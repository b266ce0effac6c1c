package graft.sinks

import graft.SparkSpec

/** Loopback HTTP server speaking enough of the ES `_bulk` protocol to
  * verify delivery semantics offline: NDJSON action/source line pairs,
  * last-write-wins per `_id` within an index, `{"errors":false}` response.
  * Thread-safe store so concurrent partition posts interleave safely. */
class EsBulkStub {
  import scala.jdk.CollectionConverters._
  private val docs = new java.util.concurrent.ConcurrentHashMap[(String, String), String]()
  val requests = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile var lastAuth: Option[String] = None
  private val idRe = """"_id"\s*:\s*"((?:[^"\\]|\\.)*)"""".r

  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", { exchange =>
    val path = exchange.getRequestURI.getPath // /<index>/_bulk
    val index = path.stripPrefix("/").stripSuffix("/_bulk")
    lastAuth = Option(exchange.getRequestHeaders.getFirst("Authorization"))
    requests.incrementAndGet()
    val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
    val lines = body.split('\n').filter(_.nonEmpty)
    lines.grouped(2).foreach {
      case Array(action, source) =>
        val id = idRe.findFirstMatchIn(action)
          .getOrElse(sys.error(s"no _id in action line: $action")).group(1)
        docs.put((index, id), source) // ES semantics: index action overwrites
      case other => sys.error(s"dangling bulk line: ${other.mkString}")
    }
    val resp = """{"took":1,"errors":false,"items":[]}""".getBytes("UTF-8")
    exchange.getResponseHeaders.set("Content-Type", "application/json")
    exchange.sendResponseHeaders(200, resp.length.toLong)
    exchange.getResponseBody.write(resp)
    exchange.close()
  })
  server.start()

  def port: Int = server.getAddress.getPort
  def store: Map[(String, String), String] = docs.asScala.toMap
  def stop(): Unit = server.stop(0)
}

/** The ES adapter's two halves: the exact es-hadoop option surface the
  * reference writer passes (bexley_spark_stream_msk_es.py:510-518), and the
  * keyed-upsert delivery contract delegated to KeyedParquetSink offline. */
class EsSinkSpec extends SparkSpec {

  test("options: reproduces the reference writer's es-hadoop option map exactly") {
    val cfg = EsSinkConfig(
      nodes = "search-domain.example.com",
      port = 9243,
      user = Some("es_writer"),
      password = Some("s3cret"),
      resource = "bexley_orders",
      mappingId = "data_key")
    assert(cfg.options === Map(
      "es.nodes" -> "search-domain.example.com",
      "es.port" -> "9243",
      "es.net.http.auth.user" -> "es_writer",
      "es.net.http.auth.pass" -> "s3cret",
      "es.nodes.wan.only" -> "true",
      "es.mapping.id" -> "data_key",
      "es.resource" -> "bexley_orders"))
    // no checkpointLocation: it belongs on the stream writer, not the
    // per-batch ES writer (the reference's :517 misplacement is corrected)
    assert(!cfg.options.contains("checkpointLocation"))
    // auth options appear only when credentials are configured
    val anon = cfg.copy(user = None, password = None)
    assert(!anon.options.keySet.exists(_.startsWith("es.net.http.auth")))
  }

  test("options golden: the inline-prototype surface (reference :536-546) incl. date.rich") {
    // the reference's commented-out prototype writer is the fullest option
    // surface in the file — https nodes on 443, auth, wan-only, mapping id,
    // es.mapping.date.rich=false, resource. Snapshot it EXACTLY (minus the
    // same checkpointLocation misplacement corrected above).
    val cfg = EsSinkConfig(
      nodes = "search-shopping.example.eu-west-2.example-es.com",
      port = 443,
      user = Some("es_user"),
      password = Some("es_password"),
      resource = "bexley_orders_01",
      mappingId = "data_key",
      wanOnly = true,
      dateRich = Some(false))
    assert(cfg.options === Map(
      "es.nodes" -> "search-shopping.example.eu-west-2.example-es.com",
      "es.port" -> "443",
      "es.net.http.auth.user" -> "es_user",
      "es.net.http.auth.pass" -> "es_password",
      "es.nodes.wan.only" -> "true",
      "es.mapping.id" -> "data_key",
      "es.mapping.date.rich" -> "false",
      "es.resource" -> "bexley_orders_01"))
    // unset ⇒ the option is ABSENT (connector default rich-date parsing),
    // not rendered as "true" — the adapter only ever writes what a user set
    assert(!cfg.copy(dateRich = None).options.contains("es.mapping.date.rich"))
    // the knob renders its value, not a constant
    assert(cfg.copy(dateRich = Some(true)).options("es.mapping.date.rich") === "true")
  }

  test("writeBatchBulk: real bulk protocol into the stub — keyed idempotency across replay") {
    val s = spark
    import s.implicits._
    val stub = new EsBulkStub
    try {
      val cfg = EsSinkConfig(
        nodes = "127.0.0.1", port = stub.port,
        user = Some("es_writer"), password = Some("s3cret"),
        resource = "docs", mappingId = "data_key")
      val b1 = Seq(("a", 1), ("b", 2)).toDF("data_key", "v")
      EsSink.writeBatchBulk(b1, cfg)
      assert(stub.store.keySet === Set(("docs", "a"), ("docs", "b")))
      // credentials travel as basic auth, exactly what es-hadoop sends
      val expectedAuth = "Basic " + java.util.Base64.getEncoder
        .encodeToString("es_writer:s3cret".getBytes("UTF-8"))
      assert(stub.lastAuth === Some(expectedAuth))
      // a replayed micro-batch (at-least-once delivery) plus new data:
      // the mapping id makes replays OVERWRITE, never duplicate
      val b2 = Seq(("b", 2), ("c", 30)).toDF("data_key", "v")
      EsSink.writeBatchBulk(b2, cfg)
      EsSink.writeBatchBulk(b2, cfg) // exact replay
      assert(stub.store.keySet === Set(("docs", "a"), ("docs", "b"), ("docs", "c")))
      // last write wins on the document id
      val b3 = Seq(("b", 99)).toDF("data_key", "v")
      EsSink.writeBatchBulk(b3, cfg)
      assert(stub.store(("docs", "b")).contains("99"))
      assert(stub.store(("docs", "a")).contains("\"v\":1"))
    } finally stub.stop()
  }

  test("writeBatchBulk: drives a streaming foreachBatch micro-batch into the stub") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val stub = new EsBulkStub
    try {
      val cfg = EsSinkConfig(nodes = "127.0.0.1", port = stub.port,
        resource = "stream_docs", mappingId = "data_key")
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Int)]
      val q = input.toDF().toDF("data_key", "v").writeStream
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          EsSink.writeBatchBulk(batch, cfg)
        }
        .start()
      try {
        input.addData(("x", 1), ("y", 2))
        q.processAllAvailable()
        input.addData(("y", 20))
        q.processAllAvailable()
      } finally q.stop()
      assert(stub.store.keySet === Set(("stream_docs", "x"), ("stream_docs", "y")))
      assert(stub.store(("stream_docs", "y")).contains("20"))
      // anonymous config sends no auth header
      assert(stub.lastAuth.isEmpty)
      assert(stub.requests.get() >= 2)
    } finally stub.stop()
  }

  test("EsSinkConfig: toString redacts credentials") {
    val cfg = EsSinkConfig(nodes = "es.example.com", user = Some("u"),
      password = Some("hunter2"), resource = "r", mappingId = "k")
    assert(!cfg.toString.contains("hunter2"))
    assert(!cfg.toString.contains("Some(u)"))
    assert(cfg.toString.contains("***"))
    // the real values remain available where they belong
    assert(cfg.options("es.net.http.auth.pass") === "hunter2")
  }

  test("keyedUpsertStream: delivers the es.mapping.id upsert contract offline") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Int)]
    val cfg = EsSinkConfig(nodes = "localhost", resource = "docs", mappingId = "data_key")
    val path = tmpDir("es-sink")
    val q = EsSink.keyedUpsertStream(
      input.toDF().toDF("data_key", "v"), cfg, path, tmpDir("es-ckpt"))
    try {
      input.addData(("a", 1), ("b", 2))
      q.processAllAvailable()
      input.addData(("b", 20), ("c", 30)) // replayed key overwrites, like es.mapping.id
      q.processAllAvailable()
    } finally q.stop()
    val sink = new KeyedParquetSink(path, "data_key")
    val got = sink.read(spark).get.collect()
      .map(r => r.getAs[String]("data_key") -> r.getAs[Int]("v")).toMap
    assert(got === Map("a" -> 1, "b" -> 20, "c" -> 30))
  }
}
