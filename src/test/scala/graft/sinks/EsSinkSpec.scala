package graft.sinks

import graft.SparkSpec

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
