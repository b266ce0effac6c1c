package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Elasticsearch sink adapter — config-complete parity with the reference's
 * es-hadoop writer (`write_df_to_es`,
 * `/root/reference/bexley_spark_stream_msk_es.py:506-519`), offline-safe.
 *
 * The reference writes each micro-batch with
 * `.format("es")` + the option surface below; the es-hadoop connector jar
 * is not available in this zero-egress environment, so the adapter splits
 * the sink into the two things it actually is:
 *
 *  1. [[EsSinkConfig.options]] — the EXACT option map a real
 *     `df.write.format("es").options(...)` call takes (spec-locked against
 *     the reference's nine options). A user with es-hadoop on the
 *     classpath passes it straight through via [[EsSink.writeBatchEs]].
 *  2. The DELIVERY CONTRACT — keyed idempotent upsert, last write wins on
 *     the mapping id (`es.mapping.id = data_key` is what de-duplicates
 *     at-least-once replays in the reference) — delegated locally to
 *     [[KeyedParquetSink]], which reproduces it with a crash-atomic
 *     manifest commit.
 *
 * Note the reference misplaces `checkpointLocation` inside the per-batch
 * ES writer (:517), where it is ignored — checkpointing belongs on the
 * stream writer ([[StreamSinks.keyedUpsert]] places it correctly), so the
 * option map here deliberately omits it.
 */
final case class EsSinkConfig(
    nodes: String,
    port: Int = 9200,
    user: Option[String] = None,
    password: Option[String] = None,
    /** index (or index/type) target — `es.resource` (reference :518). */
    resource: String,
    /** document-id column — `es.mapping.id` (reference :516): the key that
      * makes replayed micro-batches overwrite instead of duplicate. */
    mappingId: String,
    /** route via publicly reachable nodes only (managed/VPC ES domains —
      * reference :515 hardcodes "true" for its AWS domain). */
    wanOnly: Boolean = true,
    /** `es.mapping.date.rich` — the reference's inline prototype (:544)
      * sets "false" so timestamp-ish fields index as plain values instead
      * of connector-parsed rich dates. None omits the option and keeps the
      * connector default (true). */
    dateRich: Option[Boolean] = None) {

  /** Case-class toString would print the credentials verbatim into any log
    * interpolation — redact them (same discipline as SecretsLoader: secret
    * material never reaches logs; the real values stay readable via the
    * fields and [[options]]). */
  override def toString: String = {
    def red(o: Option[String]) = o.map(_ => "***")
    s"EsSinkConfig($nodes,$port,${red(user)},${red(password)},$resource,$mappingId,$wanOnly,$dateRich)"
  }

  /** The es-hadoop option map, mirroring reference :510-518 line for line
    * (plus the prototype-only date.rich knob, :544, when set). */
  def options: Map[String, String] =
    Map(
      "es.nodes" -> nodes,
      "es.port" -> port.toString,
      "es.nodes.wan.only" -> wanOnly.toString,
      "es.mapping.id" -> mappingId,
      "es.resource" -> resource) ++
      user.map("es.net.http.auth.user" -> _) ++
      password.map("es.net.http.auth.pass" -> _) ++
      dateRich.map(b => "es.mapping.date.rich" -> b.toString)
}

object EsSink {

  /** The reference's per-batch writer body (:507-519) against a real
    * es-hadoop classpath: mode append + the config's option map. Kept as a
    * one-liner so the option surface, not the call, is the tested unit —
    * this line needs the connector jar and a cluster to execute. */
  def writeBatchEs(batch: DataFrame, config: EsSinkConfig): Unit =
    batch.write.mode("append").format("es").options(config.options).save()

  /** Docs per `_bulk` request — bounds request size the same way
    * es-hadoop's `es.batch.size.entries` does (its default is 1000). */
  private val BulkChunkSize = 1000

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /**
   * Connector-free per-batch writer: the SAME delivery semantics as
   * [[writeBatchEs]] (`index` action keyed by `es.mapping.id`, so replays
   * overwrite instead of duplicate — ES last-write-wins on `_id`) over the
   * plain REST `_bulk` protocol with only JDK HTTP. Executable offline
   * against any loopback stub speaking `_bulk` (EsSinkSpec does exactly
   * that), and against a real cluster without the es-hadoop jar.
   *
   * Scale shape: rows serialize to NDJSON with the codegen'd `to_json`,
   * and each PARTITION posts its own chunked bulk requests — no driver
   * collect, connections fan out with the executors exactly like the
   * connector's. Failures are loud: a non-2xx status or `"errors":true`
   * response throws, failing the task (and with [[StreamSinks.keyedUpsert]]
   * the micro-batch retries — safe, because the keyed index action is
   * idempotent).
   */
  def writeBatchBulk(batch: DataFrame, config: EsSinkConfig): Unit = {
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val endpoint = s"http://${config.nodes}:${config.port}/${config.resource}/_bulk"
    val authHeader = for { u <- config.user; p <- config.password } yield
      "Basic " + java.util.Base64.getEncoder
        .encodeToString(s"$u:$p".getBytes("UTF-8"))
    val mappingId = config.mappingId
    val payload = batch.select(
      col(mappingId).cast("string").as("_id"),
      to_json(struct(batch.columns.map(col): _*)).as("_doc"))
    payload.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      rows.grouped(BulkChunkSize).foreach { chunk =>
        val body = new StringBuilder
        chunk.foreach { r =>
          // fail like es-hadoop's explicit 'no id found', not with an
          // opaque NPE from deep inside the serializer
          if (r.isNullAt(0)) throw new java.io.IOException(
            s"bulk write failed: null $mappingId value (es.mapping.id column " +
              "must be non-null on every row)")
          body.append("{\"index\":{\"_id\":\"")
            .append(jsonEscape(r.getString(0))).append("\"}}\n")
            .append(r.getString(1)).append('\n')
        }
        val conn = new java.net.URI(endpoint).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        try {
          conn.setRequestMethod("POST")
          conn.setRequestProperty("Content-Type", "application/x-ndjson")
          authHeader.foreach(conn.setRequestProperty("Authorization", _))
          // a black-holed endpoint must fail the task (and let the
          // micro-batch retry), not hang it — es-hadoop's es.http.timeout
          // defaults to 1m for the same reason
          conn.setConnectTimeout(60000)
          conn.setReadTimeout(60000)
          conn.setDoOutput(true)
          conn.getOutputStream.write(body.toString.getBytes("UTF-8"))
          val status = conn.getResponseCode
          // getInputStream throws on error statuses; the diagnostic body
          // (ES's rejection reason) lives on getErrorStream there
          val stream =
            if (status / 100 == 2) conn.getInputStream
            else Option(conn.getErrorStream).getOrElse(conn.getInputStream)
          val resp = new String(stream.readAllBytes(), "UTF-8")
          if (status / 100 != 2 || resp.contains("\"errors\":true"))
            throw new java.io.IOException(s"bulk write failed: HTTP $status $resp")
        } finally conn.disconnect()
      }
    }
  }

  /** Offline delivery with the same contract: keyed idempotent upsert on
    * the mapping-id column into a [[KeyedParquetSink]] at `path`. Returns
    * the running stream (foreachBatch + checkpoint on the stream writer). */
  def keyedUpsertStream(
      df: DataFrame,
      config: EsSinkConfig,
      path: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    StreamSinks.keyedUpsert(
      df,
      new KeyedParquetSink(path, config.mappingId),
      checkpointDir,
      queryName = s"graft-es-${config.resource}",
      trigger = trigger)
}
