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
    wanOnly: Boolean = true) {

  /** The es-hadoop option map, mirroring reference :510-518 line for line. */
  def options: Map[String, String] =
    Map(
      "es.nodes" -> nodes,
      "es.port" -> port.toString,
      "es.nodes.wan.only" -> wanOnly.toString,
      "es.mapping.id" -> mappingId,
      "es.resource" -> resource) ++
      user.map("es.net.http.auth.user" -> _) ++
      password.map("es.net.http.auth.pass" -> _)
}

object EsSink {

  /** The reference's per-batch writer body (:507-519) against a real
    * es-hadoop classpath: mode append + the config's option map. Kept as a
    * one-liner so the option surface, not the call, is the tested unit —
    * this line needs the connector jar and a cluster to execute. */
  def writeBatchEs(batch: DataFrame, config: EsSinkConfig): Unit =
    batch.write.mode("append").format("es").options(config.options).save()

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
