package graft.streaming

import graft.ops.{Derive, Enrich, Flatten, JsonDecode, WindowStats}
import graft.sinks.{KeyedParquetSink, StreamSinks}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * End-to-end pipeline wiring — the engine's equivalent of the reference's
 * `main()` (`/root/reference/bexley_spark_stream_msk_es.py:65-181`).
 *
 * Each stage is a pure DataFrame => DataFrame function (the reference's
 * deliberate testability seam, :373-377), so the identical logical plan runs
 * over a bounded batch frame (correctness harness) or an unbounded streaming
 * frame (production) — Structured Streaming's batch-stream unification.
 */
object OrdersPipeline {

  /** raw (value: binary|string) → curated order-grain frame (stages :287-:417). */
  def curatedOrders(raw: DataFrame): DataFrame =
    Derive.curate(JsonDecode.fromRaw(raw))

  /** raw → line-item grain (explode path, :344-:367). */
  def lineItems(raw: DataFrame): DataFrame =
    Flatten.lineItems(JsonDecode.fromRaw(raw))

  /** curated + city dimension → enriched (join stage, :421-:439). */
  def enriched(raw: DataFrame, cityDim: DataFrame): DataFrame =
    Enrich.withCity(curatedOrders(raw), cityDim)

  /** curated → 2-minute tumbling fulfilment counts (window stage, :441-:458). */
  def windowedStats(curated: DataFrame): DataFrame =
    WindowStats.tumblingCounts(curated, "order_date", "fufilment_type", "ship_method")

  /** Streaming terminal: enriched flow → keyed idempotent sink (stages :465-:531). */
  def runToKeyedSink(
      raw: DataFrame,
      cityDim: DataFrame,
      sinkPath: String,
      checkpointDir: String): StreamingQuery = {
    val sink = new KeyedParquetSink(sinkPath, "data_key")
    StreamSinks.keyedUpsert(enriched(raw, cityDim), sink, checkpointDir, "bexley-shopping")
  }
}
