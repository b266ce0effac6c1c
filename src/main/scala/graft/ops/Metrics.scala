package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Pipeline observability via `Dataset.observe` — the engine's counterpart of
 * the reference's per-stage structured log events
 * (`/root/reference/bexley_spark_stream_msk_es.py:216,:265,:332,:408` — it
 * logs stage boundaries; we attach METRICS to them).
 *
 * `observe` plants an accumulator-backed aggregate on the plan that costs no
 * extra pass or shuffle: metrics materialize as a side effect of whatever
 * action runs the query. In batch they surface through
 * `QueryExecutionListener` (`df.observe` docs) or
 * [[Metrics.lastObserved]]; in streaming through
 * `StreamingQueryProgress.observedMetrics` — the production hook for
 * row-count reconciliation and drop-rate alerting at 100 TB, where a second
 * counting pass over the input would double the job.
 */
object Metrics {

  /** Attach row count + per-column null counts at a named stage boundary. */
  def observeStage(df: DataFrame, stage: String, watchNulls: Seq[String] = Nil): DataFrame = {
    val nullCounts: Seq[Column] = watchNulls.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    df.observe(stage, count(lit(1)).as("rows"), nullCounts: _*)
  }

  /** Quality-gate instrumentation: rows seen + rows that would be dropped. */
  def observeGate(df: DataFrame, stage: String, keep: Column): DataFrame =
    df.observe(stage,
      count(lit(1)).as("rows"),
      sum(when(keep, 0L).otherwise(1L)).as("dropped"))

  /** Collect the observed metrics of the LAST completed execution of `df`'s
    * plan (batch convenience; streaming reads progress.observedMetrics).
    * NOTE: metrics populate only after an action that executes THIS
    * Dataset's own plan — collect/write/foreachPartition. `df.count()`
    * compiles a separate Aggregate plan with its own QueryExecution and
    * leaves these metrics untouched; production code should prefer a
    * QueryExecutionListener keyed by the stage name. */
  def lastObserved(df: DataFrame, stage: String): Option[Map[String, Any]] = {
    val qe = df.queryExecution
    qe.observedMetrics.get(stage).map { row =>
      row.schema.fieldNames.zip(row.toSeq).toMap
    }
  }
}
