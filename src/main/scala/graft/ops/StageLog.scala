package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Per-stage structured logging + fail-fast — the reference's operational
 * contract: it emits one ECS-formatted log record at every pipeline stage
 * boundary and exits the job on the first stage failure
 * (`/root/reference/bexley_spark_stream_msk_es.py:34-39` sets up the ECS
 * handler; the eight try/except → `logger.error` + `sys.exit(1)` sites at
 * :218-221, :249-252, :281-285, :337-341, :413-417, :433-439, :454-458
 * are the per-stage fail-fast boundaries).
 *
 * Spark-first re-expression: stage SETUP code (building a source, a plan,
 * a writer) is wrapped in [[StageLogger.stage]], which emits start/ok/failed
 * events and rethrows as [[StageFailedException]] — poison propagates
 * immediately, nothing downstream runs with a half-built plan. Stage
 * EXECUTION metrics ride the plans themselves: [[Metrics.observeStage]]
 * plants accumulator-backed observe nodes, and [[StageLogger.attach]]
 * registers a `QueryExecutionListener` that turns every completed action
 * into one event per observed stage (and every failed action into a
 * `failed` event) — zero extra passes at 100 TB, unlike a count-per-stage
 * re-implementation.
 *
 * The event sink is injectable (tests collect into a buffer; production
 * defaults to one JSON line per event on stderr, the ECS-shape analogue).
 */
final case class StageEvent(
    stage: String,
    status: String, // start | ok | failed
    elapsedMs: Long,
    metrics: Map[String, Any] = Map.empty,
    error: Option[String] = None) {

  /** One JSON-shaped log line (flat, lexicographic metric order). */
  def render: String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val m = metrics.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(String.valueOf(v))}"""" }
    val e = error.map(t => s""""error":"${esc(t)}"""")
    (Seq(s""""event":"stage"""", s""""stage":"${esc(stage)}"""",
      s""""status":"$status"""", s""""elapsed_ms":$elapsedMs""") ++ m ++ e)
      .mkString("{", ",", "}")
  }
}

/** A stage failed; carries the stage name for the top-level handler. */
final class StageFailedException(val stage: String, cause: Throwable)
  extends RuntimeException(s"pipeline stage '$stage' failed: ${cause.getMessage}", cause)

final class StageLogger(sink: StageEvent => Unit = StageLogger.consoleSink) {

  /** Wrap a stage boundary: start/ok/failed events + immediate rethrow. */
  def stage[T](name: String)(body: => T): T = {
    sink(StageEvent(name, "start", 0L))
    val t0 = System.nanoTime()
    def ms = (System.nanoTime() - t0) / 1000000L
    try {
      val out = body
      sink(StageEvent(name, "ok", ms))
      out
    } catch {
      case e: Throwable =>
        sink(StageEvent(name, "failed", ms, error = Some(e.toString)))
        throw new StageFailedException(name, e)
    }
  }

  /** The reference's `sys.exit(1)` behavior for `main`s: run the stage,
    * on failure emit the event and invoke `onFatal` (defaults to exiting
    * the JVM; tests inject a throwing handler). */
  def failFast[T](name: String, onFatal: Int => Nothing = code => sys.exit(code))(
      body: => T): T =
    try stage(name)(body)
    catch { case _: StageFailedException => onFatal(1) }

  /** Register a listener that emits one event per observed metric stage
    * ([[Metrics.observeStage]] boundaries) on every completed action, and a
    * `failed` event when an action dies. Returns the listener so callers
    * can unregister. */
  def attach(spark: SparkSession): QueryExecutionListener = {
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (stageName, row) =>
          sink(StageEvent(stageName, "ok", durationNs / 1000000L,
            metrics = row.schema.fieldNames.zip(row.toSeq).toMap))
        }
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit =
        sink(StageEvent(s"action:$funcName", "failed", 0L, error = Some(ex.toString)))
    }
    spark.listenerManager.register(l)
    l
  }
}

object StageLogger {
  /** Production default: one structured line per event on stderr. */
  val consoleSink: StageEvent => Unit = e => Console.err.println(e.render)
}
