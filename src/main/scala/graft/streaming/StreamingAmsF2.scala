package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One stream arrival for the F2 sketch: a series key, a deterministic
  * order key (unused by the commutative sketch, kept for the shared
  * replay convention), and the observed item. */
case class AmsObs(series: String, seq: Long, item: String)

/** Snapshot row after each micro-batch: one estimator's signed sum and
  * its F2 estimate, plus the arrivals counted so far. */
case class AmsSnapshot(series: String, j: Int, s_j: Long, est_f2: Long,
    n_arrivals: Long)

/**
 * Streaming AMS tug-of-war F2 sketch — the streaming twin of the batch
 * q443 sketch ([[graft.queries.CatalogRx.amsSums]]): per series keep 16
 * ±1-signed sums S_j = Σ_arrivals sign_j(item), forever. S_j² is an
 * unbiased estimate of F2 = Σ_v f_v² over the series' occurrence
 * frequencies — the self-join size / skew statistic — at EXACTLY 16
 * longs of state per series regardless of arrivals or vocabulary (vs
 * the batch groupBy's full frequency shuffle): the 100 TB monitor for
 * "is this ingest stream developing a hot key".
 *
 * Determinism and merging: sign_j(item) is the same md5-parity draw as
 * the batch side ("ams:j:item", first hex char), and the state is a
 * plain SUM — commutative and associative — so the post-batch state
 * equals the batch signed sums over the whole prefix however the
 * stream was micro-batched (split invariance), and two series' or two
 * shards' sketches merge by vector addition (the same law the batch
 * spec proves for [[graft.queries.CatalogRx.amsSums]]).
 *
 * Emits the full 16-estimator snapshot after each micro-batch (Append
 * snapshot-per-batch, like [[StreamingHeavyHitters]]).
 */
object StreamingAmsF2 {

  private[streaming] val Estimators = 16

  /** The batch side's md5-parity sign, JVM-side: +1 when the first hex
    * char of md5("ams:j:item") is even. */
  private[streaming] def sign(j: Int, item: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val b0 = md.digest(s"ams:$j:$item".getBytes("UTF-8"))(0)
    if (((b0 >> 4) & 0xf) % 2 == 0) 1L else -1L
  }

  /** Pure kernel: fold arrivals into the 16 signed sums. One reused
    * MessageDigest and one mutable accumulator per invocation — the
    * monitor's hot path runs per stream arrival, so per-item
    * getInstance/Vector churn would be pure GC pressure ([[sign]] is
    * kept as the one-shot reference the spec replays against). */
  private[streaming] def step(state: Vector[Long],
      items: Seq[String]): Vector[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val acc = state.toArray
    items.foreach { item =>
      var j = 0
      while (j < Estimators) {
        val b0 = md.digest(s"ams:$j:$item".getBytes("UTF-8"))(0)
        acc(j) += (if (((b0 >> 4) & 0xf) % 2 == 0) 1L else -1L)
        j += 1
      }
    }
    acc.toVector
  }

  def summarize(obs: Dataset[AmsObs]): Dataset[AmsSnapshot] = {
    import obs.sparkSession.implicits._
    obs
      .groupByKey(_.series)
      .flatMapGroupsWithState[(Vector[Long], Long), AmsSnapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (series: String, rows: Iterator[AmsObs],
            state: GroupState[(Vector[Long], Long)]) =>
          val (s0, n0) = state.getOption
            .getOrElse((Vector.fill(Estimators)(0L), 0L))
          val arrivals = rows.toSeq.sortBy(_.seq).map(_.item)
          val s1 = step(s0, arrivals)
          val n1 = n0 + arrivals.length
          state.update((s1, n1))
          s1.zipWithIndex.map { case (sj, j) =>
            AmsSnapshot(series, j, sj, sj * sj, n1)
          }.iterator
      }
  }
}
