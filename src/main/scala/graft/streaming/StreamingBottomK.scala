package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One stream arrival for the sketch: a series key, a deterministic
  * order key, and the observed item (e.g. a token or document
  * fingerprint). */
case class BkObs(series: String, seq: Long, item: String)

/** Snapshot row after each micro-batch: one surviving sketch entry. */
case class BkEntry(series: String, item: String, h: Long, k_rank: Int,
    n_distinct_seen: Long)

/**
 * Streaming bottom-k (KMV) distinct sketch — the streaming twin of the
 * batch q236 sketch (`CatalogSci.q236BottomkJaccard`): per series keep
 * only the k smallest md5 hashes of the DISTINCT items seen, forever.
 * The state is O(k) regardless of arrivals (the sketch is an order
 * filter: an item enters only if its hash beats the current k-th
 * minimum), and two series' sketches merge by taking the k smallest of
 * the union — which is exactly how the batch side estimates Jaccard
 * and how a 100 TB ingest estimates distinct counts without a
 * vocabulary shuffle: D̂ = (k−1)·2³² ∕ h_(k) from the k-th minimum
 * (Bar-Yossef et al. 2002).
 *
 * Determinism: the hash is the same md5-prefix u32 integer as every
 * draw in the catalog, in-batch arrivals replay in `seq` order, and
 * ties break on (h, item) — so the post-batch state equals the
 * sequential run over the whole prefix however the stream was
 * micro-batched (the split-invariance law), and the state equals the
 * BATCH bottom-k over the same prefix (the batch-equivalence law).
 *
 * Emits the full surviving sketch after each micro-batch (Append
 * snapshot-per-batch, like [[StreamingHeavyHitters]]).
 */
object StreamingBottomK {

  /** The md5-prefix u32 used everywhere in the catalog, computed
    * JVM-side: first 8 hex chars of md5(item) as a long. */
  private[streaming] def u32(item: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(item.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  /** State: the sketch (ordered by (h, item)) plus how many distinct
    * items have ever been admitted-or-rejected (observed distincts are
    * not exactly countable in O(k); n_distinct_seen counts ADMISSION
    * ATTEMPTS of items not currently in the sketch — an upper bound
    * used only for reporting, the estimator itself is h_(k)). */
  private[streaming] def step(state: Vector[(Long, String)],
      seen: Long, items: Seq[String], k: Int): (Vector[(Long, String)], Long) = {
    var sk = state
    var n = seen
    items.foreach { item =>
      val key = (u32(item), item)
      if (!sk.contains(key)) {
        n += 1
        sk = (sk :+ key).sortBy(identity).take(k)
      }
    }
    (sk, n)
  }

  def summarize(obs: Dataset[BkObs], k: Int): Dataset[BkEntry] = {
    require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")
    import obs.sparkSession.implicits._
    obs
      .groupByKey(_.series)
      .flatMapGroupsWithState[(Vector[(Long, String)], Long), BkEntry](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (series: String, rows: Iterator[BkObs],
            state: GroupState[(Vector[(Long, String)], Long)]) =>
          val (s0, n0) = state.getOption
            .getOrElse((Vector.empty[(Long, String)], 0L))
          val arrivals = rows.toSeq.sortBy(_.seq).map(_.item)
          val (s1, n1) = step(s0, n0, arrivals, k)
          state.update((s1, n1))
          s1.zipWithIndex.map { case ((h, item), i) =>
            BkEntry(series, item, h, i + 1, n1)
          }.iterator
      }
  }
}
