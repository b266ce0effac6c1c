package graft.queries

import graft.Tables
import graft.ops.Guards
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Round-14 waves (q457–q459):
 *
 *   - q457 completes the interval family's verb set — the family now
 *     classifies pairs (q451 Allen relations), counts concurrency
 *     (q455 sweep-line), selects an optimum subset (q456 weighted
 *     scheduling DP), and COVERS (minimum stabbing).
 *   - q458 completes the sketch canon's sliding-WINDOW corner (DGIM)
 *     — every prior sketch (CMS/HLL/LC/Bloom/KMV/AMS/MG) answers a
 *     whole-stream question; DGIM answers "in the last N".
 *   - q459 gives the tree family its ancestry verb (LCA + tree
 *     distance), closed-form over the digit forest — zero iterations.
 */
object CatalogW14 {

  // ---------------------------------------------------------------- q457

  private[graft] val StabPanel = 60

  /** Minimum interval stabbing (piercing) over the q451/q455/q456 order
    * fulfillment windows: the fewest probe DAYS such that every window
    * of the panel contains at least one — the audit-scheduling dual of
    * q456's max-disjoint selection (for interval graphs the minimum
    * piercing number EQUALS the maximum number of pairwise-disjoint
    * intervals — Helly's theorem in one dimension / the perfection of
    * interval graphs; W14WaveSpec asserts the equality against an
    * exhaustive independent-set search). The optimal greedy is the
    * classic one (Kleinberg–Tardos ch. 4 exchange argument): walk
    * intervals by ascending right endpoint, stab at the right endpoint
    * of the first un-stabbed interval.
    *
    * The walk is inherently sequential, so it runs on the md5-bottom
    * [[StabPanel]] windows per market segment in `mapGroups` — the
    * q454/q456 fixed-panel pattern: panel selection (the corpus-sized
    * cost) is a distributed rank, the O(panel) kernel replays exactly
    * as the oracle's 60-step list-state recursive CTE. Output per
    * segment: panel size, stab count, first/last/sum of stab days
    * (inclusive day spans: a window ending day X is stabbed by a probe
    * on X). */
  def q457IntervalStabbing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val panel = CatalogW13.fulfillmentWindows(s, dir, bySegment = true)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
          .orderBy(md5(concat(lit("stab:"), col("okey").cast("string"))),
            col("okey"))))
      .filter(col("rnk") <= StabPanel)
      .select(col("k").as("seg"), col("okey"), col("sd"), col("ed"))
      .as[(String, Long, Long, Long)]
    panel.groupByKey(_._1).mapGroups { (seg, it) =>
      val rows = it.toSeq.sortBy(r => (r._4, r._3, r._2))
      val pts = scala.collection.mutable.ArrayBuffer.empty[Long]
      rows.foreach { case (_, _, sd, ed) =>
        if (pts.isEmpty || sd > pts.last) pts += ed
      }
      (seg, rows.length.toLong, pts.length.toLong, pts.head, pts.last,
        pts.sum)
    }.toDF("seg", "n_intervals", "n_stab_points", "first_stab_day",
        "last_stab_day", "sum_stab_days")
      .orderBy(col("seg"))
  }

  // ---------------------------------------------------------------- q458

  private[graft] val DgimN = 256
  private[graft] val DgimPanel = 2000

  /** One DGIM micro-step kernel, shared by the engine and (as the same
    * rule in SQL) the oracle: on each arrival, expire buckets outside
    * the window, append a size-1 bucket for a 1-bit, then cascade —
    * while any size has 3 buckets, merge the two OLDEST of the SMALLEST
    * such size into one of double size carrying the newer timestamp.
    * Bucket timestamps are distinct by construction (each is the
    * position of some 1, and a merge keeps the newer), so (sz, ts)
    * identifies the merge pair in both engines. */
  private[graft] def dgimRun(bits: Seq[Int], n: Int): Seq[(Long, Long)] = {
    var buckets = List.empty[(Long, Long)] // (ts, sz)
    bits.zipWithIndex.foreach { case (b, i0) =>
      val t = i0 + 1L
      buckets = buckets.filter(_._1 > t - n)
      if (b == 1) {
        buckets = (t, 1L) :: buckets
        var done = false
        while (!done) {
          val bySize = buckets.groupBy(_._2)
          bySize.filter(_._2.size >= 3).keys.toSeq.sorted.headOption match {
            case Some(s) =>
              val olds = buckets.filter(_._2 == s).sortBy(_._1).take(2)
              buckets = (olds.map(_._1).max, 2 * s) ::
                buckets.filterNot(x => x._2 == s && olds.exists(_._1 == x._1))
            case None => done = true
          }
        }
      }
    }
    buckets
  }

  /** DGIM sliding-window counting (Datar–Gionis–Indyk–Motwani 2002) —
    * the sliding-WINDOW member completing the sketch canon (CMS
    * frequency, HLL/linear-counting cardinality, Bloom membership, KMV
    * order statistics, AMS moments, Misra–Gries heavy hitters — all
    * whole-stream; DGIM answers "how many 1s in the LAST N", the decay
    * problem those cannot): O(log² N) buckets of power-of-2 sizes, at
    * most two per size, estimate = all-but-oldest + half the oldest,
    * relative error ≤ 50% by the bucket invariant. The bit stream is a
    * per-event predicate (user_id ≡ 0 mod 3) over the GLOBAL
    * md5-bottom-[[DgimPanel]] event panel split by event type — per-
    * series lengths are therefore data-dependent (∑ = [[DgimPanel]]),
    * unlike q457's per-segment rank panels — in event_id order (the
    * q454 fixed-panel sequential-kernel pattern; the oracle takes the
    * identical global-then-split panel and replays the
    * identical micro-step rule as an h-indexed list-of-structs
    * recursive CTE, merges linearized one per step). Output per series:
    * the exact window count, the DGIM estimate, bucket stats, and the
    * ≤50%-error guarantee as a constant-TRUE audit column. */
  def q458DgimWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val panel = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("user_id"))
      .orderBy(md5(concat(lit("dgim:"), col("event_id").cast("string"))),
        col("event_id"))
      .limit(DgimPanel)
      .select(col("event_type").as("series"),
        when(col("user_id") % 3 === 0, 1).otherwise(0).as("bit"),
        col("event_id").as("seq"))
      .as[(String, Int, Long)]
    panel.groupByKey(_._1).mapGroups { (series, it) =>
      val rows = it.toSeq.sortBy(_._3)
      val bits = rows.map(_._2)
      val exact = bits.takeRight(DgimN).sum.toLong
      val buckets = dgimRun(bits, DgimN)
      val est =
        if (buckets.isEmpty) 0L
        else {
          val oldest = buckets.minBy(_._1)
          buckets.map(_._2).sum - oldest._2 + oldest._2 / 2
        }
      val maxB = if (buckets.isEmpty) 0L else buckets.map(_._2).max
      (series, rows.length.toLong, exact, est, buckets.length.toLong, maxB,
        (est - exact).abs * 2 <= exact || est == exact)
    }.toDF("series", "n_seen", "exact_ones", "dgim_est", "n_buckets",
        "max_bucket", "within_bound")
      .orderBy(col("series"))
  }

  // ---------------------------------------------------------------- q459

  private[graft] val LcaPanel = 40

  /** Lowest common ancestor + tree distance over the digit-decimation
    * forest (parent = v div 10, roots < 10 — q407's hierarchy): THE
    * classic tree query (Aho–Hopcroft–Ullman 1976 posed it; tree
    * distance d(u,v) = depth(u) + depth(v) − 2·depth(lca) is its
    * canonical application). Like q407's rollup, the answer is CLOSED
    * FORM — an ancestor is a decimal prefix whether or not that key
    * exists (the round-13 sparse-key lesson), so LCA = the longest
    * common decimal prefix, zero iterations: explode d = 1..min(len),
    * keep prefix-equal d, take the max. Pairs come from the md5-bottom
    * [[LcaPanel]] customer panel (C(40,2) = 780 rows — a bounded
    * broadcast, never a corpus self-join); cross-root pairs (different
    * leading digit) have NULL lca and NULL distance — a forest has no
    * path between trees. */
  def q459TreeLca(s: SparkSession, dir: String): DataFrame = {
    val panel = Tables.customer(s, dir)
      .select(col("c_custkey").as("v"))
      .orderBy(md5(concat(lit("lca:"), col("v").cast("string"))), col("v"))
      .limit(LcaPanel)
      .select(col("v"), col("v").cast("string").as("vs"))
    val a = panel.select(col("v").as("u"), col("vs").as("us"))
    val b = Guards.bounded(panel, LcaPanel)
    val pairs = a.join(broadcast(b), col("u") < col("v"))
    val lcp = pairs
      .select(col("u"), col("us"), col("v"), col("vs"),
        explode(sequence(lit(1),
          least(length(col("us")), length(col("vs"))))).as("d"))
      .filter(expr("substring(us, 1, d) = substring(vs, 1, d)"))
      .groupBy(col("u"), col("v")).agg(max(col("d")).cast("long").as("p"))
    pairs.join(lcp, Seq("u", "v"), "left")
      .withColumn("p", coalesce(col("p"), lit(0L)))
      .select(col("u"), col("v"),
        when(col("p") > 0,
          expr("cast(substring(us, 1, cast(p as int)) as bigint)"))
          .otherwise(lit(null).cast("long")).as("lca"),
        col("p").as("lca_depth"),
        when(col("p") > 0, length(col("us")) - col("p")
          + length(col("vs")) - col("p"))
          .otherwise(lit(null).cast("long")).as("tree_dist"))
      .orderBy(col("u"), col("v"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q457_interval_stabbing" -> q457IntervalStabbing _,
    "q458_dgim_window"       -> q458DgimWindow _,
    "q459_tree_lca"          -> q459TreeLca _)
}
