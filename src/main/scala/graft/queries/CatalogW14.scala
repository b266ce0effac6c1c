package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Round-14 waves (q457) — completing the interval family's verb set.
 * The family now classifies pairs (q451 Allen relations), counts
 * concurrency (q455 sweep-line), selects an optimum subset (q456
 * weighted scheduling DP), and — here — COVERS: the minimum set of
 * probe days that stabs every window.
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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q457_interval_stabbing" -> q457IntervalStabbing _)
}
