package graft

/**
 * Second-chance baseline for [[Bench]] — pure functions, unit-testable
 * without a SparkSession (BenchBaselineSpec plants a synthetic 3×
 * regression and the round-11 staleness scenario).
 *
 * Round-11 lesson: the baseline was read from ONE file
 * (BENCH_DETAIL.json), which at the time held round-9 mins — q119's
 * stale 0.7641 put the 3× trigger at 2.29 s, so a transient 2.10 s
 * sample slipped past un-re-run while the true prior min was 0.61 s.
 * The baseline is now the per-query MINIMUM across the working-tree
 * detail file AND the last two committed per-round details, so one
 * stale source can only make the trigger MORE sensitive, never less.
 */
object BenchBaseline {

  /** Per-query mins from a bench detail artifact (its
    * {"metric":"detail",...} line). The `[^}]*` capture is valid only
    * because the writer emits the queries object FLAT (string→number);
    * [[Bench]] owns both ends. None when the text has no parsable
    * detail line — callers must LOG that, not fail open silently. */
  def parseDetail(txt: String): Option[Map[String, Double]] =
    txt.linesIterator.find(_.contains("\"metric\":\"detail\"")).flatMap { l =>
      "\"queries\":\\{([^}]*)\\}".r.findFirstMatchIn(l).map(_.group(1))
        .map(_.split(',').flatMap { kv =>
          kv.split(':') match {
            case Array(k, v) =>
              try Some(k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble)
              catch { case _: Throwable => None }
            case _ => None
          }
        }.toMap)
    }

  /** Merge parsed baselines per-query: the MIN across sources (failed
    * runs are recorded as -1 by the writer and are not baselines). */
  def merged(maps: Seq[Map[String, Double]]): Map[String, Double] =
    maps.flatten
      .filter(_._2 > 0)
      .groupMapReduce(_._1)(_._2)(math.min)

  /** The re-run trigger: a min-of-3 more than 3× its baseline AND slow
    * enough (>0.3 s) that the ratio isn't just fast-query jitter. */
  def suspect(minSec: Double, prev: Option[Double]): Boolean =
    prev.exists(p => minSec > 3 * p && minSec > 0.3)

  /** Baseline file set: the explicit override alone when given, else
    * the working-tree detail plus the newest two committed per-round
    * details (all repo-relative — same default as the writer). */
  def defaultSources(override_ : Option[String]): Seq[String] =
    override_ match {
      case Some(p) => Seq(p)
      case None =>
        val rs = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
          .map(_.getName)
          .filter(_.matches("BENCH_DETAIL_r\\d+\\.json"))
          .sortBy(n => "\\d+".r.findFirstIn(n).map(_.toInt).getOrElse(0))
          .takeRight(2)
          .toSeq
        "BENCH_DETAIL.json" +: rs
    }
}
