package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Dataset reconciliation: the added/removed/changed/same report between
 * two versions of a keyed table — the validation step after a migration,
 * a backfill, or an untrusted upstream refresh ("what exactly did this
 * load change?").
 *
 * One full-outer join on the key; per-column inequality (null-safe) folds
 * into the row status. At 100 TB both sides shuffle once on the key —
 * there is no cheaper general shape, and no driver-side state; the
 * compare columns are evaluated as a codegen'd projection.
 */
object Reconcile {

  /** Row-status diff. Output: key columns + status ∈
    * {added, removed, changed, same} (right side is "new"). */
  def diff(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty, "need key and compare columns")
    val l = left.select((keyCols ++ compareCols).map(c => col(c).as(s"l_$c")): _*)
    val r = right.select((keyCols ++ compareCols).map(c => col(c).as(s"r_$c")): _*)
    val joinCond = keyCols.map(c => col(s"l_$c") <=> col(s"r_$c")).reduce(_ && _)
    val anyDiff = compareCols
      .map(c => !(col(s"l_$c") <=> col(s"r_$c")))
      .reduce(_ || _)
    val leftMissing = keyCols.map(c => col(s"l_$c").isNull).reduce(_ && _)
    val rightMissing = keyCols.map(c => col(s"r_$c").isNull).reduce(_ && _)
    l.join(r, joinCond, "full_outer")
      .select(
        keyCols.map(c => coalesce(col(s"l_$c"), col(s"r_$c")).as(c)) :+
          when(leftMissing, lit("added"))
            .when(rightMissing, lit("removed"))
            .when(anyDiff, lit("changed"))
            .otherwise(lit("same")).as("status"): _*)
  }
}
