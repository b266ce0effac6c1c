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
    // explicit presence flags, NOT key-nullness: a genuinely-null key
    // (exactly the dirty data a reconciliation exists to catch) must not
    // read as "this side was absent from the join"
    val l = left.select((keyCols ++ compareCols).map(c => col(c).as(s"l_$c")) :+
      lit(true).as("__l_present"): _*)
    val r = right.select((keyCols ++ compareCols).map(c => col(c).as(s"r_$c")) :+
      lit(true).as("__r_present"): _*)
    val joinCond = keyCols.map(c => col(s"l_$c") <=> col(s"r_$c")).reduce(_ && _)
    val anyDiff = compareCols
      .map(c => !(col(s"l_$c") <=> col(s"r_$c")))
      .reduce(_ || _)
    val leftMissing = col("__l_present").isNull
    val rightMissing = col("__r_present").isNull
    l.join(r, joinCond, "full_outer")
      .select(
        keyCols.map(c =>
          when(col("__l_present").isNotNull, col(s"l_$c"))
            .otherwise(col(s"r_$c")).as(c)) :+
          when(leftMissing, lit("added"))
            .when(rightMissing, lit("removed"))
            .when(anyDiff, lit("changed"))
            .otherwise(lit("same")).as("status"): _*)
  }

  /**
   * Referential-integrity audit: for each declared (child, fk) → (parent,
   * pk) relationship, the child row count and the orphan count (child
   * rows whose fk matches no parent pk; NULL fks count as orphans — a
   * null reference is unresolvable). The load-validation twin of
   * [[diff]]: run after every ingest, alert on non-zero orphans.
   *
   * Scale shape: per relationship, one join of the child against the
   * parent's DISTINCT key projection (dimension-sized → broadcastable)
   * folded into a single count/conditional-count aggregate; the
   * relationships union into one report frame.
   */
  def fkOrphans(rels: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(rels.nonEmpty, "no relationships declared")
    rels.map { case (name, child, fk, parent, pk) =>
      child.select(col(fk).as("__fk"))
        .join(broadcast(parent.select(col(pk).as("__fk"), lit(true).as("__p"))
          .distinct()), Seq("__fk"), "left")
        .agg(count(lit(1)).as("n_child"),
          count(when(col("__p").isNull, lit(1))).as("n_orphans"))
        .select(lit(name).as("relationship"), col("n_child"), col("n_orphans"))
    }.reduce(_.unionByName(_))
  }
}
