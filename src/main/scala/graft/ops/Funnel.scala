package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ordered-stage funnel analysis (the view → click → purchase conversion
 * report): for each user, the first time they reached every stage, where
 * reaching stage k counts only events at or after the stage-(k−1) reach
 * time — an out-of-order purchase before the first view does NOT convert.
 *
 * Shape: one user-keyed aggregate per stage, each joined back to the
 * accumulating per-user frame. Every join and aggregate is keyed on the
 * same user column, so after the first exchange AQE-preserved partitioning
 * keeps the later stages co-located; stage count is a small constant (the
 * funnel definition), not data-dependent. No windows over the raw event
 * stream — per-user event skew never concentrates in one reducer beyond
 * the per-stage min, which combines map-side.
 */
object Funnel {

  /** Per-user stage reach times + conversion depth.
    *
    * Output: (userCol, t_<stage> for each stage (nullable), depth) where
    * depth = number of stages reached in order. */
  def stageTimes(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val users = events.select(col(userCol)).distinct()
    val withStages = stages.zipWithIndex.foldLeft(users) { case (acc, (stage, i)) =>
      val reached =
        if (i == 0)
          events.filter(col(typeCol) === stage)
            .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t_$stage"))
        else {
          val prev = s"t_${stages(i - 1)}"
          events.select(col(userCol), col(typeCol), col(tsCol))
            .join(acc.select(col(userCol), col(prev).as("__prev")), Seq(userCol))
            .filter(col(typeCol) === stage && col(tsCol) >= col("__prev"))
            .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t_$stage"))
        }
      acc.join(reached, Seq(userCol), "left")
    }
    // Forward fold wraps later stages OUTERMOST: the final expression reads
    // "deepest non-null stage wins" (t_<stage k> is only ever non-null when
    // every earlier stage was reached, so the deepest check is sufficient).
    val depth = stages.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (stage, i)) =>
        when(col(s"t_$stage").isNotNull, lit(i + 1)).otherwise(acc)
    }
    withStages.withColumn("depth", depth.cast("long"))
  }

  /** Funnel summary: users reaching each stage (depth ≥ k) — the report a
    * dashboard renders as the funnel bars. */
  def conversionCounts(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    val st = stageTimes(events, userCol, typeCol, tsCol, stages)
    val exprs = stages.zipWithIndex.map { case (stage, i) =>
      sum(when(col("depth") >= i + 1, 1L).otherwise(0L)).as(s"n_$stage")
    }
    st.agg(count(lit(1)).as("n_users"), exprs: _*)
  }
}
