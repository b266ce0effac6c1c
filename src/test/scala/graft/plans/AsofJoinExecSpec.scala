package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom as-of join physical operator: correctness vs a composed
  * window reference, plan shape, and the zero-extra-exchange contract. */
class AsofJoinExecSpec extends SparkSpec {
  import spark.implicits._

  private def trades: DataFrame = Seq(
    (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 5L, "t0"),
    (2L, 15L, "t3"), (2L, 3L, "t4"), (3L, 50L, "t5"))
    .toDF("k", "t", "trade")

  private def quotes: DataFrame = Seq(
    (1L, 8L, 1.0), (1L, 10L, 1.5), (1L, 19L, 2.0),
    (2L, 15L, 3.0), (4L, 1L, 9.9))
    .toDF("qk", "qt", "px")

  private def finalPlanString(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case o => o.toString
    }
  }

  test("matches the window-composed as-of reference on every row") {
    val got = AsofJoinOp.asofJoin(trades, quotes,
        Seq("k"), Seq("qk"), "t", "qt")
      .select($"trade", $"px").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // reference: left join on key with qt <= t, keep max-qt quote per trade
    val w = Window.partitionBy($"trade").orderBy($"qt".desc_nulls_last)
    val ref = trades.join(quotes, $"k" === $"qk" && $"qt" <= $"t", "left")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"trade", $"px").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == ref)
    assert(got("t1") == Some(1.5)) // tie included: qt == t matches
    assert(got("t2") == Some(2.0))
    assert(got("t0") == None)      // no quote at or before
    assert(got("t4") == None)
    assert(got("t5") == None)      // key with no quotes at all
  }

  test("physical plan uses AsofJoinExec with one exchange+sort per side") {
    val df = AsofJoinOp.asofJoin(trades, quotes, Seq("k"), Seq("qk"), "t", "qt")
    val s = finalPlanString(df)
    assert(s.contains("AsofJoin"), s)
    assert("Exchange hashpartitioning".r.findAllIn(s).size == 2, s)
    assert("Sort \\[".r.findAllIn(s).size == 2, s)
  }

  test("pre-partitioned inputs add NO exchange beyond the explicit repartitions") {
    val l = trades.repartition(4, $"k")
    val r = quotes.repartition(4, $"qk")
    val df = AsofJoinOp.asofJoin(l, r, Seq("k"), Seq("qk"), "t", "qt")
    val s = finalPlanString(df)
    assert(s.contains("AsofJoin"), s)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(s).size
    // exactly the two REPARTITION_BY_COL exchanges — the join itself added none
    assert(shuffles == 2, s"expected only the 2 explicit repartitions:\n$s")
    assert(s.contains("REPARTITION_BY_NUM"), s)
    assert(!s.contains("ENSURE_REQUIREMENTS"),
      "the operator must reuse the existing hash partitioning:\n" + s)
    assert(df.count() == trades.count())
  }

  test("empty right side yields all-null enrichment; empty left yields empty") {
    val emptyQ = quotes.filter($"qk" < 0)
    val allNull = AsofJoinOp.asofJoin(trades, emptyQ, Seq("k"), Seq("qk"), "t", "qt")
    assert(allNull.count() == 6 && allNull.filter($"px".isNotNull).count() == 0)
    val emptyT = trades.filter($"k" < 0)
    assert(AsofJoinOp.asofJoin(emptyT, quotes, Seq("k"), Seq("qk"), "t", "qt").count() == 0)
  }

  test("multi-column keys and duplicate left times") {
    val l = Seq((1L, "a", 10L, "x1"), (1L, "a", 10L, "x2"), (1L, "b", 10L, "x3"))
      .toDF("k1", "k2", "t", "tag")
    val r = Seq((1L, "a", 9L, 7.0), (1L, "b", 11L, 8.0))
      .toDF("rk1", "rk2", "rt", "v")
    val got = AsofJoinOp.asofJoin(l, r, Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "rt")
      .select($"tag", $"v").collect()
      .map(r0 => (r0.getString(0), if (r0.isNullAt(1)) None else Some(r0.getDouble(1)))).toMap
    assert(got == Map("x1" -> Some(7.0), "x2" -> Some(7.0), "x3" -> None))
  }
}
