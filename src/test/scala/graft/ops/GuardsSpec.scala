package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The one-row guard contract: pass-through on a genuine scalar, LOUD
  * failure on multi-row and on empty (a silent `crossJoin` with an empty
  * side annihilates output — the nastier of the two bugs), plus the
  * bounded escape hatch for documented small-constant tables. */
class GuardsSpec extends SparkSpec {

  test("scalar: identity on a one-row frame (values and schema)") {
    val one = spark.range(1).select(lit(42L).as("a"), lit("x").as("b"))
    val out = Guards.scalar(one)
    assert(out.columns.toSeq === Seq("a", "b"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((42L, "x")))
    // and through the idiom it guards
    val df = spark.range(3).toDF("id")
      .crossJoin(broadcast(Guards.scalar(one)))
    assert(df.count() === 3)
  }

  test("scalar: a 2-row frame fails loudly at execution") {
    val two = spark.range(2).toDF("a")
    val ex = intercept[Exception] {
      spark.range(3).toDF("id")
        .crossJoin(broadcast(Guards.scalar(two))).collect()
    }
    assert(ex.getMessage.contains("exactly one row")
      || Option(ex.getCause).exists(_.getMessage.contains("exactly one row")))
  }

  test("scalar: an EMPTY frame fails loudly instead of silently annihilating the join") {
    val empty = spark.range(1).toDF("a").filter(lit(false))
    val ex = intercept[Exception] {
      spark.range(3).toDF("id")
        .crossJoin(broadcast(Guards.scalar(empty))).collect()
    }
    assert(ex.getMessage.contains("exactly one row")
      || Option(ex.getCause).exists(_.getMessage.contains("exactly one row")))
  }

  test("bounded: pass-through within the bound, loud beyond it") {
    val ten = spark.range(10).toDF("dec")
    assert(Guards.bounded(ten, 10).collect().map(_.getLong(0)).sorted
      === (0L until 10L).toArray)
    val ex = intercept[Exception] {
      Guards.bounded(spark.range(11).toDF("dec"), 10).collect()
    }
    assert(ex.getMessage.contains("stated bound")
      || Option(ex.getCause).exists(_.getMessage.contains("stated bound")))
  }
}
