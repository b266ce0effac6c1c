package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Law: the two-phase salted aggregation equals the direct groupBy. */
class SkewSpec extends SparkSpec {

  test("saltedCountSum equals direct groupBy on a skewed key distribution") {
    val s = spark
    import s.implicits._
    // heavy-hitter: 90% of rows share key 0
    val rows = (1 to 2000).map { i =>
      (if (i % 10 == 0) i.toLong % 7 + 1 else 0L, i * 0.5)
    }
    val df = rows.toDF("k", "v")
    val direct = df.groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("v")).cast("decimal(25,6)").cast("double").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedCountSum(df, "k", "v", salts = 8)
      .select(col("k"), col("n"),
        col("total").cast("decimal(25,6)").cast("double").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // counts must match exactly; sums compared after decimal stabilization
    assert(salted.map(t => (t._1, t._2)) === direct.map(t => (t._1, t._2)))
    direct.foreach { case (k, _, tot) =>
      val st = salted.find(_._1 == k).get._3
      assert(math.abs(st - tot) < 1e-6, s"key $k: $st vs $tot")
    }
  }

  test("salted aggregation on real data: lineitem quantity by returnflag") {
    val direct = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCountSum(
      Tables.lineitem(spark, "/root/testdata/sf0.001"), "l_returnflag", "l_quantity", 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === direct)
  }
}
