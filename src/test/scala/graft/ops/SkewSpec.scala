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

  test("saltedJoin equals the plain join: planted skew, dup dim keys, inner + left") {
    val s = spark
    import s.implicits._
    // fact: 95% of rows on key 0; keys 7..9 have no dim match
    val fact = (1 to 1000).map { i =>
      (if (i % 20 == 0) (i % 10).toLong else 0L, i.toLong)
    }.toDF("fk", "payload")
    // dim: keys 0..6; key 3 DUPLICATED to prove match multiplicity survives
    val dim = ((0 to 6).map(k => (k.toLong, s"attr$k")) :+ (3L, "attr3b"))
      .toDF("dk", "attr")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Any, Any)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.get(2), r.get(3)))
        .toSeq.sortBy(t => (t._1, t._2, String.valueOf(t._3)))
    for (jt <- Seq("inner", "left")) {
      val plain = fact.join(dim, fact("fk") === dim("dk"), jt)
      val salted = Skew.saltedJoin(fact, dim, "fk", "dk", salts = 8, joinType = jt)
      assert(salted.columns.toSeq === plain.columns.toSeq, s"$jt columns")
      assert(rows(salted) === rows(plain), s"$jt rows")
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
