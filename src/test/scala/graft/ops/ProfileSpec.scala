package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Profiler + histogram laws. */
class ProfileSpec extends SparkSpec {

  test("numericStats: counts, nulls, ndv, bounds on a handcrafted frame") {
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Double, java.lang.Long)](
      (1.5, 10L), (2.5, 10L), (null, 20L), (2.5, null), (9.0, null))
      .toDF("a", "b")
    val got = Profile.numericStats(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got("a") === ((5L, 1L, 3L, 1.5, 9.0)))
    assert(got("b") === ((5L, 2L, 2L, 10.0, 20.0)))
  }

  test("equiDepthHistogram: partitions all rows, ordered disjoint bounds, near-equal depths") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val hist = Profile.equiDepthHistogram(li, "l_extendedprice", buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(hist.map(_._1).toSeq === (0L until 8L).toSeq)
    assert(hist.map(_._2).sum === li.count())
    // buckets tile the domain in order without overlap
    hist.sliding(2).foreach {
      case Array((_, _, _, _, hiA), (_, _, _, loB, _)) => assert(hiA < loB)
      case _ => ()
    }
    // near-equal depth: every bucket within 20% of the ideal (ties only)
    val ideal = li.count() / 8.0
    hist.foreach { case (b, n, _, _, _) =>
      assert(math.abs(n - ideal) < ideal * 0.2, s"bucket $b depth $n vs ideal $ideal")
    }
  }

  test("cumulative rails: NULLs are excluded (ANALYZE convention), NaN keeps its count") {
    val s = spark
    import s.implicits._
    val clean = (1 to 80).map(i => Some(i.toDouble))
    val dirty = clean ++ Seq(None, None, Some(Double.NaN))
    val cleanHist = Profile.equiDepthHistogram(
      clean.toDF("v").withColumn("v", col("v").cast("double")), "v", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dirtyHist = Profile.equiDepthHistogram(
      dirty.toDF("v").withColumn("v", col("v").cast("double")), "v", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // NULLs are not values: the histogram describes the non-null population
    // (null_frac is numericStats' job), so only the NaN row joins the 80 —
    // and the NULL-ordering question (Spark NULLS FIRST vs DuckDB NULLS
    // LAST) can never reach the cumulative
    assert(dirtyHist.values.sum === 81L)
    assert(cleanHist.values.sum === 80L)
    assert(cleanHist === Map(0L -> 20L, 1L -> 20L, 2L -> 20L, 3L -> 20L))
    // NaN sorts LAST among doubles in both engines: it lands in the top
    // bucket and shifts nothing below it
    assert(dirtyHist === Map(0L -> 21L, 1L -> 20L, 2L -> 20L, 3L -> 20L))
  }

  test("winsorize: NULL and NaN pass through unclamped; ranks use the non-null population") {
    val s = spark
    import s.implicits._
    val df = ((1 to 100).map(i => Some(i.toDouble)) ++ Seq(None, Some(Double.NaN)))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = Profile.winsorize(df, "v", pLo = 0.05, pHi = 0.95)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSeq
    val byId = got.map(t => t._1 -> (t._2, t._3)).toMap
    // NULL stays NULL (not fabricated to the p05 bound) and NaN stays NaN
    // (not clamped to the p95 bound)
    assert(byId(100L) === ((null, null)))
    assert(byId(101L)._2.asInstanceOf[Double].isNaN)
    // bounds come from the non-null, non-NaN ranked population: NaN sorts
    // last so pHi=0.95 over n=101 non-null rows → ceil = 96th element = 96.0
    got.collect { case (id, v: java.lang.Double, w: java.lang.Double)
        if !v.isNaN => (id, v, w) }
      .foreach { case (_, v, w) =>
        assert(w === math.min(math.max(v, 6.0), 96.0), s"v=$v w=$w") }
  }

  test("winsorize: bounds are dataset elements, clamp respects them, idempotent") {
    val s = spark
    import s.implicits._
    val values = (1 to 100).map(_.toDouble)
    val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = Profile.winsorize(df, "v", pLo = 0.05, pHi = 0.95)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2))
    // ceil(0.05*100)=5th element = 5.0; ceil(0.95*100)=95th = 95.0
    got.foreach { case (v, w) =>
      assert(w === math.min(math.max(v, 5.0), 95.0), s"v=$v w=$w")
    }
    assert(got.map(_._2).min === 5.0 && got.map(_._2).max === 95.0)
    // bounds are members of the original value set
    assert(values.contains(got.map(_._2).min) && values.contains(got.map(_._2).max))
    // idempotence: winsorizing the winsorized column changes nothing
    val once = Profile.winsorize(df, "v").select(col("id"), col("v_wins").as("v"))
    val twice = Profile.winsorize(once, "v")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    twice.foreach { case (_, v, w) => assert(v === w) }
  }
}
