package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the CatalogMore wave (q174-q178): brute-force dominance check
  * for the Pareto frontier, row-normalization for the Markov model, the
  * exact-equality identity for the join-size estimator, and Q20's
  * subset/threshold laws. */
class MoreWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("Q20: every reported supplier is in NATION_1 and shipped a red part") {
    val out = CatalogTpch.q174TpchQ20(spark, sf).collect()
    val n1Supps = graft.Tables.supplier(spark, sf)
      .join(graft.Tables.nation(spark, sf).filter(col("n_name") === "NATION_1"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name")).collect().map(_.getString(0)).toSet
    assert(out.map(_.getString(0)).toSet.subsetOf(n1Supps))
    assert(out.map(_.getString(0)).toSeq === out.map(_.getString(0)).toSeq.sorted)
  }

  test("markov: probabilities row-normalize to 1 per from_type") {
    val out = CatalogMore.q176MarkovTransitions(spark, sf)
      .groupBy(col("from_type")).agg(sum(col("prob")).as("p")).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9, r))
  }

  test("markov: transition counts conserve total adjacent pairs") {
    val total = CatalogMore.q176MarkovTransitions(spark, sf)
      .agg(sum(col("cnt"))).collect().head.getLong(0)
    val ev = graft.Tables.events(spark, sf)
    val nEvents = ev.count()
    val nUsers = ev.select(col("user_id")).distinct().count()
    assert(total === nEvents - nUsers) // each user contributes |seq|-1 pairs
  }

  test("pareto: frontier is exactly the brute-force non-dominated set") {
    val d = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("dt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = d.filter { case (_, c, t) =>
      !d.exists { case (_, c2, t2) =>
        c2 <= c && t2 >= t && (c2 < c || t2 > t)
      }
    }.map(_._1).toSet
    val got = CatalogMore.q177ParetoFrontier(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got === want)
  }

  test("join estimate: predicted equals actual for both equi-joins") {
    val out = CatalogMore.q178JoinSizeEstimate(spark, sf).collect()
    assert(out.length === 2)
    out.foreach(r => assert(r.getLong(1) === r.getLong(2), r))
    assert(out.exists(r => r.getLong(1) > 0L))
  }

  test("retrieval eval: mrr never exceeds hit rate; both are proper fractions") {
    val r = CatalogMore.q181RetrievalEval(spark, sf).collect().head
    val (nq, nh, hr, mrr) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(nq > 0 && nh >= 0 && nh <= nq)
    assert(hr >= 0.0 && hr <= 1.0 && mrr >= 0.0)
    assert(mrr <= hr + 1e-12) // 1/rank <= 1 counted only on hits
  }

  test("calibration: bins partition the corpus; rates are proper fractions") {
    val rows = CatalogMore.q183Calibration(spark, sf).collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === nDocs)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 7)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("frequent triples: canonical order, support bounded by user count") {
    val rows = CatalogMore.q184FrequentTriples(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val nUsers = graft.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1) && r.getLong(1) < r.getLong(2))
      assert(r.getLong(3) >= 1 && r.getLong(3) <= nUsers)
    }
    val supports = rows.map(_.getLong(3)).toSeq
    assert(supports === supports.sortBy(-_))
  }

  test("weighted median: matches a driver-side brute force per language") {
    val d = graft.Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("wt"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    val want = d.groupBy(_._1).map { case (lang, rows) =>
      val sorted = rows.sortBy(_._2)
      val total = sorted.map(_._3).sum
      var cum = 0L
      lang -> sorted.find { x => cum += x._3; cum * 2 >= total }.get._2
    }
    val got = CatalogMore.q185WeightedMedian(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === want)
  }

  test("expectations: the clean fixture passes every declared contract") {
    val rows = CatalogMore.q186Expectations(spark, sf).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"empty check ${r.getString(0)}")
      assert(r.getLong(2) === 0L && r.getBoolean(3), s"violated ${r.getString(0)}")
    }
  }

  test("benford: digits 1-9 only, counts conserve orders, shares sum to 1") {
    val rows = CatalogMore.q187Benford(spark, sf).collect()
    assert(rows.forall(r => r.getString(0).length == 1 &&
      r.getString(0).head >= '1' && r.getString(0).head <= '9'))
    assert(rows.map(_.getLong(1)).sum === graft.Tables.orders(spark, sf).count())
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-9)
  }

  test("woe: cell counts conserve the corpus; zero cells yield NULL") {
    val rows = CatalogMore.q188WoeEncoding(spark, sf).collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === nDocs)
    rows.foreach { r =>
      val defined = r.getLong(1) > 0 && r.getLong(2) > 0
      assert(r.isNullAt(3) !== defined, s"bucket ${r.getLong(0)}")
    }
  }

  test("token budget: kept share never exceeds half, kept docs positive") {
    val rows = CatalogMore.q189TokenBudget(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 0.5 + 1e-12, r)
    }
  }

  test("gini: bounded in [0, 1); uniform-ish corpus scores low") {
    val r = CatalogMore.q190GiniConcentration(spark, sf).collect().head
    val g = r.getDouble(2)
    assert(r.getLong(0) > 1 && r.getLong(1) > 0)
    assert(g >= 0.0 && g < 1.0)
  }

  test("triplets: pos/neg are the true per-label argmax cosines (brute force)") {
    val emb = graft.Tables.embeddings(spark, sf)
      .collect().map(r => (r.getAs[Number](0).longValue, r.getSeq[Float](1).toArray,
        r.getAs[Number](2).longValue))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = CatalogMore.q191TripletMining(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (qid, lab) = (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)
      val qv = emb.find(_._1 == qid).get._2
      val same = emb.filter(e => e._1 != qid && e._3 == lab)
        .map(e => (cos(qv, e._2), e._1))
      val diff = emb.filter(e => e._1 != qid && e._3 != lab)
        .map(e => (cos(qv, e._2), e._1))
      assert(math.abs(r.getDouble(3) - same.map(_._1).max) < 1e-12)
      assert(math.abs(r.getDouble(5) - diff.map(_._1).max) < 1e-12)
      assert(math.abs(r.getDouble(6) - (r.getDouble(3) - r.getDouble(5))) < 1e-15)
    }
  }

  test("ann recall: proper fraction; hits bounded by 10 per query") {
    val r = CatalogMore.q192AnnRecall(spark, "/root/testdata/sf0.01")
      .collect().head
    val (nq, nh, rec) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nq > 0 && nh >= 0 && nh <= 10 * nq)
    assert(rec >= 0.0 && rec <= 1.0)
    assert(rec > 0.2, s"IVF nProbe=3 should recall well above chance, got $rec")
  }

  test("quantile norm: pct_rank equals Spark's percent_rank on the raw rows") {
    val viaWindow = graft.Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long").as("v"))
      .withColumn("pr", org.apache.spark.sql.functions.percent_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("v"))))
      .groupBy(col("v")).agg(org.apache.spark.sql.functions.min(col("pr")).as("pr"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = CatalogMore.q193QuantileTransform(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet === viaWindow.keySet)
    got.foreach { case (v, p) =>
      assert(math.abs(p - viaWindow(v)) < 1e-12, s"value $v")
    }
  }

  test("neardup eval: verified LSH candidates give perfect precision") {
    val r = CatalogMore.q194NearDupEval(spark, "/root/testdata/sf0.01")
      .collect().head
    val (ne, na, nc) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nc <= na && nc <= ne)
    // q49 exact-verifies its candidates, so every reported pair is real
    assert(nc === na)
    assert(r.getDouble(3) === 1.0)
    assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
  }

  test("k-anonymity: totals conserve; risk share is a proper fraction") {
    val r = CatalogMore.q195KAnonymity(spark, sf).collect().head
    assert(r.getLong(3) === graft.Tables.orders(spark, sf).count())
    assert(r.getLong(1) <= r.getLong(0))
    assert(r.getLong(2) <= r.getLong(3))
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }

  test("lang confusion: rows conserve docs; shares row-normalize per lang") {
    val rows = CatalogMore.q196LangConfusion(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum === graft.Tables.documents(spark, sf).count())
    rows.groupBy(_.getString(0)).foreach { case (lang, cells) =>
      assert(math.abs(cells.map(_.getDouble(3)).sum - 1.0) < 1e-9, lang)
    }
  }

  test("selectivity: full-range estimate is exact; actual always <= n") {
    val rows = CatalogMore.q197Selectivity(spark, sf).collect()
    assert(rows.length === 4)
    val n = graft.Tables.lineitem(spark, sf).count()
    val full = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 50L).get
    // l_quantity spans exactly 1..50 in the fixture -> uniform estimate = n
    assert(full.getLong(2) === n && full.getLong(3) === n)
    rows.foreach(r => assert(r.getLong(3) <= n && r.getLong(2) >= 0))
  }

  test("cramers v: bounded in [0,1]; independent uniform-ish data scores low") {
    val r = CatalogMore.q198CramersV(spark, sf).collect().head
    val (chi2, v) = (r.getDouble(3), r.getDouble(4))
    assert(chi2 >= 0.0)
    assert(v >= 0.0 && v <= 1.0)
    assert(v < 0.5, s"priority and year should be near-independent, got $v")
  }

  test("c-tf-idf: exactly 5 terms per language, scores descending, df sane") {
    val rows = CatalogMore.q199CTfidf(spark, sf).collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    rows.groupBy(_.getString(0)).foreach { case (lang, terms) =>
      assert(terms.length === 5, lang)
      val scores = terms.sortBy(_.getLong(5)).map(_.getDouble(4)).toSeq
      assert(scores === scores.sortBy(-_), lang)
    }
    rows.foreach(r => assert(r.getLong(3) >= 1 && r.getLong(3) <= nDocs))
  }

  test("events report: six metrics, all consistent with direct recomputes") {
    val m = CatalogMore.q200EventsReport(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = graft.Tables.events(spark, sf)
    assert(m("n_events") === ev.count())
    assert(m("n_users") === ev.select(col("user_id")).distinct().count())
    assert(m("n_event_types") === ev.select(col("event_type")).distinct().count())
    assert(m("peak_hour_events") >= 1 && m("peak_hour_events") <= m("n_events"))
    assert(m("median_events_per_user") >= 1)
    assert(m("span_hours") >= 0)
  }

  test("skew report: top-10 by count desc, shares proper, top keys above mean") {
    val rows = CatalogMore.q201SkewReport(spark, sf).collect()
    assert(rows.length === 10)
    val cnts = rows.map(_.getLong(1)).toSeq
    assert(cnts === cnts.sortBy(-_))
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 1.0)
      // uniform fixture: the 10th key can sit just under the mean
      assert(r.getLong(3) >= 900000L, "top-10 keys should sit near/above the mean")
    }
  }

  test("lateness audit: planted disorder is counted at exactly the right bands") {
    val s = spark
    import s.implicits._
    import java.sql.Timestamp
    def ts(m: Int, sec: Int = 0) = Timestamp.valueOf(f"2024-03-01 10:$m%02d:$sec%02d")
    // arrival order 1..5; event times: 10:00, 10:10, 10:07 (3min late),
    // 10:09.5 (30s late), 10:02 (7.5min late)
    val ev = Seq(
      (1L, 1L, ts(0)), (1L, 2L, ts(10)), (1L, 3L, ts(7)),
      (1L, 4L, ts(9, 30)), (1L, 5L, ts(2, 30)))
      .toDF("user_id", "event_id", "ts")
    val r = graft.ops.TimeSeries.latenessAudit(ev, "user_id", "event_id", "ts")
      .collect().head
    assert(r.getLong(0) === 5L)
    assert(r.getLong(1) === 3L) // three late arrivals
    assert(r.getLong(2) === 2L) // >1min: the 3min and 7.5min ones
    assert(r.getLong(3) === 2L) // >2min: same two
    assert(r.getLong(4) === 1L) // >5min: only the 7.5min one
    assert(r.getLong(5) === 450000000L) // 7.5 min in us
  }

  test("kwic: every context contains the term; positions are in-document") {
    val rows = CatalogMore.q203Kwic(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(2).split(" ").contains("merge"), r)
      assert(r.getLong(1) >= 1L)
    }
  }

  test("exact variance: matches BigDecimal brute force per flag") {
    val data = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = CatalogMore.q204ExactVariance(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    data.groupBy(_._1).foreach { case (flag, xs) =>
      val n = xs.length.toLong
      val s1 = xs.map(_._2).sum
      val s2 = xs.map(x => x._2 * x._2).sum
      val want = (n * s2 - s1 * s1).toDouble / (n * (n - 1)).toDouble
      assert(got(flag) === want, flag)
    }
  }

  test("ab test: arms partition users; z2 non-negative when defined") {
    val r = CatalogMore.q205AbTest(spark, sf).collect().head
    val nUsers = graft.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(r.getLong(0) + r.getLong(2) === nUsers)
    assert(r.getLong(1) <= r.getLong(0) && r.getLong(3) <= r.getLong(2))
    if (!r.isNullAt(4)) assert(r.getDouble(4) >= 0.0)
  }

  test("catalog profile: one row per declared column; clean fixture has no nulls") {
    val rows = CatalogMore.q206CatalogProfile(spark, sf).collect()
    assert(rows.length === 5 + 11 + 6)
    rows.foreach { r =>
      assert(r.getLong(2) > 0, r.getString(1))
      assert(r.getLong(3) === 0L, s"unexpected nulls in ${r.getString(1)}")
    }
  }

  test("bfs on trade graph: seeds at 0 hops, neighbors alternate parity") {
    // the trade graph is bipartite (even=customer, odd=supplier nodes):
    // distance parity must match node parity relative to odd seeds
    val out = CatalogMore.q175BfsHops(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, h) = (r.getLong(0), r.getLong(1))
      assert((id % 2 === 1) === (h % 2 === 0), s"parity broken at $id hops=$h")
    }
  }
}
