package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Science/evaluation wave: community-structure quality (modularity),
 * sketch-vs-exact set similarity (bottom-k / KMV), robust trend
 * estimation (Theil–Sen), and distribution-free prediction intervals
 * (split conformal). Determinism contract as everywhere in the
 * catalog: integer moments until a final divide, md5-derived hashes
 * compared as integers, order-statistic picks instead of interpolated
 * quantiles, sorted folds for any float sum.
 */
object CatalogSci {

  /** md5-prefix uniform u32 ∈ [0, 2³²) of a string column. */
  private def u32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Newman modularity of the nation partition on the weighted
    * customer–supplier trade graph (edge weight = lineitem count):
    * Q = Σ_c (w_c∕m − (d_c∕2m)²) — positive iff trade is
    * nation-assortative beyond degree chance. All masses are exact
    * int64 (intra-community weight, community degree, total weight);
    * each community term is two fixed-parenthesization divides; the
    * cross-community sum is a sorted fold over ≤ 25 nations. One
    * shuffle for the edge aggregate, nation lookups broadcast. */
  def q235Modularity(s: SparkSession, dir: String): DataFrame = {
    val edges = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey").as("cn"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey").as("sn"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("cn"), col("sn"))
    val m = edges.agg(count(lit(1)).as("m"))
    val byNation = edges
      .select(explode(array(
        struct(col("cn").as("nation"),
          when(col("cn") === col("sn"), 1L).otherwise(0L).as("intra")),
        struct(col("sn").as("nation"), lit(0L).as("intra"))))
        .as("e"))
      .select(col("e.nation").as("nation"), col("e.intra").as("intra"))
      .groupBy(col("nation"))
      // intra mass is attached to the customer-side endpoint only (an
      // intra edge belongs wholly to its single community), degree to both
      .agg(count(lit(1)).as("deg"), sum(col("intra")).as("wi"))
    byNation.crossJoin(broadcast(m))
      .select(col("nation"),
        (col("wi").cast("double") / col("m").cast("double") -
          (col("deg").cast("double") / (lit(2L) * col("m")).cast("double")) *
            (col("deg").cast("double") / (lit(2L) * col("m")).cast("double")))
          .as("term"),
        col("m"))
      .groupBy(col("m").as("m_weight"))
      .agg(count(lit(1)).as("n_communities"),
        aggregate(
          transform(sort_array(collect_list(struct(col("nation"), col("term")))),
            e => e("term")),
          lit(0.0), (acc, x) => acc + x).as("modularity"))
  }

  /** Bottom-k (KMV) sketch Jaccard between source vocabularies, k = 64,
    * audited against the exact Jaccard: each source keeps only its 64
    * smallest md5 token hashes (mergeable, fixed-size — the sketch you
    * ship at 100 TB where the exact side is a full vocabulary join),
    * and Ĵ = |union-k ∩ S_a ∩ S_b| ∕ k (Bar-Yossef et al. 2002;
    * Beyer et al. 2007). The estimate, the exact value, and the
    * absolute error sit side by side per source pair — the calibration
    * table that justifies replacing the exact join with the sketch. */
  def q236BottomkJaccard(s: SparkSession, dir: String): DataFrame = {
    val k = 64
    val toks = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .distinct()
      .withColumn("h", u32(col("tok")))
    val wSk = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("tok"))
    val sk = toks.withColumn("rn", row_number().over(wSk))
      .filter(col("rn") <= k)
      .select(col("source"), col("tok"), col("h"))
    val srcs = sk.select(col("source")).distinct()
    val pairs = srcs.select(col("source").as("sa"))
      .join(srcs.select(col("source").as("sb")), col("sa") < col("sb"))
    // union of the two sketches, deduped by token, ranked by (h, tok)
    val skA = pairs.join(sk, col("source") === col("sa"))
      .select(col("sa"), col("sb"), col("tok"), col("h"))
    val skB = pairs.join(sk, col("source") === col("sb"))
      .select(col("sa"), col("sb"), col("tok"), col("h"))
    val un = skA.unionByName(skB)
      .groupBy(col("sa"), col("sb"), col("tok"), col("h"))
      .agg(count(lit(1)).as("n_sides"))
    val wUn = Window.partitionBy(col("sa"), col("sb"))
      .orderBy(col("h"), col("tok"))
    val est = un.withColumn("rn", row_number().over(wUn))
      .filter(col("rn") <= k)
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("union_k"),
        sum(when(col("n_sides") === 2, 1L).otherwise(0L)).as("in_both"))
      .select(col("sa"), col("sb"),
        (col("in_both").cast("double") /
          least(lit(k.toLong), col("union_k")).cast("double")).as("j_est"))
    val sizes = toks.groupBy(col("source")).agg(count(lit(1)).as("nv"))
    val inter = toks.select(col("source").as("sa"), col("tok"))
      .join(toks.select(col("source").as("sb"), col("tok")), "tok")
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("ni"))
    val exact = inter
      .join(broadcast(sizes.select(col("source").as("sa"), col("nv").as("na"))), "sa")
      .join(broadcast(sizes.select(col("source").as("sb"), col("nv").as("nb"))), "sb")
      .select(col("sa"), col("sb"),
        (col("ni").cast("double") /
          (col("na") + col("nb") - col("ni")).cast("double")).as("j_exact"))
    est.join(exact, Seq("sa", "sb"))
      .select(col("sa"), col("sb"), col("j_est"), col("j_exact"),
        abs(col("j_est") - col("j_exact")).as("abs_err"))
      .orderBy(col("sa"), col("sb"))
  }

  /** Theil–Sen robust slope of the daily event-count trend: the median
    * of all pairwise slopes (Sen 1968) — up to ~29% of days can be
    * corrupted before the estimate moves, unlike OLS. The quadratic
    * pair space is bounded BY CONSTRUCTION to the daily series; the
    * median is the lower-median ORDER-STATISTIC pick (row_number over
    * (slope, t1, t2) — no float interpolation), and the Sen intercept
    * is median(y) − slope·median(t) with both medians integer picks. */
  def q237TheilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("y"))
      .withColumn("t", row_number().over(Window.orderBy(col("d"))).cast("long"))
    val a = daily.select(col("t").as("t1"), col("y").as("y1"))
    val b = daily.select(col("t").as("t2"), col("y").as("y2"))
    val slopes = a.join(b, col("t1") < col("t2"))
      .select(col("t1"), col("t2"),
        ((col("y2") - col("y1")).cast("double") /
          (col("t2") - col("t1")).cast("double")).as("slope"))
    val np = slopes.agg(count(lit(1)).as("n_pairs"))
    val medSlope = slopes
      .withColumn("rn", row_number().over(
        Window.orderBy(col("slope"), col("t1"), col("t2"))))
      .crossJoin(broadcast(np))
      .filter(col("rn") === floor((col("n_pairs") + 1) / 2))
      .select(col("slope"), col("n_pairs"))
    val nd = daily.agg(count(lit(1)).as("n_days"))
    val medY = daily
      .withColumn("rn", row_number().over(Window.orderBy(col("y"), col("t"))))
      .crossJoin(broadcast(nd))
      .filter(col("rn") === floor((col("n_days") + 1) / 2))
      .select(col("y").as("med_y"), col("n_days"))
    val medT = daily
      .withColumn("rn", row_number().over(Window.orderBy(col("t"))))
      .crossJoin(broadcast(nd.select(col("n_days").as("nd2"))))
      .filter(col("rn") === floor((col("nd2") + 1) / 2))
      .select(col("t").as("med_t"))
    medSlope.crossJoin(broadcast(medY)).crossJoin(broadcast(medT))
      .select(col("n_days"), col("n_pairs"), col("slope"),
        (col("med_y").cast("double") -
          col("slope") * col("med_t").cast("double")).as("intercept"))
  }

  /** Split-conformal prediction interval for document length predicted
    * from token count (Vovk et al.; Lei et al. 2018): thirds by
    * doc_id mod 3 — OLS on the train third (exact integer moments, two
    * divides), calibration residual quantile q̂ = the ⌈(n+1)·0.9⌉-th
    * order statistic of |residual| (an integer-indexed PICK, the
    * finite-sample-valid choice), coverage audited on the held-out
    * test third. Distribution-free ~90% coverage is the contract the
    * law spec pins. */
  def q238Conformal(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("x"),
        col("n_chars").as("y"),
        (col("doc_id") % 3).as("fold"))
    val m = docs.filter(col("fold") === 0)
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("intercept",
        (col("sy").cast("double") - col("slope") * col("sx").cast("double")) /
          col("n").cast("double"))
      .select(col("n").as("n_train"), col("slope"), col("intercept"))
    val cal = docs.filter(col("fold") === 1).crossJoin(broadcast(m))
      .select(col("doc_id"), col("n_train"), col("slope"), col("intercept"),
        abs(col("y").cast("double") -
          (col("slope") * col("x").cast("double") + col("intercept")))
          .as("r"))
    val nc = cal.agg(count(lit(1)).as("n_cal"))
    val qhat = cal
      .withColumn("rn", row_number().over(Window.orderBy(col("r"), col("doc_id"))))
      .crossJoin(broadcast(nc))
      .filter(col("rn") ===
        least(floor((lit(9L) * (col("n_cal") + 1) + 9) / 10), col("n_cal")))
      .select(col("n_train"), col("slope"), col("intercept"),
        col("n_cal"), col("r").as("q90"))
    docs.filter(col("fold") === 2).crossJoin(broadcast(qhat))
      .select(col("n_train"), col("n_cal"), col("slope"), col("intercept"),
        col("q90"),
        when(abs(col("y").cast("double") -
          (col("slope") * col("x").cast("double") + col("intercept"))) <=
          col("q90"), 1L).otherwise(0L).as("cov"))
      .groupBy(col("n_train"), col("n_cal"), col("slope"),
        col("intercept"), col("q90"))
      .agg(count(lit(1)).as("n_test"), sum(col("cov")).as("n_covered"))
      .select(col("n_train"), col("n_cal"), col("n_test"), col("slope"),
        col("intercept"), col("q90"),
        (col("n_covered").cast("double") / col("n_test").cast("double"))
          .as("coverage"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q235_modularity"     -> q235Modularity _,
    "q236_bottomk_jaccard" -> q236BottomkJaccard _,
    "q237_theil_sen"      -> q237TheilSen _,
    "q238_conformal"      -> q238Conformal _)
}
