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

  /** l-diversity audit over the (lang, length-bucket) quasi-identifier
    * — the sensitive-attribute complement of q195's k-anonymity
    * (Machanavajjhala et al. 2007): a group can be k-anonymous yet leak
    * its members' `source` if every member shares one. One aggregate
    * pass; l = exact distinct count of the sensitive attribute; the
    * l ≥ 3 verdict is an integer compare. */
  def q239LDiversity(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("lang"), floor(col("n_chars") / 100).as("len_bucket"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("source")).as("l_div"))
      .select(col("lang"), col("len_bucket"), col("n"), col("l_div"),
        (col("l_div") >= 3).as("pass"))
      .orderBy(col("lang"), col("len_bucket"))

  /** Rank-biased overlap (Webber et al. 2010) between the cosine and
    * raw-dot-product rankings of the q28 retrieval fixture, truncated
    * at depth 10 with p = 0.9 — the top-weighted rank-agreement metric
    * that tells you whether skipping normalization changes what users
    * actually see. overlap_d is an exact integer per depth (each
    * common pair expands to the depths d ≥ max(ra, rb) it occupies —
    * a bounded 10-row explode, never a prefix self-join); the
    * geometric weights are shared p^(d−1) literals built by repeated
    * multiplication; per-query RBO is a sorted fold over d. */
  def q240Rbo(s: SparkSession, dir: String): DataFrame = {
    val k = 10
    val pw: Seq[Double] = Iterator.iterate(1.0)(_ * 0.9).take(k).toSeq
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, t) => acc + t)
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val qs = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val cs = emb.select(col("vec_id").as("c_id"), col("v").as("c_v"))
    val scored = cs.join(broadcast(qs), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("q_v"), col("c_v")) /
          (sqrt(dot(col("q_v"), col("q_v"))) *
            sqrt(dot(col("c_v"), col("c_v"))))).as("cosine"),
        dot(col("q_v"), col("c_v")).as("dotp"))
    val wA = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id").asc)
    val wB = Window.partitionBy(col("q_id"))
      .orderBy(col("dotp").desc, col("c_id").asc)
    val ranked = scored
      .withColumn("ra", row_number().over(wA))
      .withColumn("rb", row_number().over(wB))
      .filter(col("ra") <= k || col("rb") <= k)
    val common = ranked.filter(col("ra") <= k && col("rb") <= k)
      .select(col("q_id"),
        greatest(col("ra"), col("rb")).cast("long").as("m"))
    val byDepth = common
      .select(col("q_id"), explode(sequence(col("m"), lit(k.toLong))).as("d"))
      .groupBy(col("q_id"), col("d")).agg(count(lit(1)).as("overlap_d"))
    val pwArr = array(pw.map(lit): _*)
    byDepth
      .select(col("q_id"), col("d"),
        (element_at(pwArr, col("d").cast("int")) *
          (col("overlap_d").cast("double") / col("d").cast("double")))
          .as("term"),
        when(col("d") === k, col("overlap_d")).otherwise(lit(0L)).as("o10"))
      .groupBy(col("q_id"))
      .agg(sum(col("o10")).as("overlap_10"),
        ((lit(1.0) - lit(0.9)) * aggregate(
          transform(sort_array(collect_list(struct(col("d"), col("term")))),
            e => e("term")),
          lit(0.0), (acc, x) => acc + x)).as("rbo"))
      .orderBy(col("q_id"))
  }

  /** Weiszfeld geometric median per embedding label, 4 fixed-point
    * iterations — the ROBUST centroid (≤50% of a label's vectors can
    * be corrupted before it moves arbitrarily, vs q73's mean which one
    * outlier drags; Weiszfeld 1937). Every iteration is order-free by
    * construction so it needs NO sorted fold and survives any
    * partitioning: coordinates are quantized to 2²⁰ fixed-point
    * integers, weights are the quantized-and-capped integers
    * round(2²⁰∕d) (d from the dot-product identity ‖v−x‖² =
    * v·v − 2v·x + x·x, a fixed parenthesization), and the update is
    * Σw·q ∕ Σw ∕ 2²⁰ — int64 sums, two divides. Per iteration: one
    * narrow pass + a (label × dim)-sized aggregate; labels broadcast
    * back. (Int64 headroom: w ≤ 2²⁴, q ≤ 2²², so ~2⁴⁶ per row —
    * fine to ~10⁷ rows per label; shard the sum at larger scale.) */
  def q241GeoMedian(s: SparkSession, dir: String): DataFrame = {
    val scale = 1048576L // 2^20
    val wCap = 16777216L // 2^24
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, t) => acc + t)
    val emb = Tables.embeddings(s, dir)
      .select(col("label"), col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"),
        transform(col("embedding"),
          x => round(x.cast("double") * scale).cast("long")).as("q"))
    val n = emb.groupBy(col("label")).agg(count(lit(1)).as("n"))
    // x0: per-dimension fixed-point mean (exact integer sums, order-free)
    val x0 = emb.select(col("label"), posexplode(col("q")).as(Seq("pos", "qv")))
      .groupBy(col("label"), col("pos")).agg(sum(col("qv")).as("sq"))
      .join(broadcast(n), "label")
      .select(col("label"), col("pos"),
        ((col("sq") - pmod(col("sq"), col("n"))) / col("n")).cast("long")
          .as("m"))
      .select(col("label"), col("pos"),
        (col("m").cast("double") / lit(scale.toDouble)).as("coord"))
    def toArr(df: DataFrame): DataFrame = df
      .groupBy(col("label"))
      .agg(transform(
        sort_array(collect_list(struct(col("pos"), col("coord")))),
        e => e("coord")).as("x"))
    def iterate(xk: DataFrame): DataFrame = {
      val joined = emb.join(broadcast(toArr(xk)), "label")
        .withColumn("d2",
          dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), col("x")) +
            dot(col("x"), col("x")))
        .withColumn("d", sqrt(greatest(col("d2"), lit(0.0))))
        .withColumn("w",
          when(col("d") < 1e-9, lit(wCap)).otherwise(
            least(round(lit(scale.toDouble) / col("d")).cast("long"),
              lit(wCap))))
      joined
        .select(col("label"), col("w"), posexplode(col("q")).as(Seq("pos", "qv")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("w") * col("qv")).as("swq"), sum(col("w")).as("sw"))
        .select(col("label"), col("pos"),
          (col("swq").cast("double") / col("sw").cast("double") /
            lit(scale.toDouble)).as("coord"))
    }
    val x4 = (1 to 4).foldLeft(x0)((x, _) => iterate(x).localCheckpoint())
    x4.select(col("label"), col("pos").cast("long").as("pos"), col("coord"))
      .orderBy(col("label"), col("pos"))
  }

  /** Neyman optimal allocation of a 1000-document sampling budget
    * across sources (Neyman 1934): n_h ∝ N_h·S_h — strata that are big
    * OR internally variable get more of the budget, the design that
    * minimizes the estimator's variance at fixed cost. Variances are
    * exact integer moments with one divide; the largest-remainder
    * rounding (floor + top-r fractional parts) makes the integer
    * allocation sum EXACTLY to the budget, deterministically. Strata
    * are manifest-sized, so the global windows are legitimate. */
  def q242NeymanAlloc(s: SparkSession, dir: String): DataFrame = {
    val budget = 1000L
    val strata = Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("nh"), sum(col("n_chars")).as("sy"),
        sum(col("n_chars") * col("n_chars")).as("syy"))
      .withColumn("s2",
        (col("nh") * col("syy") - col("sy") * col("sy")).cast("double") /
          (col("nh") * (col("nh") - 1)).cast("double"))
      .withColumn("w", col("nh").cast("double") * sqrt(col("s2")))
    val tot = strata
      .agg(aggregate(
        transform(sort_array(collect_list(struct(col("source"), col("w")))),
          e => e("w")),
        lit(0.0), (acc, x) => acc + x).as("sumw"))
    val alloc = strata.crossJoin(broadcast(tot))
      .withColumn("alloc",
        lit(budget.toDouble) * col("w") / col("sumw"))
      .withColumn("base", floor(col("alloc")).cast("long"))
      .withColumn("frac", col("alloc") - col("base").cast("double"))
    val used = alloc.agg(sum(col("base")).as("used"))
    alloc.crossJoin(broadcast(used))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("frac").desc, col("source"))))
      .select(col("source"), col("nh").as("n_docs"), col("s2"),
        col("alloc").as("alloc_frac"),
        (col("base") + when(col("rk") <= lit(budget) - col("used"), 1L)
          .otherwise(0L)).as("n_alloc"))
      .orderBy(col("source"))
  }

  /** Chapman capture–recapture estimate of the distinct-document
    * universe (Chapman 1951, the bias-corrected Lincoln–Petersen): two
    * INDEPENDENT md5-seeded half-samples of the corpus, identity = the
    * md5 text fingerprint (so exact duplicates collapse, which is the
    * point: this estimates the DEDUPLICATED universe a full dedup run
    * would find, from two cheap samples). n1, n2, m are exact distinct
    * counts; N̂ = (n1+1)(n2+1)∕(m+1) − 1 is one divide; the true
    * distinct count sits beside it as the audit. */
  def q243CaptureRecapture(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), md5(col("text")).as("fp"),
        pmod(u32(concat(lit("cr_a:"), col("doc_id").cast("string"))), lit(2L))
          .as("ina"),
        pmod(u32(concat(lit("cr_b:"), col("doc_id").cast("string"))), lit(2L))
          .as("inb"))
    val m = docs.agg(
      countDistinct(when(col("ina") === 0, col("fp"))).as("n1"),
      countDistinct(when(col("inb") === 0, col("fp"))).as("n2"),
      countDistinct(when(col("ina") === 0 && col("inb") === 0, col("fp")))
        .as("m_naive"),
      countDistinct(col("fp")).as("true_distinct"))
    // recapture = fingerprints seen in BOTH samples (not necessarily the
    // same doc row: capture is at the fingerprint level)
    val caught = docs.groupBy(col("fp"))
      .agg(max(when(col("ina") === 0, 1L).otherwise(0L)).as("a"),
        max(when(col("inb") === 0, 1L).otherwise(0L)).as("b"))
      .agg(sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L))
        .as("m"))
    m.crossJoin(broadcast(caught))
      .select(col("n1"), col("n2"), col("m"), col("true_distinct"),
        (((col("n1") + 1) * (col("n2") + 1)).cast("double") /
          (col("m") + 1).cast("double") - lit(1.0)).as("n_hat"))
      .select(col("n1"), col("n2"), col("m"), col("true_distinct"),
        col("n_hat"),
        (abs(col("n_hat") - col("true_distinct").cast("double")) /
          col("true_distinct").cast("double")).as("rel_err"))
  }

  /** Isotonic (PAV) calibration of the length→quality relationship via
    * the MINIMAX formula (Barlow et al. 1972): fitted_i =
    * max_{j≤i} min_{k≥i} avg(y over levels j..k) — the closed form of
    * pool-adjacent-violators that needs NO sequential stack, only
    * interval averages over the BOUNDED level domain (⌊n_chars∕50⌋
    * buckets), so it is fully relational: prefix sums once, then a
    * bounded (i, j, k) triple enumeration. y = the q229 TTR gate.
    * Interval averages are one divide of exact int64 prefix sums;
    * min/max of doubles is order-free. */
  def q244Isotonic(s: SparkSession, dir: String): DataFrame = {
    val lv = Tables.documents(s, dir)
      .select(floor(col("n_chars") / 50).as("level"),
        (size(array_distinct(split(col("text"), " "))) * 2 >=
          size(split(col("text"), " "))).cast("long").as("y"))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("w"), sum(col("y")).as("sy"))
    val wIdx = Window.orderBy(col("level"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = lv.select(col("level"), col("w"), col("sy"),
      sum(col("w")).over(wIdx).as("cw"), sum(col("sy")).over(wIdx).as("cs"))
    val right = pre.select(col("level").as("k"), col("cw").as("cwk"),
      col("cs").as("csk"))
    val left = pre.select(col("level").as("j"),
      (col("cw") - col("w")).as("cwj0"), (col("cs") - col("sy")).as("csj0"))
    val intervals = left.join(right, col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("csk") - col("csj0")).cast("double") /
          (col("cwk") - col("cwj0")).cast("double")).as("avg_jk"))
    val levels = pre.select(col("level").as("i"))
    val minK = levels.join(intervals,
        col("j") <= col("i") && col("i") <= col("k"))
      .groupBy(col("i"), col("j")).agg(min(col("avg_jk")).as("mn"))
    val fitted = minK.groupBy(col("i")).agg(max(col("mn")).as("fitted"))
    pre.join(fitted, col("level") === col("i"))
      .select(col("level"), col("w"),
        (col("sy").cast("double") / col("w").cast("double")).as("raw_rate"),
        col("fitted"))
      .orderBy(col("level"))
  }

  /** Simplified silhouette per label (Rousseeuw 1987 via the
    * centroid shortcut): a = cosine distance to the OWN label
    * centroid, b = distance to the nearest OTHER centroid,
    * s = (b − a) ∕ max(a, b) — the clustering-quality score for the
    * label structure q73/q224 use, without the O(n²) pairwise pass
    * full silhouette needs. Centroids are the q73 fixed-point means
    * (one broadcast row); per-label means are sorted folds by vec_id. */
  def q245Silhouette(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val cents = graft.sim.Similarity
      .labelCentroids(emb, "label", "embedding")
      .groupBy(col("label").as("cl"))
      .agg(sort_array(collect_list(struct(col("pos"), col("centroid"))))
        .as("cs"))
      .select(col("cl"), transform(col("cs"), x => x("centroid")).as("cv"))
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, t) => acc + t)
    val centArr = cents
      .agg(sort_array(collect_list(struct(col("cl"), col("cv")))).as("__cents"))
    val scored = emb
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .crossJoin(broadcast(centArr))
      .select(col("vec_id"), col("label"),
        explode(col("__cents")).as("c"), col("v"))
      .select(col("vec_id"), col("label"), col("c.cl").as("cl"),
        (lit(1.0) - dot(col("v"), col("c.cv")) /
          (sqrt(dot(col("v"), col("v"))) *
            sqrt(dot(col("c.cv"), col("c.cv"))))).as("dist"))
    val own = scored.filter(col("cl") === col("label"))
      .select(col("vec_id"), col("label"), col("dist").as("a"))
    val other = scored.filter(col("cl") =!= col("label"))
      .groupBy(col("vec_id")).agg(min(col("dist")).as("b"))
    val sil = own.join(other, "vec_id")
      .select(col("vec_id"), col("label"),
        ((col("b") - col("a")) / greatest(col("a"), col("b"))).as("sil"))
    sil.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        aggregate(
          transform(sort_array(collect_list(struct(col("vec_id"), col("sil")))),
            e => e("sil")),
          lit(0.0), (acc, x) => acc + x).as("sil_sum"))
      .select(col("label"), col("n"),
        (col("sil_sum") / col("n").cast("double")).as("mean_sil"))
      .orderBy(col("label"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q243_capture_recapture" -> q243CaptureRecapture _,
    "q244_isotonic"       -> q244Isotonic _,
    "q245_silhouette"     -> q245Silhouette _,
    "q235_modularity"     -> q235Modularity _,
    "q236_bottomk_jaccard" -> q236BottomkJaccard _,
    "q237_theil_sen"      -> q237TheilSen _,
    "q238_conformal"      -> q238Conformal _,
    "q239_l_diversity"    -> q239LDiversity _,
    "q240_rbo"            -> q240Rbo _,
    "q241_geo_median"     -> q241GeoMedian _,
    "q242_neyman_alloc"   -> q242NeymanAlloc _)
}
