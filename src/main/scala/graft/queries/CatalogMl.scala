package graft.queries

import graft.Tables
import graft.ops.IterativeLoop
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Round-11 ML-kernel wave: the feature-engineering / pattern-mining verbs
 * a training pipeline runs next to curation, each in cross-engine-exact
 * arithmetic:
 *
 *  - q426 histogram best-split finding (the decision-stump / gradient-
 *    boosted-tree kernel): 64-bin feature histogram, every candidate
 *    threshold scored by weighted Gini impurity in EXACT DECIMAL(38,0)
 *    integer arithmetic (cross-multiplied — no ratio ever materializes),
 *  - q427 sequential-pattern (subsequence) funnel mining: user support of
 *    ALL event-type triples a→b→c under greedy earliest-match semantics —
 *    q81's fixed funnel generalized to the full pattern grid in three
 *    chained min-aggregates,
 *  - q428 co-visitation lift ("also-ordered"): basket pair lift
 *    N·c_xy/(c_x·c_y) from exact counts (single IEEE divide of exact
 *    integers — bit-stable cross-engine), top-5 per part,
 *  - q429 smoothed target encoding: the high-cardinality categorical →
 *    numeric feature map with additive (m-estimate) smoothing toward the
 *    global mean, from exact integer sums.
 *
 * Scale posture: q426 is one corpus pass + a 64-row domain frame (the
 * histogram-split trick that makes distributed GBT training feasible);
 * q427 is three equi-joins each bounded by |types|× the events table;
 * q428 never leaves Σ|basket|² pair space; q429 is one groupBy.
 */
object CatalogMl {

  // ---------------------------------------------------------------- q426

  private[graft] val SplitBins = 64L

  /** Best decision-stump split of event `value` (in cents) against the
    * is-purchase label. Candidate thresholds are the 64 histogram bin
    * edges; each split's weighted Gini impurity is compared in exact
    * integer arithmetic: minimizing Σ_side n_side·gini_side is
    * maximizing score(split) = (pL²+qL²)·nR + (pR²+qR²)·nL over the
    * common denominator nL·nR — DECIMAL(38,0) products, never a ratio.
    * Output: the argmax split with its exact count block (nL, pL, nR,
    * pR) — gain in any float convention is derivable downstream. */
  def q426BestSplit(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      round(col("value") * 100).cast("long").as("c"),
      (col("event_type") === "purchase").cast("long").as("y"))
    val mm = ev.agg(min(col("c")).as("mn"), max(col("c")).as("mx"),
      count(lit(1)).as("n"), sum(col("y")).as("p"))
    // bin width: (range div bins) + 1 keeps every value inside 64 bins
    val binned = ev.crossJoin(broadcast(graft.ops.Guards.scalar(mm)))
      .select(expr(s"(c - mn) div ((mx - mn) div $SplitBins + 1)").as("bin"),
        col("y"), col("mn"), col("mx"), col("n"), col("p"))
    val hist = IterativeLoop.cutLazy(binned
      .groupBy(col("bin"), col("mn"), col("mx"), col("n"), col("p"))
      .agg(count(lit(1)).as("nb"), sum(col("y")).as("pb")))
    // prefix sums over the ≤64-row domain via a bounded self-join —
    // never a single-partition window, even on a domain frame
    val left = hist.select(col("bin").as("k"))
      .join(hist.select(col("bin"), col("nb"), col("pb")),
        col("bin") <= col("k"))
      .groupBy(col("k")).agg(sum(col("nb")).as("nl"), sum(col("pb")).as("pl"))
    val scored = left.crossJoin(broadcast(graft.ops.Guards.scalar(hist.select(col("mn"), col("mx"),
        col("n"), col("p")).limit(1))))
      .filter(col("nl") < col("n")) // a split must leave a right side
      .select(col("k"), col("nl"), col("pl"),
        (col("n") - col("nl")).as("nr"), (col("p") - col("pl")).as("pr"),
        col("mn"), col("mx"), col("n"), col("p"))
      .withColumn("score", expr(
        """(CAST(pl AS DECIMAL(38,0)) * pl
          |   + CAST(nl - pl AS DECIMAL(38,0)) * (nl - pl)) * nr
          | + (CAST(pr AS DECIMAL(38,0)) * pr
          |   + CAST(nr - pr AS DECIMAL(38,0)) * (nr - pr)) * nl""".stripMargin))
    scored.orderBy(col("score").desc, col("k").asc).limit(1)
      .select(col("k").as("split_bin"),
        expr(s"mn + (k + 1) * ((mx - mn) div $SplitBins + 1)")
          .as("threshold_cents"),
        col("nl"), col("pl"), col("nr"), col("pr"))
  }

  // ---------------------------------------------------------------- q427

  /** Support mining over ALL event-type triple patterns a→b→c (125 at
    * the 5-type vocabulary): a user supports a pattern iff their
    * time-ordered stream contains it as a SUBSEQUENCE, decided by greedy
    * earliest-match (match the first a, then the first b strictly after
    * it, then the first c strictly after that — greedy is exact for
    * subsequence existence). Three chained min-aggregates, each join
    * bounded by |types| × events; (ts, event_id) pairs make "strictly
    * after" total. The q81 funnel, generalized from one hand-picked
    * stage chain to the whole pattern grid — funnel DISCOVERY. */
  def q427SeqPatterns(s: SparkSession, dir: String): DataFrame = {
    val ev = IterativeLoop.cutLazy(Tables.events(s, dir)
      .select(col("user_id"), col("event_type").as("ty"),
        struct(col("ts"), col("event_id")).as("k")))
    val a1 = ev.groupBy(col("user_id"), col("ty").as("a"))
      .agg(min(col("k")).as("ka"))
    val a2 = ev.join(a1, Seq("user_id")).filter(col("k") > col("ka"))
      .groupBy(col("user_id"), col("a"), col("ty").as("b"))
      .agg(min(col("k")).as("kb"))
    val a3 = ev.join(a2, Seq("user_id")).filter(col("k") > col("kb"))
      .select(col("user_id"), col("a"), col("b"), col("ty").as("c"))
      .distinct()
    a3.groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("a"), col("b"), col("c"))
  }

  // ---------------------------------------------------------------- q428

  /** Co-visitation ("customers who ordered X also ordered Y"): basket =
    * the distinct parts of one order; pair lift = N·c_xy/(c_x·c_y) with
    * every count exact and the lift a SINGLE IEEE divide of two exact
    * integer products (correctly rounded, so bit-stable across engines);
    * top-5 recommendations per part, both directions emitted. Pair space
    * is Σ|basket|² (baskets are small by the order contract), never n². */
  def q428CovisitLift(s: SparkSession, dir: String): DataFrame = {
    val baskets = IterativeLoop.cutLazy(Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct())
    val nOrders = baskets.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n"))
    val cx = baskets.groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
    val pairs = baskets.select(col("ok"), col("pk").as("x"))
      .join(baskets.select(col("ok"), col("pk").as("y")), "ok")
      .filter(col("x") =!= col("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= 2)
    val scored = pairs
      .join(cx.select(col("pk").as("x"), col("cnt").as("cx")), "x")
      .join(cx.select(col("pk").as("y"), col("cnt").as("cy")), "y")
      .crossJoin(broadcast(graft.ops.Guards.scalar(nOrders)))
      .select(col("x"), col("y"), col("cxy"), col("cx"), col("cy"),
        ((col("n") * col("cxy")).cast("double")
          / (col("cx") * col("cy")).cast("double")).as("lift"))
    val w = Window.partitionBy(col("x"))
      .orderBy(col("lift").desc, col("y").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("x"), col("y"), col("rnk"), col("cxy"), col("lift"))
      .orderBy(col("x"), col("rnk"))
  }

  // ---------------------------------------------------------------- q429

  private[graft] val TeSmoothing = 100L

  /** Smoothed (m-estimate) target encoding of the nation×segment
    * categorical against order value: enc(cat) = (Σ_cat cents +
    * m·globalMean)/(n_cat + m), pulling sparse categories toward the
    * global mean — THE high-cardinality categorical featurizer. All
    * sums exact integers; globalMean and enc are each one IEEE divide /
    * fused in a fixed op order both engines replay bit-identically. */
  def q429TargetEncode(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_custkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
      .join(Tables.customer(s, dir).select(col("c_custkey"),
        col("c_nationkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    val g = o.agg(sum(col("cents")).as("gs"), count(lit(1)).as("gn"))
    o.groupBy(col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_cat"), sum(col("cents")).as("sum_cents"))
      .crossJoin(broadcast(graft.ops.Guards.scalar(g)))
      .select(col("nation"), col("segment"), col("n_cat"), col("sum_cents"),
        ((col("sum_cents").cast("double")
          + lit(TeSmoothing.toDouble) * (col("gs").cast("double")
            / col("gn").cast("double")))
          / (col("n_cat") + lit(TeSmoothing)).cast("double")).as("enc"))
      .orderBy(col("nation"), col("segment"))
  }

  // ---------------------------------------------------------------- q434

  private[graft] val WoeBins = 10L

  /** Weight-of-evidence / information-value feature audit (the
    * credit-scoring feature-selection classic, next to q426's split
    * finding and q429's target encoding): event value binned into
    * [[WoeBins]] equi-width bins against the is-purchase target;
    * WOE_b = lg(2p_b+1) − lg(2P+B) − lg(2n_b+1) + lg(2N+B) in the
    * engine's exact piecewise lg (the ×2+1 scaling is the 0.5-Laplace
    * smoothing kept in INTEGER lg arguments, so empty cells are defined
    * and both engines agree bit for bit); IV = Σ_b (p_b/P − n_b/N)·WOE_b
    * as a fixed-order fold over bins ascending. */
  def q434WoeIv(s: SparkSession, dir: String): DataFrame = {
    import graft.curation.Curation.lg
    val ev = Tables.events(s, dir).select(
      round(col("value") * 100).cast("long").as("c"),
      (col("event_type") === "purchase").cast("long").as("y"))
    val mm = ev.agg(min(col("c")).as("mn"), max(col("c")).as("mx"),
      count(lit(1)).as("n"), sum(col("y")).as("p"))
    val bins = ev.crossJoin(broadcast(graft.ops.Guards.scalar(mm)))
      .select(expr(s"(c - mn) div ((mx - mn) div $WoeBins + 1)").as("bin"),
        col("y"), col("n"), col("p"))
      .groupBy(col("bin"), col("n"), col("p"))
      .agg(count(lit(1)).as("f"), sum(col("y")).as("fp"))
      .select(col("bin"), col("fp").as("n_pos"), (col("f") - col("fp")).as("n_neg"),
        col("p").as("tp"), (col("n") - col("p")).as("tn"))
    val scored = bins.withColumn("woe",
        lg(lit(2L) * col("n_pos") + 1L) - lg(lit(2L) * col("tp") + lit(WoeBins))
          - (lg(lit(2L) * col("n_neg") + 1L)
            - lg(lit(2L) * col("tn") + lit(WoeBins))))
      .withColumn("term",
        (col("n_pos").cast("double") / col("tp").cast("double")
          - col("n_neg").cast("double") / col("tn").cast("double")) * col("woe"))
    val iv = scored.agg(aggregate(
      array_sort(collect_list(struct(col("bin"), col("term")))), lit(0.0),
      (acc, x) => acc + x.getField("term")).as("iv"))
    scored.crossJoin(broadcast(graft.ops.Guards.scalar(iv)))
      .select(col("bin"), col("n_pos"), col("n_neg"), col("woe"), col("iv"))
      .orderBy(col("bin"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q426_best_split"    -> q426BestSplit _,
    "q427_seq_patterns"  -> q427SeqPatterns _,
    "q428_covisit_lift"  -> q428CovisitLift _,
    "q429_target_encode" -> q429TargetEncode _,
    "q434_woe_iv"        -> q434WoeIv _)
}
