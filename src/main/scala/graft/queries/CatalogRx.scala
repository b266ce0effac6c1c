package graft.queries

import graft.Tables
import graft.curation.Curation.lg
import graft.ops.IterativeLoop
import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Round-12 second wave (q442–q446) — operators closing gaps the r12
 * graph wave opened or the survey audit surfaced:
 *
 *   - q442 one-to-one linkage assignment: the record-linkage step
 *     BETWEEN pair scoring (q119/q278/q405 produce candidate pairs)
 *     and merge — each record joined to at most ONE partner, best
 *     scores first, via the q438 local-dominance matching core on
 *     similarity-ranked weights. Pairs alone over-merge (a record in
 *     three pairs would merge into two masters); the matching is the
 *     standard greedy 1:1 assignment, distributed.
 *   - q443 AMS tug-of-war F2 sketch (Alon–Matias–Szegedy 1996):
 *     completes the sketch canon (CMS=frequency q77, HLL=cardinality
 *     q135, Bloom=membership q182, KMV=distinct/set-algebra
 *     q236/q404, AMS=second moment): 16 ±1-signed estimators of
 *     Σf² — the self-join size / skew statistic — next to the exact
 *     audit, mergeable by construction (S_j is a plain sum).
 *   - q444 Dunning log-likelihood (G²) collocations: the
 *     significance-testing complement of q129's PMI (PMI over-ranks
 *     rare pairs; G² weighs evidence): 2·ΣO·(lg O+lg N−lg R−lg C)
 *     over the 2×2 bigram contingency — every lg argument an INTEGER,
 *     so the engine's exact piecewise lg applies unchanged.
 *   - q445 exact point-level DBSCAN: textbook core/border/noise
 *     semantics with the grid neighbor search, completing q264's
 *     cell-level approximation.
 *   - q446 incremental connected-components maintenance: stored
 *     labels + a delta edge set re-cluster ONLY the touched
 *     components — the daily 100 TB dedup-store operation.
 */
object CatalogRx {

  // ---------------------------------------------------------------- q442

  /** One-to-one fuzzy-linkage assignment over the q119 candidate pairs
    * (lang-blocked 40-char prefixes, Dice ≥ 3∕4 on character bigrams):
    * each edge's weight ranks by DISSIMILARITY first — the exact
    * rational (na+nb−2·inter)∕(na+nb) in 20-bit fixed point (integer
    * DIV, bit-identical cross-engine) — with 40 md5 bits as the
    * distinct tiebreak, so local-dominance matching pairs the
    * strongest links first and the assignment equals greedy
    * best-score-first 1:1 linkage. Output: (a_id, b_id, dice, round),
    * each doc in at most one row. */
  def q442LinkageAssignment(s: SparkSession, dir: String): DataFrame = {
    val pairs = IterativeLoop.cutLazy(graft.dedup.Dedup.fuzzyBlockedPairs(
      Tables.documents(s, dir), "doc_id", "text", "lang",
      prefixLen = 40, thresholdNum = 3, thresholdDen = 4))
    val we = pairs.select(col("a_id").as("x"), col("b_id").as("y"),
      (expr("((na + nb - 2 * inter) * 1048576) div (na + nb)")
        * lit(1099511627776L)
        + conv(substring(md5(concat(lit("as:"), col("a_id"), lit(","),
          col("b_id"))), 1, 10), 16, 10).cast("long")).as("wt"))
    CatalogGx.matchingOf(we, CatalogGx.MatchRounds)
      .join(pairs.select(col("a_id").as("x"), col("b_id").as("y"),
        col("dice")), Seq("x", "y"))
      .select(col("x").as("a_id"), col("y").as("b_id"), col("dice"),
        col("round"))
      .orderBy(col("a_id"))
  }

  // ---------------------------------------------------------------- q443

  private[graft] val AmsEstimators = 16

  /** AMS tug-of-war F2 sketch over the l_partkey stream: estimator j
    * draws sign_j(v) = ±1 from md5 parity, S_j = Σ_v sign_j(v)·f_v,
    * and S_j² is an unbiased estimate of F2 = Σf² (the self-join
    * size — what q178 computes from exact histograms, here at
    * O(estimators) state). The signed sums are computed on the
    * (v, f_v) FREQUENCY frame (one map-combinable groupBy), the grid
    * is |values|×16, and each S_j is a plain sum — the sketch merges
    * across splits by addition (the 100 TB property; spec law). Exact
    * F2 audit + one-divide ratio per estimator, q178's
    * law-is-the-output style. */
  def q443AmsF2(s: SparkSession, dir: String): DataFrame = {
    val fv = IterativeLoop.cutLazy(Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("v")).agg(count(lit(1)).as("f")))
    val sj = amsSums(fv, AmsEstimators)
    val exact = fv.agg(sum(col("f") * col("f")).as("f2_exact"))
    sj.crossJoin(exact)
      .select(col("j"), col("s_j"), (col("s_j") * col("s_j")).as("est_f2"),
        col("f2_exact"),
        ((col("s_j") * col("s_j")).cast("double")
          / col("f2_exact").cast("double")).as("ratio"))
      .orderBy(col("j"))
  }

  /** The signed sums S_j on a (v, f) frequency frame — the mergeable
    * sketch state. */
  private[graft] def amsSums(fv: DataFrame, estimators: Int): DataFrame =
    fv.select(col("v"), col("f"),
        explode(sequence(lit(0L), lit(estimators - 1L))).as("j"))
      .select(col("j"),
        when(conv(substring(md5(concat(lit("ams:"), col("j").cast("string"),
          lit(":"), col("v").cast("string"))), 1, 1), 16, 10)
          .cast("long") % 2 === 0, col("f")).otherwise(-col("f")).as("sf"))
      .groupBy(col("j")).agg(sum(col("sf")).as("s_j"))

  // ---------------------------------------------------------------- q444

  /** Dunning's log-likelihood-ratio (G²) collocation test over
    * adjacent token pairs: the 2×2 contingency lives in the BIGRAM
    * event space (N = total bigrams, R = bigrams starting with w1,
    * C = bigrams ending with w2), and G² in bits is
    * 2·Σ_{cells, O>0} O·(((lg O + lg N) − lg rowTot) − lg colTot) —
    * every lg argument a positive INTEGER (O > 0 ⇒ rowTot ≥ O and
    * colTot ≥ O), so the exact piecewise lg applies and both engines
    * agree bit for bit; the four cell terms fold in a fixed written
    * order. G² is the significance companion of q129's PMI: PMI
    * over-ranks rare pairs (a hapax pair maxes PMI), G² weighs the
    * evidence mass (Dunning 1993). Top-20 by (g2 desc, w1, w2) after
    * the minCount prune — applied BEFORE the margin joins. */
  def q444G2Collocations(s: SparkSession, dir: String): DataFrame =
    g2Of(Tables.documents(s, dir), minCount = 5L, k = 20)

  private[graft] def g2Of(docs: DataFrame, minCount: Long, k: Int): DataFrame = {
    val toks = docs.select(TextOps.tokens(col("text")).as("w"))
    val bi = IterativeLoop.cutLazy(toks
      .select(posexplode(slice(col("w"), lit(1),
        greatest(size(col("w")) - 1, lit(0)))), col("w"))
      .select(col("col").as("w1"), element_at(col("w"), col("pos") + 2).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12")))
    val firsts = bi.groupBy(col("w1")).agg(sum(col("c12")).as("r1"))
    val seconds = bi.groupBy(col("w2")).agg(sum(col("c12")).as("k1"))
    val tot = bi.agg(sum(col("c12")).as("n"))
    def term(o: Column, rt: Column, ct: Column): Column =
      when(o > 0,
        o.cast("double") * (((lg(o) + lg(col("n"))) - lg(rt)) - lg(ct)))
        .otherwise(lit(0.0))
    val g2 = (((term(col("c12"), col("r1"), col("k1"))
      + term(col("r1") - col("c12"), col("r1"), col("n") - col("k1")))
      + term(col("k1") - col("c12"), col("n") - col("r1"), col("k1")))
      + term((col("n") - col("r1")) - (col("k1") - col("c12")),
        col("n") - col("r1"), col("n") - col("k1"))) * lit(2.0)
    bi.filter(col("c12") >= minCount)
      .join(firsts, "w1")
      .join(seconds, "w2")
      .crossJoin(broadcast(graft.ops.Guards.scalar(tot)))
      .select(col("w1"), col("w2"), col("c12"), col("r1"), col("k1"),
        g2.as("g2_bits"))
      .orderBy(col("g2_bits").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  // ---------------------------------------------------------------- q445

  private[graft] val DbEps = 5L
  private[graft] val DbMinPts = 4L
  private[graft] val DbSample = 2000L

  /** Exact point-level DBSCAN (Ester et al. 1996) over a 2-D
    * customer-behavior panel — completes q264's CELL-level
    * approximation (X245b clusters occupied ε-cells: cell density is
    * not point density, and border points are absorbed or dropped with
    * their cell) with the textbook per-point semantics. Features (x = lifetime spend in exact $10k integer units,
    * y = 2·order count), ε-neighborhoods found by the GRID trick —
    * bucket every point into ⌊·∕ε⌋ cells, candidate pairs only within
    * the 3×3 adjacent-cell equi-join (never all-pairs), exact integer
    * dx²+dy² ≤ ε² post-filter. Core (≥ [[DbMinPts]] neighbors) points
    * cluster via [[graft.graph.Graph.ccAuto]] — cluster label = the
    * component-minimum core id, the canonical fixpoint both CC
    * algorithms compute — border points take the MINIMUM cluster among
    * their core neighbors (the deterministic resolution of DBSCAN's
    * classic border ambiguity), the rest are noise.
    *
    * Panel bound: DBSCAN runs on the md5-rank bottom-[[DbSample]]
    * customers (the q394/q418 fixed-panel pattern). The bound is what
    * keeps an EXACT cross-engine oracle tractable — DuckDB labels
    * components by a recursive min-label closure whose row count is
    * Σ|C|² ≤ sample² — while the engine-side primitives (grid-bucketed
    * ε-join, ccAuto) are the scale path and carry their own ×10
    * evidence on full corpora (q53/q436). A fixed ε is only meaningful
    * at a fixed density anyway: on the FULL corpus the panel density
    * grows with SF and ε would have to shrink with it (measured:
    * ε = 25 chains 14k of 15k customers into ~2k-node components at
    * sf0.1 — a parameter artifact, not structure). */
  def q445GridDbscan(s: SparkSession, dir: String): DataFrame = {
    val f0 = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("id"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
        (count(lit(1)) * 2L).as("y"))
      .select(col("id"), expr("cents div 1000000").as("x"), col("y"))
    // bottom-K panel selection: only MEMBERSHIP in the md5-bottom-2000
    // is used downstream, so orderBy+limit (TakeOrderedAndProject — a
    // per-partition heap, no range shuffle) replaces the full
    // DistributedRank-then-filter of round 12 (same set, same hashes;
    // the q394 pattern)
    val panel = f0
      .orderBy(md5(concat(lit("db:"), col("id").cast("string"))), col("id"))
      .limit(DbSample.toInt)
    dbscanOf(panel.select(col("id"), col("x"), col("y")), DbEps, DbMinPts)
  }

  /** DBSCAN core on an (id, x, y) integer-feature frame. */
  private[graft] def dbscanOf(feats: DataFrame, eps: Long,
      minPts: Long): DataFrame = {
    val f = IterativeLoop.cutLazy(feats)
    val cells = f.select(col("id"), col("x"), col("y"),
      expr(s"x div $eps").as("cx"), expr(s"y div $eps").as("cy"))
    val shifted = cells.select(col("id").as("bi"), col("x").as("bx"),
        col("y").as("by"),
        explode(typedLit(Seq(-1L, 0L, 1L))).as("dx"), col("cx"), col("cy"))
      .select(col("bi"), col("bx"), col("by"), (col("cx") + col("dx")).as("cx"),
        col("cy"), explode(typedLit(Seq(-1L, 0L, 1L))).as("dy"))
      .select(col("bi"), col("bx"), col("by"), col("cx"),
        (col("cy") + col("dy")).as("cy"))
    val cand = IterativeLoop.cutLazy(cells
      .join(shifted, Seq("cx", "cy"))
      .filter(col("id") =!= col("bi") &&
        (col("x") - col("bx")) * (col("x") - col("bx")) +
          (col("y") - col("by")) * (col("y") - col("by")) <= eps * eps)
      .select(col("id").as("ai"), col("bi")))
    val core = IterativeLoop.cutLazy(cand.groupBy(col("ai").as("id"))
      .agg(count(lit(1)).as("d")).filter(col("d") >= minPts)
      .select(col("id")))
    val ce = cand
      .join(core.select(col("id").as("ai")), Seq("ai"), "left_semi")
      .join(core.select(col("id").as("bi")), Seq("bi"), "left_semi")
      .filter(col("ai") < col("bi"))
    // Round 15: hookComponents DIRECTLY, not ccAuto. The ε-neighbor graph
    // of density clusters is the high-diameter regime by construction
    // (core points chain along thin manifolds), and the plan audit showed
    // ccAuto's min-label attempt burning its full 10 stall rounds (each an
    // edges⋈labels round) before falling back to hookComponents anyway —
    // pure paid-probe overhead on every run. Both compute the same
    // canonical component-minimum labeling, so the output is unchanged
    // (the CcAutoSpec equality law); this is just skipping a probe we can
    // predict from the workload's shape (guide §1.2 step 1).
    val cc = graft.graph.Graph.hookComponents(ce, "ai", "bi")
    val coreClusters = IterativeLoop.cutLazy(core
      .join(cc.select(col("id"), col("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster")))
    val borderClusters = cand
      .join(core, col("id") === col("ai"), "left_anti")
      .join(coreClusters.select(col("id").as("bi"), col("cluster")), "bi")
      .groupBy(col("ai").as("id")).agg(min(col("cluster")).as("cluster"))
    f.join(coreClusters.select(col("id"), col("cluster").as("cc")),
        Seq("id"), "left")
      .join(borderClusters.select(col("id"), col("cluster").as("bc")),
        Seq("id"), "left")
      .select(col("id"), col("x"), col("y"),
        when(col("cc").isNotNull, "core")
          .when(col("bc").isNotNull, "border")
          .otherwise("noise").as("role"),
        coalesce(col("cc"), col("bc")).as("cluster"))
      .orderBy(col("id"))
  }

  // ---------------------------------------------------------------- q446

  private[graft] val CiSegLen = 128L

  /** Incremental connected-components maintenance — the operation a
    * 100 TB dedup store actually runs daily: yesterday's labels are
    * STORED, today only a small DELTA edge set arrives, and the engine
    * must re-cluster ONLY the components the delta touches instead of
    * re-running CC over the whole corpus ([[incrementalCc]]: affected
    * labels = stored labels of the delta endpoints; their nodes +
    * their internal edges + the delta feed one bounded
    * [[graft.graph.Graph.hookComponents]] run; everyone else keeps
    * their stored label untouched — correctness is canonical because
    * the component-minimum fixpoint doesn't care how it was reached,
    * and the spec's law asserts equality with a FULL recompute).
    *
    * Catalog instance (the q436 construction, densified): documents on
    * md5-rank path segments of [[CiSegLen]] = stored state; the delta
    * bridges segment s to s+1 exactly when s ≡ 1 (mod 8) — so 2 of
    * every 8 segments re-cluster and the rest must not be recomputed.
    * Oracle: GROUND TRUTH by construction (the q436 pattern) — merged
    * groups are closed-form rank ranges, no CC replay needed. */
  def q446IncrementalCc(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val r = IterativeLoop.cutLazy(graft.ops.DistributedRank.withRowNumber(
      docs, "rnk",
      md5(concat(lit("ci:"), col("doc_id").cast("string"))), col("doc_id")))
    val consec = r.select(col("doc_id").as("x"), col("rnk"))
      .join(r.select(col("doc_id").as("y"), (col("rnk") - 1).as("rnk")), "rnk")
    val base = consec.filter(col("rnk") % CiSegLen =!= 0)
      .select(col("x"), col("y"))
    val delta = consec.filter(col("rnk") % CiSegLen === 0 &&
        expr(s"(rnk div $CiSegLen) % 8") === 1)
      .select(col("x"), col("y"))
    // stored labels: segment minima (yesterday's canonical CC output,
    // here available in closed form because segments ARE the components)
    val labels0 = r.select(col("doc_id").as("id"),
      min(col("doc_id")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(expr(s"(rnk - 1) div $CiSegLen"))).as("component"))
    incrementalCc(labels0, base, delta)
  }

  /** The incremental step: re-cluster ONLY components touched by
    * `delta`. `labels0` must be a canonical (id, component=min) CC
    * labeling of `base` — BOTH preconditions are loudly asserted
    * in-plan: completeness (every base node labeled) and
    * min-canonicality (each component label is the minimum id of its
    * label group — a stale label store would under-scope the
    * touched-component probe and silently diverge from a full
    * recompute). Delta endpoints NOT in `labels0` are the daily-ingest
    * normal case — brand-new nodes — and enter as singleton components
    * before the touched-set probe. Returns the labeling of base ∪
    * delta over the nodes that appear in ≥ 1 edge. */
  private[graft] def incrementalCc(labels0: DataFrame, base: DataFrame,
      delta: DataFrame): DataFrame = {
    val d = IterativeLoop.cutLazy(delta)
    val dnodes = d.select(col("x").as("id")).unionAll(
      d.select(col("y").as("id"))).distinct()
    // new nodes (in delta, unknown to labels0) start as singletons
    val l0 = IterativeLoop.cutLazy(labels0.unionByName(
      dnodes.join(labels0, Seq("id"), "left_anti")
        .select(col("id"), col("id").as("component"))))
    // min-canonicality guard: each component label must be the minimum
    // id within its label group (one map-side-combined aggregate over
    // the label store; linear, no join). Without it a stale/renamed
    // label store passes silently and the touched probe under-scopes.
    val canon = l0.groupBy(col("component")).agg(min(col("id")).as("mn"))
      .agg(coalesce(sum(when(col("mn") =!= col("component"), 1L)
        .otherwise(0L)), lit(0L)).as("n_noncanon"))
    val touched = IterativeLoop.cutLazy(
      dnodes.join(l0, "id").select(col("component")).distinct())
    val subNodes = l0.join(touched, Seq("component"), "left_semi")
      .select(col("id"))
    val subEdges = base
      .join(subNodes.select(col("id").as("x")), Seq("x"), "left_semi")
      .join(subNodes.select(col("id").as("y")), Seq("y"), "left_semi")
      .unionAll(d)
    val sub = graft.graph.Graph.hookComponents(subEdges, "x", "y")
      .select(col("id"), col("component").as("newc"))
    val nodes = base.unionAll(d)
      .select(col("x").as("id")).unionAll(
        base.unionAll(d).select(col("y").as("id")))
      .distinct()
    // left join + loud assert, not an inner join: an unlabeled BASE
    // node is a broken precondition and must raise, never drop rows
    nodes.join(l0, Seq("id"), "left").join(sub, Seq("id"), "left")
      .crossJoin(broadcast(graft.ops.Guards.scalar(canon)))
      .filter(coalesce(assert_true(col("n_noncanon") === 0L,
        lit("incrementalCc: labels0 is not min-canonical; rebuild the " +
          "label store with a full CC before resuming increments")),
        lit(true)))
      .filter(coalesce(assert_true(col("component").isNotNull,
        lit("incrementalCc: labels0 must label every base node")),
        lit(true)))
      .select(col("id"), coalesce(col("newc"), col("component"))
        .as("component"))
      .orderBy(col("id"))
  }

  // ---------------------------------------------------------------- q447

  /** Bitmap-index audience overlap — the EXACT set-algebra primitive
    * next to the approximate KMV family (q236/q404): each event type's
    * user audience packs into 63-bit words (word = u div 63, mask =
    * bit_or(1 << (u mod 63)) — 63 bits, not 64, because signed-shift
    * overflow at bit 63 is an error in DuckDB and a sign flip in
    * Spark), so a 100 TB event log's audience reduces to ⌈|U|∕63⌉
    * longs per type and every pairwise intersection is a WORD-ALIGNED
    * equi-join + bit_count(a & b) sum — user lists never shuffle,
    * exactness without a sketch (the groupBitmapAnd idiom). Union by
    * inclusion–exclusion; Jaccard one divide; zero-overlap pairs kept
    * via the bounded type-pair grid. */
  def q447BitmapOverlap(s: SparkSession, dir: String): DataFrame = {
    val tu = IterativeLoop.cutLazy(Tables.events(s, dir)
      .select(col("event_type").as("t"), col("user_id").as("u")).distinct())
    // 63-bit packing assumes user_id >= 0: a negative id makes Spark's
    // truncating div/% diverge from DuckDB's flooring //,% and feeds
    // shiftleft a negative count (silent garbage). Guard loudly — the
    // q419/q440 priority-packing pattern.
    val umin = tu.agg(coalesce(min(col("u")), lit(0L)).as("umin"))
    val words = IterativeLoop.cutLazy(tu
      .crossJoin(broadcast(graft.ops.Guards.scalar(umin)))
      .filter(coalesce(assert_true(col("umin") >= 0L,
        lit("q447: bitmap word packing requires user_id >= 0")), lit(true)))
      .select(col("t"), expr("u div 63").as("w"),
        expr("shiftleft(cast(1 as bigint), cast(u % 63 as int))").as("b"))
      .groupBy(col("t"), col("w")).agg(expr("bit_or(b)").as("m")))
    val sizes = IterativeLoop.cutLazy(words.groupBy(col("t"))
      .agg(sum(expr("bit_count(m)")).as("n")))
    val inter = words.select(col("t").as("ta"), col("w"), col("m").as("ma"))
      .join(words.select(col("t").as("tb"), col("w"), col("m").as("mb")), "w")
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(sum(expr("bit_count(ma & mb)")).as("n_inter"))
    sizes.select(col("t").as("ta"), col("n").as("n_a"))
      .join(sizes.select(col("t").as("tb"), col("n").as("n_b")),
        col("ta") < col("tb"))
      .join(inter, Seq("ta", "tb"), "left")
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("n_a"), col("n_b"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / col("n_union").cast("double"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q442_linkage_assignment" -> q442LinkageAssignment _,
    "q443_ams_f2"             -> q443AmsF2 _,
    "q444_g2_collocations"    -> q444G2Collocations _,
    "q445_grid_dbscan"        -> q445GridDbscan _,
    "q446_incremental_cc"     -> q446IncrementalCc _,
    "q447_bitmap_overlap"     -> q447BitmapOverlap _)
}
