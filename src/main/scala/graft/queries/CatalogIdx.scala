package graft.queries

import graft.Tables
import graft.ops.{DistributedRank, IterativeLoop}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Round-10 wave: corpus indexing & synopsis verbs — the index structures
 * a training-data platform builds OVER the corpus rather than per-row
 * statistics of it. Global suffix-array ranks by distributed prefix
 * doubling (the index behind exact-substring dedup), per-document BWT
 * compressibility (run structure as a repetition signal), a grid-pruned
 * Pareto skyline (multi-objective "best corpus slices" without a
 * cartesian), winnowing fingerprints (Schleimer–Wilkerson–Aiken local
 * sampling with the coverage guarantee, the MOSS scheme), exact
 * t-closeness over QI groups (completing the k-anonymity / l-diversity /
 * DP-counts privacy family), and an integer Haar wavelet synopsis of the
 * daily revenue series (hierarchical pairwise aggregation, top
 * coefficients by energy). Determinism contract as everywhere: integer
 * or exact-string state, single-division doubles, total-order tiebreaks.
 */
object CatalogIdx {

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  /** Global suffix-array ranks over the whole document corpus via
    * distributed prefix doubling ([[graft.text.SuffixIndex]]) — every
    * rank step is range-partition + offset, never a single-partition
    * window, so the index scales with the corpus. */
  def q396SuffixRanks(s: SparkSession, dir: String): DataFrame =
    graft.text.SuffixIndex.globalRanksCached(s, dir)

  /** Per-document BWT compressibility: suffix order per doc (documents
    * are the unit of parallelism), BWT read as cyclic predecessors in
    * rank order; run count ≪ length flags repetitive text the way
    * deflate-ratio does, but with exact integer structure. */
  def q397BwtRuns(s: SparkSession, dir: String): DataFrame =
    graft.text.SuffixIndex.bwtOf(
      graft.text.SuffixIndex.perDocRanksCached(s, dir))

  /** Pareto skyline of orders (maximize price AND recency). The
    * all-pairs dominance test is O(n²); this runs the scalable form:
    * date-bucket pruning (a later bucket's max price ≥ p proves
    * domination — bucket summary is date-span-sized, broadcast) plus a
    * per-bucket window sweep for the survivors. */
  def q398Skyline(s: SparkSession, dir: String): DataFrame =
    skylineOf(Tables.orders(s, dir)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("p"),
        to_date(col("o_orderdate")).as("d"))
      .withColumn("dd",
        datediff(col("d"), lit("1970-01-01").cast("date")).cast("long")))
      .select(col("o_orderkey"), col("p"),
        date_format(col("d"), "yyyy-MM-dd").as("d_str"))

  /** Skyline core on (p, dd [, carried cols]): rows not dominated in
    * (p max, dd max). Exact: cross-bucket domination is decided by the
    * bucket suffix-max (strictly later bucket ⇒ strictly later day),
    * same-bucket domination by a range-frame sweep, same-day by the
    * day-partition max. The only broadcast is the bucket summary, whose
    * size is the DATE SPAN / 32 — independent of row count. */
  private[graft] def skylineOf(rows: DataFrame): DataFrame = {
    val o = rows.withColumn("b", shiftright(col("dd"), 5))
    val cells = o.groupBy(col("b")).agg(max(col("p")).as("mp"))
      .withColumn("smax", max(col("mp")).over(
        Window.orderBy(col("b")).rowsBetween(1, Window.unboundedFollowing)))
      .select(col("b"), col("smax"))
    val pruned = o.join(broadcast(cells), Seq("b"))
      .filter(col("smax").isNull || col("smax") < col("p"))
    val wLater = Window.partitionBy(col("b")).orderBy(col("dd"))
      .rangeBetween(1, Window.unboundedFollowing)
    val wSame = Window.partitionBy(col("b"), col("dd"))
    pruned
      .withColumn("ml", max(col("p")).over(wLater))
      .withColumn("me", max(col("p")).over(wSame))
      .filter((col("ml").isNull || col("ml") < col("p")) && col("me") <= col("p"))
      .drop("b", "smax", "ml", "me")
  }

  /** Winnowing fingerprints (k=8 char grams, window w=12): in every
    * window of 12 consecutive gram hashes select the minimum (rightmost
    * on ties) — the guarantee is one fingerprint per window with
    * expected density 2/(w+1). Per doc: selection count, XOR of selected
    * hashes, and how many of its distinct selected prints are SHARED
    * (doc-frequency ≥ 2 over the selected-print table) — the
    * plagiarism/near-dup signal via a print-keyed df join. Deliberately
    * NOT "count of partner docs": corpus-common grams give hub prints
    * df≈corpus, and a partner expansion is Σdf² pairs (measured 5.6·10⁸
    * at sf0.1) — the exact all-pairs shape this engine never ships. */
  def q399Winnowing(s: SparkSession, dir: String): DataFrame = {
    val prints = winnowingPrints(Tables.documents(s, dir), "doc_id", "text")
    val perDoc = prints.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_prints"), expr("bit_xor(h)").as("fp_xor"))
    val sel = prints.select(col("doc_id"), col("h")).distinct()
    val df = sel.groupBy(col("h")).agg(count(lit(1)).as("hdf"))
    val shared = sel.join(df, Seq("h")).filter(col("hdf") >= 2)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("nsp"))
    perDoc.join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_prints"), col("fp_xor"),
        coalesce(col("nsp"), lit(0L)).as("n_shared_prints"))
  }

  private[graft] val WinnowK = 8
  private[graft] val WinnowW = 12

  /** Selected winnowing prints (doc_id, pos, h). Selection rule made
    * window-function-shaped: pos is the (hash asc, pos desc)-argmin of
    * SOME full window covering it ⟺ for some backward extent j, the j
    * hashes before it and the w-1-j after it all exceed its key — an OR
    * over w fixed frames, evaluated in one pass per doc partition.
    * Keys pack (40-bit md5 prefix, 2^20−pos) into one long so "min" is
    * the rightmost-on-ties rule; docs are capped at 2^20 grams by the
    * packing (enforced). */
  private[graft] def winnowingPrints(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val k = WinnowK; val w = WinnowW
    // sequence(1, n) descends for n < 1 — a doc shorter than one gram
    // must contribute zero rows, like the oracle's generate_series.
    val grams = docs
      .filter(length(col(textCol)) >= k)
      .select(col(idCol).as("doc_id"),
        explode(sequence(lit(1), length(col(textCol)) - (k - 1))).as("p"),
        col(textCol).as("text"))
      .select(col("doc_id"), col("p").cast("long").as("pos"),
        conv(substring(md5(expr(s"substring(text, p, $k)")), 1, 10), 16, 10)
          .cast("long").as("h"))
      .withColumn("wk", col("h") * 1048576L + (lit(1048576L) - col("pos")))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val g = grams.withColumn("gmax",
      max(col("pos")).over(Window.partitionBy(col("doc_id"))))
    val selected = (0 until w).map { j =>
      val back =
        if (j == 0) lit(true)
        else min(col("wk")).over(wd.rowsBetween(-j, -1)) > col("wk")
      val fwd =
        if (j == w - 1) lit(true)
        else min(col("wk")).over(wd.rowsBetween(1, w - 1 - j)) > col("wk")
      (col("pos") - j >= 1) && (col("pos") - j <= col("gmax") - (w - 1)) &&
        back && fwd
    }.reduce(_ || _)
    // window expressions can't sit in a WHERE — materialize the predicate
    g.withColumn("keep", selected).filter(col("keep"))
      .select(col("doc_id"), col("pos"), col("h"))
  }

  /** Exact t-closeness of (segment, region) QI groups over account-
    * balance deciles: EMD between each group's decile distribution and
    * the global one, kept in integers (numerator Σ|cum_g·N − cum_all·n_g|,
    * denominator n_g·N·(m−1)) with one final division. Deciles come from
    * the exact distributed rank ([[DistributedRank]]), not ntile's
    * single-partition window. */
  def q400Tcloseness(s: SparkSession, dir: String): DataFrame = {
    val nr = Tables.nation(s, dir).join(Tables.region(s, dir),
      col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("r_name"))
    val base = Tables.customer(s, dir)
      .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("id"), col("c_mktsegment").as("segment"),
        col("r_name").as("region"), cents(col("c_acctbal")).as("bal"))
    tclosenessOf(base, Seq("segment", "region"))
  }

  /** t-closeness core on (id, bal [, QI cols]); see [[q400Tcloseness]]. */
  private[graft] def tclosenessOf(base: DataFrame, qi: Seq[String]): DataFrame = {
    val s = base.sparkSession
    val tot = base.agg(count(lit(1)).as("N"))
    val dec = DistributedRank.withRowNumber(base, "rn", col("bal"), col("id"))
      .crossJoin(broadcast(graft.ops.Guards.scalar(tot)))
      .withColumn("dec", expr("((rn - 1) * 10) div N") + 1)
    val cumAll = dec.groupBy(col("dec")).agg(count(lit(1)).as("ca"))
      .withColumn("cum_all", sum(col("ca")).over(Window.orderBy(col("dec"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("dec"), col("cum_all"))
    val groups = dec.groupBy(qi.map(col): _*).agg(count(lit(1)).as("n_g"))
    val grid = groups.crossJoin(
      broadcast(graft.ops.Guards.bounded(
        s.range(1, 11).select(col("id").as("dec")), 10)))
    val gCnt = dec.groupBy((qi.map(col) :+ col("dec")): _*)
      .agg(count(lit(1)).as("cg"))
    val wG = Window.partitionBy(qi.map(col): _*).orderBy(col("dec"))
    grid.join(gCnt, qi :+ "dec", "left")
      .withColumn("cum_g", sum(coalesce(col("cg"), lit(0L)))
        .over(wG.rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(cumAll), Seq("dec"))
      .crossJoin(broadcast(graft.ops.Guards.scalar(tot)))
      .filter(col("dec") <= 9)
      .groupBy((qi.map(col) :+ col("n_g")): _*)
      .agg(sum(abs(col("cum_g") * col("N") - col("cum_all") * col("n_g")))
        .as("t_num"), max(col("N")).as("NN"))
      .select((qi.map(col) :+ col("n_g") :+ col("t_num") :+
        (col("n_g") * col("NN") * 9).as("t_den") :+
        (col("t_num").cast("double") /
          (col("n_g") * col("NN") * 9).cast("double")).as("t_close")): _*)
  }

  /** Haar wavelet synopsis of the daily revenue series: integer pairwise
    * sum/difference pyramid over a 4096-day grid (12 levels through
    * [[IterativeLoop]] — each level one key-partitioned aggregate), top
    * 16 coefficients by energy |d|²/2^level. The classic OLAP synopsis:
    * reconstructable range sums from a handful of coefficients. */
  def q401Haar(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      to_date(col("o_orderdate")).as("d"), cents(col("o_totalprice")).as("v"))
    val minD = o.agg(min(col("d")).as("d0"))
    val day = o.crossJoin(broadcast(graft.ops.Guards.scalar(minD)))
      .groupBy(datediff(col("d"), col("d0")).cast("long").as("i"))
      .agg(sum(col("v")).as("v"))
    haarTop(day, s, topK = 16)
  }

  /** Haar core on a (i, v) integer series; grid 4096 (12 levels). */
  private[graft] def haarTop(day: DataFrame, s: SparkSession, topK: Int): DataFrame = {
    val span = day.agg(max(col("i")).as("m")).head().getLong(0)
    require(span < 4096, s"Haar grid is 4096 days; series spans $span")
    // cut: the zero-filled grid feeds both the detail aggregate and the
    // total row (two union arms re-deriving the day build otherwise)
    val l0 = IterativeLoop.cutLazy(s.range(4096).select(col("id").as("i"))
      .join(day, Seq("i"), "left")
      .select(col("i"), coalesce(col("v"), lit(0L)).as("v")))
    // Round 15: the 12-level sum/difference pyramid has a CLOSED FORM —
    // the level-k detail coefficient of block j is a signed sum over the
    // raw day grid, d(k, j) = Σ_{i div 2^k = j} ±v_i with the sign given
    // by bit k−1 of i (unrolling the recursion: level-(k−1) averages with
    // even pair-parity are exactly the days whose (k−1)-th bit is 0), and
    // the one surviving approximation coefficient is the plain total.
    // Integer addition is associative, so the flat signed sums equal the
    // pyramid's staged sums EXACTLY — one explode + ONE key-partitioned
    // aggregate replaces 12 sequential aggregates (guide §1.2 step 1:
    // fewer passes; the loop was 12 shuffles of a frame that only
    // shrinks). Verified hash-identical at sf0.001/0.01/0.1, and the
    // SuffixIndexSpec Parseval/total laws pin the semantics.
    val dRows = l0
      .select(col("i"), col("v"),
        explode(sequence(lit(1L), lit(12L))).as("level"))
      .select(col("level"),
        expr("shiftright(i, cast(level as int))").as("j"),
        when(expr("shiftright(i, cast(level - 1 as int)) % 2") === 0L,
          col("v")).otherwise(-col("v")).as("sv"))
      .groupBy(col("level"), col("j"))
      .agg(sum(col("sv")).as("v"))
      .select(lit("d").as("kind"), col("level"), col("j").as("i"), col("v"))
    val aRow = l0.agg(sum(col("v")).as("v"))
      .select(lit("a").as("kind"), lit(12L).as("level"), lit(0L).as("i"),
        col("v"))
    val folded = dRows.unionByName(aRow)
    folded
      .select(col("kind"), col("level"), col("i").as("idx"), col("v").as("coeff"),
        (col("v").cast("double") * col("v").cast("double") /
          expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(level AS INT)) AS DOUBLE)"))
          .as("energy"))
      .orderBy(col("energy").desc, col("level").asc, col("idx").asc,
        col("kind").asc)
      .limit(topK)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q396_suffix_ranks" -> q396SuffixRanks _,
    "q397_bwt_runs"     -> q397BwtRuns _,
    "q398_skyline"      -> q398Skyline _,
    "q399_winnowing"    -> q399Winnowing _,
    "q400_tcloseness"   -> q400Tcloseness _,
    "q401_haar"         -> q401Haar _)
}
