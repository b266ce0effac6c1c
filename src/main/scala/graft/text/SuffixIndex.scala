package graft.text

import graft.ops.{DistributedRank, IterativeLoop}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Suffix-array construction as dataflow: prefix doubling (Manber–Myers)
 * expressed in joins, group-ranks and windows — the index layer behind
 * exact-substring dedup (Lee et al.-style span work already lives in
 * [[graft.dedup.Dedup]]; this adds the full suffix ORDER, from which BWT
 * compressibility and repeated-substring structure follow).
 *
 * Two shapes, two distribution strategies:
 *
 *  - [[globalRanks]]: ONE order over every suffix of every document —
 *    the cross-document index. Ranks are computed with
 *    [[DistributedRank]] (range-partition + offset), never a
 *    single-partition window, so the sort scales with the corpus.
 *  - [[perDocBwt]]: per-document suffix order (documents are the unit of
 *    parallelism — windows PARTITION BY doc, so a 100 TB corpus
 *    distributes across documents and each doc's index stays local).
 *
 * Both start from rank-0 on a [[Base]]-char gram (string order == byte
 *  order for the ASCII corpus) and double the compared span each round:
 * rank_k orders suffixes by their first Base·2^k chars, with the
 * "suffix ends inside the window" case encoded by the gram's own length
 * (a proper prefix sorts first, exactly like string compare) and the
 * missing-right-half case by the -1 sentinel. ceil(lg(maxLen/Base))
 * rounds — 7 for the ~600-char testdata docs, 17 for megabyte docs —
 * each a constant number of key-partitioned shuffles, all through
 * [[IterativeLoop]] so per-round lineage stays cut.
 */
object SuffixIndex {

  /** rank-0 gram width (output is Base-invariant — rank-0 on a B-char
    * gram orders by the first B chars exactly like lg(B) doubling rounds
    * would). Triage notes from the sf0.1 bench, so nobody re-walks them:
    * 8 vs 32 both land ≈20 s — round count is NOT the bottleneck at this
    * scale (each round is ~4 small key-partitioned stages; scheduling
    * overhead dominates 1.5M-row data). What DOES matter is rank-0
    * class granularity: a packed-7-chars-into-a-long rank-0 (zero-shuffle
    * projection) measured 3× WORSE (59 s) because 7-char classes on
    * low-entropy token text are huge tie groups, range partitioning maps
    * equal keys to ONE partition, and every rank exchange skews. 32-char
    * grams keep classes fine from round 0 and the exchanges balanced. */
  private val Base = 32

  private def rounds(maxLen: Int): Int = {
    var k = 0
    while (Base.toLong << k < maxLen.toLong) k += 1
    math.max(1, k)
  }

  /** Global suffix ranks: one row per (doc, pos), `suffix_rank` = 1-based
    * position in the corpus-wide lexicographic order of all suffixes
    * (equal suffix strings tie-broken by (doc_id, pos), matching
    * `row_number() OVER (ORDER BY suffix, doc_id, pos)`). */
  def globalRanks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Spark's sequence(1, n) DESCENDS for n < 1 (it never returns empty);
    // guard the degenerate empty-text row out, matching generate_series.
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .filter(length(col("text")) >= 1)
    // bounded driver scalar: the round count (a plan-shape decision, like
    // the BPE merge count) needs the corpus max length up front.
    val maxLen = base.agg(max(length(col("text"))).as("m")).head().getInt(0)
    val grams = base
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")))).as("p"), col("text"))
      .select(col("doc_id"), col("p").cast("long").as("pos"),
        expr(s"substring(text, p, $Base)").as("g"))
    val init = DistributedRank.denseGroupRank(grams, Seq("g"), "r")
      .select(col("doc_id"), col("pos"), col("r"))
    val ranked = IterativeLoop.fixed(init, rounds(maxLen)) { (st, k) =>
      val step = Base.toLong << (k - 1)
      val right = st.select(col("doc_id"),
        (col("pos") - step).as("pos"), col("r").as("r2"))
      val paired = st.join(right, Seq("doc_id", "pos"), "left")
        .withColumn("r2", coalesce(col("r2"), lit(-1L)))
      DistributedRank.denseGroupRank(paired, Seq("r", "r2"), "nr")
        .select(col("doc_id"), col("pos"), col("nr").as("r"))
    }
    DistributedRank
      .withRowNumber(ranked, "suffix_rank", col("r"), col("doc_id"), col("pos"))
      .select(col("doc_id"), col("pos"), col("suffix_rank"))
  }

  /** Per-document suffix ranks over the sentinel-appended text
    * (`text + TAB`, TAB below every corpus char so all suffixes are
    * distinct): (doc_id, pos, bc, r) with `r` the 1-based rank of the
    * suffix starting at `pos` within its doc and `bc` the suffix's
    * cyclic predecessor char (the BWT char). Documents are the unit of
    * parallelism — per-doc dense_rank windows, prefix doubling as in
    * [[globalRanks]]. Appending the sentinel preserves the relative
    * order of the original suffixes (TAB sorts below everything, so a
    * prefix still sorts first), which is what the LCP consumers rely
    * on. */
  def perDocRanks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      concat(col(textCol), lit("\t")).as("t"))
    val maxLen = base.agg(max(length(col("t"))).as("m")).head().getInt(0)
    val wDoc = Window.partitionBy(col("doc_id"))
    val grams = base
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("t")))).as("p"), col("t"))
      .select(col("doc_id"), col("p").cast("long").as("pos"),
        expr(s"substring(t, p, $Base)").as("g"),
        when(col("p") === 1, expr("substring(t, length(t), 1)"))
          .otherwise(expr("substring(t, p - 1, 1)")).as("bc"))
    val init = grams
      .withColumn("r", dense_rank().over(wDoc.orderBy(col("g"))).cast("long"))
      .select(col("doc_id"), col("pos"), col("bc"), col("r"))
    IterativeLoop.fixed(init, rounds(maxLen)) { (st, k) =>
      val step = Base.toLong << (k - 1)
      val right = st.select(col("doc_id"),
        (col("pos") - step).as("pos"), col("r").as("r2"))
      st.join(right, Seq("doc_id", "pos"), "left")
        .withColumn("r2", coalesce(col("r2"), lit(-1L)))
        .withColumn("nr",
          dense_rank().over(wDoc.orderBy(col("r"), col("r2"))).cast("long"))
        .select(col("doc_id"), col("pos"), col("bc"), col("nr").as("r"))
    }
  }

  /** Builder version for the persistent index spills — bump on ANY
    * change to [[globalRanks]]/[[perDocRanks]] semantics so stale disk
    * indexes from an older algorithm can never be served. */
  private val IndexVersion = "v1"

  /** [[globalRanks]] over the standard corpus read, memoized ACROSS
    * sessions via [[graft.ops.FrameMemo.cachedPersistent]] — the
    * deployment model (a materialized index table every query reads,
    * not a per-query rebuild) made literal: the first session writes the
    * ranks to parquet keyed by (builder version, corpus fingerprint),
    * every later session opens the files in sub-second time. The
    * round-12 bench paid the 27–44 s build once per SESSION; now it is
    * once per corpus per machine. */
  def globalRanksCached(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.ops.FrameMemo.cachedPersistent(s, s"suffix-global-$IndexVersion:$dir",
      graft.ops.FrameMemo.fileFingerprint(s"$dir/documents.parquet"),
      // restore the build's doc_id clustering on reload: every consumer's
      // first move is a join back to documents on doc_id (to fetch text
      // heads), and the ranks side is the big one — one session-time
      // shuffle here buys exchange-free consumer joins (FrameMemo doc)
      layout = _.repartition(col("doc_id")))(
      globalRanks(graft.Tables.documents(s, dir), "doc_id", "text"))

  /** [[perDocRanks]] over the standard corpus read, memoized like
    * [[globalRanksCached]]. */
  def perDocRanksCached(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.ops.FrameMemo.cachedPersistent(s, s"suffix-perdoc-$IndexVersion:$dir",
      graft.ops.FrameMemo.fileFingerprint(s"$dir/documents.parquet"),
      // doc_id clustering serves both the text join AND the rank-adjacent
      // self-join on (doc_id, rr): HashPartitioning(doc_id) satisfies the
      // clustered distribution of any superset join key
      layout = _.repartition(col("doc_id")))(
      perDocRanks(graft.Tables.documents(s, dir), "doc_id", "text"))

  /** Per-document BWT summary over [[perDocRanks]]: the BWT read as each
    * suffix's cyclic predecessor char in rank order. Emits the
    * compressibility signal (BWT clusters equal context-chars, so
    * run count ≪ length means repetitive text): doc_id, n (=len+1),
    * bwt_runs, and the first `headLen` BWT chars as a spot-checkable
    * prefix. */
  def perDocBwt(docs: DataFrame, idCol: String, textCol: String,
      headLen: Int = 24): DataFrame =
    bwtOf(perDocRanks(docs, idCol, textCol), headLen)

  /** [[perDocBwt]] body over an already-built [[perDocRanks]] frame, so
    * callers can feed the session-memoized index. */
  def bwtOf(ranked: DataFrame, headLen: Int = 24): DataFrame = {
    val wDoc = Window.partitionBy(col("doc_id"))
    ranked
      .withColumn("prev", lag(col("bc"), 1).over(wDoc.orderBy(col("r"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("prev").isNull || col("prev") =!= col("bc"), lit(1L))
          .otherwise(lit(0L))).as("bwt_runs"),
        array_join(slice(
          transform(sort_array(collect_list(struct(col("r"), col("bc")))),
            e => e("bc")), 1, headLen), "").as("bwt_head"))
  }
}
