package graft.queries

import graft.Tables
import graft.ops.{DistributedRank, IterativeLoop}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Round-10b wave: selection, linkage & structure verbs — the remaining
 * named algorithms a corpus platform runs BETWEEN indexing and training.
 * Truss decomposition (cohesion beyond k-core: edges, not nodes, must
 * sit in triangles), greedy set cover (pick the fewest documents that
 * cover a target vocabulary — the classic coverage-driven corpus
 * selection), KMV/theta sketch set algebra (mergeable distinct sketches
 * with union/intersection estimates — the cross-source overlap planner),
 * sorted-neighborhood record linkage (the windowed blocking alternative
 * to q26's LSH), longest-repeated-substring mining off the q396 suffix
 * index (rank-adjacent LCP — the exact-substring dedup diagnostic),
 * hierarchy rollup by path doubling (subtree aggregates in O(log depth)
 * rounds, never a per-level pass), SAX symbolization of the revenue
 * series (PAA + empirical-quartile symbols, rare-word discords), and
 * dictionary/blocklist matching (vocabulary-bounded multi-pattern scan).
 * Determinism contract as everywhere: integer or exact-string state,
 * single-division doubles, total-order tiebreaks.
 */
object CatalogSel {

  private def cents(c: Column) = round(c * 100).cast("long")

  // ---------------------------------------------------------------- q402

  /** 3-truss of the part co-order graph (parts co-ordered ≥2 times are
    * adjacent): iteratively drop edges supported by <1 triangle until
    * stable (4 synchronous rounds, replayed exactly by the oracle).
    * Support is the canonical oriented triangle enumeration — each
    * triangle a<b<c found once via two equi-joins — so per-round cost is
    * the triangle count, never an all-pairs form. Output: surviving
    * edges with their final within-truss support. */
  def q402Ktruss(s: SparkSession, dir: String): DataFrame = {
    val pp = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = pp.select(col("ok"), col("pk").as("ax"))
      .join(pp.select(col("ok"), col("pk").as("by")), "ok")
      .filter(col("ax") < col("by"))
      .groupBy(col("ax").as("x"), col("by").as("y"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select(col("x"), col("y"))
    trussOf(edges, minSup = 1, rounds = 4)
  }

  /** Truss peel on an explicit (x, y) x<y edge frame (also ScaleProbe's
    * entry): keep edges whose support ≥ minSup, `rounds` synchronous
    * rounds. */
  private[graft] def trussOf(edges0: DataFrame, minSup: Int, rounds: Int): DataFrame = {
    val e0 = IterativeLoop.cutLazy(edges0)
    // Round 16 (r15 VERDICT #6): exact early exit on the monotone peel —
    // edges are only ever REMOVED, so a stationary edge count ⟺ nothing
    // was removed ⟺ the filter kept every edge ⟺ step(e) = e, and every
    // skipped round of the cap is the identity (the q149 k-core argument;
    // the truss usually stabilizes before the replay cap, and each skipped
    // round is two triangle joins that never run, at any scale).
    val probe = IterativeLoop.stationaryAgg(
      df => df.agg(count(lit(1))).collect().toSeq.map(_.toSeq))
    val peeled = IterativeLoop.fixedUntil(e0, rounds, sameAs = probe) { (e, _) =>
      e.join(supportOf(e), Seq("x", "y"), "left")
        .filter(coalesce(col("sup"), lit(0L)) >= minSup)
        .select(col("x"), col("y"))
    }.df
    peeled.join(supportOf(peeled), Seq("x", "y"), "left")
      .select(col("x"), col("y"),
        coalesce(col("sup"), lit(0L)).as("support"))
      .orderBy(col("x"), col("y"))
  }

  /** Per-edge triangle support of an oriented (x<y) edge set: triangles
    * a<b<c enumerated once ((a,b)⋈(b,c) checked against (a,c)), each
    * crediting its three edges.
    *
    * Round 16 (r15 VERDICT #6): the per-edge credits are emitted by ONE
    * explode over the enumerated triangles instead of a 3-way unionAll —
    * the union's three branches each carried the full two-join triangle
    * subtree, so the joins (the expensive part of the round; exchange
    * reuse shares only the exchanges under them, not the join operators)
    * ran three times per round. Same credit multiset — each triangle
    * contributes exactly its three edges — so the count aggregate is
    * value-identical; the round's plan drops from 3 join subtrees to 1
    * (guide §2.4: remove duplicated passes). */
  private def supportOf(e: DataFrame): DataFrame = {
    val e1 = e.select(col("x").as("a"), col("y").as("b"))
    val e2 = e.select(col("x").as("b"), col("y").as("c"))
    val e3 = e.select(col("x").as("a"), col("y").as("c"))
    val tri = e1.join(e2, "b").join(e3, Seq("a", "c"))
    tri.select(explode(array(
        struct(col("a").as("x"), col("b").as("y")),
        struct(col("b").as("x"), col("c").as("y")),
        struct(col("a").as("x"), col("c").as("y")))).as("t"))
      .select(col("t.x").as("x"), col("t.y").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("sup"))
  }

  // ---------------------------------------------------------------- q403

  /** Greedy set cover for corpus selection: universe = every distinct
    * token bigram in the corpus; 8 greedy rounds each pick the document
    * covering the most still-uncovered bigrams (ties → smallest doc_id).
    * Per round: one anti-join + one aggregate + a one-row broadcast —
    * the lazy-greedy shape that scales with the doc-bigram table, not
    * with pairs. Output: (pick_round, doc_id, gain). */
  def q403SetCover(s: SparkSession, dir: String): DataFrame = {
    val ut = IterativeLoop.cutLazy(docBigrams(Tables.documents(s, dir)))
    // state rows: kind='cov' carries a covered bigram; kind='pick' a pick
    val init = s.range(0).select(lit("cov").as("kind"),
      lit(0L).as("pick_round"), lit(0L).as("doc_id"), lit(0L).as("gain"),
      lit("").as("bg"))
    val fin = IterativeLoop.fixed(init, 8) { (st, r) =>
      val covered = st.filter(col("kind") === "cov").select(col("bg"))
      val pick = ut.join(covered, Seq("bg"), "left_anti")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("doc_id").asc).limit(1)
      val pickRow = pick.select(lit("pick").as("kind"),
        lit(r.toLong).as("pick_round"), col("doc_id"), col("gain"),
        lit(null).cast("string").as("bg"))
      val newCov = ut
        .join(broadcast(pick.select(col("doc_id"))), Seq("doc_id"), "left_semi")
        .join(covered, Seq("bg"), "left_anti")
        .select(lit("cov").as("kind"), lit(null).cast("long").as("pick_round"),
          lit(null).cast("long").as("doc_id"), lit(null).cast("long").as("gain"),
          col("bg"))
      st.unionByName(pickRow).unionByName(newCov)
    }
    fin.filter(col("kind") === "pick")
      .select(col("pick_round"), col("doc_id"), col("gain"))
      .orderBy(col("pick_round"))
  }

  /** Distinct (doc_id, bg) token-bigram incidence (whitespace tokens,
    * mirroring q51's tokenizer). */
  private[graft] def docBigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
      .select(col("doc_id"), explode(expr(
        "zip_with(slice(ts, 1, size(ts) - 1), slice(ts, 2, size(ts) - 1)," +
          " (a, b) -> concat(a, ' ', b))")).as("bg"))
      .distinct()

  // ---------------------------------------------------------------- q404

  private[graft] val KmvK = 64

  /** KMV (k-minimum-values / theta) sketch set algebra across corpus
    * sources: per source keep the 64 smallest 40-bit md5 hashes of its
    * distinct token bigrams, then for every source pair estimate
    * |A∪B| from the merged sketch's k-th minimum and |A∩B| from the
    * shared fraction within the merged sketch — the mergeable-sketch
    * overlap planner. Every frame after the first aggregate is
    * (#sources × k)-bounded, hence broadcastable at any corpus size;
    * sketches with fewer than k values report exact counts (the KMV
    * small-set rule). */
  def q404KmvSketch(s: SparkSession, dir: String): DataFrame = {
    val k = KmvK
    val sb = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), split(col("text"), " ").as("ts"))
      .select(col("source"), explode(expr(
        "zip_with(slice(ts, 1, size(ts) - 1), slice(ts, 2, size(ts) - 1)," +
          " (a, b) -> concat(a, ' ', b))")).as("bg"))
      .select(col("source"),
        conv(substring(md5(col("bg")), 1, 10), 16, 10).cast("long").as("h"))
      .distinct()
    // per-source sketch: k smallest distinct hashes + the exact distinct
    // count (count is one more aggregate over the same shuffle key)
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"))
    val sk = sb.withColumn("rn", row_number().over(wS))
      .withColumn("nsrc", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))))
      .filter(col("rn") <= k)
      .select(col("source"), col("h"), col("nsrc"))
    val sketches = IterativeLoop.cutLazy(sk)
    val srcs = sketches.select(col("source"), col("nsrc")).distinct()
    val pairs = srcs.select(col("source").as("s1"), col("nsrc").as("n1"))
      .crossJoin(srcs.select(col("source").as("s2"), col("nsrc").as("n2")))
      .filter(col("s1") < col("s2"))
    // merged sketch per pair: k smallest of the two sketches' union,
    // each hash flagged with how many of the two sketches hold it
    val cand = pairs.select(col("s1"), col("s2"))
      .join(sketches.select(col("source").as("s1"), col("h")), Seq("s1"))
      .select(col("s1"), col("s2"), col("h"))
      .unionAll(pairs.select(col("s1"), col("s2"))
        .join(sketches.select(col("source").as("s2"), col("h")), Seq("s2"))
        .select(col("s1"), col("s2"), col("h")))
      .groupBy(col("s1"), col("s2"), col("h"))
      .agg(count(lit(1)).as("nin"))
    val wP = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s1"), col("s2")).orderBy(col("h"))
    val merged = cand.withColumn("rn", row_number().over(wP))
      .filter(col("rn") <= k)
    val agg = merged.groupBy(col("s1"), col("s2")).agg(
      count(lit(1)).as("m"),
      max(col("h")).as("hk"),
      sum(when(col("nin") === 2, 1L).otherwise(0L)).as("shared"))
    val two40 = 1099511627776L // 2^40: the hash space
    agg.join(pairs, Seq("s1", "s2"))
      .select(col("s1"), col("s2"), col("n1"), col("n2"), col("m"),
        col("hk"), col("shared"),
        when(col("m") < k, col("m").cast("double"))
          .otherwise(lit((k - 1).toDouble * two40) / col("hk").cast("double"))
          .as("union_est"),
        (col("shared").cast("double") / col("m").cast("double")).as("jacc_est"))
      .withColumn("inter_est", col("jacc_est") * col("union_est"))
      .orderBy(col("s1"), col("s2"))
  }

  // ---------------------------------------------------------------- q405

  /** Sorted-neighborhood record linkage over part names: global sort by
    * (p_name, p_partkey) via [[DistributedRank]] (range partition +
    * offset, no single-partition window), then candidates = pairs within
    * a 3-row window, materialized as a BAND equi-join on rn div 4 blocks
    * (each row joins its own and the previous block — bounded fan-out,
    * never a cartesian), scored with exact Levenshtein ≤ 20. The classic
    * blocking alternative to LSH when a meaningful sort key exists. */
  def q405SortedNeighborhood(s: SparkSession, dir: String): DataFrame = {
    val w = 3
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_name"))
    val rn = DistributedRank.withRowNumber(p, "rn", col("p_name"), col("p_partkey"))
      .withColumn("bl", expr("(rn - 1) div 4"))
    val rr = IterativeLoop.cutLazy(rn)
    val a = rr.select(col("p_partkey").as("a_key"), col("p_name").as("a_name"),
      col("rn").as("a_rn"), col("bl"))
    val b = rr.select(col("p_partkey").as("b_key"), col("p_name").as("b_name"),
      col("rn").as("b_rn"), col("bl"))
    // same-block + next-block EQUI-joins (an OR condition would plan as a
    // nested-loop join); a pair lands in exactly one of the two
    val cand = a.join(b, "bl")
      .unionByName(a.withColumn("bl", col("bl") + 1).join(b, "bl"))
      .filter(col("b_rn") - col("a_rn") >= 1 && col("b_rn") - col("a_rn") <= w)
    cand.select(col("a_key"), col("b_key"),
        (col("b_rn") - col("a_rn")).as("gap"),
        levenshtein(col("a_name"), col("b_name")).cast("long").as("lev"))
      .filter(col("lev") <= 20)
      .orderBy(col("a_key"), col("b_key"))
  }

  // ---------------------------------------------------------------- q406

  private[graft] val LcpCap = 96

  /** Longest repeated substrings off the global suffix index: LCP of
    * rank-adjacent suffixes ([[graft.text.SuffixIndex.globalRanks]] —
    * the standard LCP-array read), computed exactly up to a 96-char cap
    * (`lcp_capped` surfaces when the cap binds — the no-silent-caps
    * rule). Each suffix carries only its 96-char head, so the pair table
    * is cap-bounded per row, not text-sized. Top 25 by (lcp, doc, pos)
    * with a 40-char snippet — the exact-substring dedup diagnostic. */
  def q406LcpRepeats(s: SparkSession, dir: String): DataFrame = {
    val cap = LcpCap
    val docs = Tables.documents(s, dir)
    // the session-memoized index (one build serves q396/q397/q406/q411)
    // + the two-tier codegen'd LCP kernel (block probes then a fine
    // scan, q411's plan) — this query used to rebuild the ranks AND run
    // a 96-step per-char HOF fold per adjacent pair, and was the single
    // most expensive bench entry for it
    val ranks = graft.text.SuffixIndex.globalRanksCached(s, dir)
    val heads = IterativeLoop.cutLazy(
      ranks.join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
        .select(col("doc_id"), col("pos"), col("suffix_rank"),
          expr(s"substring(text, pos, $cap)").as("hd")))
    val aSide = heads.select(col("doc_id").as("doc_a"), col("pos").as("pos_a"),
      col("suffix_rank").as("rk"), col("hd").as("ha"))
    val bSide = heads.select(col("doc_id").as("doc_b"), col("pos").as("pos_b"),
      (col("suffix_rank") - 1).as("rk"), col("hd").as("hb"))
    CatalogAlg.withLcp(aSide.join(bSide, "rk"), "ha", "hb", cap)
      .select(col("doc_a"), col("pos_a"), col("doc_b"), col("pos_b"),
        col("lcp"), (col("lcp") === cap).as("lcp_capped"),
        substring(col("ha"), 1, 40).as("snippet"))
      .orderBy(col("lcp").desc, col("doc_a"), col("pos_a"))
      .limit(25)
  }

  // ---------------------------------------------------------------- q407

  /** Hierarchy rollup over the digit-decimation forest (ancestor =
    * decimal prefix; keys < 10 are roots) to per-node subtree size and
    * balance. Ancestors are CLOSED-FORM — every v has exactly
    * digits(v)−1 of them, materialized by one explode (≤ 18 rows per
    * key, zero iterations). Round 12 built the same pairs by repeated
    * squaring of the (v, v div 10) edge set, which composes only
    * through EXISTING intermediate keys — correct on dense key ranges,
    * silently under-counting on sparse ones (the round-13 ×10 gate
    * caught it: replica offsets leave million-shaped intermediates
    * nonexistent, the classic closure-vs-arithmetic-hierarchy trap).
    * Output: top 20 subtrees by rolled-up balance. */
  def q407TreeRollup(s: SparkSession, dir: String): DataFrame = {
    val nodes = Tables.customer(s, dir)
      .select(col("c_custkey").as("v"), cents(col("c_acctbal")).as("bal"))
    // the digit-decimation hierarchy is ARITHMETIC — every ancestor of v
    // is a decimal prefix of v, whether or not that ancestor is itself a
    // key. The round-12 squaring closure composed edges through EXISTING
    // intermediate keys only, which agrees on dense key ranges (every
    // sf dir) but silently under-counts on sparse ones (caught by the
    // round-13 ×10 gate: replica offsets make 1,000,000-shaped
    // intermediates nonexistent and the closure broke there). Closed
    // form instead: explode d = 1..digits−1, anc = prefix of length
    // len−d — ≤ 18 rows per key, ZERO iterations, strictly cheaper than
    // the old 4-round squaring join.
    val pairs = nodes.filter(col("v") >= 10)
      .select(col("v"), col("v").cast("string").as("vs"))
      .select(col("v"),
        explode(sequence(lit(1L), (length(col("vs")) - 1).cast("long"))).as("d"),
        col("vs"))
      .select(col("v"),
        expr("cast(substring(vs, 1, length(vs) - cast(d as int)) as bigint)")
          .as("anc"),
        col("d"))
    val sub = pairs.select(col("v"), col("anc"))
      .unionByName(nodes.select(col("v"), col("v").as("anc")))
    val depth = pairs.groupBy(col("v")).agg(max(col("d")).as("depth"))
    sub.join(nodes.select(col("v"), col("bal")), Seq("v"))
      .groupBy(col("anc").as("node"))
      .agg(count(lit(1)).as("n_subtree"), sum(col("bal")).as("subtree_bal"))
      .join(depth.select(col("v").as("node"), col("depth")), Seq("node"), "left")
      .select(col("node"), col("n_subtree"), col("subtree_bal"),
        coalesce(col("depth"), lit(0L)).as("depth"))
      .orderBy(col("subtree_bal").desc, col("node"))
      .limit(20)
  }

  // ---------------------------------------------------------------- q408

  /** SAX symbolization of the weekly revenue series: integer PAA (weekly
    * sums over the day grid, empty weeks = 0), empirical-quartile
    * symbols via the exact distributed rank (never ntile's
    * single-partition window), 3-symbol SAX words by week+1/week+2
    * equi-joins (the series is date-span-sized, but the join shape stays
    * an equi-join out of principle), and the discord report: weeks whose
    * word occurs ≤ 2 times. */
  def q408SaxWords(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      to_date(col("o_orderdate")).as("d"), cents(col("o_totalprice")).as("v"))
    val minD = o.agg(min(col("d")).as("d0"))
    val day = o.crossJoin(broadcast(graft.ops.Guards.scalar(minD)))
      .groupBy(datediff(col("d"), col("d0")).cast("long").as("i"))
      .agg(sum(col("v")).as("v"))
    val span = day.agg(expr("max(i) div 7").as("m")).head().getLong(0)
    val weeks = s.range(span + 1).select(col("id").as("wk"))
      .join(day.groupBy(expr("i div 7").as("wk"))
        .agg(sum(col("v")).as("sv")), Seq("wk"), "left")
      .select(col("wk"), coalesce(col("sv"), lit(0L)).as("sv"))
    val n = span + 1
    val q = DistributedRank.withRowNumber(weeks, "rn", col("sv"), col("wk"))
      .withColumn("sym", expr(s"((rn - 1) * 4) div $n") + 1)
      .select(col("wk"), col("sv"), col("sym"))
    val qq = IterativeLoop.cutLazy(q)
    val words = qq.select(col("wk"), col("sv"), col("sym"))
      .join(qq.select((col("wk") - 1).as("wk"), col("sym").as("s2")), "wk")
      .join(qq.select((col("wk") - 2).as("wk"), col("sym").as("s3")), "wk")
      .select(col("wk"), col("sv"),
        concat(col("sym"), col("s2"), col("s3")).as("word"))
    val freq = words.groupBy(col("word")).agg(count(lit(1)).as("wfreq"))
    words.join(freq, Seq("word"))
      .filter(col("wfreq") <= 2)
      .select(col("wk"), col("word"), col("wfreq"), col("sv"))
      .orderBy(col("wk"))
  }

  // ---------------------------------------------------------------- q409

  /** Dictionary / blocklist matching: the 40 most frequent token bigrams
    * (mined from the corpus itself) matched back over every document as
    * SUBSTRING patterns — per pattern, how many documents contain it and
    * how many non-overlapping occurrences exist (exact via the
    * replace-length identity). The scan is a broadcast of the
    * vocabulary-bounded dictionary against a single pass over the
    * corpus — the distributed stand-in for an Aho–Corasick pass, with
    * map-side partial aggregation collapsing to dictionary size. */
  def q409DictMatch(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val dict = docs.select(split(col("text"), " ").as("ts"))
      .select(explode(expr(
        "zip_with(slice(ts, 1, size(ts) - 1), slice(ts, 2, size(ts) - 1)," +
          " (a, b) -> concat(a, ' ', b))")).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("tok_cnt"))
      .orderBy(col("tok_cnt").desc, col("bg").asc).limit(40)
    docs.select(col("doc_id"), col("text"))
      .crossJoin(broadcast(graft.ops.Guards.bounded(dict, 40)))
      .select(col("bg"), col("tok_cnt"),
        expr("CASE WHEN instr(text, bg) > 0 THEN CAST(1 AS BIGINT)" +
          " ELSE CAST(0 AS BIGINT) END").as("hit"),
        expr("(length(text) - length(replace(text, bg, ''))) div length(bg)")
          .as("occ"))
      .groupBy(col("bg"), col("tok_cnt"))
      .agg(sum(col("hit")).as("n_docs"), sum(col("occ")).as("n_occ"))
      .orderBy(col("bg"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q402_ktruss"       -> q402Ktruss _,
    "q403_set_cover"    -> q403SetCover _,
    "q404_kmv_sketch"   -> q404KmvSketch _,
    "q405_sorted_neighborhood" -> q405SortedNeighborhood _,
    "q406_lcp_repeats"  -> q406LcpRepeats _,
    "q407_tree_rollup"  -> q407TreeRollup _,
    "q408_sax_words"    -> q408SaxWords _,
    "q409_dict_match"   -> q409DictMatch _)
}
