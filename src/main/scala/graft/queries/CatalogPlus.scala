package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Round-9 wave: operators that lean on the engine's OWN Catalyst machinery
 * (the edit-distance band optimizer rule, the DSv2 surface) plus further
 * statistics/pipeline verbs. Same determinism contract as the rest of the
 * catalog: md5-derived randomness as exact integers, exact-lg bits for
 * logarithms, fixed parenthesization on every float fold.
 */
object CatalogPlus {

  private def lg(x: Column): Column = graft.curation.Curation.lg(x)

  /** md5-prefix uniform u32 ∈ [0, 2³²) of an arbitrary string column. */
  private def u32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Blocked fuzzy entity match under the engine's edit-distance band rule
    * (Ed-Join / Gravano VLDB'01 family): deterministic corrupted probes
    * (4th character deleted from each customer name) are matched back
    * against the clean names with `levenshtein <= 1`, blocked on the
    * 4-char name suffix so the join is an EQUI join on the block key with
    * the fuzzy predicate as a residual filter. [[graft.plans.EditDistanceBandRule]]
    * rewrites that residual into a length-band short-circuit + Spark's
    * threshold-banded O(k·n) DP — the plan a fuzzy join should have at
    * 100 TB (blocking bounds candidates; the rule bounds per-pair cost). */
  def q278FuzzyNameMatch(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftPlans.ensureInjected(s)
    val cust = Tables.customer(s, dir).select(col("c_name"))
    val bkey = (c: Column) => substring(c, -4, 4)
    val probes = cust.select(
      concat(substring(col("c_name"), 1, 3), substring(col("c_name"), 5, 1000))
        .as("probe"),
      bkey(col("c_name")).as("bk")).distinct()
    val cands = cust.select(col("c_name"), bkey(col("c_name")).as("bk"))
    probes.join(cands, Seq("bk"))
      .filter(levenshtein(col("probe"), col("c_name")) <= 1)
      .groupBy(col("probe"))
      .agg(count(lit(1)).as("n_matches"), min(col("c_name")).as("first_match"))
      .orderBy(col("probe"))
  }

  /** The engine's own DSv2 source end-to-end: read `graft-synth` (see
    * [[graft.sources.SynthDocsSource]]) with a doc_id range predicate that
    * pushes into partition planning (20k of 50k ids are never generated)
    * and a projection that prunes `text` synthesis away, then aggregate.
    * The DuckDB oracle replays the md5 field-derivation contract over
    * `range(10000, 40000)` — the source's generated data IS verifiable. */
  def q279SynthSourceAgg(s: SparkSession, dir: String): DataFrame = {
    s.read.format("graft-synth")
      .option("rows", 50000L).option("seed", "g9").option("partitions", 8)
      .load()
      .filter(col("doc_id") >= 10000L && col("doc_id") < 40000L)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words").cast("long")).as("sum_words"),
        sum(col("n_chars").cast("long")).as("sum_chars"))
      .orderBy(col("lang"), col("source"))
  }

  /** Sorted-key double fold: bit-identical to the oracle's
    * `list_reduce(list_prepend(0.0, list(v ORDER BY k)))`. */
  // Round 16: the ordered fold runs as ONE codegen'd kernel
  // (graft_ordered_sum) instead of the interpreted transform+aggregate
  // HOF pair — bit-compatible per OrderedStructSum's doc (same adds in
  // the same sorted order, same int->double cast per element).
  private def foldSorted(k: Column, v: Column): Column =
    graft.functions.GraftFunctions.orderedSum(
      sort_array(collect_list(struct(k.as("k"), v.as("v")))))

  /** Murphy (1973) decomposition of the Brier score: REL − RES + UNC over
    * 10 deterministic forecast buckets (p̂ = (2b+1)∕20 with b md5-drawn
    * per doc; outcome = the doc is English). Per-bucket contributions are
    * one divide each; bucket-ascending folds make the three components
    * bit-reproducible. The map side reduces each partition to ≤10 bucket
    * rows, so the statistic costs one 10-group shuffle at any corpus
    * size — the calibration audit you run on every model release. */
  def q280BrierDecomp(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(
        pmod(u32(concat(lit("brier:"), col("doc_id").cast("string"))), lit(10L))
          .as("b"),
        (col("lang") === "en").cast("long").as("o"))
    val bk = docs.groupBy(col("b"))
      .agg(count(lit(1)).as("nk"), sum(col("o")).as("ok"))
    val pk = (e: Column) =>
      (e("b") * 2 + 1).cast("double") / lit(20.0)
    val obk = (e: Column) => e("ok").cast("double") / e("nk").cast("double")
    bk.agg(
        sort_array(collect_list(struct(col("b"), col("nk"), col("ok"))))
          .as("xs"))
      .withColumn("n", aggregate(transform(col("xs"), e => e("nk")),
        lit(0L), (a, x) => a + x))
      .withColumn("o", aggregate(transform(col("xs"), e => e("ok")),
        lit(0L), (a, x) => a + x))
      .withColumn("obar", col("o").cast("double") / col("n").cast("double"))
      .withColumn("relsum", aggregate(transform(col("xs"), e =>
          e("nk").cast("double") * ((pk(e) - obk(e)) * (pk(e) - obk(e)))),
        lit(0.0), (a, x) => a + x))
      .withColumn("ressum", aggregate(transform(col("xs"), e =>
          e("nk").cast("double") * ((obk(e) - col("obar")) * (obk(e) - col("obar")))),
        lit(0.0), (a, x) => a + x))
      .withColumn("briersum", aggregate(transform(col("xs"), e =>
          e("nk").cast("double") * (pk(e) * pk(e)) -
            lit(2.0) * pk(e) * e("ok").cast("double") + e("ok").cast("double")),
        lit(0.0), (a, x) => a + x))
      .select(col("n").as("n_docs"),
        (col("briersum") / col("n").cast("double")).as("brier"),
        (col("relsum") / col("n").cast("double")).as("reliability"),
        (col("ressum") / col("n").cast("double")).as("resolution"),
        (col("obar") * (lit(1.0) - col("obar"))).as("uncertainty"))
  }

  /** Exact ROC-AUC of `n_chars` as a score for "doc is English", via the
    * rank-sum identity AUC = (R₁ − n₁(n₁+1)∕2) ∕ (n₁n₀) with midrank tie
    * handling. Doubled ranks keep everything in int64 until the single
    * final divide. The rank window runs over the DISTINCT score frame
    * (value-grouped), not raw rows — the same trick as q85's histogram,
    * so a 100 TB corpus ranks its ~thousands of distinct lengths, not
    * its rows. */
  def q281RocAuc(s: SparkSession, dir: String): DataFrame = {
    val byv = Tables.documents(s, dir)
      .groupBy(col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"),
        sum((col("lang") === "en").cast("long")).as("p"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    byv
      .withColumn("rlo", coalesce(sum(col("c")).over(w), lit(0L)) + 1)
      // doubled midrank of the tie group: 2*rlo + c - 1 (exact integer)
      .agg(sum(col("p") * (col("rlo") * 2 + col("c") - 1)).as("r1x2"),
        sum(col("p")).as("n1"), sum(col("c")).as("n"))
      .select(col("n1"), (col("n") - col("n1")).as("n0"),
        ((col("r1x2") - col("n1") * (col("n1") + 1)).cast("double") /
          (col("n1") * (col("n") - col("n1")) * 2).cast("double")).as("auc"))
  }

  /** Bradley–Terry strength ranking (Bradley & Terry 1952; Hunter 2004 MM
    * algorithm) over event types: within each user's timeline, an event
    * "beats" the event it directly follows (typed transitions as pairwise
    * comparisons — the preference-model shape RLHF reward data takes).
    * The DISTRIBUTED work is the wins matrix (one shuffle to a ≤5×5
    * table); the 8 MM rounds π_i ← W_i ∕ Σ_j n_ij∕(π_i+π_j) run
    * driver-side with the oracle's exact fold orders (j-ascending
    * denominators, i-ascending normalization), per the q250/q266
    * d²-sized-work precedent. */
  def q282BtRank(s: SparkSession, dir: String): DataFrame = {
    val wnd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("nxt", lead(col("event_type"), 1).over(wnd))
      .filter(col("nxt").isNotNull && col("nxt") =!= col("event_type"))
    val wins = pairs.groupBy(col("nxt").as("wi"), col("event_type").as("lo"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val types = wins.keysIterator.flatMap(k => Iterator(k._1, k._2)).toSeq.distinct.sorted
    val idx = types.zipWithIndex.toMap
    val k = types.length
    val nMat = Array.tabulate(k, k) { (i, j) =>
      wins.getOrElse((types(i), types(j)), 0L) + wins.getOrElse((types(j), types(i)), 0L)
    }
    val wTot = Array.tabulate(k)(i =>
      types.indices.map(j => wins.getOrElse((types(i), types(j)), 0L)).sum)
    var pi = Array.fill(k)(0.2)
    for (_ <- 1 to 8) {
      val u = Array.tabulate(k) { i =>
        var den = 0.0; var j = 0
        while (j < k) {
          if (j != i && nMat(i)(j) > 0) den += nMat(i)(j).toDouble / (pi(i) + pi(j))
          j += 1
        }
        if (den > 0.0) wTot(i).toDouble / den else 0.0
      }
      var sSum = 0.0; var i = 0
      while (i < k) { sSum += u(i); i += 1 }
      if (sSum > 0.0) pi = u.map(_ / sSum)
    }
    import s.implicits._
    types.indices.map(i => (types(i), wTot(i), pi(i)))
      .toDF("event_type", "wins", "pi")
      .orderBy(col("event_type"))
  }

  /** Inverse-propensity-score ATE (Horvitz–Thompson 1952 / Rosenbaum &
    * Rubin 1983): treatment = user parity, covariate stratum = user_id
    * mod 5, outcome = the user's purchase count. Propensity within each
    * stratum is the exact fraction nt∕n, so each stratum's IPS term is
    * integer·integer ∕ integer with ONE divide; strata violating
    * positivity (no treated or no control) are dropped in both engines.
    * Everything reduces map-side to ≤5 stratum rows. */
  def q283IpsAte(s: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sum((col("event_type") === "purchase").cast("long")).as("y"))
      .select(col("y"), pmod(col("user_id"), lit(2L)).as("t"),
        pmod(col("user_id"), lit(5L)).as("x"))
    val strata = users.groupBy(col("x"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("nt"),
        sum(col("t") * col("y")).as("syt"),
        sum((lit(1L) - col("t")) * col("y")).as("syc"))
      .filter(col("nt") > 0 && col("nt") < col("n"))
    strata.agg(
        sort_array(collect_list(struct(col("x"), col("n"), col("nt"),
          col("syt"), col("syc")))).as("xs"))
      .withColumn("nu", aggregate(transform(col("xs"), e => e("n")),
        lit(0L), (a, v) => a + v))
      .select(col("nu").as("n_users"),
        size(col("xs")).cast("long").as("n_strata"),
        (aggregate(transform(col("xs"), e =>
            (e("syt") * e("n")).cast("double") / e("nt").cast("double") -
              (e("syc") * e("n")).cast("double") / (e("n") - e("nt")).cast("double")),
          lit(0.0), (a, v) => a + v) / col("nu").cast("double")).as("ate_ips"))
  }

  /** Difference-in-differences (Card & Krueger 1994 shape): mean purchase
    * value per {treat = user parity} × {period = before/after Jan 16}
    * cell, DiD = (T_post − T_pre) − (C_post − C_pre). Sums ride
    * DECIMAL(25,6) so the four cell means are order-independent; one
    * divide per cell; empty cells null out instead of tripping ANSI
    * division. One scan, conditional aggregation, zero joins. */
  def q284DiffInDiff(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    val p = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select((pmod(col("user_id"), lit(2L)) === 1).as("treat"),
        (col("ts") >= cut).as("post"),
        col("value").cast("decimal(25,6)").as("v"))
    def cell(t: Boolean, po: Boolean, nm: String): Seq[Column] = Seq(
      sum(when(col("treat") === t && col("post") === po, col("v"))).as(s"s_$nm"),
      count(when(col("treat") === t && col("post") === po, lit(1))).as(s"c_$nm"))
    val aggs = cell(true, false, "t_pre") ++ cell(true, true, "t_post") ++
      cell(false, false, "c_pre") ++ cell(false, true, "c_post")
    def mean(nm: String): Column =
      when(col(s"c_$nm") > 0,
        col(s"s_$nm").cast("double") / col(s"c_$nm").cast("double"))
    p.agg(aggs.head, aggs.tail: _*)
      .select(mean("t_pre").as("m_t_pre"), mean("t_post").as("m_t_post"),
        mean("c_pre").as("m_c_pre"), mean("c_post").as("m_c_post"),
        ((mean("t_post") - mean("t_pre")) - (mean("c_post") - mean("c_pre")))
          .as("did"))
  }

  /** Flesch reading-ease per language (Flesch 1948), with the standard
    * vowel-group syllable surrogate and each doc scored as one sentence:
    * 206.835 − 1.015·words − 84.6·(syllables∕words). Per-doc scores are
    * three multiplies and a divide; per-language means fold doc-ascending
    * so the hash is stable. Everything is a narrow map + one small-key
    * aggregate — the quality-scoring family's readability leg. */
  def q285FleschReading(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("w"),
        regexp_count(col("text"), lit("[aeiouy]+")).cast("long").as("syl"))
      .withColumn("score",
        lit(206.835) - lit(1.015) * col("w").cast("double") -
          lit(84.6) * (col("syl").cast("double") / col("w").cast("double")))
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("sw"),
        sum(col("syl")).as("ss"),
        foldSorted(col("doc_id"), col("score")).as("scsum"))
      .select(col("lang"), col("n_docs"),
        (col("sw").cast("double") / col("n_docs").cast("double"))
          .as("mean_words"),
        (col("ss").cast("double") / col("sw").cast("double"))
          .as("syl_per_word"),
        (col("scsum") / col("n_docs").cast("double")).as("mean_flesch"))
      .orderBy(col("lang"))
  }

  /** Index of dispersion (variance-to-mean ratio) of daily event counts
    * per type — the Poisson overdispersion check (D ≈ 1 under Poisson;
    * D ≫ 1 ⟹ bursty/clumped traffic, the q221 Fano factor's time-series
    * sibling). Variance and the D > 2 flag stay in EXACT int64
    * (cross-multiplied comparison, no float threshold); one divide for
    * each emitted double. Day-grain pre-aggregation bounds the window at
    * 365·types rows a year regardless of event volume. */
  def q286DispersionIndex(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("s1"),
        sum(col("c") * col("c")).as("s2"))
      .filter(col("n_days") > 1)
      .select(col("event_type"), col("n_days"),
        (col("s1").cast("double") / col("n_days").cast("double"))
          .as("mean_daily"),
        ((col("n_days") * (col("n_days") * col("s2") - col("s1") * col("s1")))
          .cast("double") /
          (col("n_days") * (col("n_days") - 1) * col("s1")).cast("double"))
          .as("dispersion"),
        (col("n_days") * (col("n_days") * col("s2") - col("s1") * col("s1")) >
          col("n_days") * (col("n_days") - 1) * col("s1") * 2)
          .as("overdispersed"))
      .orderBy(col("event_type"))
  }

  /** Pairwise Jensen–Shannon divergence between source unigram
    * distributions, in exact-lg bits (Lin 1991): with integer counts
    * aᵢ∕A and bᵢ∕B, each token's contribution needs only lg of INTEGER
    * products — lg(2aᵢB) − lg(aᵢB + bᵢA) — so the whole symmetric
    * drift matrix replays exactly. Folds run token-ascending per pair.
    * Counts reduce map-side to |sources|·|vocab| rows; the pair grid is
    * sources², both corpus-independent. The q115 KL monitor's symmetric,
    * bounded (≤1 bit) sibling. */
  def q287JsdSources(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val tot = tok.groupBy(col("source")).agg(sum(col("c")).as("nn"))
    val vocab = tok.select(col("tok")).distinct()
    val pairs = tot.select(col("source").as("s1"), col("nn").as("na"))
      .crossJoin(tot.select(col("source").as("s2"), col("nn").as("nb")))
      .filter(col("s1") < col("s2"))
    val grid = pairs.crossJoin(vocab)
      .join(tok.select(col("source").as("s1"), col("tok"), col("c").as("a")),
        Seq("s1", "tok"), "left")
      .join(tok.select(col("source").as("s2"), col("tok"), col("c").as("b")),
        Seq("s2", "tok"), "left")
      .select(col("s1"), col("s2"), col("tok"), col("na"), col("nb"),
        coalesce(col("a"), lit(0L)).as("a"), coalesce(col("b"), lit(0L)).as("b"))
      .filter(col("a") + col("b") > 0)
      .withColumn("mix", col("a") * col("nb") + col("b") * col("na"))
      .withColumn("contrib",
        when(col("a") > 0,
          (col("a").cast("double") / col("na").cast("double")) *
            (lg(col("a") * col("nb") * 2) - lg(col("mix")))).otherwise(lit(0.0)) +
        when(col("b") > 0,
          (col("b").cast("double") / col("nb").cast("double")) *
            (lg(col("b") * col("na") * 2) - lg(col("mix")))).otherwise(lit(0.0)))
    grid.groupBy(col("s1"), col("s2"))
      .agg((foldSorted(col("tok"), col("contrib")) * lit(0.5)).as("jsd_bits"))
      .orderBy(col("s1"), col("s2"))
  }

  /** Cohen's κ (Cohen 1960) between the stored language label and the
    * engine's marker-token language-ID (q22): chance-corrected agreement
    * κ = (N·agree − Σ rmₗ·cmₗ) ∕ (N² − Σ rmₗ·cmₗ) in EXACT int64 with
    * one divide — the inter-annotator reliability readout that tells you
    * whether an auto-labeler is usable. Marginals are a 5-row aggregate;
    * the confusion reduction is one small-key shuffle. */
  def q288LangKappa(s: SparkSession, dir: String): DataFrame = {
    val pred = CatalogExt.q22LangId(s, dir)
      .select(col("lang"), col("predicted_lang"))
    val cells = pred.groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
    val rm = cells.groupBy(col("lang")).agg(sum(col("n")).as("rm"))
    val cm = cells.groupBy(col("predicted_lang")).agg(sum(col("n")).as("cm"))
    val chance = rm.join(cm, rm("lang") === cm("predicted_lang"), "inner")
      .agg(sum(col("rm") * col("cm")).as("sumrc"))
    val base = cells.agg(sum(col("n")).as("n_docs"),
      sum(when(col("lang") === col("predicted_lang"), col("n"))
        .otherwise(lit(0L))).as("agree"))
    base.crossJoin(broadcast(graft.ops.Guards.scalar(chance)))
      .select(col("n_docs"), col("agree"),
        (col("agree").cast("double") / col("n_docs").cast("double")).as("p_o"),
        (col("sumrc").cast("double") /
          (col("n_docs") * col("n_docs")).cast("double")).as("p_e"),
        ((col("n_docs") * col("agree") - col("sumrc")).cast("double") /
          (col("n_docs") * col("n_docs") - col("sumrc")).cast("double"))
          .as("kappa"))
  }

  /** Holt linear-trend exponential smoothing (Holt 1957) of the daily
    * event series, α = 1∕2, β = 1∕4 — level/trend/one-step forecast per
    * day. The DISTRIBUTED work is the day-grain count (365 rows/year no
    * matter the event volume); the inherently sequential recurrence runs
    * driver-side over the collected day series with exactly the oracle's
    * recursive-CTE arithmetic (q250/q282 precedent for state-sized
    * loops). Exactly-representable smoothing weights keep every double
    * reproducible. */
  def q289HoltLinear(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("ds"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("ds"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val out = Array.newBuilder[(Long, String, Long, Double, Double, Option[Double])]
    var l = 0.0; var t = 0.0
    daily.zipWithIndex.foreach { case ((ds, c), i0) =>
      val i = i0 + 1L
      if (i == 1L) {
        l = c.toDouble; t = 0.0
        out += ((i, ds, c, l, t, None))
      } else {
        val fcst = l + t
        val lNew = 0.5 * c.toDouble + 0.5 * (l + t)
        val tNew = 0.25 * (lNew - l) + 0.75 * t
        l = lNew; t = tNew
        out += ((i, ds, c, l, t, Some(fcst)))
      }
    }
    import s.implicits._
    out.result().toSeq.toDF("i", "ds", "c", "level", "trend", "fcst")
      .orderBy(col("i"))
  }

  /** Gradient-boosted regression stumps (Friedman 2001), 3 rounds at
    * learning rate 1∕2, squared loss, predicting "doc is English" from
    * n_chars over a fixed 9-threshold grid. The scan reduces to ≤20
    * (grid-cell, label) count rows — the sufficient statistics — so each
    * boosting round is driver math over exact integer counts (residuals
    * per cell are finitely many doubles, folded cell-ascending; the
    * oracle unrolls all 3 rounds in CTEs). Split choice = min (SSE,
    * threshold); leaf values are η·mean(residual). The in-engine training
    * story q123/q261 started, extended to an ensemble. */
  def q290BoostedStumps(s: SparkSession, dir: String): DataFrame = {
    val thr = Array(100L, 150L, 200L, 250L, 300L, 350L, 400L, 450L, 500L)
    val cellOf = thr.foldLeft(lit(0L)) { (acc, t) =>
      acc + (col("n_chars") > t).cast("long")
    }
    // sufficient statistics: exact counts per (grid cell, label)
    val cells = Tables.documents(s, dir)
      .select(cellOf.as("cell"), (col("lang") === "en").cast("long").as("y"))
      .groupBy(col("cell"), col("y")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(c => (c._1, c._2))
    val nTot = cells.map(_._3).sum
    val yTot = cells.map(c => c._2 * c._3).sum
    var f = Map.empty[Long, Double].withDefaultValue(yTot.toDouble / nTot.toDouble)
    val fv = (cell: Long) => f(cell)
    val rounds = Array.newBuilder[(Long, Long, Double, Double, Double)]
    for (k <- 1 to 3) {
      // residual per cell-label row, then candidate stats via ordered folds
      val rs = cells.map { case (cell, y, cnt) => (cell, y, cnt, y.toDouble - fv(cell)) }
      var ss = 0.0; var stot = 0.0
      rs.foreach { case (_, _, cnt, r) => ss += cnt.toDouble * (r * r); stot += cnt.toDouble * r }
      var best: Option[(Double, Int, Double, Double)] = None
      for (ci <- 1 to 9) {
        var sl = 0.0; var cl = 0L
        rs.foreach { case (cell, _, cnt, r) =>
          if (cell < ci) { sl += cnt.toDouble * r; cl += cnt }
        }
        val cr = nTot - cl
        if (cl > 0 && cr > 0) {
          val sr = stot - sl
          val sse = ss - ((sl * sl) / cl.toDouble + (sr * sr) / cr.toDouble)
          if (best.isEmpty || sse < best.get._1) {
            val vl = 0.5 * (sl / cl.toDouble)
            val vr = 0.5 * (sr / cr.toDouble)
            best = Some((sse, ci, vl, vr))
          }
        }
      }
      val (sse, ci, vl, vr) = best.get
      val fPrev = f
      f = Map.empty[Long, Double].withDefault { cell =>
        fPrev(cell) + (if (cell < ci) vl else vr)
      }
      rounds += ((k.toLong, thr(ci - 1), vl, vr, sse))
    }
    import s.implicits._
    rounds.result().toSeq
      .toDF("round", "threshold", "left_val", "right_val", "sse")
      .orderBy(col("round"))
  }

  /** Nearest-neighbor covariate matching WITH replacement (Abadie &
    * Imbens 2006): every treated user (parity 1) matches the control in
    * its stratum with the closest total-activity covariate (ties by
    * control id), ATT = mean(y_t − y_match) in exact int64 with one
    * divide. Blocking on the stratum bounds candidate pairs; at corpus
    * scale the same semantics run as a sort-merge as-of pass per
    * stratum. Matching-with-replacement keeps the estimator
    * order-independent — greedy without-replacement matching is
    * sequence-dependent and can't be a deterministic set operator. */
  def q291MatchAtt(s: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("ne"),
        sum((col("event_type") === "purchase").cast("long")).as("y"))
      .select(col("user_id"), col("ne"), col("y"),
        pmod(col("user_id"), lit(2L)).as("t"),
        pmod(col("user_id"), lit(5L)).as("x"))
    val treated = users.filter(col("t") === 1)
      .select(col("x"), col("user_id").as("tu"), col("ne").as("tne"),
        col("y").as("ty"))
    val control = users.filter(col("t") === 0)
      .select(col("x"), col("user_id").as("cu"), col("ne").as("cne"),
        col("y").as("cy"))
    val w = Window.partitionBy(col("tu"))
      .orderBy(abs(col("tne") - col("cne")), col("cu"))
    treated.join(control, Seq("x"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .agg(count(lit(1)).as("n_treated"),
        sum(col("ty")).as("syt"), sum(col("cy")).as("sym"))
      .select(col("n_treated"),
        (col("syt").cast("double") / col("n_treated").cast("double"))
          .as("mean_treated"),
        (col("sym").cast("double") / col("n_treated").cast("double"))
          .as("mean_matched"),
        ((col("syt") - col("sym")).cast("double") /
          col("n_treated").cast("double")).as("att"))
  }

  /** Burrows' Delta (Burrows 2002) between source pairs: z-score each
    * token's relative frequency across the source population, Delta =
    * mean |z₁ − z₂| over tokens with positive spread — the stylometric
    * distance that attributes authorship and here fingerprints template
    * drift between corpus slices. All folds are source- then
    * token-ascending; frequencies are one divide each; population sd is
    * one sqrt (IEEE-exact). The per-source profile is vocab-sized. */
  def q292BurrowsDelta(s: SparkSession, dir: String): DataFrame = {
    val tc = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val tot = tc.groupBy(col("source")).agg(sum(col("c")).as("nn"))
    val vocab = tc.select(col("tok")).distinct()
    val grid = tot.crossJoin(vocab)
      .join(tc, Seq("source", "tok"), "left")
      .select(col("source"), col("tok"),
        (coalesce(col("c"), lit(0L)).cast("double") /
          col("nn").cast("double")).as("f"))
    val nSrc = grid.select(col("source")).distinct().count()
    val stats = grid.groupBy(col("tok"))
      .agg(foldSorted(col("source"), col("f")).as("sf"))
      .withColumn("mu", col("sf") / lit(nSrc.toDouble))
    val zs = grid.join(stats.select(col("tok"), col("mu")), Seq("tok"))
      .groupBy(col("tok"), col("mu"))
      .agg(foldSorted(col("source"), (col("f") - col("mu")) * (col("f") - col("mu")))
        .as("sq"))
      .select(col("tok"), col("mu"),
        sqrt(col("sq") / lit((nSrc - 1).toDouble)).as("sd"))
      .filter(col("sd") > 0)
    val z = grid.join(zs, Seq("tok"))
      .select(col("source"), col("tok"), ((col("f") - col("mu")) / col("sd")).as("z"))
    val pairs = z.select(col("source").as("s1"), col("tok"), col("z").as("z1"))
      .join(z.select(col("source").as("s2"), col("tok"), col("z").as("z2")),
        Seq("tok"))
      .filter(col("s1") < col("s2"))
    pairs.groupBy(col("s1"), col("s2"))
      .agg((foldSorted(col("tok"), abs(col("z1") - col("z2"))) /
        count(lit(1)).cast("double")).as("delta"))
      .orderBy(col("s1"), col("s2"))
  }

  /** McNemar's paired test (McNemar 1947) between two auto-labelers on
    * the binary "is English" task — the q22 marker classifier vs the
    * cruder s_en ≥ 2 vote — χ² = (b−c)² ∕ (b+c) from the EXACT discordant
    * counts (b: only A right, c: only B right). The readout that says
    * whether a labeler upgrade actually changed decisions, not just
    * aggregate accuracy. One scan over the q22 leg, one divide. */
  def q293McnemarLabelers(s: SparkSession, dir: String): DataFrame = {
    val scored = CatalogExt.q22LangId(s, dir)
      .select((col("lang") === "en").as("truth"),
        (col("predicted_lang") === "en").as("pa"),
        (col("s_en") >= 2).as("pb"))
      .select((col("pa") === col("truth")).cast("long").as("ca"),
        (col("pb") === col("truth")).cast("long").as("cb"))
    scored.agg(
        sum(col("ca") * (lit(1L) - col("cb"))).as("b"),
        sum(col("cb") * (lit(1L) - col("ca"))).as("c"))
      .select(col("b"), col("c"),
        when(col("b") + col("c") > 0,
          ((col("b") - col("c")) * (col("b") - col("c"))).cast("double") /
            (col("b") + col("c")).cast("double")).as("chi2"),
        when(col("b") + col("c") > 0,
          ((col("b") - col("c")) * (col("b") - col("c"))).cast("double") /
            (col("b") + col("c")).cast("double") > 3.841458820694124)
          .as("significant"))
  }

  /** Cumulative gains / precision-recall curve of the n_chars score for
    * "doc is English", computed on the DISTINCT-score frame (q281's AUC
    * companion): for every distinct score v, the exact count and
    * positives at-or-above v, recall = TP∕P and precision = TP∕n. The
    * curve a threshold picker reads; value-grouping keeps the window
    * over ~hundreds of distinct lengths regardless of corpus size. */
  def q294GainsCurve(s: SparkSession, dir: String): DataFrame = {
    val byv = Tables.documents(s, dir)
      .groupBy(col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"),
        sum((col("lang") === "en").cast("long")).as("p"))
    val w = Window.orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byv
      .select(col("v"), sum(col("c")).over(w).as("cum_n"),
        sum(col("p")).over(w).as("cum_pos"))
      .crossJoin(broadcast(graft.ops.Guards.scalar(byv.agg(sum(col("p")).as("ptot")))))
      .select(col("v"), col("cum_n"), col("cum_pos"),
        (col("cum_pos").cast("double") / col("ptot").cast("double"))
          .as("cum_recall"),
        (col("cum_pos").cast("double") / col("cum_n").cast("double"))
          .as("cum_prec"))
      .orderBy(col("v").desc)
  }

  /** The custom sort-merge as-of join PHYSICAL operator end-to-end
    * ([[graft.plans.AsofJoinExec]] via [[graft.plans.AsofJoinOp]]): every
    * view event enriched with the user's most recent purchase value at or
    * before the view. The right side is pre-aggregated to one row per
    * (user, ts) so the as-of pick is deterministic; the oracle is
    * DuckDB's NATIVE `ASOF LEFT JOIN` — two independent as-of
    * implementations agreeing hash-for-hash. Plan: one exchange+sort per
    * side, single forward merge, no window, no union. */
  def q295AsofExec(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purch = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("r_user"), col("ts").as("r_ts"))
      .agg(sum(col("value").cast("decimal(25,6)")).cast("double").as("r_value"))
    graft.plans.AsofJoinOp.asofJoin(views, purch,
        Seq("user_id"), Seq("r_user"), "ts", "r_ts")
      .select(col("event_id"), col("r_value").as("last_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** word2vec-style negative-sampling table (Mikolov et al. 2013): token
    * weights tempered by the ¾ power, w = c ∕ ⁴√c — computed as two
    * IEEE-exact sqrts on the exact integer count, so the whole table
    * replays bit-for-bit (libm pow would not). Emits weight, probability
    * and the cumulative boundary an alias/bisection sampler consumes.
    * Vocab-sized output; the only corpus-scale work is the token count. */
  def q296NegSampling(s: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("weight",
        col("cnt").cast("double") / sqrt(sqrt(col("cnt").cast("double"))))
    val z = cnt.agg(foldSorted(col("tok"), col("weight")).as("z"))
    val w = Window.orderBy(col("tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cnt.crossJoin(broadcast(graft.ops.Guards.scalar(z)))
      .select(col("tok"), col("cnt"), col("weight"),
        (col("weight") / col("z")).as("prob"),
        (sum(col("weight")).over(w) / col("z")).as("cum_prob"))
      .orderBy(col("tok"))
  }

  /** Expected steps to conversion: hitting time of the absorbing
    * 'purchase' state under the empirical event-transition chain
    * (absorbing Markov chain; q266's removal-effect sibling), via 12
    * Jacobi rounds h_i ← 1 + Σ_j c_ij·h_j ∕ c_i with h_purchase ≡ 0 —
    * every round replayed by the oracle. The distributed work is the
    * ≤|types|² transition count; the iteration is state-sized driver
    * math with j-ascending folds (q282/q250 precedent). */
  def q297HittingTime(s: SparkSession, dir: String): DataFrame = {
    val wnd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("nxt", lead(col("event_type"), 1).over(wnd))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val states = trans.keysIterator.flatMap(k => Iterator(k._1, k._2))
      .toSeq.distinct.sorted
    val rowTot = states.map(st =>
      st -> states.map(d => trans.getOrElse((st, d), 0L)).sum).toMap
    var h = states.map(_ => 0.0).toArray
    val idx = states.zipWithIndex.toMap
    for (_ <- 1 to 12) {
      val hNew = states.map { st =>
        if (st == "purchase" || rowTot(st) == 0L) 0.0
        else {
          var acc = 0.0
          states.foreach { d =>
            val c = trans.getOrElse((st, d), 0L)
            if (c > 0) acc += c.toDouble * h(idx(d))
          }
          1.0 + acc / rowTot(st).toDouble
        }
      }.toArray
      h = hNew
    }
    import s.implicits._
    states.map(st => (st, rowTot(st), h(idx(st))))
      .toDF("event_type", "out_transitions", "exp_steps_to_purchase")
      .orderBy(col("event_type"))
  }

  /** Cochran–Armitage trend test (Armitage 1955): is purchase propensity
    * monotone in the ordered exposure strata (user_id mod 5 as dose
    * score)? Z² = N·A² ∕ (R(N−R)(N·Σs²n − (Σsn)²)) with
    * A = N·Σsr − R·Σsn — EVERYTHING exact int64 up to the single final
    * divide, the trend audit a dose-bucketed A/B rollout reads. One
    * user-grain aggregate, then a 5-row reduction. */
  def q298CochranArmitage(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.events(s, dir)
      .groupBy(col("user_id"))
      // heavy-buyer outcome (≥14 purchases, near the per-user mean): the
      // any-purchase indicator saturates at R = N and zeroes the variance
      .agg((sum((col("event_type") === "purchase").cast("long")) >= 14)
        .cast("long").as("r"))
      .select(pmod(col("user_id"), lit(5L)).as("sc"), col("r"))
      .groupBy(col("sc"))
      .agg(count(lit(1)).as("n"), sum(col("r")).as("rr"))
    g.agg(sum(col("n")).as("nn"), sum(col("rr")).as("rt"),
        sum(col("sc") * col("rr")).as("ssr"),
        sum(col("sc") * col("n")).as("ssn"),
        sum(col("sc") * col("sc") * col("n")).as("ss2n"))
      .select(col("nn").as("n_users"), col("rt").as("r_total"),
        ((col("nn") * ((col("nn") * col("ssr") - col("rt") * col("ssn")) *
          (col("nn") * col("ssr") - col("rt") * col("ssn")))).cast("double") /
          (col("rt") * (col("nn") - col("rt")) *
            (col("nn") * col("ss2n") - col("ssn") * col("ssn"))).cast("double"))
          .as("z2"),
        (((col("nn") * ((col("nn") * col("ssr") - col("rt") * col("ssn")) *
          (col("nn") * col("ssr") - col("rt") * col("ssn")))).cast("double") /
          (col("rt") * (col("nn") - col("rt")) *
            (col("nn") * col("ss2n") - col("ssn") * col("ssn"))).cast("double"))
          > 3.841458820694124).as("significant"))
  }

  /** Kruskal–Wallis H (Kruskal & Wallis 1952): the rank-based one-way
    * ANOVA across languages on doc length — q272's nonparametric
    * complement, valid under the heavy tails q251 diagnosed. Midranks
    * come from the DISTINCT-value frame (doubled to stay integer);
    * per-group rank sums are exact int64; the tie correction is the
    * exact-integer (N³−N) form, applied as multiply-before-divide.
    * Window over distinct lengths, not rows — corpus-size-proof. */
  def q299KruskalWallis(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("lang"), col("n_chars").as("v"))
    val byv = docs.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val ranked = byv
      .withColumn("rlo", coalesce(sum(col("c")).over(w), lit(0L)) + 1)
      .select(col("v"), col("c"), (col("rlo") * 2 + col("c") - 1).as("ar2"),
        (col("c") * col("c") * col("c") - col("c")).as("tie3"))
    val grp = docs.groupBy(col("lang"), col("v")).agg(count(lit(1)).as("gc"))
      .join(ranked, Seq("v"))
      .groupBy(col("lang"))
      .agg(sum(col("gc")).as("ng"), sum(col("gc") * col("ar2")).as("r2"))
      .select(col("lang"), col("ng"), col("r2"))
    val tots = ranked.agg(sum(col("c")).as("nn"), sum(col("tie3")).as("s3"))
    grp.agg(sort_array(collect_list(struct(col("lang"), col("ng"), col("r2"))))
        .as("xs"))
      .crossJoin(broadcast(graft.ops.Guards.scalar(tots)))
      .withColumn("sumr", aggregate(transform(col("xs"), e =>
          ((e("r2").cast("double") / lit(2.0)) * (e("r2").cast("double") / lit(2.0)))
            / e("ng").cast("double")),
        lit(0.0), (a, x) => a + x))
      .withColumn("h",
        lit(12.0) / (col("nn") * (col("nn") + 1)).cast("double") * col("sumr")
          - lit(3.0) * (col("nn") + 1).cast("double"))
      .select(col("nn").as("n_docs"),
        size(col("xs")).cast("long").as("n_groups"), col("h"),
        (col("h") *
          (col("nn") * col("nn") * col("nn") - col("nn")).cast("double") /
          (col("nn") * col("nn") * col("nn") - col("nn") - col("s3"))
            .cast("double")).as("h_tie_corrected"))
  }

  /** The engine eats its own synthetic corpus: the DSv2 graft-synth
    * source (50k generated docs, zero storage) through the curation
    * verbs — a length gate, exact text-fingerprint dedup keeping each
    * text's first doc_id, and the per-(lang, source) factory report
    * (kept counts, dup rate, surviving tokens). The oracle replays the
    * generator contract over range(50000) and dedups on the
    * (n_words, digit-prefix) key, which is EQUIVALENT to text equality
    * because digit→word is injective — so the whole pipeline, source
    * included, is hash-verified without materializing text in SQL. */
  def q300SynthCuration(s: SparkSession, dir: String): DataFrame = {
    def src = s.read.format("graft-synth")
      .option("rows", 50000L).option("seed", "g9c").option("partitions", 8)
      .load()
    // second overlapping read = a re-ingested shard: 20k exact duplicates
    // (and its doc_id predicate pushes into the source's partition planning)
    val raw = src.unionByName(src.filter(col("doc_id") < 20000L))
    val gated = raw.filter(col("n_words") >= 10 && col("n_words") <= 30)
    val keepW = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val dedup = gated
      .withColumn("fp", md5(col("text")))
      .withColumn("rk", row_number().over(keepW))
    dedup.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_gated"),
        sum((col("rk") === 1).cast("long")).as("n_unique"),
        sum(when(col("rk") === 1, col("n_words")).otherwise(lit(0L)))
          .as("tokens_kept"))
      .select(col("lang"), col("source"), col("n_gated"), col("n_unique"),
        ((col("n_gated") - col("n_unique")).cast("double") /
          col("n_gated").cast("double")).as("dup_rate"),
        col("tokens_kept"))
      .orderBy(col("lang"), col("source"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q278_fuzzy_name_match" -> q278FuzzyNameMatch _,
    "q279_synth_source_agg" -> q279SynthSourceAgg _,
    "q280_brier_decomp"     -> q280BrierDecomp _,
    "q281_roc_auc"          -> q281RocAuc _,
    "q282_bt_rank"          -> q282BtRank _,
    "q283_ips_ate"          -> q283IpsAte _,
    "q284_diff_in_diff"     -> q284DiffInDiff _,
    "q285_flesch_reading"   -> q285FleschReading _,
    "q286_dispersion_index" -> q286DispersionIndex _,
    "q287_jsd_sources"      -> q287JsdSources _,
    "q288_lang_kappa"       -> q288LangKappa _,
    "q289_holt_linear"      -> q289HoltLinear _,
    "q290_boosted_stumps"   -> q290BoostedStumps _,
    "q291_match_att"        -> q291MatchAtt _,
    "q292_burrows_delta"    -> q292BurrowsDelta _,
    "q293_mcnemar_labelers" -> q293McnemarLabelers _,
    "q294_gains_curve"      -> q294GainsCurve _,
    "q295_asof_exec"        -> q295AsofExec _,
    "q296_neg_sampling"     -> q296NegSampling _,
    "q297_hitting_time"     -> q297HittingTime _,
    "q298_cochran_armitage" -> q298CochranArmitage _,
    "q299_kruskal_wallis"   -> q299KruskalWallis _,
    "q300_synth_curation"   -> q300SynthCuration _)
}
