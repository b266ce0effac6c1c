package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Round-9 wave 11 (mini): curation-planning verbs — the questions a data
 * lead asks BEFORE running the big dedup/rebalance jobs. Sampled dedup
 * savings curve (what would near-dedup buy at each threshold?),
 * importance resampling to a target mixture (deterministic md5
 * acceptance), dyadic freshness decay (exact powers of two, no exp()),
 * a partition-column advisor (cardinality × skew), and tokenizer
 * fertility by language. Determinism contract unchanged.
 */
object CatalogCur {

  private def u32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Sampled dedup-savings curve: on a deterministic md5 bottom-200
    * sample, exact token-set Jaccard for all sample pairs via the
    * inverted-index join (shared-token counts, |A∪B| by inclusion-
    * exclusion — zero floats until the final ratio), then for each
    * threshold τ ∈ {50..90} the keep-first savings: docs whose id is the
    * LARGER side of any pair ≥ τ are dropped. Answers "what would
    * near-dedup buy?" for a 100 TB corpus at sample cost — the sizing
    * step before committing to the full q26/q59 pipeline. */
  def q381DedupSavings(s: SparkSession, dir: String): DataFrame = {
    val sample = Tables.documents(s, dir)
      .withColumn("pri", u32(concat(lit("ds:"), col("doc_id"))))
      .orderBy(col("pri"), col("doc_id")).limit(200)
      .select(col("doc_id"), col("text"), col("n_chars"))
    val toks = sample
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " ")))
        .as("tok"))
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val pairs = toks.alias("a").join(toks.alias("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("i"), col("sz").as("szi")), Seq("i"))
      .join(sizes.select(col("doc_id").as("j"), col("sz").as("szj")), Seq("j"))
      .select(col("i"), col("j"),
        (col("inter") * 100L).as("num"),
        (col("szi") + col("szj") - col("inter")).as("un"))
    val chars = sample.select(col("doc_id"), col("n_chars"))
    val tot = sample.agg(count(lit(1)).as("n_sample"),
      sum(col("n_chars")).as("sample_chars"))
    (5 to 9).map { t =>
      val thr = t * 10
      val removed = pairs.filter(col("num") >= col("un") * thr)
        .select(col("j").as("doc_id")).distinct()
      removed.join(chars, Seq("doc_id"))
        .agg(count(lit(1)).as("n_removed"),
          coalesce(sum(col("n_chars")), lit(0L)).as("chars_removed"))
        .crossJoin(broadcast(graft.ops.Guards.scalar(tot)))
        .select(lit(thr.toLong).as("threshold_pct"), col("n_sample"),
          col("n_removed"),
          (col("chars_removed").cast("double")
            / col("sample_chars").cast("double")).as("savings_share"))
    }.reduce(_ unionByName _).orderBy(col("threshold_pct"))
  }

  /** Importance resampling to a uniform source mixture: target per-source
    * count t = ⌊n∕n_sources⌋; doc accepted iff u32·nₛ < t·2³² (the exact
    * integer form of u < t∕nₛ, capped at 1 automatically since
    * over-target sources get ratios < 1 and under-target sources accept
    * everything). Output: per-source before/after vs target — the
    * rebalancing audit behind q70's √-tempering. */
  def q382ImportanceResample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        u32(concat(lit("ir:"), col("doc_id"))).as("u"))
    val bySrc = docs.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val tot = bySrc.agg(sum(col("ns")).as("n"), count(lit(1)).as("k"))
    val target = tot.select(expr("n div k").as("t"))
    docs.join(bySrc, Seq("source")).crossJoin(broadcast(graft.ops.Guards.scalar(target)))
      .withColumn("accept",
        (col("u") * col("ns") < col("t") * 4294967296L).cast("long"))
      .groupBy(col("source"))
      .agg(max(col("ns")).as("n_before"), sum(col("accept")).as("n_after"),
        max(col("t")).as("n_target"))
      .select(col("source"), col("n_before"), col("n_after"), col("n_target"),
        (col("n_after").cast("double") / col("n_target").cast("double"))
          .as("achieved_ratio"))
      .orderBy(col("source"))
  }

  /** Dyadic freshness decay: weight = 2^{−⌊age_days∕7⌋} — EXACT powers
    * of two (scaled to integers by 2^{max_k}, one divide at the end), no
    * exp() to diverge between engines. Decay-weighted event counts per
    * type answer "what does the corpus look like to a recency-weighted
    * consumer" with zero float accumulation error. */
  def q383FreshnessDecay(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type").as("t"), to_date(col("ts")).as("d"))
    val mx = ev.agg(max(col("d")).as("md"))
    val weighted = ev.crossJoin(broadcast(graft.ops.Guards.scalar(mx)))
      .select(col("t"), expr("datediff(md, d) div 7").as("k"))
    val maxK = weighted.agg(max(col("k")).as("mk"))
    weighted.crossJoin(broadcast(graft.ops.Guards.scalar(maxK)))
      .select(col("t"),
        expr("shiftleft(cast(1 as bigint), cast(mk - k as int))").as("w"),
        col("mk"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_events"), sum(col("w")).as("w_scaled"),
        max(col("mk")).as("mk"))
      .select(col("t").as("event_type"), col("n_events"),
        (col("w_scaled").cast("double")
          / expr("shiftleft(cast(1 as bigint), cast(mk as int))")
            .cast("double")).as("decayed_count"))
      .orderBy(col("event_type"))
  }

  /** Partition-column advisor: for each candidate partition key of the
    * orders table (month, custkey mod 64, order priority), the facts a
    * layout planner needs — cardinality, largest-partition share, skew
    * ratio (max∕mean) — and a verdict: candidates are RANKED by closeness
    * of cardinality to the 128-file target with a skew penalty, all in
    * exact integer/rational arithmetic. The advisor half of q232's
    * compaction planner. */
  def q384PartitionAdvisor(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def stats(name: String, key: Column): DataFrame = {
      val g = o.groupBy(key.as("k")).agg(count(lit(1)).as("c"))
      g.agg(count(lit(1)).as("card"), sum(col("c")).as("n"),
          max(col("c")).as("mx"))
        .select(lit(name).as("candidate"), col("card"), col("n"),
          (col("mx").cast("double") / col("n").cast("double"))
            .as("max_share"),
          (col("mx").cast("double")
            * col("card").cast("double") / col("n").cast("double"))
            .as("skew_ratio"),
          // |card − 128| · skew_ratio: smaller is better
          (abs(col("card") - 128).cast("double")
            * (col("mx").cast("double") * col("card").cast("double")
              / col("n").cast("double"))).as("penalty"))
    }
    val all = Seq(
      stats("order_month", date_format(col("o_orderdate"), "yyyy-MM")),
      stats("custkey_mod64", col("o_custkey") % 64),
      stats("order_priority", col("o_orderpriority")))
      .reduce(_ unionByName _)
    all.withColumn("rank", row_number().over(
        Window.orderBy(col("penalty"), col("candidate"))).cast("long"))
      .orderBy(col("rank"))
  }

  /** Tokenizer fertility by language: characters per whitespace token and
    * per-language shares — the first number a tokenizer owner checks per
    * locale before training (high fertility = wasteful encoding). One
    * divide per language over exact int64 sums. */
  def q385Fertility(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("lang"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val tot = d.agg(sum(col("n_tokens")).as("tt"))
    d.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"),
        sum(col("n_tokens")).as("tokens"))
      .crossJoin(broadcast(graft.ops.Guards.scalar(tot)))
      .select(col("lang"), col("n_docs"), col("tokens"),
        (col("chars").cast("double") / col("tokens").cast("double"))
          .as("chars_per_token"),
        (col("tokens").cast("double") / col("tt").cast("double"))
          .as("token_share"))
      .orderBy(col("lang"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q381_dedup_savings"    -> q381DedupSavings _,
    "q382_importance_resample" -> q382ImportanceResample _,
    "q383_freshness_decay"  -> q383FreshnessDecay _,
    "q384_partition_advisor" -> q384PartitionAdvisor _,
    "q385_fertility"        -> q385Fertility _)
}
