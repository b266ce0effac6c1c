package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Pipeline-infrastructure wave: the operational verbs a 100 TB training
 * corpus needs AROUND the analytics — uncertainty quantification that
 * never reshuffles the data (Poisson bootstrap), lakehouse maintenance
 * planning (small-file compaction), data-loader handoff (epoch shard
 * assignment + balance audit), and privacy-budgeted stat release
 * (deterministic base-2 Laplace). Same determinism contract as the
 * catalog: md5-derived randomness compared as exact integers, exact-lg
 * where a logarithm is needed, fixed parenthesization on every float.
 */
object CatalogInfra {

  private def lg(x: Column): Column = graft.curation.Curation.lg(x)

  /** md5-prefix uniform u32 ∈ [0, 2³²) of an arbitrary string column. */
  private def u32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Poisson(1) CDF thresholds scaled to 2³² — floor(CDF(k)·2³²) for
    * k = 0..7; a u32 below threshold k (first hit) draws weight k.
    * Shared literals with the oracle so the draw replays bit-for-bit. */
  private val PoissonT = Seq(1580030168L, 3160060337L, 3950075421L,
    4213413783L, 4279248373L, 4292415291L, 4294609777L, 4294923276L)

  /** Poisson bootstrap CI for the corpus mean document length (Chamandy
    * et al. 2012, "Estimating uncertainty for massive data streams" —
    * the Google-scale bootstrap): instead of B resampling shuffles, each
    * row draws B = 32 INDEPENDENT Poisson(1) weights on the fly
    * (md5(doc_id, b) → inverse CDF as integer threshold compares) and
    * every replicate mean is Σw·x ∕ Σw — ONE pass over the data, a
    * 32-group aggregate, zero data movement. The percentile interval
    * uses the 2nd and 31st order statistics of the replicate means
    * (≈ 6%/94% — a ~88% CI at B = 32). All replicate sums are exact
    * int64; each mean is one divide; the CI picks are array indexes on
    * the sorted 32-element list. */
  def q231PoissonBoot(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    val point = docs.agg(count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("sx"))
    val reps = docs
      .select(col("doc_id"), col("n_chars"),
        explode(sequence(lit(0), lit(31))).as("b"))
      .withColumn("u",
        u32(concat(col("doc_id").cast("string"), lit("_"),
          col("b").cast("string"))))
      .withColumn("w",
        PoissonT.zipWithIndex.foldRight(lit(8L)) { case ((t, k), e) =>
          when(col("u") < t, k.toLong).otherwise(e)
        })
    val means = reps.groupBy(col("b"))
      .agg(sum(col("w") * col("n_chars")).as("swx"), sum(col("w")).as("sw"))
      // a replicate whose weights all drew 0 has no resample — drop it
      // rather than emit a 0/0 NaN whose sort position is engine-defined
      // (astronomically unlikely beyond tiny corpora; mirrored in oracle)
      .filter(col("sw") > 0)
      .select(col("b"),
        (col("swx").cast("double") / col("sw").cast("double")).as("m"))
    means.agg(sort_array(collect_list(col("m"))).as("ms"))
      .crossJoin(broadcast(graft.ops.Guards.scalar(point)))
      .select(col("n_docs"), lit(32L).as("n_reps"),
        (col("sx").cast("double") / col("n_docs").cast("double"))
          .as("point_mean"),
        element_at(col("ms"), 2).as("boot_lo"),
        element_at(col("ms"), 31).as("boot_hi"))
  }

  /** Small-file compaction plan (the OPTIMIZE/rewrite planner shape):
    * treat per-(source, lang) byte totals as the file manifest, order
    * files largest-first (deterministic tie-break), and assign next-fit
    * bins by cumulative-sum division — bin = ⌊cum_before ∕ target⌋.
    * Runs on MANIFEST-sized data (file counts, not row counts), which
    * is why the global-order window is legitimate here and nowhere
    * else: a 100 TB table's manifest is thousands of rows. Next-fit
    * guarantees every bin except possibly the last holds ≥ target −
    * max_file bytes and ≤ target + max_file; the law spec pins both
    * conservation and that overflow bound. */
  def q232CompactionPlan(s: SparkSession, dir: String): DataFrame = {
    val target = 65536L
    val files = Tables.documents(s, dir)
      .groupBy(col("source"), col("lang"))
      .agg(sum(col("n_chars")).as("bytes"), count(lit(1)).as("n_docs"))
    val w = Window.orderBy(col("bytes").desc, col("source"), col("lang"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    files
      .withColumn("cum_before", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / lit(target)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("total_bytes"),
        sum(col("n_docs")).as("n_docs"))
      .select(col("bin"), col("n_files"), col("n_docs"), col("total_bytes"),
        (col("total_bytes").cast("double") / lit(target.toDouble))
          .as("fill_ratio"))
      .orderBy(col("bin"))
  }

  /** Epoch shard assignment for the training data loader: shard =
    * md5(doc_id, epoch seed) mod 16 — a NEW independent permutation
    * each epoch by reseeding, with zero state and zero shuffle beyond
    * the 16-group audit aggregate (the assignment itself is a narrow
    * map a writer would partition by). Emits the balance audit a loader
    * needs before it trusts the shards: per-shard doc/byte counts and
    * the byte load ratio vs perfect balance (ratio = bytes·16 ∕ total,
    * exact int64 numerator, one divide). */
  def q233ShardAssign(s: SparkSession, dir: String): DataFrame = {
    val nShards = 16L
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"),
        pmod(u32(concat(lit("epoch0:"), col("doc_id").cast("string"))),
          lit(nShards)).as("shard"))
    val shards = docs.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bytes"))
    val tot = shards.agg(sum(col("bytes")).as("tb"))
    shards.crossJoin(broadcast(graft.ops.Guards.scalar(tot)))
      .select(col("shard"), col("n_docs"), col("bytes"),
        ((col("bytes") * lit(nShards)).cast("double") /
          col("tb").cast("double")).as("load_ratio"))
      .orderBy(col("shard"))
  }

  /** Differentially-private release of per-language document counts —
    * ε = 1 Laplace noise made DETERMINISTIC and oracle-replayable the
    * way every draw in this catalog is: u32 = md5-prefix uniform,
    * folded to d = 2u − 2³² (sign carries the direction), and the
    * magnitude is the base-2 inverse CDF −(1∕ε)·ln(1 − |d|∕2³²)
    * computed as −(lg(2³² − |d|) − 32)·ln2 — the lg argument is an
    * exact int64, guarded to ≥ 1. True count, noise, and noisy count
    * are released side by side because this is the calibration AUDIT
    * of the mechanism (scale of noise vs scale of counts), not the
    * production release path (which would drop true_count). */
  def q234DpCounts(s: SparkSession, dir: String): DataFrame = {
    val eps = 1.0
    val two32 = 4294967296L
    val byLang = Tables.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("true_count"))
      .withColumn("u", u32(concat(lit("dp:"), col("lang"))))
      .withColumn("d", lit(2L) * col("u") - lit(two32))
      .withColumn("noise",
        when(col("d") === 0L, lit(0.0)).otherwise(
          signum(col("d")) * (lit(0.0) -
            (lg(greatest(lit(two32) - abs(col("d")), lit(1L))) - lit(32.0))) *
            lit(0.6931471805599453) / lit(eps)))
    byLang.select(col("lang"), col("true_count"), col("noise"),
        (col("true_count").cast("double") + col("noise")).as("noisy_count"),
        lit(eps).as("epsilon"))
      .orderBy(col("lang"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q231_poisson_boot"   -> q231PoissonBoot _,
    "q232_compaction"     -> q232CompactionPlan _,
    "q233_shard_assign"   -> q233ShardAssign _,
    "q234_dp_counts"      -> q234DpCounts _)
}
