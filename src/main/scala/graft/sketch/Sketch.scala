package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005): fixed
 * d×w counter grid answering point frequency queries with one-sided error
 * (never under-estimates; over-estimate ≤ εN with w = ⌈e/ε⌉).
 *
 * Why it matters at 100 TB: exact per-token frequency needs a shuffle keyed
 * by token over the full vocabulary; the sketch is a CONSTANT-size summary
 * (d×w longs) that merges by cell-wise addition — partial sketches combine
 * map-side, ship one grid per partition, and the merged grid answers any
 * point query. This implementation keeps the whole pipeline declarative:
 * counters are a (row, bucket) aggregate, estimates come back via a
 * broadcast join against the tiny grid, and — because the bucket hash is
 * md5-derived rather than engine-private — the DuckDB oracle replays the
 * exact same grid, so estimates hash-match bit for bit.
 *
 * Cell-wise addition is commutative ⇒ the estimate is a pure function of
 * the input MULTISET, independent of partitioning/merge order: the sketch
 * is deterministic even though it is approximate.
 */
object Sketch {

  /** Row-r bucket of a token: the first 8 md5 hex chars of `token:r` as an
    * integer, mod `width`. Any engine with md5 reproduces it. */
  def cmsBucket(token: Column, row: Column, width: Int): Column =
    pmod(
      conv(substring(md5(concat(token, lit(":"), row.cast("string"))), 1, 8), 16, 10)
        .cast("long"),
      lit(width.toLong))

  /** Per-token CMS point estimates next to exact counts.
    *
    * Output: (token, tf, est) — `tf` the exact multiplicity, `est` the
    * sketch answer min_r grid[r][bucket_r(token)]. `est >= tf` always
    * (one-sided error law, spec-asserted); equality wherever a token
    * collides with nothing heavier in every row.
    *
    * Plan shape: one token-keyed aggregate for tf (the only large shuffle),
    * a d-way explode of the DISTINCT token set (vocabulary-sized, not
    * corpus-sized), a (row, bucket) aggregate producing the d×w grid, and a
    * broadcast join of the grid back to the vocabulary. */
  def cmsEstimates(tokens: DataFrame, tokenCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    val tf = tokens.groupBy(col(tokenCol)).agg(count(lit(1)).as("tf"))
    val exploded = tf
      .withColumn("r", explode(lit((0 until depth).toArray)))
      .withColumn("b", cmsBucket(col(tokenCol), col("r"), width))
    val grid = exploded.groupBy(col("r"), col("b"))
      .agg(sum(col("tf")).as("cnt"))
    exploded.join(broadcast(grid), Seq("r", "b"))
      .groupBy(col(tokenCol))
      .agg(first(col("tf")).as("tf"), min(col("cnt")).as("est"))
  }

  /**
   * Mergeable distinct-count sketches: per-domain HyperLogLog sketches of
   * the token vocabulary (Spark's Apache DataSketches `hll_sketch_agg`)
   * UNIONED into the corpus estimate with `hll_union_agg` — the pattern
   * that makes distributed distinct-count O(sketch bytes) per partition
   * instead of a vocabulary-sized shuffle: partial sketches merge
   * associatively like any semigroup, so a 1000-executor fleet ships
   * kilobytes upward. Output: one row per domain plus the merged '*' row,
   * each carrying the exact distinct count (for the oracle) and the
   * q14-style tolerance verdict `within_tol` (HLL lgK=12 has σ ≈ 1.04/64
   * ≈ 1.6%; the law allows `tol`). The estimate itself is
   * implementation-specific (DataSketches ≠ DuckDB's HLL), hence the
   * constant-TRUE-boolean oracle form, exactly like q14.
   */
  def hllVocabulary(docs: DataFrame, textCol: String, domainCol: String,
      tol: Double = 0.1): DataFrame = {
    val toks = docs.select(col(domainCol).as("source"),
      explode(graft.text.TextOps.tokens(col(textCol))).as("t"))
    val per = toks.groupBy(col("source"))
      .agg(hll_sketch_agg(col("t")).as("sk"),
        countDistinct(col("t")).as("n_exact"))
    val glob = per.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .crossJoin(toks.agg(countDistinct(col("t")).as("n_exact")))
      .select(lit("*").as("source"), col("n_exact"), col("est"))
    per.select(col("source"), col("n_exact"),
        hll_sketch_estimate(col("sk")).as("est"))
      .unionByName(glob)
      .select(col("source"), col("n_exact"),
        (abs(col("est").cast("double") - col("n_exact").cast("double")) <=
          lit(tol) * col("n_exact").cast("double")).as("within_tol"))
  }

  /** Hash-`i` Bloom bit position of a token: first 8 md5 hex chars of
    * `token#i` mod `bits` — replayable on any engine with md5, like
    * [[cmsBucket]]. */
  def bloomPos(token: Column, i: Int, bits: Int): Column =
    pmod(
      conv(substring(md5(concat(token, lit(s"#$i"))), 1, 8), 16, 10)
        .cast("long"),
      lit(bits.toLong))

  /**
   * Bloom-filter membership (Bloom, CACM 1970), completing the sketch
   * family (CMS = frequency, HLL = cardinality, Bloom = membership):
   * build a `bits`-position filter over the corpus vocabulary, probe it,
   * and report the verdict NEXT TO exact membership — so the one-sided
   * error law (no false negatives: `bloom_member` whenever `present`) and
   * the false-positive mechanics are both visible in the output.
   *
   * The filter is materialized as the DISTINCT set-position table
   * (≤ `bits` rows — semantically the bitmap, without packing words into
   * longs, which keeps both engines integer-exact); the probe is a
   * broadcast join of probe positions against it. Build is one
   * vocabulary-sized distinct + a `hashes`-way explode that collapses to
   * ≤ `bits` rows — at 100 TB the filter is still ≤ `bits` rows, and the
   * real deployment packs those into executor-local bitsets exactly like
   * [[graft.ops.Prefilter]] ships its sorted key array.
   *
   * Output: (probe, present, bloom_member).
   */
  def bloomMembership(tokens: DataFrame, tokenCol: String,
      probes: DataFrame, probeCol: String,
      bits: Int = 512, hashes: Int = 3): DataFrame = {
    require(bits >= 8 && bits <= (1 << 20), s"bits out of range: $bits")
    require(hashes >= 1 && hashes <= 8, s"hashes out of range: $hashes")
    val vocab = tokens.select(col(tokenCol).as("t")).distinct()
    val setBits = vocab
      .select(explode(array((0 until hashes).map(i =>
        bloomPos(col("t"), i, bits)): _*)).as("p"))
      .distinct()
    val probeBits = probes.select(col(probeCol).as("probe")).distinct()
      .select(col("probe"),
        explode(array((0 until hashes).map(i =>
          bloomPos(col("probe"), i, bits)): _*)).as("p"))
    val hit = probeBits
      .join(broadcast(setBits.withColumn("set", lit(true))), Seq("p"), "left")
      .groupBy(col("probe"))
      .agg(min(coalesce(col("set"), lit(false))).as("bloom_member"))
    hit
      .join(broadcast(vocab.select(col("t").as("probe"))
        .withColumn("in_vocab", lit(true))), Seq("probe"), "left")
      .select(col("probe"), coalesce(col("in_vocab"), lit(false)).as("present"),
        col("bloom_member"))
  }
}
