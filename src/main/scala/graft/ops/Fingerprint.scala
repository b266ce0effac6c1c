package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Dataset content fingerprinting — the versioning/reconciliation primitive
 * for corpus snapshots: every row hashes to a 60-bit digest
 * (md5 of "id:text", first 15 hex digits — positive BIGINT on any
 * engine), and per-domain + whole-corpus fingerprints are the BIT-XOR of
 * row digests. XOR is commutative/associative, so the aggregate is
 * order-free by construction (the same determinism argument as the
 * integer-gradient ops) and incrementally maintainable: adding or
 * removing a row XORs its digest in or out — two snapshots differ exactly
 * where their fingerprints differ, without row-level comparison. The
 * complement to q100's row-level reconciliation: q100 says WHICH rows
 * differ, this says WHETHER a partition differs in O(1) comparison.
 *
 * Scale shape: one map-side-combinable rollup aggregate — per-domain
 * partials XOR locally before the exchange; the rollup adds the corpus
 * total row ('*') in the same pass.
 */
object Fingerprint {

  def datasetFingerprint(df: DataFrame, idCol: String, textCol: String,
      domainCol: String): DataFrame =
    df
      .select(col(domainCol).as("source"), col(idCol).as("id"),
        rowDigest(col(idCol), col(textCol)).as("h"))
      .rollup(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(h)").as("xor_fp"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
      .select(coalesce(col("source"), lit("*")).as("source"),
        col("n_docs"), col("xor_fp"), col("min_id"), col("max_id"))

  /** The shared 60-bit row digest: first 15 md5 hex digits of "id:text". */
  def rowDigest(id: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(concat(id.cast("string"), lit(":"), text)), 1, 15),
      16, 10).cast("long")

  /** Flat per-source fingerprint of a batch (no rollup row) — the delta
    * shape [[mergeFingerprint]] consumes. */
  def deltaFingerprint(df: DataFrame, idCol: String, textCol: String,
      domainCol: String): DataFrame =
    df.select(col(domainCol).as("source"),
        rowDigest(col(idCol), col(textCol)).as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), expr("bit_xor(h)").as("xor_fp"))

  /** Merge a batch's per-source fingerprint delta into prior state:
    * counts add, digests XOR — the O(|touched sources|) incremental
    * maintenance law (streamed state ≡ batch recompute, spec-tested
    * through the crash-atomic keyed sink). */
  def mergeFingerprint(prev: DataFrame, delta: DataFrame): DataFrame = {
    val p = prev.select(col("source").as("__ps"), col("n_docs").as("__pn"),
      col("xor_fp").as("__px"))
    delta.join(p, col("source") <=> col("__ps"), "full_outer")
      .select(coalesce(col("source"), col("__ps")).as("source"),
        (coalesce(col("n_docs"), lit(0L)) + coalesce(col("__pn"), lit(0L)))
          .as("n_docs"),
        coalesce(col("xor_fp"), lit(0L)).bitwiseXOR(
          coalesce(col("__px"), lit(0L))).as("xor_fp"))
  }
}
