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
        conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
          col(textCol))), 1, 15), 16, 10).cast("long").as("h"))
      .rollup(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(h)").as("xor_fp"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
      .select(coalesce(col("source"), lit("*")).as("source"),
        col("n_docs"), col("xor_fp"), col("min_id"), col("max_id"))
}
