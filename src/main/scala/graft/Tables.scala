package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading for the local TPC-H-ish testdata (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /**
   * `events.ts` has shipped in two parquet encodings across testdata
   * generations: TIMESTAMP(NANOS) (which Spark's reader rejects —
   * [PARQUET_TYPE_ILLEGAL] — so we read nanos as long via the legacy conf and
   * truncate to µs, matching DuckDB's ns→µs behavior) and plain TIMESTAMP(µs)
   * (readable directly). Branch on the physical schema so both work.
   */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ =>
        // Plain parquet TIMESTAMP(µs) surfaces as TIMESTAMP_NTZ; normalize to
        // TIMESTAMP (LTZ) — an identity cast under the UTC session zone — so
        // functions like unix_micros/from_utc_timestamp resolve.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
