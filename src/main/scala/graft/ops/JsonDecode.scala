package graft.ops

import graft.model.OrderEvent
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/**
 * Raw-bytes → typed-struct decode stage.
 *
 * Capability re-derivation of the reference's `transform_raw_dataframe`
 * (`/root/reference/bexley_spark_stream_msk_es.py:287-341`): cast the binary
 * Kafka `value` to string, apply a hand-declared schema with `from_json`
 * (PERMISSIVE — malformed input becomes an all-null struct, it never fails
 * the stream), then star-expand the struct to top-level columns.
 *
 * Every function is a pure DataFrame => DataFrame so unit tests can feed
 * hand-built frames of raw JSON strings (the reference's intended seam,
 * bexley_spark_stream_msk_es.py:373-377).
 */
object JsonDecode {

  /** `CAST(value AS STRING)` — binary Kafka payload to UTF-8 string (P1/P2). */
  def valueAsString(df: DataFrame): DataFrame =
    df.select(col("value").cast(StringType).as("value"))

  /** `from_json` under a declared schema, then `select("struct.*")` (P3/P4). */
  def decode(df: DataFrame, schema: StructType = OrderEvent.schema): DataFrame =
    df.select(from_json(col("value"), schema).as("temptable"))
      .select(col("temptable.*"))

  /** Full raw→typed stage: cast then decode. */
  def fromRaw(df: DataFrame, schema: StructType = OrderEvent.schema): DataFrame =
    decode(valueAsString(df), schema)
}
