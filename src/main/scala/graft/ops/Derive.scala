package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Scalar derivation stage — the curated order-grain projection.
 *
 * Capability re-derivation of the reference's `transform_json_message`
 * curated select (`/root/reference/bexley_spark_stream_msk_es.py:393-401`):
 *   - `discounted_total = order_total - (discount_applied/100) * order_total`
 *     (money-as-double, discount is a 0-100 percentage; :395)
 *   - `data_key = concat_ws('-', order_number, substring(order_date,1,10))`
 *     — the sink's idempotency key (:396)
 *   - `fufilment_type = CASE WHEN substring(order_number,6,1)='3'
 *     THEN 'Bexley' ELSE 'Merchant' END` (1-based substring; :400; the
 *     reference's spelling `fufilment_type` is kept for output compatibility)
 */
object Derive {

  def discountedTotal(total: Column, discountPct: Column): Column =
    total - (discountPct / 100) * total

  def dataKey(orderNumber: Column, orderDate: Column): Column =
    concat_ws("-", orderNumber, substring(orderDate, 1, 10))

  def fufilmentType(orderNumber: Column): Column =
    when(substring(orderNumber, 6, 1) === "3", "Bexley").otherwise("Merchant")

  /** The curated order-grain projection (reference :393-401, column-for-column). */
  def curate(df: DataFrame): DataFrame =
    df.select(
      col("order_number"),
      discountedTotal(col("order_total"), col("discount_applied")).as("discounted_total"),
      dataKey(col("order_number"), col("order_date")).as("data_key"),
      col("ship_to_city_id"),
      col("order_date"),
      col("ship_method"),
      fufilmentType(col("order_number")).as("fufilment_type"))
}
