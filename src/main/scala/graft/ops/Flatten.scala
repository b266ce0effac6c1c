package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Nested-array flattening stage (the engine's generator/UDTF surface).
 *
 * Capability re-derivation of the reference's basket explode
 * (`/root/reference/bexley_spark_stream_msk_es.py:353-361`): one output row
 * per basket line item, order-level columns replicated. It is `explode`, not
 * `explode_outer` — empty/null baskets drop the order row.
 */
object Flatten {

  /** `select("*", explode(order_basket) as basket_exp)` (G1, reference :353). */
  def explodeBasket(df: DataFrame): DataFrame =
    df.select(col("*"), explode(col("order_basket")).as("basket_exp"))

  /**
   * Narrow line-item-grain projection with nested-field access
   * (P5/P6, reference :359-361).
   */
  def lineItems(df: DataFrame): DataFrame =
    explodeBasket(df).select(
      col("customer_id"),
      col("order_number"),
      col("basket_exp.product_id").as("product_id"),
      col("basket_exp.order_qty").as("order_qty"))
}
