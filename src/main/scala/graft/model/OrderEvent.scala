package graft.model

import org.apache.spark.sql.types._

/**
 * The engine's central record type: a shopping-order event arriving as a JSON
 * document on an unbounded stream.
 *
 * Schema re-derived from the reference's declared `StructType`
 * (`/root/reference/bexley_spark_stream_msk_es.py:303-322`): all fields
 * nullable, money-as-double, `order_date` as an ISO-ish string whose first 10
 * chars are the date, and an array-of-struct basket.
 */
final case class BasketItem(
    order_qty: Option[Int],
    product_id: Option[Int],
    is_discounted: Option[Boolean])

final case class OrderEvent(
    order_id: Option[Int],
    order_total: Option[Double],
    ship_to_city_id: Option[Int],
    freight: Option[Double],
    customer_id: Option[Int],
    ship_method: Option[String],
    order_number: Option[String],
    discount_applied: Option[Double],
    order_date: Option[String],
    order_basket: Seq[BasketItem])

/** Dimension row (reference `vw_uk_cities`, bexley_spark_stream_msk_es.py:91). */
final case class City(city_id: Option[Int], city: Option[String])

object OrderEvent {
  /**
   * Hand-declared schema, applied with `from_json` in PERMISSIVE mode —
   * malformed JSON degrades to an all-null struct, never an error
   * (reference bexley_spark_stream_msk_es.py:325).
   */
  val schema: StructType = StructType(Seq(
    StructField("order_id", IntegerType),
    StructField("order_total", DoubleType),
    StructField("ship_to_city_id", IntegerType),
    StructField("freight", DoubleType),
    StructField("customer_id", IntegerType),
    StructField("ship_method", StringType),
    StructField("order_number", StringType),
    StructField("discount_applied", DoubleType),
    StructField("order_date", StringType),
    StructField("order_basket", ArrayType(StructType(Seq(
      StructField("order_qty", IntegerType),
      StructField("product_id", IntegerType),
      StructField("is_discounted", BooleanType)))))
  ))
}
