package graft.ops

import graft.SparkSpec
import graft.model.OrderEvent
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit tests for the reference-parity pipeline stages, fed hand-built raw
  * JSON frames — exactly the reference's intended testing seam
  * (/root/reference/bexley_spark_stream_msk_es.py:373-377).
  */
class PipelineOpsSpec extends SparkSpec {

  private def rawOrder(
      orderId: Int,
      orderNumber: String,
      total: Double,
      discountPct: Double,
      cityId: Int,
      date: String,
      basket: String): String =
    s"""{"order_id":$orderId,"order_total":$total,"ship_to_city_id":$cityId,
       |"freight":1.5,"customer_id":7,"ship_method":"GROUND",
       |"order_number":"$orderNumber","discount_applied":$discountPct,
       |"order_date":"$date","order_basket":$basket}""".stripMargin.replace("\n", "")

  private def rawDf(jsons: String*) = {
    val s = spark
    import s.implicits._
    jsons.toSeq.toDF("value")
  }

  test("JsonDecode applies the declared schema; malformed input degrades to nulls (PERMISSIVE)") {
    val good = rawOrder(1, "BX000013", 100.0, 10.0, 3, "2024-01-02 03:04:05",
      """[{"order_qty":2,"product_id":55,"is_discounted":true}]""")
    val out = JsonDecode.fromRaw(rawDf(good, "not json at all"))
    assert(out.schema.fieldNames.toSeq === OrderEvent.schema.fieldNames.toSeq)
    val rows = out.orderBy(col("order_id").asc_nulls_last).collect()
    assert(rows(0).getAs[Int]("order_id") === 1)
    assert(rows(0).getAs[Double]("order_total") === 100.0)
    assert(rows(1).isNullAt(rows(1).fieldIndex("order_id"))) // malformed → all-null row
  }

  test("Derive.curate: discounted_total, data_key, fufilment_type (1-based substring, char 6)") {
    // order_number char 6 is '3' → Bexley; date part of data_key is first 10 chars
    val raw = rawDf(
      rawOrder(1, "BX000300", 200.0, 25.0, 3, "2024-01-02 03:04:05", "[]"),
      rawOrder(2, "BX000999", 80.0, 0.0, 4, "2024-06-07 08:09:10", "[]"))
    val out = Derive.curate(JsonDecode.fromRaw(raw)).orderBy("order_number").collect()
    assert(out(0).getAs[Double]("discounted_total") === 150.0) // 200 - 25% of 200
    assert(out(0).getAs[String]("data_key") === "BX000300-2024-01-02")
    assert(out(0).getAs[String]("fufilment_type") === "Bexley")
    assert(out(1).getAs[Double]("discounted_total") === 80.0)
    assert(out(1).getAs[String]("fufilment_type") === "Merchant")
  }

  test("Flatten: explode drops empty/null baskets, replicates order columns per item") {
    val raw = rawDf(
      rawOrder(1, "BX000001", 10.0, 0.0, 1, "2024-01-01 00:00:00",
        """[{"order_qty":2,"product_id":5,"is_discounted":false},
           {"order_qty":1,"product_id":6,"is_discounted":true}]""".replace("\n", "")),
      rawOrder(2, "BX000002", 20.0, 0.0, 1, "2024-01-01 00:00:00", "[]"))
    val out = Flatten.lineItems(JsonDecode.fromRaw(raw))
    val rows = out.orderBy("product_id").collect()
    assert(rows.length === 2) // empty basket order dropped (explode, not explode_outer)
    assert(rows.map(_.getAs[Int]("product_id")).toSeq === Seq(5, 6))
    assert(rows.map(_.getAs[String]("order_number")).distinct.toSeq === Seq("BX000001"))
  }

  test("Enrich.withCity: left-outer broadcast join keeps unmatched facts with null city") {
    val s = spark
    import s.implicits._
    val fact = Seq((1, 10), (2, 99)).toDF("order_id", "ship_to_city_id")
    val dim = Seq((10, "London")).toDF("city_id", "city")
    val out = Enrich.withCity(fact, dim).orderBy("order_id").collect()
    assert(out.length === 2)
    assert(out(0).getAs[String]("city") === "London")
    assert(out(1).isNullAt(out(1).fieldIndex("city"))) // left outer survives
    assert(!Enrich.withCity(fact, dim).columns.contains("city_id")) // dup key dropped
  }

  test("WindowStats batch: 2-minute tumbling buckets with correct boundaries") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("2024-01-01 00:00:30", "A"), // window [00:00, 00:02)
      ("2024-01-01 00:01:59", "A"),
      ("2024-01-01 00:02:00", "A"), // boundary → next window
      ("2024-01-01 00:03:30", "B")
    ).toDF("ts", "g").withColumn("ts", col("ts").cast("timestamp"))
    val out = WindowStats.tumblingCountsBatch(df, "ts", "g", "g")
      .withColumn("window_start", date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss"))
      .orderBy("window_start", "g").collect()
    assert(out.map(r => (r.getAs[String]("window_start"),
      r.getAs[String]("g"), r.getAs[Long]("total_orders"))).toSeq === Seq(
      ("2024-01-01 00:00:00", "A", 2L),
      ("2024-01-01 00:02:00", "A", 1L),
      ("2024-01-01 00:02:00", "B", 1L)))
  }
}
