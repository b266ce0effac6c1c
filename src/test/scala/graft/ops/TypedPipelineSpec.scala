package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The typed layer is a view: same results as the untyped stages. */
class TypedPipelineSpec extends SparkSpec {

  private def raw = {
    val s = spark
    import s.implicits._
    Seq(
      """{"order_id":1,"order_total":200.0,"ship_to_city_id":3,"freight":1.0,
        |"customer_id":7,"ship_method":"AIR","order_number":"BX000300",
        |"discount_applied":25.0,"order_date":"2024-01-02 03:04:05",
        |"order_basket":[{"order_qty":2,"product_id":5,"is_discounted":true}]}"""
        .stripMargin.replace("\n", ""),
      """{"order_id":2,"order_total":50.0,"ship_to_city_id":4,"freight":1.0,
        |"customer_id":8,"ship_method":"GROUND","order_number":"BX000999",
        |"discount_applied":0.0,"order_date":"2024-06-07 08:09:10",
        |"order_basket":[{"order_qty":-1,"product_id":6,"is_discounted":false}]}"""
        .stripMargin.replace("\n", "")).toDF("value")
  }

  test("typedDecode.curate equals the untyped Derive.curate row-for-row") {
    val typed = TypedPipeline.curate(TypedPipeline.typedDecode(raw))
      .toDF().orderBy("order_number").collect().toSeq
    val untyped = Derive.curate(JsonDecode.fromRaw(raw))
      .orderBy("order_number").collect().toSeq
    assert(typed === untyped)
  }

  test("typed basket invariant filters with real Scala predicates") {
    val kept = TypedPipeline.withBasketInvariant(TypedPipeline.typedDecode(raw))
      .collect().flatMap(_.order_id)
    assert(kept.toSeq === Seq(1)) // order 2 has a negative qty
  }

  test("typed decode is a schema re-tag: plan still scans once, no extra exchange") {
    val plan = TypedPipeline.typedDecode(raw).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(300))
  }
}
