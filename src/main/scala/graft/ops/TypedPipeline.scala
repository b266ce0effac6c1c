package graft.ops

import graft.model.OrderEvent
import org.apache.spark.sql.{DataFrame, Dataset}

/** The curated order-grain record with compile-time field checking. */
final case class CuratedOrder(
    order_number: Option[String],
    discounted_total: Option[Double],
    data_key: Option[String],
    ship_to_city_id: Option[Int],
    order_date: Option[String],
    ship_method: Option[String],
    fufilment_type: String)

/**
 * Typed `Dataset[T]` view of the pipeline (SURVEY.md §1.2's idiomatic
 * upgrade: case-class Encoders give compile-time field checks where the
 * DataFrame API only fails at analysis time).
 *
 * The untyped [[Derive]]/[[JsonDecode]] stages stay the primary path — their
 * Column expressions keep everything in whole-stage codegen — and the typed
 * layer is a zero-copy cast on top: `as[OrderEvent]` only re-tags the schema
 * (no serialization), so `typedDecode(df).filter(_.order_id.isDefined)`
 * composes typed logic with the same physical plan underneath. Typed lambda
 * transforms (map/filter on case classes) DO break codegen and pay encoder
 * round-trips — use them for business logic that genuinely needs the type,
 * not for column arithmetic.
 */
object TypedPipeline {

  /** raw value column -> typed order events (PERMISSIVE: malformed = all-null). */
  def typedDecode(raw: DataFrame): Dataset[OrderEvent] = {
    val spark = raw.sparkSession
    import spark.implicits._
    JsonDecode.fromRaw(raw).as[OrderEvent]
  }

  /** typed curate: same derivations as [[Derive.curate]], through the typed
    * column expressions (identical plan — law-tested in TypedPipelineSpec). */
  def curate(events: Dataset[OrderEvent]): Dataset[CuratedOrder] = {
    val spark = events.sparkSession
    import spark.implicits._
    Derive.curate(events.toDF()).as[CuratedOrder]
  }

  /** Example of genuinely-typed business logic: orders whose basket passes a
    * predicate no Column expression expresses naturally. */
  def withBasketInvariant(events: Dataset[OrderEvent]): Dataset[OrderEvent] =
    events.filter { e =>
      e.order_basket != null &&
        e.order_basket.forall(i => i.order_qty.forall(_ >= 0))
    }
}
