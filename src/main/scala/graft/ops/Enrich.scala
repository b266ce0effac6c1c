package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/**
 * Stream-static enrichment join.
 *
 * Capability re-derivation of the reference's `transform_stream_static_join`
 * (`/root/reference/bexley_spark_stream_msk_es.py:421-439`): left-outer
 * equi-join of the (streaming) order flow with a small static city dimension,
 * then drop the duplicated join key. Left outer ⇒ orders with an unknown city
 * survive with a null `city`.
 *
 * Scale note: the dimension is explicitly `broadcast()` so the plan is a
 * BroadcastHashJoin with NO shuffle on the fact/stream side — at 100 TB the
 * fact side never moves; only the kilobyte-scale dimension is replicated.
 */
object Enrich {

  def withCity(fact: DataFrame, dim: DataFrame): DataFrame =
    fact
      .join(broadcast(dim), fact("ship_to_city_id") === dim("city_id"), "left_outer")
      .drop(dim("city_id"))

  /** Generic broadcast left-outer enrichment against any small dimension. */
  def leftEnrich(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String): DataFrame =
    fact
      .join(broadcast(dim), fact(factKey) === dim(dimKey), "left_outer")
      .drop(dim(dimKey))
}
