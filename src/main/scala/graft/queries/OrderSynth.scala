package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Synthesizes reference-shaped order events from the local TPC-H-ish testdata
 * (TESTDATA.md / FIXTURES.md role mapping: order stream ≈ orders ⋈ lineitem
 * with basket = grouped lineitems; dimension vw_uk_cities ≈ nation).
 *
 * `rawJson` produces one JSON string per order under exactly the reference's
 * declared event schema (/root/reference/bexley_spark_stream_msk_es.py:303-322),
 * so the real pipeline (cast → from_json → explode → derive → join) can be
 * exercised and oracle-checked end-to-end on deterministic data.
 *
 * Deterministic field mapping (documented so the DuckDB oracle can mirror it):
 *   order_id         = o_orderkey (int)
 *   order_total      = o_totalprice
 *   ship_to_city_id  = o_custkey % 30        (25-29 miss the 25-row nation dim
 *                                             → exercises left-outer nulls)
 *   freight          = o_totalprice / 20
 *   customer_id      = o_custkey (int)
 *   ship_method      = o_orderpriority
 *   order_number     = 'BX' || lpad(o_orderkey, 7, '0')   (char 6 = 4th pad digit)
 *   discount_applied = (o_orderkey % 50)  as double, percent 0-100
 *   order_date       = o_orderdate formatted 'yyyy-MM-dd HH:mm:ss'
 *   order_basket[]   = per lineitem: (order_qty = int(l_quantity),
 *                      product_id = int(l_partkey), is_discounted = l_discount > 0)
 *                      ordered by l_linenumber
 */
object OrderSynth {

  /** Order-grain DataFrame with the reference's exact column names/types. */
  def orderEvents(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val basket = li
      .groupBy(col("l_orderkey"))
      .agg(
        sort_array(collect_list(struct(
          col("l_linenumber").as("ln"),
          struct(
            col("l_quantity").cast("int").as("order_qty"),
            col("l_partkey").cast("int").as("product_id"),
            (col("l_discount") > 0).as("is_discounted")).as("item")))).as("sorted"))
      .select(col("l_orderkey"), expr("transform(sorted, x -> x.item)").as("order_basket"))
    orders
      .join(basket, orders("o_orderkey") === basket("l_orderkey"), "inner")
      .select(
        col("o_orderkey").cast("int").as("order_id"),
        col("o_totalprice").as("order_total"),
        (col("o_custkey") % 30).cast("int").as("ship_to_city_id"),
        (col("o_totalprice") / 20).as("freight"),
        col("o_custkey").cast("int").as("customer_id"),
        col("o_orderpriority").as("ship_method"),
        concat(lit("BX"), lpad(col("o_orderkey").cast("string"), 7, "0")).as("order_number"),
        (col("o_orderkey") % 50).cast("double").as("discount_applied"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("order_date"),
        col("order_basket"))
  }

  /** The same events as raw JSON strings in a `value` column (the Kafka shape).
    *
    * The frame is `cache()`d so downstream decode stages see an opaque string
    * column — exactly what a Kafka consumer sees. The InMemoryRelation is an
    * optimizer barrier: without it Catalyst collapses decode expressions into
    * this subtree; e.g. `InferFiltersFromGenerate` pushes the basket explode's
    * `size(from_json(to_json(...)))>0 AND isnotnull(...)` predicate into the
    * synth join condition, re-running the whole JSON roundtrip 3× per row
    * (measured 14s vs 2s at sf0.1). Spark's CacheManager dedupes by canonical
    * plan, so every query over the same sf dir shares one materialization.
    * The explicit repartition sets the parse parallelism for downstream
    * consumers (the synth agg's AQE-coalesced output is ~10 partitions).
    * Fixture-only: engine code never caches its inputs. */
  def rawJson(spark: SparkSession, dir: String): DataFrame =
    orderEvents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(to_json(struct(col("*"))).as("value"))
      .cache()

  /** The city dimension: nation as vw_uk_cities (city_id, city). */
  def cityDim(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir).select(
      col("n_nationkey").cast("int").as("city_id"),
      col("n_name").as("city"))
}
