package graft.queries

import graft.Tables
import graft.ops.{Derive, Enrich, Flatten, JsonDecode, WindowStats}
import graft.streaming.OrdersPipeline
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The operator catalog: every SURVEY.md §2 capability as a named batch query
 * over the local testdata, paired (in `oracle`) with ANSI SQL that DuckDB
 * runs on the same parquet files.
 *
 * Cross-engine determinism rules used throughout (see SURVEY.md §7.3):
 *  - double aggregation goes through DECIMAL (exact, order-independent) and
 *    is cast back to double — `dsum` — because float sums are
 *    partition-order-dependent;
 *  - timestamps are emitted as formatted strings, never raw timestamps;
 *  - DuckDB integer sums (HUGEINT) are cast to BIGINT to match Spark's LongType.
 */
object Catalog {

  /** Order-independent, cross-engine-stable sum of a double expression. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(25, 6))).cast("double")

  private def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  // ---------------------------------------------------------------- parity —

  /** A1-family batch aggregation: TPC-H Q1-shaped pricing summary. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** P3: from_json decode (events.props) + grouped aggregation. */
  def q02JsonDecodeAgg(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(s, dir)
      .select(col("event_type"), from_json(col("props"), schema).as("p"))
      .select(col("event_type"), col("p.k").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).cast("long").as("sum_k"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** P1-P12: the curated order-grain stage over synthesized JSON order events. */
  def q03CuratedOrders(s: SparkSession, dir: String): DataFrame =
    Derive.curate(JsonDecode.fromRaw(OrderSynth.rawJson(s, dir).select(col("value").cast(BinaryType))))

  /** G1/P5/P6: basket explode to line-item grain. */
  def q04LineItems(s: SparkSession, dir: String): DataFrame =
    OrdersPipeline.lineItems(OrderSynth.rawJson(s, dir))

  /** J1: stream-static-shaped broadcast left-outer enrichment join. */
  def q05Enriched(s: SparkSession, dir: String): DataFrame =
    OrdersPipeline.enriched(OrderSynth.rawJson(s, dir), OrderSynth.cityDim(s, dir))

  /** A1/T2 batch-equivalent: 2-minute tumbling window counts over events. */
  def q06WindowTumbling(s: SparkSession, dir: String): DataFrame =
    WindowStats.tumblingCountsBatch(Tables.events(s, dir), "ts", "event_type", "event_type")
      .select(
        fmtTs(col("window_start")).as("window_start"),
        fmtTs(col("window_end")).as("window_end"),
        col("event_type"),
        col("total_orders"))

  /** Filter + narrow projection (pushdown surface). */
  def q07FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 30 && col("l_discount") > 0.02)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(DecimalType(18, 4)).cast("double").as("net_price"))

  /** Global sort + limit (TakeOrderedAndProject). */
  def q08TopOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        fmtTs(col("o_orderdate")).as("o_orderdate"))

  /** Left-semi join: customers with at least one open-status order. */
  def q09SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
    Tables.customer(s, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Left-anti join: customers with no order above 250k (non-trivial result). */
  def q10AntiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(
        Tables.orders(s, dir).filter(col("o_totalprice") > 250000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Set operations: union / intersect / except over key sets. */
  def q11SetOps(s: SparkSession, dir: String): DataFrame = {
    val buyers = Tables.orders(s, dir).select(col("o_custkey").as("k")).distinct()
    val known = Tables.customer(s, dir).select(col("c_custkey").as("k")).distinct()
    val both = buyers.intersect(known).withColumn("tag", lit("both"))
    val customerOnly = known.except(buyers).withColumn("tag", lit("customer_only"))
    both.unionByName(customerOnly)
  }

  /** Rollup with grouping-set indicator. */
  def q12Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
        grouping_id().cast("long").as("gid"))

  /** Exact distinct counting (the approx variant is q14, rows-only checked). */
  def q13CountDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** approx_count_distinct (HLL++ sketch) as a TOLERANCE LAW: the sketch
    * estimate itself is engine-specific (no external engine reproduces
    * Spark's HLL++ registers), but its merge is order-independent, so
    * |approx - exact| <= tol * exact is a DETERMINISTIC boolean — the oracle
    * recomputes `exact_parts` and asserts the bound as a constant TRUE
    * column. A sketch regression past the configured rsd now breaks the
    * hash gate instead of hiding behind a rows-only check.
    *
    * The tolerance DERIVES from the configured rsd (4x = 4 sigma of the
    * estimator's relative standard deviation) rather than a magic
    * percentage; even so it is a per-dataset statement, not a universal
    * guarantee — an in-spec sketch can legitimately land outside any fixed
    * multiple on some input. 4 sigma makes that a ~6e-5 event per group,
    * and the fixture datasets are pinned, so the gate is deterministic in
    * practice while staying sensitive to real sketch regressions.
    *
    * NOTE for cross-round bench comparisons: since round 5 this query pays
    * for BOTH the sketch and the exact countDistinct (the law needs the
    * exact side) — its bench number measures the pair, not the sketch
    * alone. */
  def q14ApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    val rsd = 0.02
    val tol = 4 * rsd
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd).as("approx"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(
        col("l_returnflag"),
        col("exact_parts"),
        (abs(col("approx").cast("double") - col("exact_parts").cast("double"))
          <= col("exact_parts").cast("double") * tol).as("within_tol"))
      .orderBy(col("l_returnflag"))
  }

  /** String function family: concat_ws, substring, upper/lower, lpad, regexp. */
  def q15StringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        concat_ws("-", col("c_mktsegment"), col("c_custkey").cast("string")).as("seg_key"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_name")).as("name_lower"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("key_pad"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("name_masked"),
        length(col("c_name")).cast("long").as("name_len"))

  /** Date/time function family over order dates. */
  def q16DateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("y"), col("q"))

  /** P7/P10: CASE WHEN + arithmetic derivations at order grain. */
  def q17CaseWhenArith(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") >= 200000, "large")
          .when(col("o_totalprice") >= 50000, "medium")
          .otherwise("small").as("size_band"),
        (col("o_totalprice") - (col("o_totalprice") / 100) * 2).cast(DecimalType(18, 4)).cast("double").as("after_fee"))

  /** Analytic window functions: row_number / rank / running sum per group. */
  def q18AnalyticWindows(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(byCust).cast("long").as("order_seq"),
        sum(col("o_totalprice").cast(DecimalType(25, 6))).over(
          byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"))
  }

  /** Multi-join aggregation (TPC-H Q3-shaped): join reorder + broadcast surface. */
  def q19MultiJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** Full-outer join with null-safe coalesced key (join-menu breadth). */
  def q20FullOuter(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(s, dir).select(col("n_nationkey").as("k"), col("n_name"))
    val supByNation = Tables.supplier(s, dir)
      .groupBy(col("s_nationkey").as("k2")).agg(count(lit(1)).as("n_supp"))
    n.join(supByNation, col("k") === col("k2"), "full_outer")
      .select(
        coalesce(col("k"), col("k2")).cast("long").as("nationkey"),
        col("n_name"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }
}
