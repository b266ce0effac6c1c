package graft

import graft.queries.{Catalog, CatalogAlg, CatalogBeh, CatalogCur, CatalogEv, CatalogExt, CatalogGp, CatalogGr, CatalogGx, CatalogRx, CatalogW13, CatalogW14, CatalogIdx, CatalogMl, CatalogMore, CatalogInfra, CatalogDec, CatalogDist, CatalogDp, CatalogNext, CatalogPlus, CatalogPlan, CatalogRe, CatalogSci, CatalogSel, CatalogStats, CatalogTpch, Oracles, OraclesAlg, OraclesEv, OraclesGp, OraclesGr, OraclesGx, OraclesRx, OraclesW13, OraclesW14, OraclesMl, OraclesRe, OraclesBeh, OraclesCur, OraclesExt, OraclesIdx, OraclesInfra, OraclesMore, OraclesDec, OraclesDist, OraclesDp, OraclesNext, OraclesPlus, OraclesPlan, OraclesSci, OraclesSel, OraclesStats, OraclesTpch, OrderSynth}
import graft.streaming.OrdersPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference pipeline shape: JSON order events → decode → derive →
    * broadcast dim enrichment (SURVEY.md §3 entry point 1, batch form). */
  def entry(spark: SparkSession): DataFrame =
    OrdersPipeline.enriched(
      OrderSynth.rawJson(spark, "/root/testdata/sf0.001"),
      OrderSynth.cityDim(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"  -> Catalog.q01PricingSummary _,
    "q02_json_decode_agg"  -> Catalog.q02JsonDecodeAgg _,
    "q03_curated_orders"   -> Catalog.q03CuratedOrders _,
    "q04_line_items"       -> Catalog.q04LineItems _,
    "q05_enriched"         -> Catalog.q05Enriched _,
    "q06_window_tumbling"  -> Catalog.q06WindowTumbling _,
    "q07_filter_project"   -> Catalog.q07FilterProject _,
    "q08_top_orders"       -> Catalog.q08TopOrders _,
    "q09_semi_join"        -> Catalog.q09SemiJoin _,
    "q10_anti_join"        -> Catalog.q10AntiJoin _,
    "q11_set_ops"          -> Catalog.q11SetOps _,
    "q12_rollup"           -> Catalog.q12Rollup _,
    "q13_count_distinct"   -> Catalog.q13CountDistinct _,
    "q14_approx_distinct"  -> Catalog.q14ApproxDistinct _,
    "q15_string_funcs"     -> Catalog.q15StringFuncs _,
    "q16_date_funcs"       -> Catalog.q16DateFuncs _,
    "q17_case_when_arith"  -> Catalog.q17CaseWhenArith _,
    "q18_analytic_windows" -> Catalog.q18AnalyticWindows _,
    "q19_multi_join_agg"   -> Catalog.q19MultiJoinAgg _,
    "q20_full_outer"       -> Catalog.q20FullOuter _,
  ) ++ CatalogExt.all ++ CatalogTpch.all ++ CatalogMore.all ++ CatalogStats.all ++ CatalogInfra.all ++ CatalogSci.all ++ CatalogPlus.all ++ CatalogNext.all ++ CatalogDist.all ++ CatalogDec.all ++ CatalogBeh.all ++ CatalogCur.all ++ CatalogPlan.all ++ CatalogIdx.all ++ CatalogSel.all ++ CatalogAlg.all ++ CatalogDp.all ++ CatalogGr.all ++ CatalogGp.all ++ CatalogMl.all ++ CatalogRe.all ++ CatalogEv.all ++ CatalogGx.all ++ CatalogRx.all ++ CatalogW13.all ++ CatalogW14.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Oracles.all ++ OraclesExt.all ++ OraclesTpch.all ++ OraclesMore.all ++ OraclesStats.all ++ OraclesInfra.all ++ OraclesSci.all ++ OraclesPlus.all ++ OraclesNext.all ++ OraclesDist.all ++ OraclesDec.all ++ OraclesBeh.all ++ OraclesCur.all ++ OraclesPlan.all ++ OraclesIdx.all ++ OraclesSel.all ++ OraclesAlg.all ++ OraclesDp.all ++ OraclesGr.all ++ OraclesGp.all ++ OraclesMl.all ++ OraclesRe.all ++ OraclesEv.all ++ OraclesGx.all ++ OraclesRx.all ++ OraclesW13.all ++ OraclesW14.all
}
