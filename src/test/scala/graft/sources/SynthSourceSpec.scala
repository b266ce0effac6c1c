package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DSv2 `graft-synth` source: pruning, pushdown, determinism, partitioning. */
class SynthSourceSpec extends SparkSpec {

  private def load(rows: Long = 1000, parts: Int = 8): DataFrame =
    spark.read.format("graft-synth")
      .option("rows", rows).option("seed", "spec").option("partitions", parts)
      .load()

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.sparkPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan:\n" + df.queryExecution.sparkPlan))

  test("row count, schema, and per-seed determinism") {
    val df = load()
    assert(df.count() == 1000)
    assert(df.schema.fieldNames.toSeq ==
      Seq("doc_id", "lang", "source", "n_words", "n_chars", "text"))
    val a = df.orderBy("doc_id").collect()
    val b = load().orderBy("doc_id").collect()
    assert(a.sameElements(b), "same seed must generate identical rows")
    val c = spark.read.format("graft-synth").option("rows", 1000)
      .option("seed", "other").load().orderBy("doc_id").collect()
    assert(!a.sameElements(c), "different seed must generate different rows")
  }

  test("n_chars equals length(text) and text words come from the 16-word vocab") {
    val bad = load(200).filter(length(col("text")) =!= col("n_chars")).count()
    assert(bad == 0)
    val words = load(200)
      .select(explode(split(col("text"), " ")).as("w"))
      .select(countDistinct(col("w")).as("d"),
        max(col("w").isin(SynthDocs.VOCAB16.toIndexedSeq: _*).cast("int")).as("inv"),
        min(col("w").isin(SynthDocs.VOCAB16.toIndexedSeq: _*).cast("int")).as("alliv"))
      .head()
    assert(words.getLong(0) <= 16 && words.getInt(2) == 1)
  }

  test("doc_id range filters push into partition planning (partition pruning analog)") {
    val full = scanOf(load(1000, parts = 8))
    val pruned = scanOf(load(1000, parts = 8)
      .filter(col("doc_id") >= 900L && col("doc_id") < 950L))
    assert(full.inputRDD.getNumPartitions == 8)
    assert(pruned.scan.description().contains("range=[900,950)"),
      s"filters not pushed into the scan range: ${pruned.scan.description()}")
    // a range narrower than the partition count shrinks planned splits
    val tiny = scanOf(load(1000, parts = 8)
      .filter(col("doc_id") >= 997L))
    assert(tiny.inputRDD.getNumPartitions == 3,
      "3-row range must plan at most 3 partitions")
    val n = load(1000, parts = 8)
      .filter(col("doc_id") >= 900L && col("doc_id") < 950L).count()
    assert(n == 50)
    // fully-handled predicates leave no rows outside the range even though
    // the residual Filter may be elided
    val ids = load(1000).filter(col("doc_id") === 7L).select("doc_id").collect()
    assert(ids.map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("column pruning reaches the scan (text synthesis skipped for lang-only reads)") {
    val slim = load(100).select("lang").groupBy("lang").count()
    val schema = scanOf(slim).scan.readSchema()
    assert(schema.fieldNames.toSeq == Seq("lang"),
      s"expected pruned read schema [lang], got ${schema.fieldNames.mkString(",")}")
    assert(slim.agg(sum("count")).head().getLong(0) == 100)
  }

  test("empty range plans zero partitions, contradictory filters yield empty") {
    assert(load(1000).filter(col("doc_id") >= 600L && col("doc_id") < 600L).count() == 0)
    assert(load(1000).filter(col("doc_id") === 2000L).count() == 0)
  }
}
