package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format breadth: the engine round-trips its tables through
  * every batch format Spark ships (SURVEY.md §2.1 — the reference reads
  * Kafka+JDBC; a complete engine also covers the file formats). */
class FormatsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def nationSorted = Tables.nation(spark, sfDir)
    .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    .orderBy("n_nationkey")

  test("parquet -> csv -> read back (schema declared) preserves rows") {
    val out = tmpDir("fmt-csv")
    nationSorted.write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("n_nationkey", LongType),
      StructField("n_name", StringType),
      StructField("n_regionkey", LongType)))
    val back = spark.read.schema(schema).option("header", "true").csv(out)
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      nationSorted.collect().toSeq)
  }

  test("parquet -> json lines -> read back preserves rows") {
    val out = tmpDir("fmt-json")
    nationSorted.write.mode("overwrite").json(out)
    val back = spark.read.json(out)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      nationSorted.collect().toSeq)
  }

  test("parquet -> orc -> read back preserves rows and schema") {
    val out = tmpDir("fmt-orc")
    nationSorted.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.schema === nationSorted.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      nationSorted.collect().toSeq)
  }

  test("partitioned parquet write prunes partitions on read (scale surface)") {
    val out = tmpDir("fmt-part")
    Tables.orders(spark, sfDir)
      .withColumn("y", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("y").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("y") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    // partition pruning shows up as a pushed partition filter in the scan
    assert(plan.contains("PartitionFilters: [isnotnull(y"), plan.take(400))
    assert(pruned.count() ===
      Tables.orders(spark, sfDir).filter(year(col("o_orderdate")) === 1995).count())
  }
}
