package graft.tools

import graft.queries.{Catalog, OrderSynth}
import graft.streaming.OrdersPipeline
import org.apache.spark.sql.SparkSession

/** Dev-only stage timing breakdown for the slow bench queries. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    time("warmup")(spark.range(1000000).count())
    time("orders.count")(graft.Tables.orders(spark, dir).count())
    time("lineitem.count")(graft.Tables.lineitem(spark, dir).count())
    time("orderEvents")(OrderSynth.orderEvents(spark, dir).count())
    time("rawJson")(OrderSynth.rawJson(spark, dir).count())
    time("decode(rawJson)")(graft.ops.JsonDecode.fromRaw(OrderSynth.rawJson(spark, dir)).count())
    time("q04_line_items")(Catalog.q04LineItems(spark, dir).count())
    time("q05_enriched")(Catalog.q05Enriched(spark, dir).count())
    time("q04 again")(Catalog.q04LineItems(spark, dir).count())
    spark.stop()
  }
}
