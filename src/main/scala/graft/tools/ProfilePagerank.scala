package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: where does q83's time go? Times the edge build, the invariant
  * materialization, and each iteration count separately. */
object ProfilePagerank {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pr] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    time("warmup")(spark.range(1000000).count())
    val pairs = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("cust"), (col("l_suppkey") * 2 + 1).as("supp"))
      .distinct()
    time("edge build count")(pairs.count())
    val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .union(pairs.select(col("supp").as("src"), col("cust").as("dst")))
    for (iters <- Seq(1, 2, 4, 8)) {
      time(s"pagerank $iters iters")(
        graft.graph.Graph.pageRankFixedPoint(edges, "src", "dst", iters).count())
    }
    spark.stop()
  }
}
