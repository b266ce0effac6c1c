package graft.tools

import org.apache.spark.sql.SparkSession

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
    // the exact q83 graph — shared builder, so the profiler can never
    // drift from the catalog query it measures
    val edges = graft.queries.CatalogExt.tradeGraphEdges(spark, dir)
    time("edge build count")(edges.count())
    for (iters <- Seq(1, 2, 4, 8)) {
      time(s"pagerank $iters iters")(
        graft.graph.Graph.pageRankFixedPoint(edges, "src", "dst", iters).count())
    }
    spark.stop()
  }
}
