package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off dir-scale probe for [[graft.graph.Graph.hookComponents]] on
  * the part co-order graph (same ×{1,4,10} convention and per-leg block
  * hygiene as [[ScaleProbeDirs]]) plus the adversarial scrambled-path
  * shape at growing n — the operator has no catalog query (its labels
  * equal Dedup.connectedComponents' where both converge), so its scale
  * evidence lives here and in SCALE.md. */
object ProbeHookCc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(1000000).count()
    val dirs = Seq(1 -> "/root/testdata/sf0.1", 4 -> "/tmp/testdata_x4",
      10 -> "/tmp/testdata_x10")
    val ts = dirs.map { case (k, d) =>
      val t0 = System.nanoTime()
      val n = graft.graph.Graph.hookComponents(
        graft.queries.CatalogAlg.partEdges(spark, d)).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[hookcc] co-order x$k%-3d $t%7.1f s nodes=$n")
      graft.ops.FrameMemo.invalidate()
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      t
    }
    println(f"[hookcc] alpha=${math.log(ts(2) / ts(1)) / math.log(10.0 / 4.0)}%5.2f")
    // adversarial scrambled paths (diameter = n): rounds must stay ~log n
    Seq(5003L, 50021L, 500009L).foreach { p =>
      val edges = (0L until p - 1)
        .map(i => ((i * 2654435761L) % p, ((i + 1) * 2654435761L) % p))
        .toDF("x", "y")
      val t0 = System.nanoTime()
      val comps = graft.graph.Graph.hookComponents(edges)
        .select("component").distinct().count()
      println(f"[hookcc] path n=$p%-7d ${(System.nanoTime() - t0) / 1e9}%7.1f s comps=$comps")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
