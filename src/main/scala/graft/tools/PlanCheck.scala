package graft.tools
import graft.queries.{Catalog, CatalogExt}
import org.apache.spark.sql.SparkSession
/** Dev tool: condensed physical-plan audit of the scale-sensitive queries. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq(
      "q07_filter_project" -> Catalog.q07FilterProject _,
      "q05_enriched"       -> Catalog.q05Enriched _,
      "q19_multi_join_agg" -> Catalog.q19MultiJoinAgg _,
      "q25_jaccard_pairs"  -> CatalogExt.q25JaccardPairs _,
      "q28_embed_knn"      -> CatalogExt.q28EmbedKnn _,
      "q34_asof_join"      -> CatalogExt.q34AsofJoin _)
    interesting.foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val ops = plan.linesIterator
        .map(_.replaceAll("^[-+:* ()0-9]*", "").takeWhile(_ != ' '))
        .filter(op => op.nonEmpty && !op.startsWith("Input") && !op.startsWith("Output"))
        .toSeq
      println(s"== $name ==")
      ops.groupBy(identity).toSeq.sortBy(-_._2.size).foreach { case (op, n) =>
        println(f"   ${n.size}%2d x $op")
      }
      val pushed = plan.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema")).take(4)
      pushed.foreach(l => println("   " + l.trim.take(150)))
    }
  }
}
