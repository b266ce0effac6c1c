package graft.tools
import graft.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage breakdown of the jaccard-pair bench hot spot. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n")
    }
    val docs = Tables.documents(spark, dir)
    time("warmup")(spark.range(1000000).count())
    (1 to 2).foreach { i =>
      time(s"shingled.count #$i")(Dedup.shingled(docs, "doc_id", "text", 3).count())
      time(s"shingled+explode #$i")(
        Dedup.shingled(docs, "doc_id", "text", 3)
          .select(explode(col("s"))).count())
      time(s"jaccardPairs #$i")(Dedup.jaccardPairs(docs, "doc_id", "text").count())
      time(s"minhashLsh #$i")(Dedup.minhashLshPairs(docs, "doc_id", "text").count())
    }
    spark.stop()
  }
}
