package graft.tools

import graft.Tables
import graft.text.SuffixIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off wall-clock probe for the suffix-index pipelines (round-10
  * perf triage; the phase breakdown that found the 10.7 s string-keyed
  * rank-0 lives in git history — the fix is the packed-long rank-0). */
object IdxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[idx] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    spark.range(1000000).count()
    val docs = Tables.documents(spark, dir)
    t("warm docs")(docs.count())
    (1 to 2).foreach { i =>
      t(s"globalRanks #$i")(
        SuffixIndex.globalRanks(docs, "doc_id", "text").count())
      t(s"perDocBwt   #$i")(
        SuffixIndex.perDocBwt(docs, "doc_id", "text").count())
    }
    spark.stop()
  }
}
