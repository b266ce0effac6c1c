package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Dev-only (round 16): isolate the ordered-fold kernel vs the HOF
  * composition on one big sorted struct array (the q322 shape). */
object MicroFold {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(3000000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(n).select(col("id"),
      (col("id") % 1000).cast("double").as("v")).cache()
    df.count()
    def hof(k: Column, v: Column): Column =
      aggregate(
        transform(sort_array(collect_list(struct(k.as("k"), v.as("v")))),
          e => e("v")),
        lit(0.0), (acc, x) => acc + x)
    def native(k: Column, v: Column): Column =
      graft.functions.GraftFunctions.orderedSum(
        sort_array(collect_list(struct(k.as("k"), v.as("v")))))
    def time(tag: String)(c: => Column): Unit = {
      // warm once, then 3 timed
      df.agg(c).collect()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val r = df.agg(c).collect()(0).getDouble(0)
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"$tag%-8s min=${ts.map(_._1).min}%.3f s  result=${ts.head._2}")
    }
    time("hof")(hof(col("id"), col("v")))
    time("native")(native(col("id"), col("v")))
    time("hof")(hof(col("id"), col("v")))
    time("native")(native(col("id"), col("v")))
    spark.stop()
  }
}
