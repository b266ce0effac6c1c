package graft.tools

import graft.functions.GraftExtensions
import org.apache.spark.sql.SparkSession

/** Drives the SQL surface of the native expressions through a session built
  * with `withExtensions(GraftExtensions)` — the spark.sql.extensions
  * deployment path (injected at session build, callable from plain SQL text,
  * no Column API involved). Run via `sbt "runMain graft.tools.SqlSurface"`. */
object SqlSurface {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cos = spark.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS c").head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12, s"cosine self = $cos")

    val sh = spark.sql(
      "SELECT graft_simhash64(array('key','agg','row')) AS h").head().getLong(0)
    val sh2 = spark.sql(
      "SELECT graft_simhash64(array('key','agg','row')) AS h").head().getLong(0)
    assert(sh == sh2 && sh != 0L)

    val sig = spark.sql(
      "SELECT graft_minhash_sig(array('a b c','b c d'), 8) AS s").head()
      .getSeq[Long](0)
    assert(sig.length == 8)

    val bucket = spark.sql(
      "SELECT graft_sign_bucket(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 6) AS b")
      .head().getInt(0)
    assert(bucket >= 0 && bucket < 64)

    val sh3 = spark.sql(
      "SELECT graft_word_shingles(array('a','b','c','d'), 3) AS s").head()
      .getSeq[String](0)
    assert(sh3 == Seq("a b c", "b c d"), s"shingles = $sh3")

    // the gate probe: 'b c d' xxhash64-ed is in the sorted array, 'x y z' not
    val probeHash = graft.functions.VectorMath.xxhash(
      org.apache.spark.unsafe.types.UTF8String.fromString("b c d"))
    val hit = spark.sql(
      s"SELECT graft_shingle_hash_overlap(array('a','b','c','d'), array(${probeHash}L), 3) AS o")
      .head().getBoolean(0)
    val miss = spark.sql(
      s"SELECT graft_shingle_hash_overlap(array('x','y','z'), array(${probeHash}L), 3) AS o")
      .head().getBoolean(0)
    assert(hit && !miss, s"shingle_hash_overlap hit=$hit miss=$miss")

    val folded = spark.sql(
      "SELECT graft_strip_accents('café naïve') AS f").head().getString(0)
    assert(folded == "cafe naive", s"strip_accents = $folded")

    val bo = spark.sql(
      "SELECT graft_bigram_overlap('aaaa', 'aa') AS o").head().getLong(0)
    assert(bo == 1L, s"bigram_overlap multiset law = $bo")

    // registered functions are visible in the catalog listing
    val listed = spark.sql("SHOW FUNCTIONS LIKE 'graft*'").count()
    println(s"[sql-surface] graft functions listed=$listed cosine=$cos simhash=$sh PASS")
    spark.stop()
  }
}
