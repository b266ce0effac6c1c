package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-10d discrete-algorithms wave (q415-q417):
  * Huffman Kraft equality + entropy sandwich + a textbook fixture, LIS
  * against an independent O(n log n) patience computation, and the rho
  * map against a driver-side brute-force walk of the full function. */
class DpWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("Huffman: Kraft sum is exactly 1 and the entropy sandwich holds") {
    val rows = CatalogDp.q415Huffman(spark, sf).collect()
    val lens = rows.map(_.getAs[Long]("code_len"))
    val cnts = rows.map(_.getAs[Long]("cnt"))
    val maxLen = lens.max
    // Kraft with integers: sum 2^(maxLen - len) == 2^maxLen
    assert(lens.map(l => 1L << (maxLen - l)).sum === (1L << maxLen))
    val n = cnts.sum.toDouble
    val entropy = cnts.map { c =>
      val p = c / n; -p * math.log(p) / math.log(2.0) }.sum
    val avg = rows.map(r =>
      r.getAs[Long]("cnt") * r.getAs[Long]("code_len")).sum / n
    assert(avg >= entropy - 1e-9 && avg < entropy + 1.0,
      s"H=$entropy avg=$avg")
    assert(rows.head.getAs[Long]("total_bits") ===
      rows.map(r => r.getAs[Long]("cnt") * r.getAs[Long]("code_len")).sum)
  }

  test("Huffman: textbook fixture gets the optimal code lengths") {
    import spark.implicits._
    // frequencies 5,2,1,1,8 -> lengths a2 b3 c4 d4 e1
    val text = (Seq.fill(5)("a") ++ Seq.fill(2)("b") ++ Seq("c") ++
      Seq("d") ++ Seq.fill(8)("e")).mkString(" ")
    val docs = Seq((1L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("huff").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CatalogDp.q415Huffman(spark, dir).collect()
      .map(r => r.getAs[String]("tok") -> r.getAs[Long]("code_len")).toMap
    assert(out === Map("a" -> 2L, "b" -> 3L, "c" -> 4L, "d" -> 4L, "e" -> 1L))
  }

  test("LIS: relaxation matches an independent patience-sort computation") {
    val out = CatalogDp.q416UserLis(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("lis_len")).toMap
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 100).cast("long").as("v"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[Long]("event_id"),
        r.getAs[Long]("v")))
      .groupBy(_._1)
    ev.foreach { case (u, rows) =>
      val vs = rows.sortBy(r => (r._2.getTime, r._3)).map(_._4)
      // patience: tails(i) = min tail of an increasing subseq of len i+1
      val tails = scala.collection.mutable.ArrayBuffer[Long]()
      vs.foreach { v =>
        val i = tails.indexWhere(_ >= v) // strictly increasing
        if (i < 0) tails += v else tails(i) = v
      }
      assert(out(u) === tails.length.toLong, s"user $u")
    }
  }

  test("rho: per-cycle rows match a driver-side brute-force walk of h") {
    val out = CatalogDp.q417RhoCycles(spark, sf).collect()
      .map(r => r.getAs[Long]("cycle_id") ->
        (r.getAs[Long]("cycle_len"), r.getAs[Long]("basin_size"),
          r.getAs[Long]("max_tail"))).toMap
    // reconstruct h exactly as the query defines it and walk it
    val keys = graft.Tables.customer(spark, sf)
      .select(col("c_custkey").as("v")).collect().map(_.getLong(0))
    val n = keys.length.toLong
    val hm = graft.Tables.customer(spark, sf)
      .select(col("c_custkey").as("v"),
        pmod(conv(substring(md5(concat(lit("rho:"), col("c_custkey"))), 1, 10),
          16, 10).cast("long"), lit(n)).as("hv"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // find cycle nodes: iterate far enough that every walk is on-cycle
    def land(v: Long): Long = {
      var x = v; var steps = 0L
      while (steps < 2 * n) { x = hm(x); steps += 1 }
      x
    }
    // cycle membership: x on cycle iff walking from land(x) returns to it
    val cyc = scala.collection.mutable.Set[Long]()
    keys.foreach { v =>
      val c = land(v)
      if (!cyc.contains(c)) {
        var x = hm(c)
        val ring = scala.collection.mutable.Set(c)
        while (x != c) { ring += x; x = hm(x) }
        cyc ++= ring
      }
    }
    def cycleId(c: Long): Long = {
      var x = hm(c); var mn = c
      while (x != c) { mn = math.min(mn, x); x = hm(x) }
      mn
    }
    def tail(v: Long): Long = {
      var x = v; var t = 0L
      while (!cyc.contains(x)) { x = hm(x); t += 1 }
      t
    }
    val brute = keys.groupBy(v => cycleId(land(v))).map { case (cid, vs) =>
      val ring = cyc.filter(c => cycleId(c) == cid)
      cid -> (ring.size.toLong, vs.length.toLong, vs.map(tail).max)
    }
    assert(out === brute)
  }
}
