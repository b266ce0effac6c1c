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

  test("LIS: the patience aggregator matches the retained relaxation " +
      "implementation row for row (cross-implementation law), and the " +
      "relaxation converges before its round cap") {
    val agg = CatalogDp.q416UserLis(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("lis_len"))).toSet
    // requireConverged=true inside: reaching the cap still moving throws,
    // so a green run IS the convergence-before-cap assertion
    val relax = CatalogDp.lisByRelaxation(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("lis_len"))).toSet
    assert(agg === relax)
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
    // O(n) functional-graph analysis so the law affords sf0.1 (15k keys)
    // as well as sf0.01; h reconstructed exactly as the query defines it:
    // md5 picks an INDEX, the index maps through the rank of the key set
    // (the self-map contract that survives non-contiguous x10 domains).
    Seq(sf, "/root/testdata/sf0.1").foreach { d =>
      val out = CatalogDp.q417RhoCycles(spark, d).collect()
        .map(r => r.getAs[Long]("cycle_id") ->
          (r.getAs[Long]("cycle_len"), r.getAs[Long]("basin_size"),
            r.getAs[Long]("max_tail"))).toMap
      val keys = graft.Tables.customer(spark, d)
        .select(col("c_custkey")).collect().map(_.getLong(0)).sorted
      val n = keys.length
      val mdv = java.security.MessageDigest.getInstance("MD5")
      def hIdx(v: Long): Int = {
        val hex = mdv.digest(s"rho:$v".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(10)
        (java.lang.Long.parseLong(hex, 16) % n).toInt
      }
      val h: Array[Int] = keys.map(hIdx)
      // cycle detection by path coloring: 0 unvisited, 1 on current path,
      // 2 finished
      val state = Array.fill(n)(0)
      val onCycle = Array.fill(n)(false)
      for (s0 <- 0 until n if state(s0) == 0) {
        val path = scala.collection.mutable.ArrayBuffer[Int]()
        var x = s0
        while (state(x) == 0) { state(x) = 1; path += x; x = h(x) }
        if (state(x) == 1) {
          var j = path.indexOf(x)
          while (j < path.length) { onCycle(path(j)) = true; j += 1 }
        }
        path.foreach(state(_) = 2)
      }
      // cycle id = min KEY on the ring; tails + landing cycle by memoized
      // recursion unrolled onto an explicit stack
      val cid = Array.fill(n)(-1L)
      for (i <- 0 until n if onCycle(i) && cid(i) < 0) {
        var x = i; var mn = keys(i)
        while ({ x = h(x); x != i }) mn = math.min(mn, keys(x))
        cid(i) = mn
        x = i
        while ({ x = h(x); x != i }) cid(x) = mn
      }
      val tail = Array.fill(n)(-1L)
      val land = Array.fill(n)(-1L)
      for (i <- 0 until n) {
        val stack = scala.collection.mutable.ArrayBuffer[Int]()
        var x = i
        while (!onCycle(x) && tail(x) < 0) { stack += x; x = h(x) }
        var t = if (onCycle(x)) 0L else tail(x)
        val c = if (onCycle(x)) cid(x) else land(x)
        for (y <- stack.reverseIterator) { t += 1L; tail(y) = t; land(y) = c }
      }
      val brute = (0 until n)
        .groupBy(i => if (onCycle(i)) cid(i) else land(i))
        .map { case (c, vs) =>
          c -> ((0 until n).count(i => onCycle(i) && cid(i) == c).toLong,
            vs.size.toLong,
            vs.map(i => if (onCycle(i)) 0L else tail(i)).max)
        }
      assert(out === brute, s"at $d")
    }
  }
}
