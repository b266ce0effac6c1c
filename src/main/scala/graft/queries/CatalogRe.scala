package graft.queries

import graft.Tables
import graft.ops.IterativeLoop
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Round-11 reconciliation & robustness wave:
 *
 *  - q430 Merkle-range snapshot diff — the incremental-replication /
 *    backfill-detection primitive at 100 TB: per-key-range XOR digests
 *    localize changes to buckets with ONE aggregate per side, and the
 *    row-level drill-down (insert/update/delete classification) touches
 *    ONLY the changed buckets via a semi-join. XOR is order-independent
 *    and overflow-free, so the bucket digest is a pure function of the
 *    bucket's row multiset in both engines.
 *  - q431 MAD robust outliers — median / median-absolute-deviation
 *    flagging composed from TWO runs of the exact no-sort quantile
 *    primitive ([[graft.ops.Quantiles]]): median of cents, then median
 *    of |cents − median|, then one filtered aggregate. The robust
 *    z-score every data-quality gate wants, with zero distributional
 *    assumptions and zero global sorts.
 */
object CatalogRe {

  // ---------------------------------------------------------------- q430

  private[graft] val RcBucket = 4096L

  /** Snapshot A = orders; snapshot B = A with deterministic md5-selected
    * mutations (≈1% rows deleted, ≈1% price-bumped, ≈0.1% cloned to new
    * keys — the three change classes a replication audit must separate).
    * Row digest: 60-bit md5 of the canonical row string; bucket =
    * okey div [[RcBucket]]. Output: per changed bucket, the
    * deleted/inserted/updated counts. */
  def q430MerkleDiff(s: SparkSession, dir: String): DataFrame = {
    val a = IterativeLoop.cutLazy(Tables.orders(s, dir).select(
      col("o_orderkey").as("okey"),
      round(col("o_totalprice") * 100).cast("long").as("cents")))
    def hashed(df: DataFrame): DataFrame = df.select(
      col("okey"), expr(s"okey div $RcBucket").as("bucket"),
      conv(substring(md5(concat(lit("o:"), col("okey"), lit("|"), col("cents"))),
        1, 15), 16, 10).cast("long").as("h"))
    val delSel = conv(substring(md5(concat(lit("del:"), col("okey"))), 1, 8),
      16, 10).cast("long") % 100L === 0L
    val updSel = conv(substring(md5(concat(lit("upd:"), col("okey"))), 1, 8),
      16, 10).cast("long") % 100L === 0L
    val insSel = conv(substring(md5(concat(lit("ins:"), col("okey"))), 1, 8),
      16, 10).cast("long") % 1000L === 0L
    val b = IterativeLoop.cutLazy(
      a.filter(!delSel)
        .select(col("okey"),
          when(updSel, col("cents") + 1000L).otherwise(col("cents")).as("cents"))
        .unionByName(a.filter(insSel)
          .select((col("okey") + lit(1000000000L)).as("okey"), col("cents"))))
    val ha = hashed(a)
    val hb = hashed(b)
    // level 1: one aggregate per side — bucket digests
    def dig(df: DataFrame, xc: String, cc: String): DataFrame =
      df.groupBy(col("bucket"))
        .agg(expr("bit_xor(h)").as(xc), count(lit(1)).as(cc))
    val changed = IterativeLoop.cutLazy(
      dig(ha, "xa", "ca").join(dig(hb, "xb", "cb"), Seq("bucket"), "full_outer")
        .filter(col("xa").isNull || col("xb").isNull ||
          col("xa") =!= col("xb") || col("ca") =!= col("cb"))
        .select(col("bucket")))
    // level 2: row drill-down touches ONLY the changed buckets.
    // Round 16: cut the four drill-down frames — aIn/bIn each feed two
    // anti-joins and aOnly/bOnly feed two/three classification branches,
    // so without the cuts every branch re-ran the md5 row-digest pass over
    // its side (the missing-loop-invariant class, guide §2.4). All four
    // are changed-bucket-sized (~2% of rows), so the persisted blocks are
    // small. Values untouched.
    val aIn = IterativeLoop.cutLazy(ha.join(changed, Seq("bucket"), "left_semi"))
    val bIn = IterativeLoop.cutLazy(hb.join(changed, Seq("bucket"), "left_semi"))
    val aOnly = IterativeLoop.cutLazy(aIn.join(bIn, Seq("okey", "h"), "left_anti"))
    val bOnly = IterativeLoop.cutLazy(bIn.join(aIn, Seq("okey", "h"), "left_anti"))
    val upd = aOnly.join(bOnly.select(col("okey")), Seq("okey"), "left_semi")
      .select(col("bucket"), lit("u").as("kind"))
    val del = aOnly.join(bOnly.select(col("okey")), Seq("okey"), "left_anti")
      .select(col("bucket"), lit("d").as("kind"))
    val ins = bOnly.join(aOnly.select(col("okey")), Seq("okey"), "left_anti")
      .select(col("bucket"), lit("i").as("kind"))
    upd.unionByName(del).unionByName(ins)
      .groupBy(col("bucket"))
      .agg(sum(when(col("kind") === "d", 1L).otherwise(0L)).as("n_deleted"),
        sum(when(col("kind") === "i", 1L).otherwise(0L)).as("n_inserted"),
        sum(when(col("kind") === "u", 1L).otherwise(0L)).as("n_updated"))
      .orderBy(col("bucket"))
  }

  // ---------------------------------------------------------------- q431

  private[graft] val MadK = 5L

  /** Robust outlier gate on event values: median and MAD by two runs of
    * the exact histogram-refinement k-th-smallest, then flag rows with
    * |cents − median| > [[MadK]]·MAD. One summary row: the population,
    * the two robust statistics, and the tail counts each side. */
  def q431MadOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cents = IterativeLoop.cutLazy(Tables.events(s, dir)
      .select(round(col("value") * 100).cast("long").as("c")))
    val n = cents.count()
    val med = graft.ops.Quantiles.kthSmallest(cents, "c",
      Seq(("med", (n + 1L) / 2L))).head._3
    val dev = IterativeLoop.cutLazy(
      cents.select(abs(col("c") - lit(med)).as("c")))
    val mad = graft.ops.Quantiles.kthSmallest(dev, "c",
      Seq(("mad", (n + 1L) / 2L))).head._3
    val thr = MadK * mad
    cents.agg(
      count(lit(1)).as("n"),
      sum(when(col("c") < lit(med - thr), 1L).otherwise(0L)).as("n_low"),
      sum(when(col("c") > lit(med + thr), 1L).otherwise(0L)).as("n_high"))
      .select(lit(med).as("median_cents"), lit(mad).as("mad_cents"),
        lit(thr).as("threshold"), col("n"), col("n_low"), col("n_high"))
  }

  // ---------------------------------------------------------------- q435

  private[graft] val CoordPct = 5L

  /** Coordinated (join-consistent) sampling: orders AND lineitems are
    * both sampled by the SAME md5 predicate on the JOIN KEY
    * (md5(okey) mod 100 < [[CoordPct]]), so the sampled child table is
    * exactly the sampled parents' children — the debug-at-scale
    * technique that lets a 5% slice answer join-shaped questions a
    * per-table Bernoulli sample destroys (independent 5% samples keep
    * only ~0.25% of join pairs). Output: per-orderpriority sampled
    * order/line counts plus the basket-size mean as one exact divide —
    * the statistic a coordinated slice estimates and an uncoordinated
    * one cannot. FK-closure (every sampled order keeps ALL its lines)
    * is the spec law. */
  def q435CoordSample(s: SparkSession, dir: String): DataFrame = {
    def keep(k: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit("cs:"), k)), 1, 8), 16, 10)
        .cast("long") % 100L < CoordPct
    val o = Tables.orders(s, dir)
      .filter(keep(col("o_orderkey")))
      .select(col("o_orderkey"), col("o_orderpriority"))
    val l = Tables.lineitem(s, dir)
      .filter(keep(col("l_orderkey")))
      .select(col("l_orderkey"))
    val lc = l.groupBy(col("l_orderkey")).agg(count(lit(1)).as("nl"))
    o.join(lc, col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(coalesce(col("nl"), lit(0L))).as("n_lines"))
      .withColumn("mean_basket",
        col("n_lines").cast("double") / col("n_orders").cast("double"))
      .orderBy(col("priority"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q430_merkle_diff"  -> q430MerkleDiff _,
    "q431_mad_outliers" -> q431MadOutliers _,
    "q435_coord_sample" -> q435CoordSample _)
}
