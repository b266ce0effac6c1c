package graft.queries

import graft.Tables
import graft.ops.IterativeLoop
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Round-10d wave: discrete-algorithm verbs — Huffman code lengths over
 * the token vocabulary (the optimal-prefix-code baseline every entropy
 * coder is judged against; the merge heap is vocabulary-sized by
 * construction, the same driver-fold contract as the BPE merge table),
 * longest increasing subsequence per user event stream (synchronous
 * longest-path relaxation over the in-user precedence pairs), and the
 * cycle structure of a hash self-map over the customer-key domain
 * (Flajolet–Odlyzko random-mapping statistics: cycle nodes via 2^k
 * pointer squaring, cycle ids via min-label jumping, tail lengths via
 * the binary descend — the hash-chain / RNG-period analysis shape).
 * Determinism contract as everywhere: integer state, md5 randomness,
 * total-order tiebreaks.
 */
object CatalogDp {

  // ---------------------------------------------------------------- q415

  /** Huffman code lengths for the corpus token vocabulary: classic
    * two-smallest merging with a CANONICAL total-order tiebreak — heap
    * entries are (weight, sorted member list) compared by weight then
    * lexicographic member list (elementwise, shorter-prefix-first),
    * exactly DuckDB's struct/list comparison, so both engines replay
    * the identical merge sequence. The heap is vocabulary-sized by
    * construction (driver fold, same contract as the BPE merge table);
    * the corpus-sized work is one token-count aggregate. */
  def q415Huffman(s: SparkSession, dir: String): DataFrame = {
    import scala.math.Ordering.Implicits.seqOrdering
    val counts = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    // The fold's member-list bookkeeping is O(V²) in the vocabulary — the
    // bound is what that cost structure actually affords on a driver, not
    // the BPE table's 65536. The tiebreak compares member lists as Scala
    // UTF-16 strings vs DuckDB's UTF-8 memcmp; those orders agree only
    // for ASCII tokens, so the assumption is enforced, not assumed.
    require(counts.size <= 4096, s"vocabulary-bounded fold: ${counts.size}")
    require(counts.forall(_._1.forall(_ < 128)),
      "canonical tiebreak requires ASCII tokens (UTF-16 vs UTF-8 order)")
    val lens = scala.collection.mutable.Map(counts.map(c => c._1 -> 0L): _*)
    implicit val ord: Ordering[(Long, List[String])] =
      Ordering.Tuple2(Ordering.Long, seqOrdering[List, String])
    // TreeSet instead of re-sorting the whole heap per merge: entries are
    // (weight, disjoint member list) so never equal; first two elements
    // ARE the two smallest under the identical canonical order.
    val heap = scala.collection.mutable.TreeSet.empty[(Long, List[String])]
    counts.foreach { case (t, w) => heap += ((w, List(t))) }
    while (heap.size > 1) {
      val a = heap.head; heap -= a
      val b = heap.head; heap -= b
      (a._2 ++ b._2).foreach(t => lens(t) += 1L)
      heap += ((a._1 + b._1, (a._2 ++ b._2).sorted))
    }
    val rows = counts.map { case (t, w) => (t, w, lens(t)) }
    val spark = s
    import spark.implicits._
    val df = rows.toDF("tok", "cnt", "code_len")
    val tot = df.agg(sum(col("cnt") * col("code_len")).as("total_bits"))
    df.crossJoin(broadcast(graft.ops.Guards.scalar(tot))).orderBy(col("tok"))
  }

  // ---------------------------------------------------------------- q416

  private[graft] val LisRounds = 32

  /** Longest strictly-increasing subsequence of each user's event-value
    * stream (time order). LIS is a per-user statistic, so the production
    * shape is ONE shuffle on user_id and a local O(n log n) patience
    * computation per group ([[graft.functions.LisAgg]], partial-agg
    * friendly, group size require()-capped) — each event moves exactly
    * once, vs the former synchronous relaxation that re-joined the
    * O(Σ n_u²) precedence-pair frame once per round for max-LIS rounds.
    * The relaxation survives as [[lisByRelaxation]], the spec's
    * independent cross-implementation law baseline (DpWaveSpec asserts
    * aggregator ≡ relaxation on real data; the DuckDB oracle replays the
    * relaxation rounds, so the hash-match crosses implementations too). */
  def q416UserLis(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"),
        round(col("value") * 100).cast("long").as("v"))
      .as[(Long, Long, Long, Long)]
    ev.groupByKey(_._1)
      .mapValues(r => (r._2, r._3, r._4))
      .agg(graft.functions.LisAgg.lis.toColumn.name("r"))
      .toDF("user_id", "r")
      .select(col("user_id"), col("r._1").as("n_events"), col("r._2").as("lis_len"))
      .orderBy(col("user_id"))
  }

  /** The synchronous longest-path relaxation form of [[q416UserLis]]:
    * L(i) ← max(L(i), 1 + max over precedence pairs L(j)) until the exact
    * fixed point (early exit via the monotone stationary-sum probe;
    * 32-round cap as the loud-failure guard — after r rounds L is
    * min(truth, r+1), so a saturated cap would be silently wrong in both
    * engines). Retained as the law baseline the patience aggregator is
    * checked against, and as the fixedUntil exemplar. */
  private[graft] def lisByRelaxation(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 100).cast("long").as("v"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id")))
        .cast("long"))
      .select(col("user_id"), col("rn"), col("v"))
    val evc = IterativeLoop.cutLazy(ev)
    val pairs = IterativeLoop.cutLazy(
      evc.select(col("user_id"), col("rn").as("rj"), col("v").as("vj"))
        .join(evc.select(col("user_id"), col("rn").as("ri"), col("v").as("vi")),
          Seq("user_id"))
        .filter(col("rj") < col("ri") && col("vj") < col("vi"))
        .select(col("user_id"), col("rj"), col("ri")))
    val l0 = evc.select(col("user_id"), col("rn"), lit(1L).as("l"))
    // fixedUntil: the relaxation converges after max-LIS rounds (E[LIS]
    // ≈ 2√n ≈ 20 at 99 events/user), so the 32-round cap is a guard, not
    // the workload — early exit is hash-identical (step(fp)=fp) and
    // requireConverged turns cap saturation into a loud failure at the
    // loop itself, complementing the in-plan assert below. The probe is
    // the cheap stationary-sum form, sound here because l is per-key
    // MONOTONE non-decreasing over an invariant (user, rn) key set:
    // sum(l) unchanged ⟺ no l moved ⟺ fixed point.
    val fin = IterativeLoop.fixedUntil(l0, LisRounds, requireConverged = true,
        sameAs = IterativeLoop.stationaryAgg(
          df => df.agg(sum(col("l"))).collect().toSeq.map(_.getLong(0)))) {
        (lf, _) =>
      val best = pairs
        .join(lf.select(col("user_id"), col("rn").as("rj"), col("l")),
          Seq("user_id", "rj"))
        .groupBy(col("user_id"), col("ri").as("rn"))
        .agg((max(col("l")) + 1L).as("cand"))
      lf.join(best, Seq("user_id", "rn"), "left")
        .select(col("user_id"), col("rn"),
          greatest(col("l"), coalesce(col("cand"), lit(0L))).as("l"))
    }
    // Cap saturation must fail loudly, not hash-match a wrong answer: after
    // r rounds L = min(true LIS, r+1), so lis_len == LisRounds+1 is
    // indistinguishable from a longer truth. In-plan assert_true (not a
    // driver-side re-aggregate, which would force the whole relaxation a
    // second time): assert_true yields NULL when the guard holds, so the
    // coalesce-filter keeps every row and raises on the first violation.
    fin.df.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("l")).as("lis_len"))
      .filter(coalesce(assert_true(col("lis_len") <= lit(LisRounds.toLong),
        lit(s"LIS relaxation cap saturated: lis_len reached ${LisRounds + 1}; " +
          "raise LisRounds")), lit(true)))
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q417

  /** Random-mapping (rho) cycle structure of the md5 self-map
    * h(v) = md5("rho:"+v) mod N over the customer-key domain: cycle
    * nodes are the image of h^(2^K) (all tails consumed once 2^K ≥ N —
    * require()d), cycle ids are the cycle-minimum via pointer-jumping
    * min-label (K rounds), tail lengths via the binary descend over the
    * stored 2^j-step maps (greedy high-bit jumps that stay off-cycle ⇒
    * exact distance), basins by landing cycle. Every step is an
    * equi-join on the key domain — the Pollard-rho / hash-chain /
    * RNG-period analysis, distributed. Output: per-cycle length, basin
    * size and max tail (Flajolet–Odlyzko statistics, exactly). */
  def q417RhoCycles(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.customer(s, dir).select(col("c_custkey").as("v"))
    val n = keys.count()
    // Round 15: the number of squaring/descend/label rounds adapts to the
    // domain — the smallest K with 2^K ≥ n — instead of the fixed
    // worst-case 20 (guide §1.2 step 1: don't run passes you provably
    // don't need). Every output is a pure function of the self-map h once
    // 2^K ≥ n: z = h^(2^K) has consumed every tail (tail ≤ n−1 < 2^K), the
    // K-round pointer-jump min spans ≥ cycle length, and the binary
    // descend can represent every tail ≤ 2^K−1 — so K = 14 at sf0.1
    // (n = 15k) computes bit-identically to K = 20 while running 30%
    // fewer join rounds, and a 10⁹-key domain gets K = 30 automatically
    // (the old constant would have FAILED the require at n ≥ 2^20).
    val rhoK = math.max(1,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1L)))
    require(rhoK <= 40, s"rho descend domain implausibly large: $n keys")
    // h must be a SELF-map on the actual key set, whatever its shape —
    // md5 mod n alone lands in [0,n), which only coincides with the keys
    // when they happen to be 0..n-1 (true at sf0.01/sf0.1, FALSE for the
    // ×10 replicas, whose copies are offset by 10M). So the hash picks an
    // index and the index maps through the rank of the key set: h(v) =
    // key_at_rank(md5(v) mod n). On contiguous 0-based keys rank(v) = v
    // and h is bit-identical to the plain mod map.
    val ranked = IterativeLoop.cutLazy(
      graft.ops.DistributedRank.withRowNumber(keys, "idx", col("v"))
        .select(col("v"), (col("idx") - 1L).as("idx")))
    val h = IterativeLoop.cutLazy(keys.select(col("v"),
        pmod(conv(substring(md5(concat(lit("rho:"), col("v"))), 1, 10), 16, 10)
          .cast("long"), lit(n)).as("hidx"))
      .join(ranked.select(col("idx").as("hidx"), col("v").as("hv")), "hidx")
      .select(col("v"), col("hv")))
    // maps(j): v -> h^(2^j)(v), j = 0..K-1, by repeated squaring
    val maps = new Array[DataFrame](rhoK)
    maps(0) = h.select(col("v"), col("hv").as("m"))
    // squaring loop: cutFresh, not cutLazy — the checkpoint-inherited
    // size estimate would square every round (see IterativeLoop.cutFresh)
    for (j <- 1 until rhoK)
      maps(j) = IterativeLoop.cutFresh(
        maps(j - 1).join(
          maps(j - 1).select(col("v").as("m"), col("m").as("m2")), "m")
          .select(col("v"), col("m2").as("m")))
    // z = h^(2^K)(v): one more squaring; its image is exactly the cycle set
    val z = IterativeLoop.cutFresh(
      maps(rhoK - 1).join(
        maps(rhoK - 1).select(col("v").as("m"), col("m").as("m2")), "m")
        .select(col("v"), col("m2").as("z")))
    val cyc = IterativeLoop.cutLazy(z.select(col("z").as("c")).distinct())
    // cycle id = min label over the cycle, pointer-jumping in K rounds
    val st0 = cyc.join(h.select(col("v").as("c"), col("hv").as("p")), "c")
      .select(col("c"), col("p"), least(col("c"), col("p")).as("mn"))
    val lab = IterativeLoop.fixedFresh(st0, rhoK) { (st, _) =>
      st.join(st.select(col("c").as("p"), col("p").as("p2"),
          col("mn").as("mn2")), "p")
        .select(col("c"), col("p2").as("p"),
          least(col("mn"), col("mn2")).as("mn"))
    }.select(col("c"), col("mn").as("cycle_id"))
    // tail length: binary descend over maps(K-1 .. 0)
    val isCyc = cyc.select(col("c").as("cur"), lit(true).as("oncyc"))
    var desc = keys.select(col("v"), col("v").as("cur"), lit(0L).as("d"))
    for (j <- (0 until rhoK).reverse) {
      val cand = desc.join(maps(j).select(col("v").as("cur"),
          col("m").as("nxt")), "cur")
        .join(isCyc.select(col("cur").as("nxt"), col("oncyc")),
          Seq("nxt"), "left")
      desc = IterativeLoop.cutFresh(cand.select(col("v"),
        when(col("oncyc").isNull, col("nxt")).otherwise(col("cur")).as("cur"),
        when(col("oncyc").isNull, col("d") + (1L << j)).otherwise(col("d"))
          .as("d")))
    }
    val tails = desc
      .join(isCyc.select(col("cur").as("v"), col("oncyc").as("von")),
        Seq("v"), "left")
      .select(col("v"),
        when(col("von").isNotNull, lit(0L)).otherwise(col("d") + 1L).as("tail"))
    // basin: v belongs to the cycle its landmark z(v) labels
    val basin = z.join(lab.select(col("c").as("z"), col("cycle_id")), "z")
      .select(col("v"), col("cycle_id"))
    val cycLen = lab.groupBy(col("cycle_id")).agg(count(lit(1)).as("cycle_len"))
    basin.join(tails, "v")
      .groupBy(col("cycle_id"))
      .agg(count(lit(1)).as("basin_size"), max(col("tail")).as("max_tail"))
      .join(cycLen, Seq("cycle_id"))
      .select(col("cycle_id"), col("cycle_len"), col("basin_size"),
        col("max_tail"))
      .orderBy(col("cycle_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q415_huffman"    -> q415Huffman _,
    "q416_user_lis"   -> q416UserLis _,
    "q417_rho_cycles" -> q417RhoCycles _)
}
