package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Round-9 wave 12: evaluation-and-allocation verbs — linkage blocking
 * quality on planted ground truth, an ε-greedy bandit replay (integer
 * state, oracle-replayed day by day), inverse-MAE forecast combination,
 * joint tail dependence, restricted mean survival time, water-filling
 * allocation, shift-share decomposition, Laspeyres/Paasche/Fisher price
 * indices, Harrell's concordance on a bounded sample, and ABC/XYZ
 * inventory classification. Determinism contract unchanged; the one new
 * primitive is the t-ascending MULTIPLICATIVE fold (bounded prefix
 * products for KM survival curves).
 */
object CatalogPlan {

  // Round 16: the ordered fold runs as ONE codegen'd kernel
  // (graft_ordered_sum) instead of the interpreted transform+aggregate
  // HOF pair — bit-compatible per OrderedStructSum's doc (same adds in
  // the same sorted order, same int->double cast per element).
  private def foldSorted(k: Column, v: Column): Column =
    graft.functions.GraftFunctions.orderedSum(
      sort_array(collect_list(struct(k.as("k"), v.as("v")))))

  /** Multiplicative ordered fold — mirror of DuckDB's
    * `list_reduce(list_prepend(1.0, list(v ORDER BY k)), (a,x) -> a*x)`. */
  private def foldSortedMul(k: Column, v: Column): Column =
    aggregate(
      transform(sort_array(collect_list(struct(k.as("k"), v.as("v")))),
        e => e("v")),
      lit(1.0), (acc, x) => acc * x)

  private def cents(c: Column): Column = round(c * 100).cast("long")

  private def u32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Record-linkage blocking quality on the q341 planted ground truth
    * (every 10th customer has a known corrupted duplicate): for three
    * blocking schemes — name suffix (survives the planted char-4 deletion), market segment, $1000 balance band —
    * the reduction ratio (candidate pairs ∕ all pairs) and the RECALL of
    * true pairs, both exact integer ratios. The measure-before-you-block
    * step of q119/q278's fuzzy matching. */
  def q386BlockingQuality(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir)
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey").as("k"), col("c_name").as("nm"),
        cents(col("c_acctbal")).as("bal"), col("c_mktsegment").as("seg"))
    val clone = base.select(col("k"),
      concat(substring(col("nm"), 1, 3), substring(col("nm"), 5, 1000))
        .as("nm"),
      (col("bal") + (u32(concat(lit("bd:"), col("k"))) % 10001L - 5000L))
        .as("bal"),
      col("seg"))
    val recs = base.withColumn("side", lit(0L))
      .unionByName(clone.withColumn("side", lit(1L)))
    def scheme(name: String, key: Column): DataFrame = {
      val keyed = recs.withColumn("bk", key)
      val blocks = keyed.groupBy(col("bk")).agg(count(lit(1)).as("c"))
      val stats = blocks.agg(count(lit(1)).as("n_blocks"),
        expr("sum(c * (c - 1) div 2)").as("cand_pairs"),
        sum(col("c")).as("n_recs"))
      val hits = keyed.filter(col("side") === 0).alias("a")
        .join(keyed.filter(col("side") === 1).alias("b"),
          col("a.k") === col("b.k") && col("a.bk") === col("b.bk"))
        .agg(count(lit(1)).as("true_in_block"))
      val truth = base.agg(count(lit(1)).as("n_true"))
      stats.crossJoin(broadcast(graft.ops.Guards.scalar(hits))).crossJoin(broadcast(graft.ops.Guards.scalar(truth)))
        .select(lit(name).as("scheme"), col("n_blocks"), col("cand_pairs"),
          (col("true_in_block").cast("double") / col("n_true").cast("double"))
            .as("recall"),
          (col("cand_pairs").cast("double")
            / expr("(n_recs * (n_recs - 1)) div 2").cast("double"))
            .as("reduction_ratio"))
    }
    Seq(scheme("name_suffix4", substring(col("nm"), -4, 4)),
        scheme("segment", col("seg")),
        scheme("balance_band", expr("bal div 100000").cast("string")))
      .reduce(_ unionByName _).orderBy(col("scheme"))
  }

  /** ε-greedy bandit replay over the order history: three segment "arms",
    * day-grain rewards (that day's segment revenue cents), 10% md5
    * exploration, greedy exploitation by exact cross-multiplied mean
    * comparison (untried arms first, index tie-break) — the WHOLE replay
    * is integer arithmetic, run driver-side on the bounded day×arm grid
    * and replayed by the oracle's recursive CTE step for step. Output:
    * chosen-policy reward vs best-fixed-arm oracle and the regret. */
  def q387BanditReplay(s: SparkSession, dir: String): DataFrame = {
    val arms = Seq("AUTOMOBILE", "BUILDING", "MACHINERY")
    val o = Tables.orders(s, dir).join(
      Tables.customer(s, dir).select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("seg")), Seq("o_custkey"))
      .filter(col("seg").isin(arms: _*))
    val daily = o.groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("ds"))
      .pivot("seg", arms).agg(coalesce(sum(cents(col("o_totalprice"))), lit(0L)))
      .na.fill(0L, arms)
      .orderBy(col("ds"))
      .collect().map(r => (r.getString(0),
        Array(r.getLong(1), r.getLong(2), r.getLong(3))))
    // driver replay on the bounded day grid — integer ops only, mirrored
    // by the oracle's recursive CTE (same u32 draws, same comparisons)
    val sArr = Array(0L, 0L, 0L); val nArr = Array(0L, 0L, 0L)
    var tot = 0L; var nExplore = 0L
    var di = 0L
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(prefix: String, i: Long): Long = {
      val h = md.digest(s"$prefix$i".getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16)
    }
    daily.foreach { case (_, rev) =>
      di += 1
      val explore = u("bd:", di) % 10L == 0L
      val arm =
        if (explore) { nExplore += 1; (u("ba:", di) % 3L).toInt }
        else if (nArr(0) == 0) 0
        else if (nArr(1) == 0) 1
        else if (nArr(2) == 0) 2
        else {
          // argmax of sArr(a)/nArr(a) via cross-multiplication, low index wins ties
          var best = 0
          if (sArr(1) * nArr(best) > sArr(best) * nArr(1)) best = 1
          if (sArr(2) * nArr(best) > sArr(best) * nArr(2)) best = 2
          best
        }
      sArr(arm) += rev(arm); nArr(arm) += 1; tot += rev(arm)
    }
    val oracleBest = (0 to 2).map(a => daily.map(_._2(a)).sum).max
    import s.implicits._
    Seq((daily.length.toLong, tot, nExplore, oracleBest, oracleBest - tot))
      .toDF("n_days", "policy_reward_cents", "n_explore",
        "best_fixed_arm_cents", "regret_cents")
  }

  /** Inverse-MAE forecast combination on daily revenue: persistence
    * (t−1), weekly naive (t−7), and the 7-day integer moving mean, each
    * with an exact integer MAE over the evaluable days; the combination
    * weights ∝ 1∕MAE and the combined MAE are fixed-parenthesization
    * doubles with day-ascending folds. The model-averaging verb over
    * q289/q313's single forecasters. */
  def q388ForecastCombo(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("ds"))
      .agg(sum(cents(col("o_totalprice"))).as("y"))
    val w = Window.orderBy(col("ds"))
    val f = daily
      .withColumn("f1", lag(col("y"), 1).over(w))
      .withColumn("f2", lag(col("y"), 7).over(w))
      .withColumn("f3", expr(
        "sum(y) over (order by ds rows between 7 preceding and 1 preceding) div 7"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 7)
    val maes = f.agg(count(lit(1)).as("n_eval"),
      sum(abs(col("y") - col("f1"))).as("ae1"),
      sum(abs(col("y") - col("f2"))).as("ae2"),
      sum(abs(col("y") - col("f3"))).as("ae3"))
    val comb = f.crossJoin(broadcast(graft.ops.Guards.scalar(maes)))
      .select(col("ds"), col("y"),
        ((col("f1").cast("double") / col("ae1").cast("double")
          + col("f2").cast("double") / col("ae2").cast("double")
          + col("f3").cast("double") / col("ae3").cast("double"))
          / (lit(1.0) / col("ae1").cast("double")
            + lit(1.0) / col("ae2").cast("double")
            + lit(1.0) / col("ae3").cast("double"))).as("fc"))
    val cmae = comb.agg(
      foldSorted(col("ds"), abs(col("y").cast("double") - col("fc")))
        .as("cae"))
    maes.crossJoin(broadcast(graft.ops.Guards.scalar(cmae)))
      .select(col("n_eval"),
        (col("ae1").cast("double") / col("n_eval").cast("double")).as("mae_persist"),
        (col("ae2").cast("double") / col("n_eval").cast("double")).as("mae_weekly"),
        (col("ae3").cast("double") / col("n_eval").cast("double")).as("mae_ma7"),
        (col("cae") / col("n_eval").cast("double")).as("mae_combined"))
  }

  /** Upper tail dependence between customer balance and customer spend:
    * exact p90 order-statistic thresholds per margin, λ_U = P(X>tx ∧
    * Y>ty) ∕ P(Y>ty) in exact integer counts, reported next to the
    * independence expectation — the joint-extremes dependence that
    * correlation (q207) and MI (q357) both blur. */
  def q389TailDependence(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("k"))
      .agg(sum(cents(col("o_totalprice"))).as("y"))
    val d = Tables.customer(s, dir)
      .select(col("c_custkey").as("k"), cents(col("c_acctbal")).as("x"))
      .join(spend, Seq("k"))
    val n = d.agg(count(lit(1)).as("n"))
    def p90(c: String): DataFrame = d.crossJoin(broadcast(graft.ops.Guards.scalar(n)))
      .withColumn("rn", row_number().over(
        Window.orderBy(col(c), col("k"))).cast("long"))
      .filter(col("rn") === expr("(n * 9 + 9) div 10"))
      .select(max(col(c)).as(s"t$c"))
    d.crossJoin(broadcast(graft.ops.Guards.scalar(p90("x")))).crossJoin(broadcast(graft.ops.Guards.scalar(p90("y"))))
      .agg(count(lit(1)).as("n_cust"),
        sum((col("x") > col("tx")).cast("long")).as("nx"),
        sum((col("y") > col("ty")).cast("long")).as("ny"),
        sum(((col("x") > col("tx")) && (col("y") > col("ty"))).cast("long"))
          .as("nboth"))
      .select(col("n_cust"), col("nx"), col("ny"), col("nboth"),
        (col("nboth").cast("double") / col("ny").cast("double"))
          .as("lambda_u"),
        (col("nx").cast("double") / col("n_cust").cast("double"))
          .as("independence_expect"))
  }

  /** Restricted mean survival time to the τ=60-day horizon, both arms:
    * KM survival via bounded prefix PRODUCTS (each S(tᵢ) is a
    * t-ascending multiplicative fold over the ≤31 death-time ratios —
    * the oracle computes the same product as a correlated ungrouped
    * fold, dodging the DuckDB grouped-list_reduce bug), RMST = Σ S·Δt.
    * The days-of-life-gained number q301's χ² can't give. */
  def q390Rmst(s: SparkSession, dir: String): DataFrame = {
    val tau = 60L
    val life = CatalogNext.survivalFrame(s, dir)
    def armRmst(g: Int): DataFrame = {
      val arm = life.filter(col("g") === g)
      val byT = arm.groupBy(col("t"))
        .agg(count(lit(1)).as("ending"), sum(col("death")).as("d"))
      val wRisk = Window.orderBy(col("t"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val deaths = byT
        .select(col("t"), col("d"), sum(col("ending")).over(wRisk).as("n"))
        .filter(col("d") > 0 && col("t") <= tau)
      val withS = deaths.alias("i").join(deaths.alias("j"),
          col("j.t") <= col("i.t"))
        .groupBy(col("i.t").as("t"))
        .agg(foldSortedMul(col("j.t"),
          (col("j.n") - col("j.d")).cast("double") / col("j.n").cast("double"))
          .as("s_at"))
      // segment contributions: S before t_i covers (t_{i-1}, t_i]
      val seg = withS
        .withColumn("tprev", coalesce(lag(col("t"), 1).over(
          Window.orderBy(col("t"))), lit(0L)))
        .withColumn("sprev", coalesce(lag(col("s_at"), 1).over(
          Window.orderBy(col("t"))), lit(1.0)))
      val tail = seg.agg(max(col("t")).as("tl"), min(col("s_at")).as("sl"))
      seg.agg(foldSorted(col("t"),
          col("sprev") * (col("t") - col("tprev")).cast("double")).as("head"))
        .crossJoin(broadcast(graft.ops.Guards.scalar(tail)))
        .select((col("head") + col("sl") * (lit(tau) - col("tl")).cast("double"))
          .as("rmst"), lit(g.toLong).as("g"))
    }
    armRmst(1).unionByName(armRmst(0))
      .groupBy().pivot(concat(lit("arm"), col("g")), Seq("arm0", "arm1"))
      .agg(first(col("rmst")))
      .select(col("arm0").as("rmst_ctrl_days"), col("arm1").as("rmst_treat_days"),
        (col("arm1") - col("arm0")).as("rmst_diff_days"))
  }

  /** Water-filling allocation of 60% capacity across the five event-type
    * queues: sorted-demand prefix scan finds the exact water level
    * L = (C − Σ smaller demands) ∕ k_remaining (one rational divide),
    * allocation = min(demand, L). Proportional-fairness without
    * iteration; conservation and clip laws in the spec. */
  def q391Waterfill(s: SparkSession, dir: String): DataFrame = {
    val q = Tables.events(s, dir)
      .groupBy(col("event_type").as("et")).agg(count(lit(1)).as("dem"))
    val cap = q.agg((sum(col("dem")) * 3L).as("c5"))  // C = 3/5 of total, x5 scaled
    val ranked = q.crossJoin(broadcast(graft.ops.Guards.scalar(cap)))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("dem"), col("et"))).cast("long"))
      .withColumn("cumSmaller", coalesce(sum(col("dem")).over(
        Window.orderBy(col("dem"), col("et"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)),
        lit(0L)))
      .withColumn("kRemain", lit(5L) - col("rk") + 1L)
      // level if this row is the first unclipped: (C - cumSmaller)/kRemain
      // (x5-scaled ints); the first row where demand*5 >= level*5 is it
      .withColumn("lvl5", (col("c5") - col("cumSmaller") * 5L).cast("double")
        / col("kRemain").cast("double"))
      .withColumn("clippedHere", col("dem").cast("double") * 5.0 <= col("lvl5"))
    val level = ranked.filter(!col("clippedHere"))
      .orderBy(col("rk")).limit(1).select(col("lvl5").as("level5"))
    ranked.crossJoin(broadcast(graft.ops.Guards.scalar(level)))
      .select(col("et").as("event_type"), col("dem").as("demand"),
        least(col("dem").cast("double"), col("level5") / lit(5.0))
          .as("allocation"),
        (col("dem").cast("double") > col("level5") / lit(5.0))
          .as("rationed"))
      .orderBy(col("event_type"))
  }

  /** Shift-share decomposition of revenue growth between the two calendar
    * halves: ΔY = Σₛ [y₀ₛ·G (national) + y₀ₛ·(gₛ−G) (segment mix)] with
    * G and gₛ exact integer-ratio growth rates — per-segment national/
    * competitive components and the conservation law Σ parts = ΔY. */
  def q392ShiftShare(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).join(
      Tables.customer(s, dir).select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("seg")), Seq("o_custkey"))
    val rng = o.agg(min(col("o_orderdate")).as("d0"), max(col("o_orderdate")).as("d1"))
    val halves = o.crossJoin(broadcast(graft.ops.Guards.scalar(rng)))
      .select(col("seg"),
        (datediff(col("o_orderdate"), col("d0")) * 2
          <= datediff(col("d1"), col("d0"))).cast("long").as("h1"),
        cents(col("o_totalprice")).as("v"))
    val bySeg = halves.groupBy(col("seg")).agg(
      sum(when(col("h1") === 1, col("v")).otherwise(0L)).as("y0"),
      sum(when(col("h1") === 0, col("v")).otherwise(0L)).as("y1"))
    val tot = bySeg.agg(sum(col("y0")).as("t0"), sum(col("y1")).as("t1"))
    bySeg.crossJoin(broadcast(graft.ops.Guards.scalar(tot)))
      .select(col("seg"), col("y0"), col("y1"),
        (col("y1") - col("y0")).cast("double").as("delta"),
        (col("y0").cast("double")
          * ((col("t1") - col("t0")).cast("double") / col("t0").cast("double")))
          .as("national_part"),
        (col("y0").cast("double")
          * ((col("y1") - col("y0")).cast("double") / col("y0").cast("double")
            - (col("t1") - col("t0")).cast("double") / col("t0").cast("double")))
          .as("competitive_part"))
      .orderBy(col("seg"))
  }

  /** Laspeyres, Paasche, and Fisher price indices between the two
    * calendar halves of lineitem: per-part unit values p = Σext∕Σqty
    * (cents per unit, one divide), index sums are partkey-ascending
    * folds over the common-part basket, Fisher is the one √ at the end.
    * The price-vs-volume split of q392's revenue growth. */
  def q393PriceIndex(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val rng = l.agg(min(col("l_shipdate")).as("d0"), max(col("l_shipdate")).as("d1"))
    val halves = l.crossJoin(broadcast(graft.ops.Guards.scalar(rng)))
      .select(col("l_partkey").as("pk"),
        (datediff(col("l_shipdate"), col("d0")) * 2
          <= datediff(col("d1"), col("d0"))).cast("long").as("h1"),
        cents(col("l_extendedprice")).as("ext"),
        round(col("l_quantity")).cast("long").as("qty"))
    val byPart = halves.groupBy(col("pk")).agg(
      sum(when(col("h1") === 1, col("ext")).otherwise(0L)).as("e0"),
      sum(when(col("h1") === 1, col("qty")).otherwise(0L)).as("q0"),
      sum(when(col("h1") === 0, col("ext")).otherwise(0L)).as("e1"),
      sum(when(col("h1") === 0, col("qty")).otherwise(0L)).as("q1"))
      .filter(col("q0") > 0 && col("q1") > 0)
    def price(e: Column, q: Column): Column = e.cast("double") / q.cast("double")
    val sums = byPart.agg(count(lit(1)).as("n_parts"),
      foldSorted(col("pk"), price(col("e1"), col("q1")) * col("q0").cast("double"))
        .as("p1q0"),
      foldSorted(col("pk"), price(col("e0"), col("q0")) * col("q0").cast("double"))
        .as("p0q0"),
      foldSorted(col("pk"), price(col("e1"), col("q1")) * col("q1").cast("double"))
        .as("p1q1"),
      foldSorted(col("pk"), price(col("e0"), col("q0")) * col("q1").cast("double"))
        .as("p0q1"))
    sums.select(col("n_parts"),
      (col("p1q0") / col("p0q0")).as("laspeyres"),
      (col("p1q1") / col("p0q1")).as("paasche"),
      sqrt((col("p1q0") / col("p0q0")) * (col("p1q1") / col("p0q1")))
        .as("fisher"))
  }

  /** Harrell's concordance index of the activity predictor (per-user
    * event count) against time-to-conversion, on the md5 bottom-400 user
    * sample (pairs are O(sample²) by construction — the bounded audit
    * shape): permissible pairs = shorter time had the event; concordant
    * = busier user converted first. Exact integer counts, ties split. */
  def q394HarrellC(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val act = ev.groupBy(col("user_id")).agg(count(lit(1)).as("activity"))
    val users = ev.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("first_d"),
        min(when(col("event_type") === "purchase" && col("value") > 150.0,
          to_date(col("ts")))).as("conv_d"))
    val horizon = ev.agg(max(to_date(col("ts"))).as("max_d"))
    val life = users.crossJoin(broadcast(graft.ops.Guards.scalar(horizon)))
      .select(col("user_id"),
        datediff(coalesce(col("conv_d"), col("max_d")), col("first_d"))
          .cast("long").as("t"),
        col("conv_d").isNotNull.cast("long").as("death"))
      .join(act, Seq("user_id"))
      .withColumn("pri", u32(concat(lit("hc:"), col("user_id"))))
      .orderBy(col("pri"), col("user_id")).limit(400)
      .select(col("user_id"), col("t"), col("death"), col("activity"))
    val pairs = life.alias("a").join(life.alias("b"),
        col("a.user_id") < col("b.user_id"))
      .select(
        when(col("a.t") < col("b.t"), col("a.death"))
          .when(col("b.t") < col("a.t"), col("b.death"))
          .otherwise(lit(0L)).as("permissible"),
        when(col("a.t") < col("b.t"),
          signum((col("a.activity") - col("b.activity")).cast("double")))
          .otherwise(signum((col("b.activity") - col("a.activity"))
            .cast("double"))).cast("long").as("dir"))
      .filter(col("permissible") === 1)
    // no-silent-caps: the audit runs on the md5 bottom-400 user sample
    // (pairs are O(sample²) by construction) — surface the sample size
    // and the full user universe so the truncation is visible
    val totals = users.agg(count(lit(1)).as("n_users_total"))
    pairs.agg(count(lit(1)).as("n_permissible"),
        sum((col("dir") === 1).cast("long")).as("concordant"),
        sum((col("dir") === -1).cast("long")).as("discordant"),
        sum((col("dir") === 0).cast("long")).as("tied"))
      .crossJoin(broadcast(graft.ops.Guards.scalar(totals)))
      .select(col("n_permissible"), col("concordant"), col("discordant"),
        ((col("concordant").cast("double") + lit(0.5) * col("tied").cast("double"))
          / col("n_permissible").cast("double")).as("c_index"),
        col("n_users_total"),
        least(lit(400L), col("n_users_total")).as("n_sampled"))
  }

  /** ABC∕XYZ inventory classification of parts: ABC by cumulative revenue
    * share (80∕95 cuts on the revenue-descending cumulative window,
    * partkey tie-break), XYZ by demand variability (CV² = n·Σx²∕(Σx)²−1
    * compared against 1∕16 and 1 by exact integer cross-multiplication).
    * Output: the 9-cell matrix with counts and revenue share — the
    * inventory-policy map. */
  def q395AbcXyz(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .select(col("l_partkey").as("pk"), cents(col("l_extendedprice")).as("v"),
        date_format(col("l_shipdate"), "yyyy-MM").as("m"))
    val byPart = l.groupBy(col("pk")).agg(sum(col("v")).as("rev"))
    val tot = byPart.agg(sum(col("rev")).as("tr"))
    val abc = byPart.crossJoin(broadcast(graft.ops.Guards.scalar(tot)))
      .withColumn("cum", sum(col("rev")).over(
        Window.orderBy(col("rev").desc, col("pk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("pk"), col("rev"),
        when(col("cum") * 100L <= col("tr") * 80L, "A")
          .when(col("cum") * 100L <= col("tr") * 95L, "B")
          .otherwise("C").as("abc"))
    val monthly = l.groupBy(col("pk"), col("m")).agg(sum(col("v")).as("mv"))
    val xyz = monthly.groupBy(col("pk")).agg(count(lit(1)).as("nm"),
        sum(col("mv")).as("sx"), sum(col("mv") * col("mv")).as("sxx"))
      // CV^2 = nm*sxx/sx^2 - 1; X: cv2 <= 1/16; Y: cv2 <= 1; else Z —
      // exact: nm*sxx*16 <= 17*sx*sx etc. sx up to ~1e9 cents per part
      // so sx*sx needs double-safe compare: use double with exact ints
      .select(col("pk"),
        when(col("nm").cast("double") * col("sxx").cast("double") * lit(16.0)
            <= col("sx").cast("double") * col("sx").cast("double") * lit(17.0),
          "X")
          .when(col("nm").cast("double") * col("sxx").cast("double")
            <= col("sx").cast("double") * col("sx").cast("double") * lit(2.0),
          "Y")
          .otherwise("Z").as("xyz"))
    abc.join(xyz, Seq("pk")).crossJoin(broadcast(graft.ops.Guards.scalar(tot)))
      .groupBy(col("abc"), col("xyz"))
      .agg(count(lit(1)).as("n_parts"),
        (sum(col("rev")).cast("double") / max(col("tr")).cast("double"))
          .as("revenue_share"))
      .orderBy(col("abc"), col("xyz"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q386_blocking_quality" -> q386BlockingQuality _,
    "q387_bandit_replay"    -> q387BanditReplay _,
    "q388_forecast_combo"   -> q388ForecastCombo _,
    "q389_tail_dependence"  -> q389TailDependence _,
    "q390_rmst"             -> q390Rmst _,
    "q391_waterfill"        -> q391Waterfill _,
    "q392_shift_share"      -> q392ShiftShare _,
    "q393_price_index"      -> q393PriceIndex _,
    "q394_harrell_c"        -> q394HarrellC _,
    "q395_abc_xyz"          -> q395AbcXyz _)
}
