package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for the shared iterative-loop combinator (round 10: every
  * fixed-round dataflow loop in the engine now runs through
  * IterativeLoop, making the plan-doubling bug class unrepresentable)
  * plus one fixed-point law per migrated loop: PageRank (q83), quality
  * LR (q123/q183), spectral power iteration (q321), IPF raking (q336),
  * TextRank (q348), Cox Newton (q361), 3-core peel (q374). */
class IterativeLoopSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---------------- combinator laws ----------------

  test("fixed() equals the hand-rolled fold, and the per-round plan depth " +
      "stays constant even when the step references its input twice") {
    val init = Seq((1L, 100.0), (2L, 40.0), (3L, 8.0)).toDF("k", "v")
    def step(df: DataFrame): DataFrame = {
      // references df TWICE — the shape that doubles plans without a cut
      val tot = df.agg(sum(col("v")).as("tot"))
      df.crossJoin(broadcast(tot)).select(col("k"), (col("v") / lit(2.0)).as("v"))
    }
    val viaLoop = IterativeLoop.fixed(init, 6)((df, _) => step(df))
    val manual = (1 to 6).foldLeft(init)((df, _) => step(df))
    val a = viaLoop.orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = manual.orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq === b.toSeq)
    // plan boundedness: 12 rounds through the loop must not be materially
    // deeper than 2 rounds (each round starts from a LogicalRDD);
    // without the cut the plan doubles per round (2^12 vs 2^2 nodes)
    val plan2 = IterativeLoop.fixed(init, 2)((df, _) => step(df))
      .queryExecution.optimizedPlan.toString.length
    val plan12 = IterativeLoop.fixed(init, 12)((df, _) => step(df))
      .queryExecution.optimizedPlan.toString.length
    assert(plan12 <= 3L * plan2,
      s"plan grew with round count: 2 rounds -> $plan2 chars, 12 -> $plan12")
  }

  test("probe independence: a loop that issues an id without offering a " +
      "frame is detected (cannot silently demote to linear-by-plan)") {
    val init = Seq((1L, 1.0)).toDF("k", "v")
    // the healthy path: combinator loops capture exactly what they issue
    val (_, healthy) = PlanProbe.recordFull {
      IterativeLoop.fixed(init, 3)((df, _) => df)
    }
    assert(healthy.issuedLoops === 1 && healthy.captured.size === 1)
    PlanProbe.requireAllLoopsCaptured("healthy", healthy) // must not throw
    // the silent-miss path: id issued, offer suppressed — exactly the
    // regression X10Gate's closed world could not see before round 14
    val (_, broken) = PlanProbe.recordFull {
      val lid = PlanProbe.loopId()
      assert(lid === 1)
      init // "loop" runs, never offers
    }
    assert(broken.issuedLoops === 1 && broken.captured.isEmpty)
    val e = intercept[IllegalArgumentException] {
      PlanProbe.requireAllLoopsCaptured("broken-loop", broken)
    }
    assert(e.getMessage.contains("unaudited"))
  }

  test("fixedUntil: bit-identical to fixed(cap), exits before the cap on a " +
      "converging map, and reports the round count") {
    // integer halving hits its exact fixed point (0) after 7 rounds
    val init = Seq((1L, 100L), (2L, 3L)).toDF("k", "v")
    def step(df: DataFrame): DataFrame =
      df.select(col("k"), (col("v") / 2).cast("long").as("v"))
    val viaCap = IterativeLoop.fixed(init, 32)((df, _) => step(df))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val res = IterativeLoop.fixedUntil(init, 32, requireConverged = true)(
      (df, _) => step(df))
    assert(res.converged)
    assert(res.rounds < 32, s"no early exit: ran ${res.rounds} rounds")
    assert(res.rounds >= 7, s"exited before the fixed point: ${res.rounds}")
    val viaUntil = res.df.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaUntil === viaCap)
  }

  test("fixedUntil: requireConverged turns cap saturation into a loud " +
      "failure; without it the cap result matches fixed(cap)") {
    // +1 never converges
    val init = Seq((1L, 0L)).toDF("k", "v")
    def step(df: DataFrame): DataFrame =
      df.select(col("k"), (col("v") + 1L).as("v"))
    val e = intercept[IllegalArgumentException] {
      IterativeLoop.fixedUntil(init, 4, requireConverged = true)((df, _) => step(df))
    }
    assert(e.getMessage.contains("no fixed point"))
    val res = IterativeLoop.fixedUntil(init, 4)((df, _) => step(df))
    assert(!res.converged && res.rounds === 4)
    assert(res.df.collect()(0).getLong(1) === 4L)
  }

  test("stationaryAgg: memo hit on the handed-back frame, fresh aggregate " +
      "for any other frame") {
    var calls = 0
    val probe = IterativeLoop.stationaryAgg { df => calls += 1; Seq(df.count()) }
    val a = Seq(1L, 2L).toDF("v")
    val b = Seq(3L, 4L).toDF("v")
    val c = Seq(5L).toDF("v")
    assert(probe(a, b)) // both count 2 -> stationary; 2 aggregates
    assert(calls === 2)
    assert(!probe(b, c)) // prev eq memoized frame -> 1 aggregate (c only)
    assert(calls === 3)
    assert(!probe(a, c)) // prev NOT the memoized frame -> fresh aggregate
    assert(calls === 5)
  }

  test("stationaryAgg: a probe shared across two concurrent loops never " +
      "pairs one loop's frame with the other's summary (round 16: the memo " +
      "is one atomic (frame, summary) reference — the old two-field shape " +
      "could tear under this interleaving and answer convergence wrongly)") {
    // Summaries are driver-side (keyed off the frame object), so thousands
    // of racing probe calls run in milliseconds and actually exercise the
    // interleaving. Thread A's chain is genuinely stationary (all tags
    // equal); thread B's never is (strictly increasing tags). A torn memo
    // would surface as a wrong boolean in one of the chains.
    val tags = new java.util.IdentityHashMap[DataFrame, Long]()
    def frame(tag: Long): DataFrame = {
      val df = spark.range(1).toDF("v")
      tags.put(df, tag); df
    }
    val iters = 2000
    val aFrames = Array.fill(iters + 1)(frame(7L))
    val bFrames = Array.tabulate(iters + 1)(i => frame(100L + i))
    val probe = IterativeLoop.stationaryAgg(df => Seq(tags.get(df)))
    @volatile var failure: String = null
    def drive(frames: Array[DataFrame], expect: Int => Boolean): Runnable = () => {
      var i = 1
      while (i <= iters && failure == null) {
        val got = probe(frames(i - 1), frames(i))
        if (got != expect(i))
          failure = s"iteration $i: got $got, expected ${expect(i)}"
        i += 1
      }
    }
    val ta = new Thread(drive(aFrames, _ => true))
    val tb = new Thread(drive(bFrames, _ => false))
    ta.start(); tb.start(); ta.join(30000); tb.join(30000)
    assert(failure == null, String.valueOf(failure))
  }

  test("fixedUntil: a multiset-level change (key churn at constant count) " +
      "is NOT a fixed point — the probe is exceptAll both directions") {
    // rotate keys: same row count and same value multiset per column
    // would fool a count- or sum-probe; exceptAll catches it
    val init = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    def rot(df: DataFrame): DataFrame =
      df.select((col("k") % 2 + 1).as("k"), col("v"))
    val res = IterativeLoop.fixedUntil(init, 3)((df, _) => rot(df))
    assert(!res.converged && res.rounds === 3)
  }

  test("fixedPointGap: zero at a genuine fixed point, detects key churn") {
    val stable = Seq((1L, 5.0), (2L, 7.0)).toDF("k", "v")
    assert(IterativeLoop.fixedPointGap(stable, Seq("k"), "v")(df => df) === 0.0)
    // halving map contracts toward 0: gap after many rounds is tiny
    val init = Seq((1L, 64.0)).toDF("k", "v")
    def halve(df: DataFrame) = df.select(col("k"), (col("v") / 2.0).as("v"))
    val late = IterativeLoop.fixed(init, 20)((df, _) => halve(df))
    assert(IterativeLoop.fixedPointGap(late, Seq("k"), "v")(halve) < 1e-4)
    // a key appearing or vanishing is NOT a fixed point
    val gap = IterativeLoop.fixedPointGap(stable, Seq("k"), "v")(
      df => df.filter(col("k") === 1L))
    assert(gap === 7.0)
  }

  // ---------------- per-loop fixed-point laws ----------------

  test("q83 PageRank: the iteration contracts — late-round movement is no " +
      "larger than first-round movement, and is tiny relative to scale") {
    val edges = graft.queries.CatalogExt.tradeGraphEdges(spark, sf)
    def pr(n: Int) = graft.graph.Graph.pageRankFixedPoint(edges, "src", "dst", n)
    def gap(a: DataFrame, b: DataFrame): Double =
      a.withColumnRenamed("rank", "ra")
        .join(b.withColumnRenamed("rank", "rb"), Seq("node"))
        .agg(max(abs(col("ra") - col("rb")))).collect()(0).getLong(0).toDouble
    val early = gap(pr(1), pr(2))
    val late = gap(pr(8), pr(9))
    assert(late <= early, s"no contraction: first-round gap $early, late gap $late")
    // damping-rate contraction: ||Δ_k|| ≤ 0.85^(k-1)·||Δ_1|| for the
    // 0.85-damped map; 0.85^7 ≈ 0.32, asserted with 2× slack
    assert(late <= 0.65 * early,
      s"contraction slower than damping allows: early $early, late $late")
  }

  test("q123/q183 quality LR: the gradient step shrinks as training converges") {
    val feat = IterativeLoop.cutLazy(graft.model.QualityLr.features(
      graft.Tables.documents(spark, sf), "doc_id", "text"))
    def w(n: Int): Array[Long] = {
      val r = graft.model.QualityLr.train(feat, n).collect()(0)
      Array(r.getAs[Long]("w0"), r.getAs[Long]("w1"),
        r.getAs[Long]("w2"), r.getAs[Long]("w3"))
    }
    val (w1, w2) = (w(1), w(2))
    val (w24, w25) = (w(24), w(25))
    val early = w1.zip(w2).map { case (a, b) => math.abs(a - b) }.max
    val late = w24.zip(w25).map { case (a, b) => math.abs(a - b) }.max
    assert(late <= early,
      s"GD step grew: round 1->2 moved $early, round 24->25 moved $late")
  }

  test("q321 spectral: power iteration stabilizes — late rounds move the " +
      "normalized vector less than early rounds") {
    def x(n: Int) = graft.queries.CatalogNext.spectralPartitionOf(spark, sf, n)
      .select(col("item"), col("score"))
    def gap(a: DataFrame, b: DataFrame): Double =
      a.withColumnRenamed("score", "sa")
        .join(b.withColumnRenamed("score", "sb"), Seq("item"))
        .agg(max(abs(col("sa") - col("sb")))).collect()(0).getDouble(0)
    val early = gap(x(1), x(2))
    val late = gap(x(8), x(9))
    assert(late <= early + 1e-12,
      s"power iteration not stabilizing: early gap $early, late gap $late")
  }

  test("q336 IPF: the raked table satisfies BOTH target margins — the " +
      "genuine fixed point of raking (uniform row margin ntot/5, uniform " +
      "column margin ntot/7)") {
    // extra rounds so both margins hold simultaneously to tight tolerance
    val raked = graft.queries.CatalogNext.rakingIpfOf(spark, sf, rounds = 30)
    val ntot = raked.agg(sum(col("n"))).collect()(0).getLong(0).toDouble
    val rowDev = raked.groupBy(col("event_type"))
      .agg(sum(col("raked")).as("m"))
      .agg(max(abs(col("m") - lit(ntot / 5.0)))).collect()(0).getDouble(0)
    val colDev = raked.groupBy(col("dow"))
      .agg(sum(col("raked")).as("m"))
      .agg(max(abs(col("m") - lit(ntot / 7.0)))).collect()(0).getDouble(0)
    assert(rowDev < 1e-6 * ntot, s"row margin off by $rowDev of $ntot")
    assert(colDev < 1e-6 * ntot, s"col margin off by $colDev of $ntot")
  }

  test("q348 TextRank: mass conservation at every round count, and the " +
      "iteration contracts") {
    val docs = graft.Tables.documents(spark, sf)
    def pr(n: Int) = graft.queries.CatalogNext.textrankScores(docs, n)
    // every node has out-edges (undirected construction), so inflow
    // preserves total mass exactly: S_{k+1} = 0.25 + 0.75·S_k — the
    // affine mass recurrence is the conservation law of this iteration
    def massOf(df: DataFrame): Double =
      df.agg(sum(col("pr"))).collect()(0).getDouble(0)
    val (s6, s7) = (massOf(pr(6)), massOf(pr(7)))
    val nNodes = pr(6).count()
    assert(math.abs(s7 - (0.25 + 0.75 * s6)) < 1e-9 * nNodes,
      s"mass recurrence violated: S6=$s6 S7=$s7")
    def gap(a: DataFrame, b: DataFrame): Double =
      a.withColumnRenamed("pr", "pa").join(b.withColumnRenamed("pr", "pb"), Seq("node"))
        .agg(max(abs(col("pa") - col("pb")))).collect()(0).getDouble(0)
    val early = gap(pr(1), pr(2))
    val late = gap(pr(6), pr(7))
    assert(late <= early, s"TextRank not contracting: early $early late $late")
  }

  test("q361 Cox: Newton reached its fixed point — a seventh round does " +
      "not move the hazard ratio") {
    val life = graft.queries.CatalogNext.survivalFrame(spark, sf)
    def hr(n: Int): Double = graft.queries.CatalogDec.coxOf(spark, life, n)
      .collect()(0).getAs[Double]("hazard_ratio")
    val (h6, h7) = (hr(6), hr(7))
    assert(math.abs(h7 - h6) < 1e-9 * math.max(1.0, math.abs(h6)),
      s"Newton had not converged: theta6=$h6 theta7=$h7")
  }

  test("q374 3-core: incremental-degree peel equals the edge-set peel, " +
      "and the closure law holds (every survivor keeps >= 3 neighbors)") {
    val ui = graft.Tables.events(spark, sf)
      .select(col("user_id").as("u"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .filter(col("item").isNotNull).distinct()
    val edges = ui.alias("a").join(ui.alias("b"),
        col("a.u") === col("b.u") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("x"), col("b.item").as("y"))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 2)
      .select(col("x"), col("y"))
    // the pre-round-10 reference formulation: recompute degrees over the
    // surviving edge set every round
    var nbr = IterativeLoop.cutLazy(
      edges.select(col("x").as("a"), col("y").as("b"))
        .unionAll(edges.select(col("y").as("a"), col("x").as("b"))))
    for (_ <- 1 to 12) {
      val keep = nbr.groupBy(col("a")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 3).select(col("a").as("keep"))
      nbr = IterativeLoop.cutLazy(
        nbr.join(keep.withColumnRenamed("keep", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("keep", "b"), Seq("b"), "left_semi")
          .select(col("a"), col("b")))
    }
    val reference = nbr.groupBy(col("a").as("item"))
      .agg(count(lit(1)).as("core_degree")).orderBy(col("item"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val incremental = graft.queries.CatalogBeh.threeCoreOf(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(incremental.toSeq === reference.toSeq)
    assert(incremental.nonEmpty)
    // closure: the peel converged, so the output IS the 3-core
    assert(incremental.forall(_._2 >= 3),
      s"non-closed survivor degrees: ${incremental.filter(_._2 < 3).take(5).toSeq}")
  }
}
