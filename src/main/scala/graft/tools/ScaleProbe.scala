package graft.tools
import graft.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** Dev probe: near-dup pair algorithms at growing corpus sizes. The corpus
  * is the sf0.1 documents table replicated K times with disjoint id ranges
  * and a per-copy token prefix. NOTE the prefix changes only the first two
  * 3-gram shingles, so copies of the same doc sit at J ≈ (s-1)/(s+1) — ABOVE
  * the 0.6 threshold for any doc with ≥ 4 shingles. Replication therefore
  * grows both n and the planted near-dup families (k copies of a family
  * fuse into one k-times-larger cluster): pair counts grow superlinearly
  * (x1: 256, x2: 6k, x4: 34k), which is exactly the stress a dedup pass
  * sees on a crawl with heavy duplication. Timings below are comparative
  * across algorithms at the same k.
  *
  * Round-4 verb (measured this host, local[32]): `dropNearDups` end to end
  * x1 5.4s / x2 6.2s / x4 34.1s (dominated by exact pair generation), with
  * connected-components converging in 2 pointer-jump rounds at EVERY scale
  * (cluster diameter doesn't grow with replication) and kept=4756 constant
  * — every content family collapses to exactly one canonical doc no matter
  * how many copies exist. The flat round count is the 100 TB property: CC
  * cost per round is one join + combinable min, and rounds track graph
  * diameter, not corpus size.
  *
  * Measured crossover (this host, local[32]): the full inverted index beats
  * the df-ordered prefix filter at every probed scale of THIS corpus
  * because its df tail is light (max df 25; blowup B = Σdf²/Σdf ≈ 5) — the
  * prefix pipeline's extra shuffles cost more than its candidate reduction
  * saves. `Dedup.jaccardPairsAuto` encodes the rule: a sampled df probe
  * keeps the full index while B stays under 64 average candidate
  * comparisons per posting and flips to the prefix plan past it (hot-
  * shingle corpora), with MinHash-LSH as the sub-quadratic escape hatch
  * when even prefix-filtered exact verification is too hot. */
object ScaleProbe {

  /** Round-7 probe: wall-time scaling exponents for the iterative heavies
    * (q53/q59/q61/q75/q83/q96) at sf0.1 × {1,4,10} — ×10 is the sf1.0
    * stand-in (no sf1.0 testdata ships in this environment). Copies are
    * made DISJOINT (every token SUFFIXED with the copy id, ids offset per
    * copy) so replication grows n without fusing near-dup families across
    * copies — measuring the ALGORITHM's growth, not the planted-duplication
    * blowup the pair probe below stresses. Suffixing keeps each copy's
    * token/shingle/df structure exactly isomorphic to the original corpus
    * (an interleaved salt TOKEN would collapse trigram df to unigram df —
    * (salt, w, salt) grams — and blow Σdf² up ~50×, measured); the k=1
    * baseline gets the same treatment so per-doc cost is identical across
    * scales. α = ln(t_10/t_4)/ln(10/4) from the two largest scales (k=1 is
    * JVM-overhead-dominated); sub-quadratic = α < 2. */
  def heavies(spark: SparkSession): Boolean = {
    import graft.curation.Curation
    val docsBase = Tables.documents(spark, "/root/testdata/sf0.1")
    val embBase = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val edgeBase = graft.queries.CatalogExt.tradeGraphEdges(spark, "/root/testdata/sf0.1")
    def docs(k: Int): DataFrame = (0 until k).map { i =>
      docsBase.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1z$i").as("text"),
        col("lang"), col("source"))
    }.reduce(_ unionByName _)
    def embs(k: Int): DataFrame = (0 until k).map { i =>
      embBase.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        col("label"), col("embedding"))
    }.reduce(_ unionByName _)
    def edges(k: Int): DataFrame = (0 until k).map { i =>
      edgeBase.select((col("src") + lit(i * 10000000L)).as("src"),
        (col("dst") + lit(i * 10000000L)).as("dst"))
    }.reduce(_ unionByName _)
    val heavies: Seq[(String, Int => Long)] = Seq(
      "q53_dedup_clusters" -> { k: Int =>
        Dedup.connectedComponents(
          Dedup.jaccardPairsAuto(docs(k), "doc_id", "text")).count() },
      "q59_drop_neardups" -> { k: Int =>
        Dedup.dropNearDups(docs(k), "doc_id", "text").count() },
      "q61_curate_corpus" -> { k: Int =>
        val d = docs(k)
        // minQuality 0: suffixed tokens match no stopword list, so q61's
        // real 0.5 gate would drop ~everything and starve the later stages
        // of scaling input — the probe measures the full dataflow instead
        Curation.curateCorpus(d, d.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", "lang", Map("en" -> 0.5, "de" -> 0.2),
          defaultFraction = 0.1, minQuality = 0.0,
          dedupN = 3, dedupThreshold = 0.6, contamN = 8).count() },
      "q75_bpe_merges" -> { k: Int =>
        Curation.bpeMerges(docs(k), "text", nMerges = 8).count() },
      "q83_pagerank" -> { k: Int =>
        graft.graph.Graph.pageRankFixedPoint(edges(k), "src", "dst",
          iterations = 8).count() },
      "q96_pca_top" -> { k: Int =>
        graft.sim.Pca.topComponent(embs(k), "embedding").count() },
      // Round-8 heavies. Probe design notes:
      //  - q113: disjoint subgraphs -> per-round joins grow linearly.
      //  - q118: the query BATCH stays fixed (first copy) and the codebook
      //    stride scales with k (fixed ~125-codeword geometry) — the
      //    serving shape: a growing corpus scanned by a constant workload;
      //    letting queries/codebook grow with n would measure k² by
      //    construction, which is a workload choice, not the operator.
      //  - q119: the blocking key gets the copy id appended — block SIZE
      //    is a design parameter (the cost is Σ|block|² at ANY scale), so
      //    the probe holds block geometry constant and grows block count.
      "q113_hits" -> { k: Int =>
        graft.graph.Graph.hitsFixedPoint(edges(k), "src", "dst",
          iterations = 8).count() },
      "q118_pq_adc" -> { k: Int =>
        graft.sim.Similarity.pqAdcKnn(
          embBase.filter(col("vec_id") % 25 === 0), embs(k),
          "vec_id", "embedding", k = 10, m = 4, stride = 40 * k).count() },
      "q119_fuzzy_pairs" -> { k: Int =>
        val blocked = (0 until k).map { i =>
          docsBase.select(
            (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
            col("text"), concat(col("lang"), lit(s"_$i")).as("lang"),
            col("source"))
        }.reduce(_ unionByName _)
        Dedup.fuzzyBlockedPairs(blocked, "doc_id", "text", "lang",
          prefixLen = 40, thresholdNum = 3, thresholdDen = 4).count() },
      // Round-8b heavies:
      //  - q123: 24 fixed GD rounds, each one 4-sum aggregate over the
      //    (lineage-cut) feature table — expect ~linear in corpus size.
      //  - q131: fixed query batch (first copy) over a growing candidate
      //    corpus — the serving shape, like q118.
      //  - q142: disjoint edge copies — triangle volume and join fan-out
      //    grow linearly by construction.
      "q123_quality_lr" -> { k: Int =>
        graft.model.QualityLr.trainAndScore(docs(k), "doc_id", "text",
          rounds = 24).count() },
      "q131_mmr_rerank" -> { k: Int =>
        graft.sim.Similarity.mmrTopK(
          embBase.filter(col("vec_id") % 50 === 0), embs(k),
          "vec_id", "embedding", k = 5).count() },
      "q142_triangles" -> { k: Int =>
        graft.graph.Graph.triangleCounts(
          edges(k).select(col("src").as("a_id"), col("dst").as("b_id")))
          .count() },
      // Round-8c heavy:
      //  - q175: disjoint graph copies, seed set replicated per copy —
      //    every copy's BFS frontier is isomorphic to the base run, so
      //    per-round frontier volume grows linearly with k.
      "q175_bfs" -> { k: Int =>
        val seedBase = Tables.supplier(spark, "/root/testdata/sf0.1")
          .filter(col("s_suppkey") % 50 === 0)
          .select((col("s_suppkey") * 2 + 1).as("id"))
        val seeds = (0 until k).map { i =>
          seedBase.select((col("id") + lit(i * 10000000L)).as("id"))
        }.reduce(_ unionByName _)
        graft.graph.Graph.bfsHops(edges(k), "src", "dst", seeds, rounds = 6)
          .count() },
      // round-9 probes. Replicated embeddings keep the label set and the
      // cell grid constant, so per-label membership / moment volume / cell
      // point-counts grow linearly while state (labels x dims, d^2 grid,
      // occupied cells) stays FIXED — the shapes that must show alpha ~ 1.
      "q241_geo_median" -> { k: Int =>
        graft.queries.CatalogSci.geoMedianOf(embs(k)).count() },
      "q247_mmd_quad" -> { k: Int =>
        graft.queries.CatalogSci.mmdQuadOf(embs(k)).count() },
      "q264_grid_dbscan" -> { k: Int =>
        graft.queries.CatalogSci.gridDbscanOf(embs(k)).count() },
      // Round-9b heavies:
      //  - q295: the custom AsofJoinExec on synthetic (key, time) frames —
      //    one exchange+sort per side then a linear merge; expect the sort's
      //    n log n.
      //  - q278: blocked fuzzy match; per-copy name suffix lands each copy
      //    in its own block-key space, so block geometry is constant and
      //    block count grows — the banded-levenshtein work is linear.
      "q295_asof_probe" -> { k: Int =>
        val n = 400000L * k
        val left = spark.range(n).select(
          (col("id") % 997).as("k"), col("id").as("t"))
        val right = spark.range(n / 4).select(
          (col("id") % 997).as("rk"), (col("id") * 4 + 1).as("rt"),
          (col("id") * 2).as("payload"))
        graft.plans.AsofJoinOp.asofJoin(left, right,
          Seq("k"), Seq("rk"), "t", "rt").count() },
      "q278_fuzzy_probe" -> { k: Int =>
        graft.plans.GraftPlans.ensureInjected(spark)
        val custBase = Tables.customer(spark, "/root/testdata/sf0.1")
          .select(col("c_name"))
        val cust = (0 until k).map { i =>
          custBase.select(concat(col("c_name"), lit(s"_$i")).as("c_name"))
        }.reduce(_ unionByName _)
        val bkey = (c: org.apache.spark.sql.Column) =>
          substring(c, -4, 4)
        val probes = cust.select(
          concat(substring(col("c_name"), 1, 3), substring(col("c_name"), 5, 1000))
            .as("probe"),
          bkey(col("c_name")).as("bk")).distinct()
        val cands = cust.select(col("c_name"), bkey(col("c_name")).as("bk"))
        probes.join(cands, Seq("bk"))
          .filter(levenshtein(col("probe"), col("c_name")) <= 1)
          .count() },
      // Round-9c heavies (this session's iterative additions):
      //  - q348: suffixed tokens make each copy's vocabulary DISJOINT, so
      //    the word graph grows linearly in nodes+edges while the 6
      //    PageRank rounds stay fixed — expect alpha ~ 1 (node-sized
      //    shuffles per round, the q83 shape).
      //  - q361: replicated users (id offset) grow the per-user aggregate
      //    linearly while the day-grain risk table — and so every Newton
      //    fold — stays CONSTANT-sized: the dominant cost is the one
      //    groupBy over users.
      //  - q374: disjoint edge copies, peel rounds fixed at 12; per-round
      //    cost is one degree aggregate + semi-joins over the surviving
      //    (linearly growing) edge set.
      //  - q377: span copies with offset user ids against the FIXED 40
      //    maintenance windows — candidate pairs grow linearly because
      //    the bucket join keys stay put.
      "q348_textrank" -> { k: Int =>
        graft.queries.CatalogNext.textrankOf(docs(k)).count() },
      "q361_cox" -> { k: Int =>
        val evBase = Tables.events(spark, "/root/testdata/sf0.1")
        val ev = (0 until k).map { i =>
          evBase.select((col("user_id") + lit(i * 10000000L)).as("user_id"),
            col("ts"), col("event_type"), col("value"))
        }.reduce(_ unionByName _)
        val users = ev.groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("first_d"),
            min(when(col("event_type") === "purchase" && col("value") > 150.0,
              to_date(col("ts")))).as("conv_d"))
        val horizon = ev.agg(max(to_date(col("ts"))).as("max_d"))
        val life = users.crossJoin(broadcast(graft.ops.Guards.scalar(horizon)))
          .select((col("user_id") % 2).as("g"),
            datediff(coalesce(col("conv_d"), col("max_d")), col("first_d"))
              .cast("long").as("t"),
            col("conv_d").isNotNull.cast("long").as("death"))
        graft.queries.CatalogDec.coxOf(spark, life).count() },
      "q374_three_core" -> { k: Int =>
        graft.queries.CatalogBeh.threeCoreOf(
          edges(k).select(col("src").as("x"), col("dst").as("y"))).count() },
      "q377_interval_overlap" -> { k: Int =>
        val evBase = Tables.events(spark, "/root/testdata/sf0.1")
        val spans = (0 until k).map { i =>
          evBase.select((col("user_id") + lit(i * 10000000L)).as("user_id"),
            col("ts"))
        }.reduce(_ unionByName _)
          .groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg(unix_seconds(min(col("ts"))).as("s1"),
            (unix_seconds(max(col("ts"))) + 1L).as("e1"))
        val wins = spark.range(40).select(col("id").as("w"),
            (conv(substring(md5(concat(lit("mw:"), col("id"))), 1, 8), 16, 10)
              .cast("long") % 2592000L + 1704067200L).as("s2"))
          .withColumn("e2", col("s2") + 21600L)
        graft.queries.CatalogBeh.overlapOf(spans, wins).count() },
      // Round-10 heavies (indexing wave):
      //  - q396: suffixed-token copies keep per-copy suffix structure
      //    isomorphic while total suffixes grow linearly; the round count
      //    is ceil(lg(maxLen/32)) — constant in k (doc length doesn't grow)
      //    — so the whole pipeline is k rounds of key-partitioned
      //    shuffles over linearly growing rows. At ×1 it is
      //    stage-overhead-bound (see SuffixIndex scaladoc), so expect a
      //    LOW alpha until data volume dominates scheduling.
      //  - q399: winnowing is one window pass per doc plus a print-keyed
      //    df join; suffixed tokens keep selected-print df structure
      //    per copy, so prints and shared-print counts grow linearly.
      "q396_suffix_ranks" -> { k: Int =>
        graft.text.SuffixIndex.globalRanks(docs(k), "doc_id", "text")
          .count() },
      "q399_winnowing" -> { k: Int =>
        val prints = graft.queries.CatalogIdx.winnowingPrints(
          docs(k), "doc_id", "text")
        val sel = prints.select(col("doc_id"), col("h")).distinct()
        val df = sel.groupBy(col("h")).agg(count(lit(1)).as("hdf"))
        sel.join(df, Seq("h")).filter(col("hdf") >= 2).count() })
    val ks = Seq(1, 4, 10)
    val filter = sys.env.get("SPARK_GRAFT_HEAVY_ONLY").map(_.split(',').toSet)
    var allSub = true
    heavies.filter(h => filter.forall(_.contains(h._1))).foreach { case (name, run) =>
      val ts = ks.map { k =>
        val t0 = System.nanoTime(); val n = run(k)
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[heavy] $name%-20s x$k%-3d $t%7.1f s rows=$n")
        t
      }
      val alpha = math.log(ts(2) / ts(1)) / math.log(10.0 / 4.0)
      val ok = alpha < 2.0
      allSub &= ok
      println(f"[heavy] $name%-20s alpha=$alpha%5.2f " +
        (if (ok) "SUB-QUADRATIC" else "SUPER-QUADRATIC (FAIL)"))
    }
    allSub
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("heavies")) {
      spark.range(1000000).count() // JVM/codegen warmup
      val ok = heavies(spark)
      // sf1.0-scale giant component: the degenerate dedup graph at ~2M
      // nodes, both CC paths (AQE skew split vs explicit hot-label routing).
      // Skipped when SPARK_GRAFT_HEAVY_ONLY narrows the run to named probes.
      val starNs =
        if (sys.env.contains("SPARK_GRAFT_HEAVY_ONLY")) Seq.empty[Int]
        else Seq(2000000)
      starNs.foreach { n =>
        val star = spark.range(1, n)
          .select(lit(0L).as("a_id"), col("id").as("b_id"))
        Seq("default" -> None, "hot-label" -> Some(10000L)).foreach { case (tag, t) =>
          val t0 = System.nanoTime()
          val (labels, rounds) =
            Dedup.connectedComponentsWithRounds(star, maxIter = 20, hotLabelThreshold = t)
          val comps = labels.select("component").distinct().count()
          println(f"[heavy] star-$n $tag%-10s ${(System.nanoTime() - t0) / 1e9}%7.1f s " +
            s"rounds=$rounds comps=$comps")
        }
      }
      if (!ok) sys.exit(1)
      return
    }
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    def corpus(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select(
          (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          concat(lit(s"cp$i "), col("text")).as("text"))
      }.reduce(_ unionByName _)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scale] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s pairs=$n")
    }
    spark.range(1000000).count()
    Seq(1, 2, 4).foreach { k =>
      val c = corpus(k)
      println(s"-- corpus x$k: ${c.count()} docs")
      time(s"exact full-index x$k")(Dedup.jaccardPairs(c, "doc_id", "text").count())
      time(s"exact df-prefix  x$k")(Dedup.jaccardPairsPrefix(c, "doc_id", "text").count())
      time(s"minhash-lsh      x$k")(Dedup.minhashLshPairs(c, "doc_id", "text").count())
      // the composed verb: pairs -> pointer-jumped components -> keep-
      // canonical; rounds should stay FLAT as n grows (pair structure is
      // constant per copy, so diameter doesn't grow with k)
      time(s"drop-near-dups   x$k") {
        val (labels, rounds) = Dedup.connectedComponentsWithRounds(
          Dedup.jaccardPairsAuto(c, "doc_id", "text"))
        val kept = Dedup.keepCanonical(c, "doc_id", labels).count()
        println(s"[scale]   cc-rounds=$rounds kept=$kept")
        kept
      }
    }
    // round-6 probe: the giant-component fallback. A planted n-node star is
    // the degenerate dedup graph (a million identical docs): after round 1
    // nearly every row's mid_component is ONE label, the exact shape that
    // hot-keys the pointer-jump join. Compare the default path (AQE
    // skew-join's problem) against hotLabelThreshold routing.
    // MEASURED (this host, local[32], AQE on): star-200k default 4.3s vs
    // hot-label 4.2s; star-800k default 9.5s vs hot-label 13.0s — AQE's
    // skew split already covers the hot key locally, so the fallback's
    // extra per-round count + materialization is pure overhead HERE. That
    // is exactly why hotLabelThreshold defaults to None: it exists for
    // configs where AQE cannot split this join (disabled, or a hot key
    // whose matching build rows exceed one executor), not as a default.
    Seq(200000, 800000).foreach { n =>
      val star = spark.range(1, n)
        .select(lit(0L).as("a_id"), col("id").as("b_id"))
      def run(tag: String, t: Option[Long]): Unit = {
        val t0 = System.nanoTime()
        val (labels, rounds) =
          Dedup.connectedComponentsWithRounds(star, maxIter = 20, hotLabelThreshold = t)
        val comps = labels.select("component").distinct().count()
        println(f"[scale] star-$n $tag%-10s ${(System.nanoTime() - t0) / 1e9}%7.1f s " +
          s"rounds=$rounds comps=$comps")
      }
      run("default", None)
      run("hot-label", Some(10000L))
    }
  }
}
