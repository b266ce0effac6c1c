package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Session-scoped materialized-frame memo — the single-JVM model of how a
 * real deployment amortizes shared index builds (a 100 TB cluster would
 * materialize the suffix ranks once to a table and every downstream
 * query would read it; here the "table" is an eager lineage-cut frame
 * cached for the session). Before this, q396/q397/q406/q411 each rebuilt
 * the same suffix ranks from scratch inside one Verify/Bench session —
 * ~4 index builds per run for one logical index.
 *
 * Contract: `build` must be DETERMINISTIC for the key (the memo swaps a
 * recompute for a reuse, so a nondeterministic build would change
 * results) — suffix ranks, like everything in the catalog, are total-
 * order deterministic by construction.
 *
 * The memoized frames are backed by eagerly-materialized localCheckpoint
 * blocks; [[protectedIds]] exposes their RDD ids so the bench harness's
 * between-query block hygiene ([[graft.Bench]]) can unpersist everything
 * EXCEPT them — unpersisting a localCheckpoint'd RDD truncates its
 * lineage, so an unprotected eviction would not "merely recompute", it
 * would break every later reader of the memo.
 */
object FrameMemo {

  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private val prot = scala.collection.mutable.Set.empty[Int]

  /** Get-or-build the frame for `key`, materializing through an eager
    * lineage cut on first use.
    *
    * Only the FINAL cut's RDD ids are protected: `build` may itself run
    * cut-per-round loops (the suffix prefix-doubling does), and those
    * intermediate localCheckpoint blocks are unreachable once the final
    * frame's lineage is cut — protecting them would pin dead blocks for
    * the whole session, exempt from every bench sweep. They are
    * unpersisted here instead (safe: the final cut is EAGER, so by the
    * time we drop them nothing reads through them again).
    *
    * Builds are serialized under one lock (synchronized is reentrant, so
    * a build that calls `cached` for another key still works):
    * TrieMap.getOrElseUpdate does not guarantee single evaluation under
    * concurrent first access, and a double build would double-persist. */
  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    memo.synchronized {
      memo.getOrElseUpdate((spark, key), {
        val before = spark.sparkContext.getPersistentRDDs.keySet
        val built = build
        val mid = spark.sparkContext.getPersistentRDDs.keySet
        val cp = IterativeLoop.cut(built)
        val after = spark.sparkContext.getPersistentRDDs.keySet
        prot.synchronized { prot ++= (after -- mid) }
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if ((mid -- before).contains(id)) rdd.unpersist(blocking = false)
        }
        cp
      })
    }

  /** RDD ids backing live memo entries — exempt from bench unpersist. */
  def protectedIds: Set[Int] = prot.synchronized(prot.toSet)

  /** Drop every memo entry (the backing blocks are left to the caller's
    * unpersist pass — after this, nothing is protected). */
  def invalidate(): Unit = {
    memo.clear()
    prot.synchronized(prot.clear())
  }
}
