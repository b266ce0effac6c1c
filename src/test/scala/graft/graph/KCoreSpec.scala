package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for k-core peeling (q149) and the conversion curve (q148). */
class KCoreSpec extends SparkSpec {

  private def edges(rows: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("a_id", "b_id")
  }

  test("2-core: a pendant path cascades away round by round; the triangle stays") {
    // triangle {1,2,3} + path 3-4-5-6
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L, 5L -> 6L)
    // one round only removes the current degree-1 frontier (node 6)
    val r1 = Graph.kCore(e, k = 2, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1.keySet === Set(1L, 2L, 3L, 4L, 5L))
    // enough rounds: the whole path peels, the triangle survives at degree 2
    val r4 = Graph.kCore(e, k = 2, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r4 === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("k larger than any degree empties the graph") {
    val e = edges(1L -> 2L, 2L -> 3L)
    assert(Graph.kCore(e, k = 5, rounds = 3).count() === 0L)
  }

  test("conversion curve: buckets, cumulation and base share") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "view", "2026-01-01 00:00:00"), (1L, "purchase", "2026-01-01 00:30:00"),
      (2L, "view", "2026-01-01 00:00:00"), (2L, "purchase", "2026-01-01 05:10:00"),
      (3L, "view", "2026-01-01 00:00:00"), // never converts
      (4L, "purchase", "2026-01-01 00:00:00"), (4L, "view", "2026-01-01 01:00:00"))
    val ev = rows.toDF("user_id", "event_type", "tss")
      .select(col("user_id"), col("event_type"), col("tss").cast("timestamp").as("ts"))
    val out = graft.ops.TimeSeries.conversionLatency(
      ev, "user_id", "ts", "event_type", "view", "purchase")
      .orderBy("hours").collect()
    // u4's purchase precedes its first view -> excluded; base = {1,2,3,4} = 4
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq((0L, 1L, 1L), (5L, 1L, 2L)))
    assert(out.map(_.getDouble(3)).toSeq === Seq(0.25, 0.5))
  }
}
