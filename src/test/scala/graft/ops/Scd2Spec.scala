package graft.ops

import graft.SparkSpec

import java.sql.Timestamp

/** SCD2 laws: validity intervals chain without gaps, exactly one current
  * version per key, versions numbered in effective order. */
class Scd2Spec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s"$s 00:00:00")

  test("versions: chained intervals, one current row per key") {
    val s = spark
    import s.implicits._
    val obs = Seq(
      (1L, "BUILDING", ts("2024-01-01")),
      (1L, "MACHINERY", ts("2024-03-01")),
      (1L, "FURNITURE", ts("2024-07-01")),
      (2L, "AUTOMOBILE", ts("2024-01-01")))
      .toDF("k", "segment", "eff")
    val got = Scd2.versions(obs, "k", "eff")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4), r.getBoolean(5)))
      .sortBy(x => (x._1, x._5))
    val k1 = got.filter(_._1 == 1L)
    // versions 1..3 in effective order
    assert(k1.map(_._5).toSeq === Seq(1L, 2L, 3L))
    assert(k1.map(_._2).toSeq === Seq("BUILDING", "MACHINERY", "FURNITURE"))
    // intervals chain: valid_to(k) == valid_from(k+1), last open
    assert(k1(0)._4 === Some(k1(1)._3))
    assert(k1(1)._4 === Some(k1(2)._3))
    assert(k1(2)._4 === None)
    // exactly one current per key
    assert(got.count(g => g._1 == 1L && g._6) === 1)
    assert(got.filter(_._1 == 2L).toSeq ===
      Seq((2L, "AUTOMOBILE", ts("2024-01-01"), None, 1L, true)))
  }

  test("latestByKey: last write wins, ties broken by the tie column") {
    val s = spark
    import s.implicits._
    val log = Seq(
      (1L, 1L, "k", ts("2024-01-01"), "old"),
      (2L, 1L, "k", ts("2024-02-01"), "mid"),
      (3L, 1L, "k", ts("2024-02-01"), "new"), // same instant: higher id wins
      (4L, 2L, "k", ts("2024-01-15"), "only"))
      .toDF("event_id", "user_id", "event_type", "ts", "payload")
    val got = Scd2.latestByKey(log, Seq("user_id", "event_type"), "ts", "event_id")
      .collect().map(r => r.getLong(1) -> (r.getLong(0), r.getString(4))).toMap
    assert(got(1L) === ((3L, "new")))
    assert(got(2L) === ((4L, "only")))
  }
}
