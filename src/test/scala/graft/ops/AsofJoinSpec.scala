package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the composed as-of join. */
class AsofJoinSpec extends SparkSpec {

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("asof picks the latest right row at-or-before each left time, per key") {
    val s = spark
    import s.implicits._
    val trades = Seq(
      ("A", ts("2024-01-01 10:00:05"), 1L),
      ("A", ts("2024-01-01 10:00:00"), 2L), // exact tie with a quote
      ("B", ts("2024-01-01 10:00:01"), 3L),
      ("C", ts("2024-01-01 10:00:01"), 4L)  // no quotes for C
    ).toDF("sym", "t", "trade_id")
    val quotes = Seq(
      ("A", ts("2024-01-01 09:59:58"), 1L, 100.0),
      ("A", ts("2024-01-01 10:00:00"), 2L, 101.0), // ties: larger quote_id wins
      ("A", ts("2024-01-01 10:00:00"), 3L, 102.0),
      ("A", ts("2024-01-01 10:00:06"), 4L, 103.0), // after both trades
      ("B", ts("2024-01-01 10:00:00"), 5L, 200.0)
    ).toDF("sym", "t", "quote_id", "px")

    val out = AsofJoin.asof(trades, quotes, ("sym", "sym"), ("t", "t"), "quote_id", Seq("px"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("px")).map(_.asInstanceOf[Double])).toMap

    assert(out(1L) === Some(102.0)) // latest quote <= 10:00:05 (tie at :00 -> id 3)
    assert(out(2L) === Some(102.0)) // equal time counts ("as of now" includes now)
    assert(out(3L) === Some(200.0))
    assert(out(4L) === None)        // no quotes for C -> null carry
  }

  test("left columns survive untouched and row count is preserved") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, "x", ts("2024-01-01 00:00:01"))).toDF("id", "tag", "t")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), 9L, "E")).toDF("id", "t", "eid", "etype")
    val out = AsofJoin.asof(l, r, ("id", "id"), ("t", "t"), "eid", Seq("etype"))
    assert(out.columns.toSeq === Seq("id", "tag", "t", "etype"))
    assert(out.count() === 1)
    assert(out.head().getAs[String]("etype") === "E")
  }
}
