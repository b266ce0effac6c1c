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

  test("asofBucketed: law-equal to asof over bucketed tables, with ZERO shuffles") {
    val s = spark
    import s.implicits._
    val wh = tmpDir("asof-wh")
    // orders-shaped left / events-shaped right, co-bucketed on user_id.
    // 600 orders x 40 users, 900 events; user 9999 has orders but no events.
    val orders = (1 to 600).map { i =>
      ((i % 40).toLong + (if (i % 97 == 0) 9999L else 0L), i.toLong,
        ts(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00"))
    }.toDF("user_id", "o_id", "ots")
    val events = (1 to 900).map { i =>
      ((i % 40).toLong, 1000L + i,
        ts(f"2024-01-01 ${(i * 7) % 24}%02d:${(i * 13) % 60}%02d:${i % 60}%02d"),
        s"type${i % 5}")
    }.toDF("user_id", "event_id", "ets", "event_type")
    try {
      orders.write.bucketBy(8, "user_id").sortBy("user_id", "ots")
        .option("path", s"$wh/orders_ab").saveAsTable("orders_ab")
      events.write.bucketBy(8, "user_id").sortBy("user_id", "ets")
        .option("path", s"$wh/events_ab").saveAsTable("events_ab")

      val fused = AsofJoin.asofBucketed(s, "orders_ab", "events_ab",
        ("user_id", "user_id"), ("ots", "ets"), "event_id", Seq("event_type"))
      // zero-exchange: no shuffle anywhere in the fused RDD lineage
      assert(!fused.rdd.toDebugString.contains("ShuffledRDD"))
      val got = fused.collect()
        .map(r => r.getAs[Long]("o_id") -> Option(r.getAs[String]("event_type"))).toMap

      val expected = AsofJoin.asof(orders, events,
        ("user_id", "user_id"), ("ots", "ets"), "event_id", Seq("event_type"))
        .collect()
        .map(r => r.getAs[Long]("o_id") -> Option(r.getAs[String]("event_type"))).toMap
      assert(got.size === 600)
      assert(got === expected)
      assert(got.exists(_._2.isEmpty), "no-match orders should carry nulls")
    } finally {
      s.sql("DROP TABLE IF EXISTS orders_ab")
      s.sql("DROP TABLE IF EXISTS events_ab")
    }
  }

  test("asofBucketed rejects unbucketed tables and mismatched bucket counts") {
    val s = spark
    import s.implicits._
    val wh = tmpDir("asof-neg")
    val d = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("k", "t")
    try {
      d.write.option("path", s"$wh/plain").saveAsTable("plain_t")
      d.write.bucketBy(4, "k").option("path", s"$wh/b4").saveAsTable("b4_t")
      d.write.bucketBy(8, "k").option("path", s"$wh/b8").saveAsTable("b8_t")
      val e1 = intercept[IllegalArgumentException] {
        AsofJoin.asofBucketed(s, "plain_t", "b4_t", ("k", "k"), ("t", "t"), "k", Seq("t"))
      }
      assert(e1.getMessage.contains("not a bucketed table"))
      val e2 = intercept[IllegalArgumentException] {
        AsofJoin.asofBucketed(s, "b4_t", "b8_t", ("k", "k"), ("t", "t"), "k", Seq("t"))
      }
      assert(e2.getMessage.contains("bucket counts differ"))
    } finally Seq("plain_t", "b4_t", "b8_t").foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
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
