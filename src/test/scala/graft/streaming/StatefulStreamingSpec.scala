package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stateful streaming breadth: flatMapGroupsWithState sessionization and
  * watermark-bounded stream-stream interval joins. */
class StatefulStreamingSpec extends SparkSpec {

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("flatMapGroupsWithState sessionization: gap closes sessions, state evicted") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[SessionEvent]
    val out = Sessionize.sessions(input.toDS(), gapMs = 5 * 60 * 1000)
    val q = out.writeStream.format("memory").queryName("fmgws_test")
      .outputMode("append").start()
    try {
      // user 1: two events 1 min apart (one session); user 2: one event
      input.addData(
        SessionEvent(1L, ts("2024-01-01 00:00:00")),
        SessionEvent(1L, ts("2024-01-01 00:01:00")),
        SessionEvent(2L, ts("2024-01-01 00:00:30")))
      q.processAllAvailable()
      // advance event time far beyond gap -> watermark closes both sessions
      input.addData(SessionEvent(3L, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      input.addData(SessionEvent(3L, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.table("fmgws_test")
      .select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("s"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("e"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(rows.contains((1L, "2024-01-01 00:00:00", "2024-01-01 00:06:00", 2L)))
    assert(rows.contains((2L, "2024-01-01 00:00:30", "2024-01-01 00:05:30", 1L)))
  }

  test("custom sessionization agrees with the built-in session_window aggregation") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // batch comparison of the builtin path over the same data shape
    val batch = Seq(
      (1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:01:00")),
      (1L, ts("2024-01-01 00:20:00")), (2L, ts("2024-01-01 00:00:30"))
    ).toDF("user_id", "ts")
    val builtin = Sessionize.sessionsBuiltin(batch, "ts", "user_id", "5 minutes")
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3))).toSet
    assert(builtin === Set(
      (1L, "2024-01-01 00:00:00.0", "2024-01-01 00:06:00.0", 2L),
      (1L, "2024-01-01 00:20:00.0", "2024-01-01 00:25:00.0", 1L),
      (2L, "2024-01-01 00:00:30.0", "2024-01-01 00:05:30.0", 1L)))
    // streaming custom path over the same events emits the same closed sessions
    val input = MemoryStream[SessionEvent]
    val out = Sessionize.sessions(input.toDS(), gapMs = 5 * 60 * 1000)
    val q = out.writeStream.format("memory").queryName("fmgws_cmp")
      .outputMode("append").start()
    try {
      input.addData(
        SessionEvent(1L, ts("2024-01-01 00:00:00")), SessionEvent(1L, ts("2024-01-01 00:01:00")),
        SessionEvent(2L, ts("2024-01-01 00:00:30")))
      q.processAllAvailable()
      input.addData(SessionEvent(1L, ts("2024-01-01 00:20:00")))
      q.processAllAvailable()
      input.addData(SessionEvent(9L, ts("2024-01-01 03:00:00")))
      q.processAllAvailable()
      input.addData(SessionEvent(9L, ts("2024-01-01 06:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val custom = s.table("fmgws_cmp")
      .filter(col("user_id") < 9)
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3))).toSet
    assert(custom === builtin)
  }

  test("sessionization: out-of-order bridge event merges a provisional split (ADVICE r2)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // gap 5 min. Batch 1 opens [00:00, 00:01]; batch 2's 00:10 event is a
    // SPLIT (>. end+gap) — the old eager-emit code closed the first session
    // here; batch 3 delivers 00:05:30, out of order but above the watermark
    // (wm = 00:10 - 5min = 00:05), which bridges BOTH sessions into one.
    val input = MemoryStream[SessionEvent]
    val out = Sessionize.sessions(input.toDS(), gapMs = 5 * 60 * 1000)
    val q = out.writeStream.format("memory").queryName("fmgws_bridge")
      .outputMode("append").start()
    try {
      input.addData(SessionEvent(1L, ts("2024-01-01 00:00:00")),
        SessionEvent(1L, ts("2024-01-01 00:01:00")))
      q.processAllAvailable()
      input.addData(SessionEvent(1L, ts("2024-01-01 00:10:00")))
      q.processAllAvailable()
      input.addData(SessionEvent(1L, ts("2024-01-01 00:05:30")))
      q.processAllAvailable()
      // advance the watermark far past end+gap so the merged session seals
      input.addData(SessionEvent(9L, ts("2024-01-01 06:00:00")))
      q.processAllAvailable()
      input.addData(SessionEvent(9L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val custom = s.table("fmgws_bridge").filter(col("user_id") === 1L)
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3))).toSet
    // the built-in session_window over the same four events: ONE session
    val builtin = Sessionize.sessionsBuiltin(
      Seq((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:01:00")),
        (1L, ts("2024-01-01 00:10:00")), (1L, ts("2024-01-01 00:05:30")))
        .toDF("user_id", "ts"), "ts", "user_id", "5 minutes")
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3))).toSet
    assert(builtin === Set((1L, "2024-01-01 00:00:00.0", "2024-01-01 00:15:00.0", 4L)))
    assert(custom === builtin)
  }

  test("transformWithState sessionization (Spark 4 API) matches flatMapGroupsWithState") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // transformWithState requires the RocksDB state store
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = s.conf.getOption(providerKey)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[SessionEvent]
      val out = Sessionize.sessionsTws(input.toDS(), gapMs = 5 * 60 * 1000)
      val q = out.writeStream.format("memory").queryName("tws_test")
        .outputMode("append").start()
      try {
        // the same out-of-order bridge scenario the fmgws spec drives
        input.addData(SessionEvent(1L, ts("2024-01-01 00:00:00")),
          SessionEvent(1L, ts("2024-01-01 00:01:00")))
        q.processAllAvailable()
        input.addData(SessionEvent(1L, ts("2024-01-01 00:10:00")))
        q.processAllAvailable()
        input.addData(SessionEvent(1L, ts("2024-01-01 00:05:30")))
        q.processAllAvailable()
        input.addData(SessionEvent(9L, ts("2024-01-01 06:00:00")))
        q.processAllAvailable()
        input.addData(SessionEvent(9L, ts("2024-01-01 12:00:00")))
        q.processAllAvailable()
      } finally q.stop()
      val rows = s.table("tws_test").filter(col("user_id") === 1L)
        .collect().map(r => (r.getLong(0),
          r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3))).toSet
      assert(rows === Set((1L, "2024-01-01 00:00:00.0", "2024-01-01 00:15:00.0", 4L)))
    } finally prior.fold(s.conf.unset(providerKey))(s.conf.set(providerKey, _))
  }

  test("built-in session_window aggregation runs STREAMING in append mode (bounded state)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = Sessionize.sessionsBuiltin(
      input.toDF().toDF("user_id", "ts"), "ts", "user_id", "5 minutes")
    val q = sessions.writeStream.format("memory").queryName("sw_stream")
      .outputMode("append").start()
    try {
      input.addData(1L -> ts("2024-01-01 00:00:00"), 1L -> ts("2024-01-01 00:02:00"))
      q.processAllAvailable()
      input.addData(1L -> ts("2024-01-01 01:00:00")) // watermark passes, closes session
      q.processAllAvailable()
      input.addData(1L -> ts("2024-01-01 02:00:00"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.table("sw_stream")
      .select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("s"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("e"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(rows.contains((1L, "2024-01-01 00:00:00", "2024-01-01 00:07:00", 2L)))
  }

  test("stream-stream interval join matches within the bound and drops outside it") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val orders = MemoryStream[(String, java.sql.Timestamp)]
    val payments = MemoryStream[(String, java.sql.Timestamp, Double)]
    val joined = StreamJoins.intervalJoin(
      orders.toDF().toDF("o_key", "o_ts"),
      payments.toDF().toDF("p_key", "p_ts", "amount"),
      "o_key", "p_key", "o_ts", "p_ts",
      within = "'10' MINUTE", watermark = "30 minutes")
      .select(col("o_key"), col("amount"))
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").start()
    try {
      orders.addData("A" -> ts("2024-01-01 00:00:00"), "B" -> ts("2024-01-01 00:05:00"))
      payments.addData(
        ("A", ts("2024-01-01 00:04:00"), 10.0), // within 10 min of A -> match
        ("B", ts("2024-01-01 00:30:00"), 20.0), // 25 min after B -> no match
        ("C", ts("2024-01-01 00:06:00"), 30.0)) // no order -> no match
      q.processAllAvailable()
      // advance both watermarks so results flush
      orders.addData("Z" -> ts("2024-01-01 02:00:00"))
      payments.addData(("Z2", ts("2024-01-01 02:00:00"), 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.table("ssj_test").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toSet
    assert(rows === Set("A" -> 10.0))
  }
}
