package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit contracts for the text-analysis operator family. */
class TextOpsSpec extends SparkSpec {

  private def one(text: String) = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("text")
  }

  test("token counting: whitespace vs BPE-ish lexer") {
    val r = one("the quick12 fox!").select(
      size(TextOps.tokensWs(col("text"))).as("ws"),
      TextOps.bpeishCount(col("text")).as("bpe")).head()
    assert(r.getAs[Int]("ws") === 3)
    // lexer: the | quick | 12 | fox | ! -> 5 (letter runs, digit runs, marks)
    assert(r.getAs[Int]("bpe") === 5)
  }

  test("rolling fingerprint matches a reference fold and md5 matches known digest") {
    val r = one("abc").select(
      TextOps.rollingFingerprint(col("text")).as("roll"),
      TextOps.md5Fingerprint(col("text")).as("md5")).head()
    // ((0*31+97)*31+98)*31+99 mod 1e9+7 = 96354
    assert(r.getAs[Long]("roll") === 96354L)
    assert(r.getAs[String]("md5") === "900150983cd24fb0d6963f7d28e17f72")
  }

  test("quality score is clamped to [0,1] and rewards longer stopword-bearing text") {
    val s = spark
    import s.implicits._
    val d = Seq(
      ("short", "key value"),
      ("long", (1 to 80).map(_ => "the data value table row").mkString(" "))
    ).toDF("tag", "text")
    val toks = TextOps.tokens(col("text"))
    val out = d.select(col("tag"),
      TextOps.qualityScore(
        size(toks).cast("long"),
        TextOps.totalTokenLen(toks).cast("double") / size(toks).cast("double"),
        TextOps.stopwordCount(toks).cast("double") / size(toks).cast("double"),
        TextOps.punctCount(col("text")).cast("double") / length(col("text")).cast("double"))
        .as("q")).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(out("long") > out("short"))
  }

  test("predictedLang: argmax with alphabetical tiebreak") {
    val s = spark
    import s.implicits._
    val d = Seq(
      ("de-ish", "table row merge table"),
      ("zh-ish", "hash scan key hash scan"),
      ("tie", "nomarkers at all")).toDF("tag", "text")
    val toks = TextOps.tokens(col("text"))
    val out = d.select(col("tag"),
      TextOps.predictedLang(TextOps.langScores(toks)).as("p"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("de-ish") === "de")
    assert(out("zh-ish") === "zh")
    assert(out("tie") === "de") // all-zero scores: first alphabetical wins
  }

  test("normalize collapses case and whitespace for exact dedup") {
    val r = one("  The   QUICK fox ").select(TextOps.normalize(col("text"))).head()
    assert(r.getString(0) === "the quick fox")
  }

  test("redactPii masks planted email/ssn/phone/ipv4 and counts each class") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "contact jane.doe+test@sub.example.org or bob@x.io today"),
      (2L, "ssn 123-45-6789 phone 555-123-4567 alt 555.123.4567"),
      (3L, "server at 192.168.1.10 and 10.0.0.1 ok"),
      (4L, "clean text with nothing sensitive at all"),
      (5L, "mixed a@b.co 111-22-3333 999-888-7777 127.0.0.1")).toDF("doc_id", "text")
    val counts = TextOps.piiCounts(col("text")).map { case (n, c) => c.as(s"n_$n") }
    val out = d.select(Seq(col("doc_id"),
        TextOps.redactPii(col("text")).as("r")) ++ counts: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("r") === "contact <EMAIL> or <EMAIL> today")
    assert(out(1L).getAs[Long]("n_email") === 2L)
    assert(out(2L).getAs[String]("r") === "ssn <SSN> phone <PHONE> alt <PHONE>")
    assert(out(2L).getAs[Long]("n_ssn") === 1L)
    assert(out(2L).getAs[Long]("n_phone") === 2L)
    assert(out(3L).getAs[String]("r") === "server at <IP> and <IP> ok")
    assert(out(3L).getAs[Long]("n_ipv4") === 2L)
    assert(out(4L).getAs[String]("r") === "clean text with nothing sensitive at all")
    assert(Seq("n_email", "n_ssn", "n_phone", "n_ipv4")
      .forall(c => out(4L).getAs[Long](c) === 0L))
    assert(out(5L).getAs[String]("r") === "mixed <EMAIL> <SSN> <PHONE> <IP>")
  }

  test("contextWindows: coverage, overlap, ragged tail, short docs") {
    val s = spark
    import s.implicits._
    val words = (0 until 40).map(i => s"t$i")
    val d = Seq(
      (1L, words.mkString(" ")),  // 40 tokens: starts 0,16,32
      (2L, "a b c"),              // 3 tokens: one ragged window
      (3L, words.take(16).mkString(" "))) // exactly one stride: start 0 only
      .toDF("doc_id", "text")
    val rows = TextOps.contextWindows(d, "doc_id", "text", window = 32, stride = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val d1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(w => (w._2, w._3, w._4)).toSeq ===
      Seq((0L, 0L, 32L), (1L, 16L, 24L), (2L, 32L, 8L)))
    // full coverage: every token appears in some window
    val covered = d1.flatMap(_._5.split(" ")).toSet
    assert(covered === words.toSet)
    // overlap: window 1 repeats the back half of window 0
    assert(d1(1)._5.split(" ").take(16).toSeq === d1(0)._5.split(" ").drop(16).toSeq)
    // short doc: single ragged window, chunk = whole text
    assert(rows.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 0L, 3L, "a b c")))
    // doc of exactly `stride` tokens: one window, not two
    assert(rows.count(_._1 == 3L) === 1)
  }
}
