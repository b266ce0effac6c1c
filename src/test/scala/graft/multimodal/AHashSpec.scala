package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the perceptual-hash (aHash) image near-dup path. */
class AHashSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src").as("source"), length(col("text")).cast("long").as("n_chars"))
  }

  test("identical payloads collide at Hamming 0; unrelated text does not") {
    val base = (1 to 40).map(i => f"tok$i%02d").mkString(" ")
    val other = (1 to 40).map(i => f"zzz$i%02d qq").mkString(" ")
    val out = Multimodal.imageNearDupPairs(
      docs(1L -> base, 2L -> base, 3L -> other), maxHamming = 7).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      === Set((1L, 2L, 0L)))
  }

  test("uniform image hashes to zero (strict mean test)") {
    val s = spark
    import s.implicits._
    // constant byte payload -> every sampled pixel equal -> 64*v == sum
    val assets = Seq(MMAsset(5L, "application/x", Array.fill[Byte](64)(65), 64L)).toDS()
    val h = Multimodal.aHash(Multimodal.encodePngGray(assets)).collect().head
    (0 to 7).foreach(b => assert(h.getAs[Long](s"b$b") === 0L))
  }

  test("non-decodable payloads are dropped by aHash") {
    val s = spark
    import s.implicits._
    val junk = Seq(MMAsset(9L, "application/x", Array[Byte](1, 2, 3), 3L)).toDS()
    assert(Multimodal.aHash(junk).count() === 0L)
  }

  test("banding is complete to Hamming 7: operator == brute force on the hashes") {
    val sfDocs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val hashes = Multimodal.aHash(Multimodal.encodePngGray(
      Multimodal.assetsFromDocuments(sfDocs))).collect()
      .map(r => r.getLong(0) -> (0 to 7).map(i => r.getLong(i + 1)))
    val brute = (for {
      (ia, ba) <- hashes; (ib, bb) <- hashes if ia < ib
      ham = (0 to 7).map(k => java.lang.Long.bitCount(ba(k) ^ bb(k))).sum
      if ham <= 7
    } yield (ia, ib, ham.toLong)).toSet
    val viaOp = Multimodal.imageNearDupPairs(sfDocs, maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaOp === brute)
  }
}
