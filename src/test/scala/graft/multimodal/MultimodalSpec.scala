package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Plumbing contracts for the multimodal binary-column path. */
class MultimodalSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("assetsFromDocuments: binary payload round-trips the text bytes; metadata typed") {
    val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, sfDir))
    val r = assets.filter(col("asset_id") === 0).head()
    val doc = Tables.documents(spark, sfDir).filter(col("doc_id") === 0).head()
    assert(new String(r.content, "UTF-8") === doc.getAs[String]("text"))
    assert(r.n_bytes === r.content.length.toLong)
    assert(r.mime.startsWith("application/x-graft-src"))
  }

  test("decodeStub: deterministic feature formula over the byte payload") {
    val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, sfDir))
    val feats = Multimodal.decodeStub(assets)
    val joined = assets.toDF().alias("a")
      .join(feats.toDF().alias("f"), col("a.asset_id") === col("f.asset_id"))
      .select(col("a.content"), col("a.n_bytes"),
        col("f.width"), col("f.height"), col("f.luma16"))
      .collect()
    joined.foreach { r =>
      val n = r.getAs[Long]("n_bytes")
      assert(r.getAs[Int]("width") === (64 + n % 577).toInt)
      assert(r.getAs[Int]("height") === (64 + (n * 31) % 433).toInt)
      val expectedLuma = r.getAs[Array[Byte]]("content").take(16).map(b => (b & 0xff).toLong).sum
      assert(r.getAs[Long]("luma16") === expectedLuma)
    }
  }

  test("resizeStub: fixed-size nearest-neighbor grid, checksum faithful, up+downsampling") {
    val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, sfDir))
    val out = Multimodal.resizeStub(assets, outW = 8, outH = 8)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val resized = r.getAs[Array[Byte]]("resized")
      assert(resized.length === 64) // every payload lands on the same grid
      assert(r.getAs[Long]("checksum") ===
        resized.iterator.map(b => (b & 0xff).toLong).sum)
    }
    // nearest-neighbor law against the source bytes for one asset
    val a = assets.filter(col("asset_id") === 0).head()
    val r0 = out.filter(col("asset_id") === 0).head().getAs[Array[Byte]]("resized")
    (0 until 64).foreach { i =>
      assert(r0(i) === a.content(((i.toLong * a.content.length) / 64).toInt))
    }
    // a payload SHORTER than the grid upsamples by repetition (never OOB)
    val s = spark
    import s.implicits._
    val tiny = Seq(MMAsset(1L, "m", "ab".getBytes("UTF-8"), 2L)).toDS()
    val up = Multimodal.resizeStub(tiny, 8, 8).head().getAs[Array[Byte]]("resized")
    assert(up.length === 64)
    assert(up.toSet.subsetOf("ab".getBytes("UTF-8").toSet))
    // an EMPTY payload still lands on the grid: all zeros, checksum 0
    val empty = Seq(MMAsset(2L, "m", Array.empty[Byte], 0L)).toDS()
    val z = Multimodal.resizeStub(empty, 8, 8).head()
    assert(z.getAs[Array[Byte]]("resized").toSeq === Seq.fill(64)(0.toByte))
    assert(z.getAs[Long]("checksum") === 0L)
  }

  test("sampleFrames: one frame per stride offset, bytes faithful") {
    val s = spark
    import s.implicits._
    val one = Seq(MMAsset(7L, "application/x-test", Array[Byte](10, 20, 30, 40, 50), 5L)).toDS()
    val frames = Multimodal.sampleFrames(one, stride = 2).orderBy("frame_off").collect()
    assert(frames.map(_.getAs[Long]("frame_off")).toSeq === Seq(0L, 2L, 4L))
    assert(frames.map(_.getAs[Long]("frame_byte")).toSeq === Seq(10L, 30L, 50L))
  }
}
