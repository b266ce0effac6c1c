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

  test("decodeImage: decodes a known PNG to known pixels (real javax.imageio path)") {
    val s = spark
    import s.implicits._
    // hand-build a 2x2 grayscale PNG with pixels [10, 20, 30, 40] row-major
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSample(0, 0, 0, 10)
    img.getRaster.setSample(1, 0, 0, 20)
    img.getRaster.setSample(0, 1, 0, 30)
    img.getRaster.setSample(1, 1, 0, 40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val ds = Seq(MMAsset(1L, "image/png", png, png.length.toLong)).toDS()
    val f = Multimodal.decodeImage(ds).head()
    assert(f.decoded)
    assert(f.width === 2)
    assert(f.height === 2)
    assert(f.luma16 === 100L) // 4 pixels < 16, so luma16 sums them all
    assert(f.pix_sum === 100L)
  }

  test("decodeImage: encodePngGray round trip equals the resample grid (law)") {
    val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, sfDir))
    val feats = Multimodal.decodeImage(Multimodal.encodePngGray(assets)).collect()
      .map(f => f.asset_id -> f).toMap
    val srcs = assets.collect()
    assert(srcs.nonEmpty)
    srcs.foreach { a =>
      val (w, h) = Multimodal.gridDims(a.n_bytes)
      val n = a.content.length
      val px = (0 until w * h).map { i =>
        if (n == 0) 0L else (a.content(((i.toLong * n) / (w * h)).toInt) & 0xff).toLong
      }
      val f = feats(a.asset_id)
      assert(f.decoded, s"asset ${a.asset_id} did not take the real-decode path")
      assert(f.width === w)
      assert(f.height === h)
      assert(f.luma16 === px.take(16).sum)
      assert(f.pix_sum === px.sum)
    }
  }

  test("decodeImage: JPEG payloads decode too (dims exact; lossy pixels bounded)") {
    val s = spark
    import s.implicits._
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 64).foreach(i => img.getRaster.setSample(i % 8, i / 8, 0, 128))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpg = bos.toByteArray
    val f = Multimodal.decodeImage(
      Seq(MMAsset(2L, "image/jpeg", jpg, jpg.length.toLong)).toDS()).head()
    assert(f.decoded)
    assert(f.width === 8)
    assert(f.height === 8)
    // flat gray is JPEG's best case: DC-only blocks reconstruct near-exactly
    assert(math.abs(f.pix_sum - 64L * 128L) <= 64L)
  }

  test("jpegRoundTrip: real encode+decode, exact dims/sums, lossy drift within law") {
    val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, sfDir))
    val out = Multimodal.jpegRoundTrip(assets).collect().map(r => r.asset_id -> r).toMap
    val srcs = assets.collect()
    assert(srcs.nonEmpty)
    srcs.foreach { a =>
      val (w, h) = Multimodal.gridDims(a.n_bytes)
      val n = a.content.length
      val exact = (0 until w * h).map { i =>
        if (n == 0) 0L else (a.content(((i.toLong * n) / (w * h)).toInt) & 0xff).toLong
      }.sum
      val r = out(a.asset_id)
      assert(r.decoded, s"asset ${a.asset_id} failed the real JPEG decode")
      assert(r.width === w.toLong)
      assert(r.height === h.toLong)
      assert(r.exact_sum === exact)
      assert(r.within_tol, s"asset ${a.asset_id} drifted past the tolerance law")
    }
    // the law must also FAIL visibly when the budget is impossible: the
    // same corpus at tolPerPixel = 0 should breach on noisy byte grids
    val strict = Multimodal.jpegRoundTrip(assets, tolPerPixel = 0).collect()
    assert(strict.exists(!_.within_tol),
      "tolPerPixel=0 passed everywhere — the drift check is vacuous")
  }

  test("wavRoundTrip: lossless PCM through a real WAV write+parse (law vs bytes)") {
    val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, sfDir))
    val out = Multimodal.wavRoundTrip(assets).collect().map(r => r.asset_id -> r).toMap
    val srcs = assets.collect()
    assert(srcs.nonEmpty)
    srcs.foreach { a =>
      val k = Multimodal.sampleCount(a.n_bytes)
      val n = a.content.length
      val expected = (0 until k).map { i =>
        if (n == 0) 0L else (a.content(((i.toLong * n) / k).toInt) & 0xff).toLong
      }.sum
      val r = out(a.asset_id)
      assert(r.decoded, s"asset ${a.asset_id} failed the WAV parse")
      assert(r.n_samples === k.toLong)
      assert(r.sample_sum === expected, s"asset ${a.asset_id}: PCM not byte-faithful")
      assert(r.sample_rate_hz === 8000L)
    }
    // empty payload: all-zero samples, sum 0, still a valid WAV
    val s = spark
    import s.implicits._
    val empty = Seq(MMAsset(5L, "m", Array.empty[Byte], 0L)).toDS()
    val z = Multimodal.wavRoundTrip(empty).head()
    assert(z.decoded && z.sample_sum === 0L && z.n_samples === 64L)
  }

  test("decodeImage: non-image payloads fall back to the stub formulas") {
    val s = spark
    import s.implicits._
    val bytes = "definitely not a png".getBytes("UTF-8")
    val ds = Seq(MMAsset(9L, "text/plain", bytes, bytes.length.toLong)).toDS()
    val f = Multimodal.decodeImage(ds).head()
    assert(!f.decoded)
    assert(f.width === (64 + bytes.length % 577))
    assert(f.height === (64 + (bytes.length.toLong * 31) % 433).toInt)
    assert(f.luma16 === bytes.take(16).map(b => (b & 0xff).toLong).sum)
    assert(f.pix_sum === bytes.map(b => (b & 0xff).toLong).sum)
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
