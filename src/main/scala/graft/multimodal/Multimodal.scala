package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal asset row: opaque binary payload + typed metadata. */
case class MMAsset(asset_id: Long, mime: String, content: Array[Byte], n_bytes: Long)

/** Features "decoded" from an asset (stub decoder — see [[Multimodal]]). */
case class MMFeatures(asset_id: Long, mime: String, n_bytes: Long,
    width: Int, height: Int, luma16: Long)

/** Features from the REAL image decoder ([[Multimodal.decodeImage]]):
  * decoded=true rows carry actual pixel-derived values; decoded=false rows
  * fell back to the deterministic stub formulas (payload not an image). */
case class ImgFeatures(asset_id: Long, mime: String,
    width: Int, height: Int, luma16: Long, pix_sum: Long, decoded: Boolean)

/** One asset's REAL lossy-codec round trip ([[Multimodal.jpegRoundTrip]]):
  * exact_sum is the SQL-predictable pre-encode pixel sum; within_tol bounds
  * the decoded sum's lossy drift (the q14-style tolerance-law column). */
case class JpegRoundTrip(asset_id: Long, width: Long, height: Long,
    exact_sum: Long, decoded: Boolean, within_tol: Boolean)

/** One asset's REAL audio-codec round trip ([[Multimodal.wavRoundTrip]]):
  * 8-bit PCM is lossless, so every column is SQL-predictable and the whole
  * round trip hash-checks — no tolerance law needed. */
case class WavRoundTrip(asset_id: Long, n_samples: Long, sample_sum: Long,
    sample_rate_hz: Long, decoded: Boolean)

/**
 * Multimodal-column plumbing for image/audio/video payloads: the engine
 * treats media as opaque `binary` columns with typed metadata, and runs
 * decode / feature-extraction as partition-local batch functions
 * (`Dataset.mapPartitions` — the JVM equivalent of the Python-side
 * `mapInPandas` batch UDF shape: one iterator in, one iterator out, no
 * per-row driver involvement, arbitrary native calls allowed inside).
 *
 * DECODE IS A STUB: this container has no image/audio codecs, so
 * [[decodeStub]] derives deterministic fake dimensions/luma from the bytes
 * (documented formula, mirrored by the DuckDB oracle). The Spark-side
 * contract — schema, binary encoding, partition-local batching, feature
 * schema — is real and tested; swapping the stub body for e.g. a JNI
 * JPEG decoder changes no plan shape.
 */
object Multimodal {

  /** Build an asset table from the documents fixture: content = UTF-8 bytes
    * of the text (a deterministic stand-in for real media payloads). */
  def assetsFromDocuments(docs: DataFrame): Dataset[MMAsset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      concat(lit("application/x-graft-"), col("source")).as("mime"),
      encode(col("text"), "UTF-8").as("content"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .as[MMAsset]
  }

  /**
   * Partition-local stub decoder. Formula (mirrored in the oracle):
   *   width  = 64 + n_bytes % 577       (preserves byte-length information)
   *   height = 64 + (n_bytes * 31) % 433
   *   luma16 = sum of the first 16 bytes (unsigned)
   * Each partition processes its rows as one batch — the exact shape a real
   * decoder needs (per-partition codec init, vectorized byte access).
   */
  def decodeStub(assets: Dataset[MMAsset]): Dataset[MMFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { batch =>
      // per-partition "codec" initialization would go here
      batch.map { a =>
        val luma = a.content.iterator.take(16).map(b => (b & 0xff).toLong).sum
        MMFeatures(
          a.asset_id, a.mime, a.n_bytes,
          width = (64 + a.n_bytes % 577).toInt,
          height = (64 + (a.n_bytes * 31) % 433).toInt,
          luma16 = luma)
      }
    }
  }

  /** Deterministic per-asset grid dims for [[encodePngGray]]/the oracle:
    * width 4..16, height 4..14, both pure functions of the byte length. */
  private[multimodal] def gridDims(nBytes: Long): (Int, Int) =
    ((4 + nBytes % 13).toInt, (4 + (nBytes * 7) % 11).toInt)

  /**
   * Encode each payload as a REAL grayscale PNG whose pixels are the
   * nearest-neighbor resample of the payload bytes onto a w x h grid
   * (pixel i = byte floor(i*n/(w*h)) — the same grid rule as
   * [[resizeStub]]; w, h from [[gridDims]]; an empty payload yields the
   * zero image). Because the pixel values are a pure function of the
   * bytes, a downstream REAL decoder's output stays predictable by the
   * DuckDB oracle — the trick that lets an actual codec round-trip be
   * hash-checked end to end. Runs javax.imageio's PNG writer inside the
   * same partition-local batch boundary as every other kernel here.
   */
  def encodePngGray(assets: Dataset[MMAsset]): Dataset[MMAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { batch =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      batch.map { a =>
        val (w, h) = gridDims(a.n_bytes)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var i = 0
        while (i < w * h) {
          raster.setSample(i % w, i / w, 0, gridPixel(a.content, i, w * h))
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val png = bos.toByteArray
        MMAsset(a.asset_id, "image/png", png, png.length.toLong)
      }
    }
  }

  /**
   * REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP — no
   * external codec dependency): per-partition batch decode producing actual
   * raster dimensions, the luma sum of the first 16 pixels in row-major
   * order, and the full-image luma sum. Luma is integer math: the raw
   * band-0 sample for single-band rasters (grayscale PNG: exactly the
   * written byte), else (r+g+b)/3 integer-averaged from the packed sRGB
   * value — deterministic on every platform, no float color conversion.
   *
   * Payloads imageio cannot decode fall back to [[decodeStub]]'s formulas
   * with `decoded = false` (same columns, pix_sum = unsigned sum of ALL
   * payload bytes), so a mixed corpus maps through one schema and the
   * no-codec behavior stays available and tested.
   */
  def decodeImage(assets: Dataset[MMAsset]): Dataset[ImgFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { batch =>
      javax.imageio.ImageIO.setUseCache(false)
      batch.map { a =>
        val img =
          // NonFatal, not just IOException: the JDK's GIF/BMP readers throw
          // unchecked exceptions (IllegalArgument/ArrayIndexOutOfBounds) on
          // payloads whose magic bytes match but whose body is garbage, and
          // those must take the documented decoded=false fallback too
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.content))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) {
          ImgFeatures(
            a.asset_id, a.mime,
            width = (64 + a.n_bytes % 577).toInt,
            height = (64 + (a.n_bytes * 31) % 433).toInt,
            luma16 = a.content.iterator.take(16).map(b => (b & 0xff).toLong).sum,
            pix_sum = a.content.iterator.map(b => (b & 0xff).toLong).sum,
            decoded = false)
        } else {
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          val singleBand = raster.getNumBands == 1
          def luma(i: Int): Long = {
            val (x, y) = (i % w, i / w)
            if (singleBand) raster.getSample(x, y, 0).toLong
            else {
              val rgb = img.getRGB(x, y)
              (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)).toLong / 3
            }
          }
          var l16 = 0L; var all = 0L
          var i = 0
          while (i < w * h) {
            val v = luma(i)
            if (i < 16) l16 += v
            all += v
            i += 1
          }
          ImgFeatures(a.asset_id, a.mime, w, h, l16, all, decoded = true)
        }
      }
    }
  }

  /** The shared grid rule of [[encodePngGray]]/[[jpegRoundTrip]]: pixel i of
    * the w x h grid is byte floor(i*n/(w*h)) of the payload (0 when empty). */
  private def gridPixel(content: Array[Byte], i: Int, wh: Int): Int =
    if (content.length == 0) 0
    else content(((i.toLong * content.length) / wh).toInt) & 0xff

  /**
   * REAL lossy-codec round trip: resample the payload onto the [[gridDims]]
   * grid (exactly like [[encodePngGray]]), encode it as an actual JPEG via
   * javax.imageio's writer at the given quality, then decode the JPEG bytes
   * back and compare pixel sums. JPEG is lossy, so the decoded sum is NOT a
   * pure function an external engine can recompute — the oracle-checkable
   * outputs are the exact pre-encode sum (SQL-predictable from the bytes),
   * the raster dimensions (lossless in JPEG), the decode-success flag, and
   * `within_tol`, a q14-style tolerance law: |decoded_sum - exact_sum| <=
   * tolPerPixel * w * h, asserted as constant TRUE by the oracle. All work
   * is partition-local (encode+decode in one batch pass, zero shuffles);
   * codec-less platforms surface as decoded=false rows, never exceptions.
   */
  def jpegRoundTrip(assets: Dataset[MMAsset], quality: Float = 0.95f,
      tolPerPixel: Int = 8): Dataset[JpegRoundTrip] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { batch =>
      javax.imageio.ImageIO.setUseCache(false)
      // per-partition codec init: one writer instance reused for the batch;
      // a platform with no JPEG writer yields decoded=false rows, honoring
      // the never-an-exception contract (same for write/read failures below)
      val writers = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg")
      val writer = if (writers.hasNext) writers.next() else null
      val param = if (writer == null) null else {
        val p = writer.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(quality)
        p
      }
      val out = batch.map { a =>
        val (w, h) = gridDims(a.n_bytes)
        val wh = w * h
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var exact = 0L
        var i = 0
        while (i < wh) {
          val v = gridPixel(a.content, i, wh)
          exact += v
          raster.setSample(i % w, i / w, 0, v)
          i += 1
        }
        val back =
          if (writer == null) null
          else try {
            val bos = new java.io.ByteArrayOutputStream()
            val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
            writer.setOutput(ios)
            writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
            ios.close()
            javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
          } catch { case scala.util.control.NonFatal(_) => null }
        if (back == null)
          JpegRoundTrip(a.asset_id, w.toLong, h.toLong, exact,
            decoded = false, within_tol = false)
        else {
          val r = back.getRaster
          var sum = 0L
          var j = 0
          while (j < wh) { sum += r.getSample(j % back.getWidth, j / back.getWidth, 0); j += 1 }
          JpegRoundTrip(a.asset_id, back.getWidth.toLong, back.getHeight.toLong, exact,
            decoded = true, within_tol = math.abs(sum - exact) <= tolPerPixel.toLong * wh)
        }
      }
      // writer.dispose() after the batch would need a closing iterator; the
      // instance is task-scoped and GC'd with the task, which imageio allows
      out
    }
  }

  /** 1-D analog of [[gridDims]] for audio: sample count 64..256, a pure
    * function of the byte length (so the oracle predicts it). */
  private[multimodal] def sampleCount(nBytes: Long): Int = (64 + nBytes % 193).toInt

  /**
   * REAL audio-codec round trip via the JDK's `javax.sound.sampled` (no
   * external dependency): resample the payload onto [[sampleCount]] 8-bit
   * PCM samples (the 1-D twin of the image grid rule), write an actual WAV
   * file through AudioSystem's WAVE writer, then parse+decode the WAV bytes
   * back and sum the samples. 8-bit PCM is LOSSLESS — the decoded samples
   * are the written bytes — so unlike [[jpegRoundTrip]] every output column
   * is an exact pure function of the payload and the whole container
   * round trip (RIFF header, format chunk, data chunk) hash-checks against
   * the SQL oracle. Partition-local batch pass, zero shuffles. Compressed
   * audio (MP3/AAC) needs codec jars this container lacks and stays out of
   * scope; WAV is the container-level real-codec path, exactly like PNG for
   * images. A parse failure surfaces as decoded=false (stub-free fallback:
   * counts/sums straight off the payload), never an exception.
   */
  def wavRoundTrip(assets: Dataset[MMAsset], sampleRateHz: Int = 8000): Dataset[WavRoundTrip] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { batch =>
      import javax.sound.sampled._
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
        sampleRateHz.toFloat, 8, 1, 1, sampleRateHz.toFloat, false)
      batch.map { a =>
        val k = sampleCount(a.n_bytes)
        val pcm = new Array[Byte](k)
        var i = 0
        while (i < k) { pcm(i) = gridPixel(a.content, i, k).toByte; i += 1 }
        // encode AND parse both guarded: a platform without a WAVE writer
        // (or a write/parse failure) lands on the decoded=false row, never
        // a task-killing exception
        val back =
          try {
            val bos = new java.io.ByteArrayOutputStream()
            val ais = new AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, k.toLong)
            AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
            AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bos.toByteArray))
          } catch { case scala.util.control.NonFatal(_) => null }
        if (back == null) {
          val sum = pcm.iterator.map(b => (b & 0xff).toLong).sum
          WavRoundTrip(a.asset_id, k.toLong, sum, sampleRateHz.toLong, decoded = false)
        } else {
          val samples = back.readAllBytes()
          var sum = 0L
          var j = 0
          while (j < samples.length) { sum += samples(j) & 0xff; j += 1 }
          WavRoundTrip(a.asset_id, samples.length.toLong, sum,
            back.getFormat.getSampleRate.toLong, decoded = true)
        }
      }
    }
  }

  /**
   * Resize shape demo: nearest-neighbor downsample of the payload to an
   * outW x outH byte grid — sample position i reads byte
   * floor(i * n_bytes / (outW*outH)) (stub for an image resampler: the
   * binary-in/binary-out batch contract, payload-proportional output size,
   * partition-local execution are all real; a real resizer swaps only the
   * kernel). Emits the resized payload plus a checksum so the relational
   * surface (q55) can verify the transform without shipping binary through
   * the oracle compare.
   */
  def resizeStub(assets: Dataset[MMAsset], outW: Int, outH: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val k = outW * outH
    require(k > 0, "output dimensions must be positive")
    assets.mapPartitions { batch =>
      batch.map { a =>
        val n = a.content.length
        // uniform contract: EVERY payload lands on the k-byte grid — an
        // empty payload resizes to the zero grid (checksum 0), keeping the
        // output schema fixed-shape for downstream batch consumers
        val out = new Array[Byte](k)
        var i = 0
        while (n > 0 && i < out.length) {
          out(i) = a.content(((i.toLong * n) / k).toInt)
          i += 1
        }
        val checksum = out.iterator.map(b => (b & 0xff).toLong).sum
        (a.asset_id, outW.toLong, outH.toLong, out, checksum)
      }
    }.toDF("asset_id", "out_w", "out_h", "resized", "checksum")
  }

  /**
   * Perceptual average-hash (aHash) from a REAL image decode: decode via
   * javax.imageio, nearest-neighbor-sample the band-0 raster onto an 8×8
   * grid (source pixel (⌊c·w/8⌋, ⌊r·h/8⌋) — the classic aHash downsample),
   * threshold each sample against the grid mean, and pack the 64 bits as
   * EIGHT 8-bit band values (b0..b7, bit j of band b = grid cell 8b+j).
   * The mean test is the integer comparison `64·v > Σv` — no division, so
   * the hash is bit-exact in any engine. Non-decodable payloads are
   * dropped (decoded=false has no pixels to hash).
   *
   * The band layout IS the LSH scheme of [[imageNearDupPairs]]: two hashes
   * within Hamming distance 7 agree exactly on ≥ 1 of the 8 bands
   * (pigeonhole), so banding finds every near-dup pair without any n²
   * comparison — the same band-bucket argument as the MinHash/SimHash
   * text paths (q26/q27), applied to decoded pixels.
   */
  def aHash(assets: Dataset[MMAsset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { batch =>
      javax.imageio.ImageIO.setUseCache(false)
      batch.flatMap { a =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.content))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          val singleBand = raster.getNumBands == 1
          val v = Array.tabulate(64) { i =>
            val (r, c) = (i / 8, i % 8)
            val (sx, sy) = ((c * w) / 8, (r * h) / 8)
            if (singleBand) raster.getSample(sx, sy, 0).toLong
            else {
              val rgb = img.getRGB(sx, sy)
              (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)).toLong / 3
            }
          }
          val s = v.sum
          val bands = Array.tabulate(8) { b =>
            (0 until 8).map(j => if (64L * v(8 * b + j) > s) 1L << j else 0L).sum
          }
          Some((a.asset_id, bands(0), bands(1), bands(2), bands(3),
            bands(4), bands(5), bands(6), bands(7)))
        }
      }
    }.toDF("asset_id", "b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7")
  }

  /**
   * Image near-duplicate pairs over a REAL codec path: text payloads →
   * actual PNG encode ([[encodePngGray]]) → actual decode + aHash →
   * band-bucket join → exact Hamming verify (`bit_count(xor)` per band —
   * codegen'd integer ops). Emits (a_id, b_id, hamming ≤ maxHamming),
   * a_id < b_id, each pair once.
   *
   * Completeness: exact for maxHamming ≤ 7 (8 bands ⇒ some band has zero
   * differing bits). Scale shape: candidate volume is Σ over buckets of
   * |bucket|² like every LSH path here — no all-pairs join, shuffles keyed
   * on (band, value); the 8-bit band alphabet trades bucket selectivity
   * for the deeper Hamming radius (more candidates per bucket than q27's
   * 16-bit simhash bands — the verify step stays cheap integer xor).
   */
  def imageNearDupPairs(docs: DataFrame, maxHamming: Int = 7): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"banding guarantees completeness only to Hamming 7, got $maxHamming")
    val bcols = (0 to 7).map(i => col(s"b$i"))
    val hashes = aHash(encodePngGray(assetsFromDocuments(docs)))
    val bands = hashes.select(col("asset_id") +: bcols :+
      posexplode(array(bcols: _*)): _*)
      .withColumnsRenamed(Map("pos" -> "bi", "col" -> "bv"))
    val a = bands.select(col("asset_id").as("a_id") +: col("bi") +: col("bv") +:
      (0 to 7).map(i => col(s"b$i").as(s"a$i")): _*)
    val b = bands.select(col("asset_id").as("b_id") +: col("bi") +: col("bv") +:
      (0 to 7).map(i => col(s"b$i").as(s"c$i")): _*)
    val hamming = (0 to 7)
      .map(i => bit_count(col(s"a$i").bitwiseXOR(col(s"c$i"))))
      .reduce(_ + _)
    a.join(b, Seq("bi", "bv"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), hamming.cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * Shot-boundary detection over the sampled frame stream: consecutive
   * "frames" (the [[sampleFrames]] stride samples — a real decoder would
   * supply per-frame luma here; the plumbing is identical) whose
   * intensity jumps by more than `threshold` mark a cut. One lag window
   * per asset — integer arithmetic end to end, no shuffle beyond the
   * asset-keyed window. First frame of each asset has no predecessor:
   * delta/is_cut are NULL there, not false.
   */
  def shotBoundaries(assets: Dataset[MMAsset], stride: Int = 16,
      threshold: Int = 64): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("asset_id")).orderBy(col("frame_off"))
    sampleFrames(assets, stride)
      .withColumn("__prev", lag(col("frame_byte"), 1).over(w))
      .select(col("asset_id"), col("frame_off"), col("frame_byte"),
        abs(col("frame_byte") - col("__prev")).as("delta"),
        (abs(col("frame_byte") - col("__prev")) > threshold).as("is_cut"))
  }

  /** Frame-sampling shape demo: pick every `stride`-th byte window as a
    * "frame" (stub for video frame extraction; same mapPartitions contract). */
  def sampleFrames(assets: Dataset[MMAsset], stride: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.flatMap { a =>
      a.content.indices.by(stride).map { off =>
        (a.asset_id, off.toLong, (a.content(off) & 0xff).toLong)
      }
    }.toDF("asset_id", "frame_off", "frame_byte")
  }
}
