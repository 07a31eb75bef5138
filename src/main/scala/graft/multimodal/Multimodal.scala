package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Bytes, Keccak}

/** Multimodal column handling (builder brief): image/audio/video
  * travel as opaque `binary` payload columns with typed metadata
  * extracted by a partition-batched decoder.
  *
  * The decode itself is a clearly-marked STUB — the real image/audio
  * libraries are not in this container — but everything Spark-side is
  * the real production shape: a typed `Dataset[MediaRecord]`, a
  * `mapPartitions` decoder (per-partition setup amortized across the
  * batch, exactly where a JNI/FFI decoder handle would live), and a
  * typed `Dataset[MediaMeta]` out. Swapping the stub for a real
  * decoder changes one function.
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

  /** STUB decoder: deterministic fake metadata derived from a keccak
    * of the payload (??? in spirit — replace with e.g. an ImageIO /
    * ffmpeg binding; the signature is the contract). */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
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

  /** partition-batched decode: one stub "decoder handle" per
    * partition, rows streamed through it. */
  def extractMeta(records: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition decoder setup would go here (codec tables, JNI handle…)
      it.map(r => decodeStub(r.payload).copy(doc_id = r.doc_id))
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
      parsed: Boolean) // false ⇒ unknown container, stub fallback used

  /** REAL container metadata ([[MediaParsers]] — PNG/JPEG/GIF/WAV
    * headers parsed from the bytes, no codec libs); unknown formats
    * fall back to the declared stub so the pipeline keeps flowing. */
  def extractContainerMeta(records: Dataset[MediaRecord]): Dataset[ContainerMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        MediaParsers.parse(r.payload) match {
          case Some(m) =>
            ContainerMeta(r.doc_id, r.payload.length, m.format, m.width, m.height,
              m.channels, m.sampleRate, m.nSamples, parsed = true)
          case None =>
            val s = decodeStub(r.payload)
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
    * decode inside each window stays with the stub. One row per
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
    * frame is the stub seam. */
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
