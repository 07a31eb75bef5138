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
}
