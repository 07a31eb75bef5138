package graft.multimodal

/** Real container-format header parsers — pure JVM, no codec
  * libraries. Pixel/sample DECODE stays stubbed (no image/audio libs
  * in this container), but format detection and structural metadata
  * (dimensions, channels, sample rate, duration) are genuinely parsed
  * from the bytes, which is what partitioning / filtering / batching
  * decisions key on in a real pipeline.
  */
object MediaParsers {

  final case class ParsedMeta(
      format: String, // png | jpeg | gif | wav | unknown
      width: Int, // -1 when not applicable
      height: Int,
      channels: Int, // audio only, else -1
      sampleRate: Int, // audio only, else -1
      nSamples: Long) // audio only, else -1

  private def u16be(b: Array[Byte], o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u16le(b: Array[Byte], o: Int): Int = ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def u32le(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) | ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG: 8-byte signature, then the IHDR chunk — width/height are
    * big-endian u32 at offsets 16/20. */
  def parsePng(b: Array[Byte]): Option[ParsedMeta] =
    if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
      new String(b.slice(12, 16), "US-ASCII") == "IHDR")
      Some(ParsedMeta("png", u32be(b, 16).toInt, u32be(b, 20).toInt, -1, -1, -1L))
    else None

  /** JPEG: FFD8 SOI, then marker segments; dimensions live in the
    * first SOF0/SOF1/SOF2 frame header (height then width, u16 BE). */
  def parseJpeg(b: Array[Byte]): Option[ParsedMeta] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None // marker desync
      val marker = b(i + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) { i += 2 } // standalone
      else {
        if (i + 4 > b.length) return None
        val len = u16be(b, i + 2)
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          if (i + 9 > b.length) return None
          return Some(ParsedMeta("jpeg", u16be(b, i + 7), u16be(b, i + 5), -1, -1, -1L))
        }
        i += 2 + len
      }
    }
    None
  }

  /** GIF87a/89a: 6-byte signature then logical screen w/h (u16 LE). */
  def parseGif(b: Array[Byte]): Option[ParsedMeta] = {
    if (b.length < 10) return None
    val sig = new String(b.take(6), "US-ASCII")
    if (sig == "GIF87a" || sig == "GIF89a")
      Some(ParsedMeta("gif", u16le(b, 6), u16le(b, 8), -1, -1, -1L))
    else None
  }

  /** RIFF/WAVE PCM: fmt chunk carries channels + sample rate + bits;
    * the data chunk size gives the sample count (duration =
    * nSamples / sampleRate). */
  def parseWav(b: Array[Byte]): Option[ParsedMeta] = {
    if (b.length < 44) return None
    if (new String(b.take(4), "US-ASCII") != "RIFF" ||
      new String(b.slice(8, 12), "US-ASCII") != "WAVE") return None
    var i = 12
    var channels = -1; var rate = -1; var bits = -1; var dataLen = -1L
    while (i + 8 <= b.length) {
      val id = new String(b.slice(i, i + 4), "US-ASCII")
      val len = u32le(b, i + 4)
      if (id == "fmt " && i + 24 <= b.length) {
        channels = u16le(b, i + 10)
        rate = u32le(b, i + 12).toInt
        bits = u16le(b, i + 22)
      } else if (id == "data") {
        dataLen = len
      }
      i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0 || bits <= 0 || dataLen < 0) None
    else Some(ParsedMeta("wav", -1, -1, channels, rate, dataLen / (channels * bits / 8)))
  }

  /** detect by magic bytes; unknown formats yield None (caller may
    * fall back to synthetic metadata). */
  def parse(b: Array[Byte]): Option[ParsedMeta] =
    parsePng(b).orElse(parseJpeg(b)).orElse(parseGif(b)).orElse(parseWav(b))

  // ----------------------------------------------- test payload forge
  /** a fully valid (zlib-deflated, CRC'd) single-color PNG — real
    * bytes a real decoder would accept, built with java.util.zip. */
  def makePng(width: Int, height: Int): Array[Byte] = {
    import java.io.ByteArrayOutputStream
    import java.util.zip.{CRC32, Deflater}
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      def be32(v: Long): Array[Byte] =
        Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(be32(data.length))
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new CRC32(); crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue))
      out.toByteArray
    }
    val ihdr = new Array[Byte](13)
    def putBe32(a: Array[Byte], o: Int, v: Int): Unit = {
      a(o) = ((v >> 24) & 0xff).toByte; a(o + 1) = ((v >> 16) & 0xff).toByte
      a(o + 2) = ((v >> 8) & 0xff).toByte; a(o + 3) = (v & 0xff).toByte
    }
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = 0 // 8-bit grayscale
    val raw = new Array[Byte]((width + 1) * height) // filter byte 0 + pixels
    val deflater = new Deflater(); deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = deflater.deflate(buf); deflater.end()
    val sig = PngSig
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", buf.take(n)) ++ chunk("IEND", Array.empty)
  }

  /** minimal structurally-valid JPEG: SOI + SOF0 with the dimensions
    * (enough for any header parser; no entropy data). */
  def makeJpegHeader(width: Int, height: Int): Array[Byte] = {
    val sof = Array[Int](0xff, 0xc0, 0x00, 0x0b, 8,
      (height >> 8) & 0xff, height & 0xff, (width >> 8) & 0xff, width & 0xff, 1, 0x11, 0, 0).map(_.toByte)
    Array(0xff.toByte, 0xd8.toByte) ++ sof ++ Array(0xff.toByte, 0xd9.toByte)
  }

  /** valid PCM WAV with silent samples. */
  def makeWav(channels: Int, sampleRate: Int, nSamples: Long): Array[Byte] = {
    val bits = 16
    val dataLen = nSamples * channels * (bits / 8)
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataLen) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(sampleRate.toLong * channels * (bits / 8)) ++
      le16(channels * (bits / 8)) ++ le16(bits) ++
      "data".getBytes("US-ASCII") ++ le32(dataLen) ++ new Array[Byte](dataLen.toInt)
  }

  def makeGif(width: Int, height: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++
      Array((width & 0xff).toByte, ((width >> 8) & 0xff).toByte,
        (height & 0xff).toByte, ((height >> 8) & 0xff).toByte, 0.toByte, 0.toByte, 0.toByte) ++
      Array(0x3b.toByte)
}
