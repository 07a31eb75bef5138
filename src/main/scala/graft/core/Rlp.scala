package graft.core

/** RLP (Recursive Length Prefix) encode/decode — Ethereum's wire format
  * for trie nodes and block headers. Public algorithm (Ethereum Yellow
  * Paper, appendix B). Behavioral contract mirrors the reference's
  * in-circuit decoder (`mrp2-utils/src/rlp.rs:60-320`): header decode
  * (single byte vs short vs long form), fixed-arity list decode, and
  * the leaf-value extraction projection
  * (`storage/mapping/leaf.rs:82-110`).
  */
object Rlp {

  sealed trait Item
  final case class Str(bytes: Array[Byte]) extends Item
  final case class Lst(items: Vector[Item]) extends Item

  // ---------------------------------------------------------------- encode

  def encode(item: Item): Array[Byte] = item match {
    case Str(b) =>
      if (b.length == 1 && (b(0) & 0xff) < 0x80) b
      else Bytes.concat(lengthPrefix(b.length, 0x80), b)
    case Lst(items) =>
      val payload = Bytes.concat(items.map(encode): _*)
      Bytes.concat(lengthPrefix(payload.length, 0xc0), payload)
  }

  /** minimal big-endian integer encoding (no leading zeros), RLP-wrapped */
  def encodeLong(v: Long): Array[Byte] = {
    require(v >= 0)
    if (v == 0) encode(Str(Array.empty))
    else {
      var width = 0
      var x = v
      while (x != 0) { width += 1; x >>>= 8 }
      encode(Str(Bytes.beBytes(v, width)))
    }
  }

  private def lengthPrefix(len: Int, base: Int): Array[Byte] =
    if (len <= 55) Array((base + len).toByte)
    else {
      var width = 0
      var x = len
      while (x != 0) { width += 1; x >>>= 8 }
      Bytes.concat(Array((base + 55 + width).toByte), Bytes.beBytes(len.toLong, width))
    }

  // ---------------------------------------------------------------- decode

  /** Decode one item starting at `off`; returns (item, bytesConsumed). */
  def decodeAt(in: Array[Byte], off: Int): (Item, Int) = {
    val b0 = in(off) & 0xff
    if (b0 < 0x80) (Str(Array(in(off))), 1)
    else if (b0 <= 0xb7) {
      val len = b0 - 0x80
      (Str(in.slice(off + 1, off + 1 + len)), 1 + len)
    } else if (b0 <= 0xbf) {
      val lw = b0 - 0xb7
      val len = Bytes.beLong(in.slice(off + 1, off + 1 + lw)).toInt
      (Str(in.slice(off + 1 + lw, off + 1 + lw + len)), 1 + lw + len)
    } else {
      val (payloadOff, payloadLen) =
        if (b0 <= 0xf7) (off + 1, b0 - 0xc0)
        else {
          val lw = b0 - 0xf7
          (off + 1 + lw, Bytes.beLong(in.slice(off + 1, off + 1 + lw)).toInt)
        }
      var cur = payloadOff
      val end = payloadOff + payloadLen
      val items = Vector.newBuilder[Item]
      while (cur < end) {
        val (item, used) = decodeAt(in, cur)
        items += item
        cur += used
      }
      (Lst(items.result()), end - off)
    }
  }

  def decode(in: Array[Byte]): Item = decodeAt(in, 0)._1

  def decodeList(in: Array[Byte]): Vector[Item] = decode(in) match {
    case Lst(items) => items
    case _          => throw new IllegalArgumentException("RLP: expected list")
  }

  /** Leaf-value projection (`storage/mapping/leaf.rs:82-110`): an MPT
    * storage leaf is `[encodedPath, rlp(value)]`; the value is RLP'd a
    * second time inside the leaf. Returns `left_pad32(value)`.
    */
  def extractLeafValue32(leafNode: Array[Byte]): Array[Byte] =
    decodeList(leafNode) match {
      case Vector(_, Str(inner)) =>
        decode(inner) match {
          case Str(v) => Bytes.leftPad32(v)
          case _      => throw new IllegalArgumentException("RLP: leaf value is a list")
        }
      case other => throw new IllegalArgumentException(s"RLP: not a 2-item leaf (${other.size} items)")
    }

  /** MPT hex-prefix ("compact") path encoding (Yellow Paper, appendix C;
    * reference: `mrp2-utils/src/rlp.rs` compact decode). `nibbles` are
    * 0..15 values; `isLeaf` sets the terminator flag. */
  def hexPrefixEncode(nibbles: Array[Int], isLeaf: Boolean): Array[Byte] = {
    val flag = (if (isLeaf) 2 else 0) + (nibbles.length % 2)
    val padded = if (nibbles.length % 2 == 1) flag +: nibbles.toSeq else Seq(flag, 0) ++ nibbles
    padded.grouped(2).map { case Seq(h, l) => ((h << 4) | l).toByte }.toArray
  }

  def hexPrefixDecode(in: Array[Byte]): (Array[Int], Boolean) = {
    val nibbles = in.flatMap(b => Array((b >> 4) & 0xf, b & 0xf))
    val isLeaf = (nibbles(0) & 2) != 0
    val odd = (nibbles(0) & 1) != 0
    ((if (odd) nibbles.drop(1) else nibbles.drop(2)).toArray, isLeaf)
  }

  /** Block-header field extraction (reference reads fixed offsets
    * `state/block_linking/block.rs:21-30`: parentHash@4, stateRoot@91,
    * number@450; we decode the header as a proper RLP list and index
    * fields by position — same result, robust to varying extra-data).
    * Field order per Ethereum header: 0 parentHash, 3 stateRoot, 8 number.
    */
  def headerFields(headerRlp: Array[Byte]): HeaderFields = {
    val items = decodeList(headerRlp)
    def str(i: Int): Array[Byte] = items(i) match {
      case Str(b) => b
      case _      => throw new IllegalArgumentException(s"header field $i is a list")
    }
    HeaderFields(
      parentHash = str(0),
      stateRoot = str(3),
      number = Bytes.beLong(str(8)))
  }

  final case class HeaderFields(parentHash: Array[Byte], stateRoot: Array[Byte], number: Long)
}
