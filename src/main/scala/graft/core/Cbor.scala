package graft.core

import java.io.ByteArrayOutputStream

/** Minimal CBOR codec (RFC 8949) — the subset the seq interchange needs:
  * unsigned/negative integers, byte strings, text strings, arrays, maps,
  * false/true/null. Definite lengths only (the reference's serde-cbor
  * output is definite-length as well). Verified against the RFC 8949
  * Appendix A examples in `CborSpec`.
  *
  * Reference context: warcat-rs offers CBOR as one of its dataseq export
  * formats alongside JSON-seq/JSONL/CSV (src/dataseq.rs); this codec
  * backs the CBOR variant of the message interchange
  * ([[graft.ops.MessageCbor]]). A CBOR *sequence* is plain concatenation
  * of self-delimiting items (RFC 8742) — no framing bytes.
  */
object Cbor {

  sealed trait Val
  final case class CInt(v: Long) extends Val
  final case class CBytes(v: Array[Byte]) extends Val
  final case class CText(v: String) extends Val
  final case class CArr(v: Vector[Val]) extends Val
  final case class CMap(v: Vector[(Val, Val)]) extends Val
  final case class CBool(v: Boolean) extends Val
  case object CNull extends Val

  private def writeTypeLen(out: ByteArrayOutputStream, major: Int, n: Long): Unit = {
    require(n >= 0, s"negative length $n")
    val mb = major << 5
    if (n < 24) out.write(mb | n.toInt)
    else if (n < 256) { out.write(mb | 24); out.write(n.toInt) }
    else if (n < 65536) {
      out.write(mb | 25); out.write((n >> 8).toInt & 0xff); out.write(n.toInt & 0xff)
    } else if (n < (1L << 32)) {
      out.write(mb | 26)
      var i = 24
      while (i >= 0) { out.write((n >> i).toInt & 0xff); i -= 8 }
    } else {
      out.write(mb | 27)
      var i = 56
      while (i >= 0) { out.write((n >> i).toInt & 0xff); i -= 8 }
    }
  }

  def encodeTo(out: ByteArrayOutputStream, v: Val): Unit = v match {
    case CInt(n) =>
      if (n >= 0) writeTypeLen(out, 0, n)
      else writeTypeLen(out, 1, -1L - n)
    case CBytes(b) => writeTypeLen(out, 2, b.length.toLong); out.write(b, 0, b.length)
    case CText(s) =>
      val b = s.getBytes("UTF-8")
      writeTypeLen(out, 3, b.length.toLong); out.write(b, 0, b.length)
    case CArr(xs) => writeTypeLen(out, 4, xs.length.toLong); xs.foreach(encodeTo(out, _))
    case CMap(kvs) =>
      writeTypeLen(out, 5, kvs.length.toLong)
      kvs.foreach { case (k, value) => encodeTo(out, k); encodeTo(out, value) }
    case CBool(b) => out.write(if (b) 0xf5 else 0xf4)
    case CNull => out.write(0xf6)
  }

  def encode(v: Val): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    encodeTo(out, v)
    out.toByteArray
  }

  /** Nesting cap for array/map recursion: a tiny malformed item claiming
    * deep nesting must fail with a clean error, not StackOverflowError.
    */
  private val MaxDepth = 512

  /** Decode one item at `off`; returns (value, offset past the item).
    * Throws IllegalArgumentException on malformed/truncated input,
    * unsupported majors (tags, floats, indefinite lengths), or nesting
    * past [[MaxDepth]] — import treats that as a corrupt stream,
    * mirroring the reference's hard dataseq error.
    */
  def decodeOne(b: Array[Byte], off: Int): (Val, Int) = decodeOne(b, off, 0)

  private def decodeOne(b: Array[Byte], off: Int, depth: Int): (Val, Int) = {
    require(off >= 0 && off < b.length, "truncated CBOR item")
    require(depth <= MaxDepth, s"CBOR nesting deeper than $MaxDepth")
    val ib = b(off) & 0xff
    val major = ib >> 5
    val info = ib & 0x1f
    def argAndNext: (Long, Int) = {
      // bounds-check multi-byte arguments: truncated input must surface
      // as the documented clean error, not ArrayIndexOutOfBoundsException
      val width = info match {
        case n if n < 24 => 0
        case 24 => 1
        case 25 => 2
        case 26 => 4
        case 27 => 8
        case other => throw new IllegalArgumentException(
          s"unsupported CBOR additional info $other (indefinite lengths not emitted)")
      }
      require(off + 1 + width <= b.length, "truncated CBOR argument")
      if (width == 0) (info.toLong, off + 1)
      else {
        var v = 0L
        var i = 1
        while (i <= width) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
        (v, off + 1 + width)
      }
    }
    major match {
      case 0 => val (n, nx) = argAndNext; (CInt(n), nx)
      case 1 => val (n, nx) = argAndNext; (CInt(-1L - n), nx)
      case 2 =>
        val (len, nx) = argAndNext
        require(nx + len <= b.length, "truncated byte string")
        (CBytes(java.util.Arrays.copyOfRange(b, nx, nx + len.toInt)), nx + len.toInt)
      case 3 =>
        val (len, nx) = argAndNext
        require(nx + len <= b.length, "truncated text string")
        (CText(new String(b, nx, len.toInt, "UTF-8")), nx + len.toInt)
      case 4 =>
        val (len, nx0) = argAndNext
        require(len <= b.length - nx0, "truncated array (length exceeds input)")
        var nx = nx0
        val items = Vector.newBuilder[Val]
        var i = 0L
        while (i < len) { val (v, n2) = decodeOne(b, nx, depth + 1); items += v; nx = n2; i += 1 }
        (CArr(items.result()), nx)
      case 5 =>
        val (len, nx0) = argAndNext
        require(len <= (b.length - nx0) / 2, "truncated map (length exceeds input)")
        var nx = nx0
        val kvs = Vector.newBuilder[(Val, Val)]
        var i = 0L
        while (i < len) {
          val (k, n2) = decodeOne(b, nx, depth + 1)
          val (v, n3) = decodeOne(b, n2, depth + 1)
          kvs += ((k, v)); nx = n3; i += 1
        }
        (CMap(kvs.result()), nx)
      case 7 => info match {
        case 20 => (CBool(false), off + 1)
        case 21 => (CBool(true), off + 1)
        case 22 => (CNull, off + 1)
        case other => throw new IllegalArgumentException(s"unsupported simple value $other")
      }
      case other => throw new IllegalArgumentException(s"unsupported CBOR major type $other")
    }
  }

  /** RFC 8742 CBOR sequence: items back-to-back until the buffer ends. */
  def decodeSeq(b: Array[Byte]): Vector[Val] = {
    val out = Vector.newBuilder[Val]
    var off = 0
    while (off < b.length) {
      val (v, nx) = decodeOne(b, off)
      out += v
      off = nx
    }
    out.result()
  }

  // convenience accessors for map-shaped messages
  def mapGet(m: Val, key: String): Option[Val] = m match {
    case CMap(kvs) => kvs.collectFirst { case (CText(`key`), v) => v }
    case _ => None
  }
  def asText(v: Val): Option[String] = v match { case CText(s) => Some(s); case _ => None }
  def asLong(v: Val): Option[Long] = v match { case CInt(n) => Some(n); case _ => None }
  def asBytes(v: Val): Option[Array[Byte]] = v match { case CBytes(x) => Some(x); case _ => None }
}
