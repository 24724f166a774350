package graft.core

import java.io.ByteArrayOutputStream

/** Minimal CBOR codec (RFC 8949) — the subset the seq interchange needs:
  * unsigned/negative integers, byte strings, text strings, arrays, maps,
  * false/true/null. The ENCODER is canonical definite-length (the
  * reference's serde-cbor output is definite-length as well); the
  * DECODER additionally accepts indefinite-length strings/arrays/maps
  * and skips tags, so any foreign conforming encoder's output imports.
  * Verified against the RFC 8949 Appendix A examples in `CborSpec`,
  * including the indefinite-length and tagged cases.
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

  /** Foreign-encoder emulation (gate/test-only — the interchange encoder
    * stays the canonical [[encode]]): re-encodes `v` with
    * indefinite-length framing for every string/array/map (strings split
    * into two definite chunks) and a tag on integers — semantically
    * identical bytes a different conforming encoder could legally
    * produce (RFC 8949 §3.2), used to gate the decoder's generality.
    */
  def encodeIndefinite(v: Val): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def go(x: Val): Unit = x match {
      case CBytes(b) =>
        out.write(0x5f)
        val mid = b.length / 2
        encodeTo(out, CBytes(java.util.Arrays.copyOfRange(b, 0, mid)))
        encodeTo(out, CBytes(java.util.Arrays.copyOfRange(b, mid, b.length)))
        out.write(0xff)
      case CText(s) =>
        out.write(0x7f)
        // split at a char boundary not inside a surrogate pair — each
        // chunk must be well-formed UTF-8 on its own (§3.2.3)
        val mid0 = s.length / 2
        val mid = if (mid0 > 0 && Character.isHighSurrogate(s.charAt(mid0 - 1))) mid0 + 1 else mid0
        encodeTo(out, CText(s.substring(0, mid)))
        encodeTo(out, CText(s.substring(mid)))
        out.write(0xff)
      case CArr(xs) => out.write(0x9f); xs.foreach(go); out.write(0xff)
      case CMap(kvs) =>
        out.write(0xbf)
        kvs.foreach { case (k, w) => go(k); go(w) }
        out.write(0xff)
      case CInt(_) =>
        out.write(0xd8); out.write(42) // tag 42 — decoder skips any tag
        encodeTo(out, x)
      case other => encodeTo(out, other)
    }
    go(v)
    out.toByteArray
  }

  /** Nesting cap for array/map recursion: a tiny malformed item claiming
    * deep nesting must fail with a clean error, not StackOverflowError.
    */
  private val MaxDepth = 512

  /** Decode one item at `off`; returns (value, offset past the item).
    *
    * DECODE-side generality beyond what [[encode]] emits (the encoder
    * stays canonical definite-length, like the reference's serde output):
    * indefinite-length byte/text strings (chunk concatenation, RFC 8949
    * §3.2.3), indefinite-length arrays/maps (§3.2.2), and tags (major 6,
    * skipped — the tagged item decodes as itself), so a foreign
    * conforming encoder's output imports cleanly. Floats remain
    * unsupported (no message field uses them; a float is a corrupt
    * stream for this interchange). Throws IllegalArgumentException on
    * malformed/truncated input or nesting past [[MaxDepth]] — import
    * treats that as a corrupt stream, mirroring the reference's hard
    * dataseq error.
    */
  def decodeOne(b: Array[Byte], off: Int): (Val, Int) = decodeOne(b, off, 0)

  private val Break = 0xff

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
        case 31 => throw new IllegalArgumentException(
          s"indefinite length not valid for major type $major")
        case other => throw new IllegalArgumentException(
          s"unsupported CBOR additional info $other")
      }
      require(off + 1 + width <= b.length, "truncated CBOR argument")
      if (width == 0) (info.toLong, off + 1)
      else {
        var v = 0L
        var i = 1
        while (i <= width) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
        // a 64-bit argument >= 2^63 wraps negative in a Long. As a LENGTH
        // it would then PASS the `<= remaining` bound checks and truncate
        // via toInt (a claimed 2^63+5-byte string silently decoding as 5
        // bytes); as an INTEGER it would silently decode as the wrong
        // negative value. Neither fits this interchange — reject cleanly.
        require(v >= 0, "CBOR 64-bit argument exceeds supported range")
        (v, off + 1 + width)
      }
    }
    def atBreak(p: Int): Boolean = {
      require(p < b.length, "truncated indefinite-length item")
      (b(p) & 0xff) == Break
    }
    // indefinite string chunks MUST be definite-length strings of the
    // same major type (RFC 8949 §3.2.3) — a nested indefinite or a
    // different major is malformed
    def stringChunks(wantMajor: Int): (Array[Byte], Int) = {
      var nx = off + 1
      val buf = new ByteArrayOutputStream()
      while (!atBreak(nx)) {
        val cb = b(nx) & 0xff
        require(cb >> 5 == wantMajor && (cb & 0x1f) != 31,
          s"indefinite string chunk must be a definite major-$wantMajor string")
        decodeOne(b, nx, depth + 1) match {
          case (CBytes(x), n2) => buf.write(x, 0, x.length); nx = n2
          case (CText(s), n2) => val x = s.getBytes("UTF-8"); buf.write(x, 0, x.length); nx = n2
          case _ => throw new IllegalArgumentException("unreachable chunk type")
        }
      }
      (buf.toByteArray, nx + 1)
    }
    major match {
      case 0 => val (n, nx) = argAndNext; (CInt(n), nx)
      case 1 => val (n, nx) = argAndNext; (CInt(-1L - n), nx)
      case 2 if info == 31 =>
        val (bytes, nx) = stringChunks(2); (CBytes(bytes), nx)
      case 2 =>
        val (len, nx) = argAndNext
        // `len <= b.length - nx`, not `nx + len <= b.length`: the latter
        // wraps negative for a claimed length near 2^63 and would pass
        require(len <= b.length - nx, "truncated byte string")
        (CBytes(java.util.Arrays.copyOfRange(b, nx, nx + len.toInt)), nx + len.toInt)
      case 3 if info == 31 =>
        val (bytes, nx) = stringChunks(3); (CText(new String(bytes, "UTF-8")), nx)
      case 3 =>
        val (len, nx) = argAndNext
        require(len <= b.length - nx, "truncated text string")
        (CText(new String(b, nx, len.toInt, "UTF-8")), nx + len.toInt)
      case 4 if info == 31 =>
        var nx = off + 1
        val items = Vector.newBuilder[Val]
        while (!atBreak(nx)) {
          val (v, n2) = decodeOne(b, nx, depth + 1); items += v; nx = n2
        }
        (CArr(items.result()), nx + 1)
      case 4 =>
        val (len, nx0) = argAndNext
        require(len <= b.length - nx0, "truncated array (length exceeds input)")
        var nx = nx0
        val items = Vector.newBuilder[Val]
        var i = 0L
        while (i < len) { val (v, n2) = decodeOne(b, nx, depth + 1); items += v; nx = n2; i += 1 }
        (CArr(items.result()), nx)
      case 5 if info == 31 =>
        var nx = off + 1
        val kvs = Vector.newBuilder[(Val, Val)]
        while (!atBreak(nx)) {
          val (k, n2) = decodeOne(b, nx, depth + 1)
          val (v, n3) = decodeOne(b, n2, depth + 1)
          kvs += ((k, v)); nx = n3
        }
        (CMap(kvs.result()), nx + 1)
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
      case 6 =>
        // tags are SKIPPED on decode: the tag number is read (validating
        // the argument) and the tagged content decodes as itself —
        // enough for any foreign encoder that stamps timestamps or
        // bignum tags on otherwise-plain items
        val (_, nx) = argAndNext
        decodeOne(b, nx, depth + 1)
      case 7 => info match {
        case 20 => (CBool(false), off + 1)
        case 21 => (CBool(true), off + 1)
        case 22 => (CNull, off + 1)
        case 31 => throw new IllegalArgumentException("unexpected break code")
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
