package graft.ops

/** Pure-JVM brotli decoder (RFC 7932) — closes the engine's last
  * content-coding gap vs the reference, which decompresses `br` HTTP
  * payloads natively (reference `http/h1/codec.rs:113-135`,
  * `compress.rs:84-98`). Decoder only: the engine never needs to EMIT
  * brotli.
  *
  * Implemented from the public RFC 7932 specification:
  *   - bit-oriented stream reading (prefix codes MSB-first inside the
  *     LSB-first byte stream, §3.1);
  *   - simple + complex prefix-code descriptors with the fixed
  *     code-length code and run-length codes 16/17 (§3.2–3.5);
  *   - meta-block structure: uncompressed / metadata / compressed,
  *     block-switch machinery for the three category streams (§6, §9.2);
  *   - context modeling for literals (4 modes) and distances (§7);
  *   - distance ring buffer + NPOSTFIX/NDIRECT alphabet (§4);
  *   - the static dictionary with its 121 word transforms (§8,
  *     Appendix A/B). The dictionary bytes, word transforms, and context
  *     lookup tables are the RFC's appendix DATA (public standard
  *     content, byte-identical to every conforming implementation;
  *     dictionary sha256 20e42eb1…3c70), carried as a resource /
  *     inline tables.
  *
  * Validated against reference-encoder streams at qualities 0–11 and
  * window sizes 10–24 (`BrotliSpec` vectors), including
  * dictionary-transform references, UTF-8 context modeling, and
  * multi-meta-block inputs.
  *
  * Scale note: decoding is per-payload scalar work inside executor
  * tasks (one UDF call per HTTP response row) — no driver state, no
  * shuffle; the dictionary/LUTs are JVM-static singletons shared by all
  * tasks in an executor.
  */
object Brotli {

  final class BrotliException(msg: String) extends RuntimeException(msg)

  private val Debug = sys.env.contains("BROTLI_DEBUG")

  private def fail(msg: String): Nothing = throw new BrotliException(msg)

  // ---------------------------------------------------------------- I/O

  /** LSB-first bit reader over a byte array (RFC 7932 §3.1). */
  private final class Reader(in: Array[Byte]) {
    private var pos = 0
    private var buf = 0L
    private var cnt = 0

    /** Absolute bit offset of the next unread bit (debug tracing). */
    def bitPos: Long = pos.toLong * 8 - cnt

    private def fill(): Unit =
      while (cnt <= 56 && pos < in.length) {
        buf |= (in(pos) & 0xffL) << cnt
        cnt += 8
        pos += 1
      }

    def readBits(n: Int): Int = {
      if (n == 0) return 0
      if (cnt < n) fill()
      if (cnt < n) fail(s"unexpected end of input at byte $pos")
      val v = (buf & ((1L << n) - 1)).toInt
      buf >>>= n
      cnt -= n
      v
    }

    def readBit(): Int = readBits(1)

    /** Next `n` bits without consuming; zero-padded at stream end. */
    def peekBits(n: Int): Int = {
      if (cnt < n) fill()
      (buf & ((1L << n) - 1)).toInt
    }

    def skipBits(n: Int): Unit = {
      if (cnt < n) fail("unexpected end of input (skip)")
      buf >>>= n
      cnt -= n
    }

    /** Discard bits to the next byte boundary. */
    def align(): Unit = {
      val drop = cnt & 7
      buf >>>= drop
      cnt -= drop
    }

    /** Byte-aligned raw copy (uncompressed meta-blocks, §9.2). */
    def readBytes(dst: Array[Byte], off: Int, len: Int): Unit = {
      require((cnt & 7) == 0, "readBytes without byte alignment")
      var o = off
      var remaining = len
      while (cnt > 0 && remaining > 0) {
        dst(o) = (buf & 0xff).toByte
        buf >>>= 8; cnt -= 8; o += 1; remaining -= 1
      }
      if (remaining > 0) {
        if (pos + remaining > in.length) fail("unexpected end of uncompressed block")
        System.arraycopy(in, pos, dst, o, remaining)
        pos += remaining
      }
    }

    /** True when every input byte has been consumed (trailing padding
      * bits inside the final byte are allowed).
      */
    def exhausted: Boolean = pos >= in.length && cnt < 8
  }

  // ------------------------------------------------------- prefix codes

  /** Canonical prefix decoder: per-bit walk with first-code arithmetic
    * (codes are MSB-first, §3.1; max depth 15). `single >= 0` encodes a
    * zero-bit single-symbol code (§3.4).
    */
  private final class Prefix(count: Array[Int], sorted: Array[Int], single: Int) {
    def read(r: Reader): Int = {
      if (single >= 0) return single
      var code = 0
      var first = 0
      var index = 0
      var len = 1
      while (len <= 15) {
        code = (code << 1) | r.readBit()
        val c = count(len)
        if (code - first < c) return sorted(index + (code - first))
        index += c
        first = (first + c) << 1
        len += 1
      }
      fail("invalid prefix code word")
    }
  }

  /** Build a canonical prefix decoder from code lengths; validates the
    * code is complete (§3.2) unless it is a single-symbol code.
    */
  private def buildPrefix(lengths: Array[Int]): Prefix = {
    val nonzero = lengths.count(_ > 0)
    if (nonzero == 0) fail("prefix code with no symbols")
    if (nonzero == 1) return new Prefix(null, null, lengths.indexWhere(_ > 0))
    val count = new Array[Int](16)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    var space = 0L
    for (l <- 1 to 15) space += count(l).toLong << (15 - l)
    if (space != (1L << 15)) fail(s"incomplete/over-subscribed prefix code (space $space)")
    // symbols sorted by (length, symbol) — canonical order
    val offsets = new Array[Int](17)
    for (l <- 1 to 15) offsets(l + 1) = offsets(l) + count(l)
    val sorted = new Array[Int](nonzero)
    val cursor = offsets.clone()
    var s = 0
    while (s < lengths.length) {
      val l = lengths(s)
      if (l > 0) { sorted(cursor(l)) = s; cursor(l) += 1 }
      s += 1
    }
    new Prefix(count, sorted, -1)
  }

  /** Fixed prefix code of the code-length alphabet (§3.5): value+length
    * looked up from the next 4 stream bits.
    */
  private val ClcValue = Array(0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)
  private val ClcLength = Array(2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4)
  private val ClcOrder = Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix-code descriptor (§3.2–3.5) over `alphabet` symbols. */
  private def readPrefixCode(r: Reader, alphabet: Int): Prefix = {
    val ident = r.readBits(2)
    if (ident == 1) {
      // simple code: 1–4 symbols listed explicitly
      val nsym = r.readBits(2) + 1
      val albits = 32 - Integer.numberOfLeadingZeros(math.max(1, alphabet - 1))
      val syms = Array.fill(nsym)(r.readBits(albits))
      syms.foreach(s => if (s >= alphabet) fail(s"simple-code symbol $s out of alphabet"))
      if (syms.distinct.length != nsym) fail("duplicate symbol in simple code")
      val lengths = new Array[Int](alphabet)
      nsym match {
        case 1 => return new Prefix(null, null, syms(0))
        case 2 =>
          java.util.Arrays.sort(syms)
          lengths(syms(0)) = 1; lengths(syms(1)) = 1
        case 3 =>
          if (syms(1) > syms(2)) { val t = syms(1); syms(1) = syms(2); syms(2) = t }
          lengths(syms(0)) = 1; lengths(syms(1)) = 2; lengths(syms(2)) = 2
        case 4 =>
          if (r.readBit() == 1) {
            if (syms(2) > syms(3)) { val t = syms(2); syms(2) = syms(3); syms(3) = t }
            lengths(syms(0)) = 1; lengths(syms(1)) = 2
            lengths(syms(2)) = 3; lengths(syms(3)) = 3
          } else {
            java.util.Arrays.sort(syms)
            syms.foreach(lengths(_) = 2)
          }
      }
      if (Debug) println(s"SIMPLE alphabet=$alphabet syms=${syms.toSeq} lens=${lengths.zipWithIndex.filter(_._1 > 0).map { case (l, sy) => s"$sy:$l" }.mkString(",")}")
      buildPrefix(lengths)
    } else {
      // complex code: code lengths themselves prefix-coded
      val hskip = ident // 0, 2 or 3
      val clcLengths = new Array[Int](18)
      var space = 0
      var numCodes = 0
      var i = hskip
      while (i < 18 && space < 32) {
        val idx = r.peekBits(4)
        r.skipBits(ClcLength(idx))
        val v = ClcValue(idx)
        clcLengths(ClcOrder(i)) = v
        if (v != 0) { space += 32 >> v; numCodes += 1 }
        i += 1
      }
      if (!(numCodes == 1 || space == 32))
        fail(s"invalid code-length code (space $space, codes $numCodes)")
      val clc = buildPrefix(clcLengths)

      // symbol code lengths with run-length codes 16/17 (§3.5)
      val lengths = new Array[Int](alphabet)
      var symbol = 0
      var prevLen = 8
      var repeat = 0
      var repeatLen = 0
      var symSpace = 0L
      val Total = 1L << 15
      while (symbol < alphabet && symSpace < Total) {
        val codeLen = clc.read(r)
        if (codeLen < 16) {
          lengths(symbol) = codeLen
          symbol += 1
          if (codeLen != 0) {
            prevLen = codeLen
            symSpace += Total >> codeLen
          }
          repeat = 0
        } else {
          val extra = codeLen - 14 // 16 → 2, 17 → 3
          val newLen = if (codeLen == 16) prevLen else 0
          if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
          val oldRepeat = repeat
          if (repeat > 0) repeat = (repeat - 2) << extra
          repeat += r.readBits(extra) + 3
          val delta = repeat - oldRepeat
          if (symbol + delta > alphabet) fail("repeat past alphabet end")
          var k = 0
          while (k < delta) { lengths(symbol) = repeatLen; symbol += 1; k += 1 }
          if (repeatLen != 0) symSpace += delta.toLong * (Total >> repeatLen)
        }
      }
      if (symSpace != Total) fail(s"incomplete symbol code (space $symSpace)")
      if (Debug) println(s"COMPLEX alphabet=$alphabet clc=${clcLengths.toSeq} lengths=${lengths.zipWithIndex.filter(_._1 > 0).map { case (l, sy) => s"$sy:$l" }.mkString(",")}")
      buildPrefix(lengths)
    }
  }

  // -------------------------------------------------- small value codes

  /** 1..256 variable-length count (NBLTYPES, NTREES — §9.2). */
  private def readVarLenCount(r: Reader): Int =
    if (r.readBit() == 0) 1
    else {
      val n = r.readBits(3)
      if (n == 0) 2 else (1 << n) + 1 + r.readBits(n)
    }

  /** Block count code: 26 symbols of (base, extra bits) (§6). */
  private val BlockLenBase = Array(1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97,
    113, 145, 177, 209, 241, 305, 369, 497, 753, 1265, 2289, 4337, 8433, 16625)
  private val BlockLenExtra = Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4,
    5, 5, 5, 5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 24)

  /** Insert-length codes 0..23 (§5). */
  private val InsertBase = Array(0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50,
    66, 98, 130, 194, 322, 578, 1090, 2114, 6210, 22594)
  private val InsertExtra = Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4,
    5, 5, 6, 7, 8, 9, 10, 12, 14, 24)

  /** Copy-length codes 0..23 (§5). */
  private val CopyBase = Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30,
    38, 54, 70, 102, 134, 198, 326, 582, 1094, 2118)
  private val CopyExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 5, 6, 7, 8, 9, 10, 24)

  /** Command-code cell → insert/copy code range starts; the first two of
    * the eleven 64-code cells imply distance code 0 (§5).
    */
  private val InsertRangeLut = Array(0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CopyRangeLut = Array(0, 8, 0, 8, 16, 0, 16, 8, 16)

  // ------------------------------------------------------ context model

  /** 2048-byte context lookup table (RFC 7932 §7.1 / Appendix B data):
    * 4 modes × (lut0[256] ++ lut1[256]) in mode order LSB6, MSB6, UTF8,
    * SIGNED; context = lut0(p1) | lut1(p2).
    */
  private lazy val ContextLut: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/brotli_context_lut.bin")
    require(in != null, "missing brotli_context_lut.bin resource")
    try in.readAllBytes() finally in.close()
  }

  // -------------------------------------------------- static dictionary

  /** Words-per-length index bits (RFC 7932 Appendix A layout). */
  private val DictSizeBits = Array(0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10,
    10, 9, 9, 8, 7, 7, 8, 7, 7, 6, 6, 5, 5)
  private val DictOffsets = Array(0, 0, 0, 0, 0, 4096, 9216, 21504, 35840,
    44032, 53248, 63488, 74752, 87040, 93696, 100864, 104704, 106752, 108928,
    113536, 115968, 118528, 119872, 121280, 122016, 122784)

  private lazy val Dictionary: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/brotli_dictionary.bin")
    require(in != null, "missing brotli_dictionary.bin resource")
    val d = try in.readAllBytes() finally in.close()
    require(d.length == 122784, s"dictionary resource is ${d.length} bytes")
    d
  }

  /** The 121 word transforms (prefix, type, suffix) in RFC order
    * (Appendix B). Types: 0 identity, 1–9 omit-last-N, 10 ferment-first,
    * 11 ferment-all, 12–20 omit-first-(N-11). Strings are latin1-coded
    * byte sequences.
    */
  private val Transforms: Array[(Array[Byte], Int, Array[Byte])] = Array(
    ("", 0, ""), // 0: Identity
    ("", 0, " "), // 1: Identity
    (" ", 0, " "), // 2: Identity
    ("", 12, ""), // 3: OmitFirst1
    ("", 10, " "), // 4: UppercaseFirst
    ("", 0, " the "), // 5: Identity
    (" ", 0, ""), // 6: Identity
    ("s ", 0, " "), // 7: Identity
    ("", 0, " of "), // 8: Identity
    ("", 10, ""), // 9: UppercaseFirst
    ("", 0, " and "), // 10: Identity
    ("", 13, ""), // 11: OmitFirst2
    ("", 1, ""), // 12: OmitLast1
    (", ", 0, " "), // 13: Identity
    ("", 0, ", "), // 14: Identity
    (" ", 10, " "), // 15: UppercaseFirst
    ("", 0, " in "), // 16: Identity
    ("", 0, " to "), // 17: Identity
    ("e ", 0, " "), // 18: Identity
    ("", 0, "\""), // 19: Identity
    ("", 0, "."), // 20: Identity
    ("", 0, "\">"), // 21: Identity
    ("", 0, "\n"), // 22: Identity
    ("", 3, ""), // 23: OmitLast3
    ("", 0, "]"), // 24: Identity
    ("", 0, " for "), // 25: Identity
    ("", 14, ""), // 26: OmitFirst3
    ("", 2, ""), // 27: OmitLast2
    ("", 0, " a "), // 28: Identity
    ("", 0, " that "), // 29: Identity
    (" ", 10, ""), // 30: UppercaseFirst
    ("", 0, ". "), // 31: Identity
    (".", 0, ""), // 32: Identity
    (" ", 0, ", "), // 33: Identity
    ("", 15, ""), // 34: OmitFirst4
    ("", 0, " with "), // 35: Identity
    ("", 0, "'"), // 36: Identity
    ("", 0, " from "), // 37: Identity
    ("", 0, " by "), // 38: Identity
    ("", 16, ""), // 39: OmitFirst5
    ("", 17, ""), // 40: OmitFirst6
    (" the ", 0, ""), // 41: Identity
    ("", 4, ""), // 42: OmitLast4
    ("", 0, ". The "), // 43: Identity
    ("", 11, ""), // 44: UppercaseAll
    ("", 0, " on "), // 45: Identity
    ("", 0, " as "), // 46: Identity
    ("", 0, " is "), // 47: Identity
    ("", 7, ""), // 48: OmitLast7
    ("", 1, "ing "), // 49: OmitLast1
    ("", 0, "\n\t"), // 50: Identity
    ("", 0, ":"), // 51: Identity
    (" ", 0, ". "), // 52: Identity
    ("", 0, "ed "), // 53: Identity
    ("", 20, ""), // 54: OmitFirst9
    ("", 18, ""), // 55: OmitFirst7
    ("", 6, ""), // 56: OmitLast6
    ("", 0, "("), // 57: Identity
    ("", 10, ", "), // 58: UppercaseFirst
    ("", 8, ""), // 59: OmitLast8
    ("", 0, " at "), // 60: Identity
    ("", 0, "ly "), // 61: Identity
    (" the ", 0, " of "), // 62: Identity
    ("", 5, ""), // 63: OmitLast5
    ("", 9, ""), // 64: OmitLast9
    (" ", 10, ", "), // 65: UppercaseFirst
    ("", 10, "\""), // 66: UppercaseFirst
    (".", 0, "("), // 67: Identity
    ("", 11, " "), // 68: UppercaseAll
    ("", 10, "\">"), // 69: UppercaseFirst
    ("", 0, "=\""), // 70: Identity
    (" ", 0, "."), // 71: Identity
    (".com/", 0, ""), // 72: Identity
    (" the ", 0, " of the "), // 73: Identity
    ("", 10, "'"), // 74: UppercaseFirst
    ("", 0, ". This "), // 75: Identity
    ("", 0, ","), // 76: Identity
    (".", 0, " "), // 77: Identity
    ("", 10, "("), // 78: UppercaseFirst
    ("", 10, "."), // 79: UppercaseFirst
    ("", 0, " not "), // 80: Identity
    (" ", 0, "=\""), // 81: Identity
    ("", 0, "er "), // 82: Identity
    (" ", 11, " "), // 83: UppercaseAll
    ("", 0, "al "), // 84: Identity
    (" ", 11, ""), // 85: UppercaseAll
    ("", 0, "='"), // 86: Identity
    ("", 11, "\""), // 87: UppercaseAll
    ("", 10, ". "), // 88: UppercaseFirst
    (" ", 0, "("), // 89: Identity
    ("", 0, "ful "), // 90: Identity
    (" ", 10, ". "), // 91: UppercaseFirst
    ("", 0, "ive "), // 92: Identity
    ("", 0, "less "), // 93: Identity
    ("", 11, "'"), // 94: UppercaseAll
    ("", 0, "est "), // 95: Identity
    (" ", 10, "."), // 96: UppercaseFirst
    ("", 11, "\">"), // 97: UppercaseAll
    (" ", 0, "='"), // 98: Identity
    ("", 10, ","), // 99: UppercaseFirst
    ("", 0, "ize "), // 100: Identity
    ("", 11, "."), // 101: UppercaseAll
    ("Â ", 0, ""), // 102: Identity
    (" ", 0, ","), // 103: Identity
    ("", 10, "=\""), // 104: UppercaseFirst
    ("", 11, "=\""), // 105: UppercaseAll
    ("", 0, "ous "), // 106: Identity
    ("", 11, ", "), // 107: UppercaseAll
    ("", 10, "='"), // 108: UppercaseFirst
    (" ", 10, ","), // 109: UppercaseFirst
    (" ", 11, "=\""), // 110: UppercaseAll
    (" ", 11, ", "), // 111: UppercaseAll
    ("", 11, ","), // 112: UppercaseAll
    ("", 11, "("), // 113: UppercaseAll
    ("", 11, ". "), // 114: UppercaseAll
    (" ", 11, "."), // 115: UppercaseAll
    ("", 11, "='"), // 116: UppercaseAll
    (" ", 11, ". "), // 117: UppercaseAll
    (" ", 10, "=\""), // 118: UppercaseFirst
    (" ", 11, "='"), // 119: UppercaseAll
    (" ", 10, "='") // 120: UppercaseFirst
  ).map { case (p, t, s) =>
    (p.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1), t,
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
  }

  /** Ferment (uppercase) step at `i`; returns bytes consumed (§8). */
  private def ferment(w: Array[Byte], i: Int): Int = {
    val c = w(i) & 0xff
    if (c < 192) {
      if (c >= 'a' && c <= 'z') w(i) = (c ^ 32).toByte
      1
    } else if (c < 224) {
      if (i + 1 < w.length) w(i + 1) = (w(i + 1) ^ 32).toByte
      2
    } else {
      if (i + 2 < w.length) w(i + 2) = (w(i + 2) ^ 5).toByte
      3
    }
  }

  /** Apply transform `tid` to the dictionary word `[off, off+len)`. */
  private def transformWord(off: Int, len: Int, tid: Int): Array[Byte] = {
    val (prefix, typ, suffix) = Transforms(tid)
    var start = off
    var n = len
    if (typ >= 12) { val omit = typ - 11; start += math.min(omit, n); n -= math.min(omit, n) }
    else if (typ >= 1 && typ <= 9) n -= math.min(typ, n)
    val word = java.util.Arrays.copyOfRange(Dictionary, start, start + n)
    if (typ == 10) { if (word.length > 0) ferment(word, 0) }
    else if (typ == 11) {
      var i = 0
      while (i < word.length) i += ferment(word, i)
    }
    val out = new Array[Byte](prefix.length + word.length + suffix.length)
    System.arraycopy(prefix, 0, out, 0, prefix.length)
    System.arraycopy(word, 0, out, prefix.length, word.length)
    System.arraycopy(suffix, 0, out, prefix.length + word.length, suffix.length)
    out
  }

  // ----------------------------------------------------------- decoding

  /** Growable output buffer with back-reference copy support. */
  private final class Output(var capHint: Int, maxOutput: Int) {
    var buf = new Array[Byte](math.max(64, math.min(capHint, 1 << 20)))
    var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length) {
        var cap = buf.length
        while (cap < len + n) cap <<= 1
        buf = java.util.Arrays.copyOf(buf, cap)
      }
    def byte(b: Byte): Unit = {
      if (len + 1 > maxOutput) fail(s"output exceeds limit $maxOutput")
      ensure(1); buf(len) = b; len += 1
    }
    def bytes(src: Array[Byte], off: Int, n: Int): Unit = {
      if (len + n > maxOutput) fail(s"output exceeds limit $maxOutput")
      ensure(n); System.arraycopy(src, off, buf, len, n); len += n
    }
    /** Overlapping-safe back-reference copy (RLE-style forward overlap). */
    def copyBack(distance: Int, n: Int): Unit = {
      if (len + n > maxOutput) fail(s"output exceeds limit $maxOutput")
      ensure(n)
      val src = len - distance
      var i = 0
      while (i < n) { buf(len + i) = buf(src + i); i += 1 }
      len += n
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  /** Per-category block-switch state (§6). */
  private final class Blocks(val n: Int, typeCode: Prefix, countCode: Prefix,
                             firstLen: Int) {
    var btype = 0
    private var prev = 1
    var remaining: Int = firstLen
    def switchBlock(r: Reader): Unit = {
      val sym = typeCode.read(r)
      val next = sym match {
        case 0 => prev
        case 1 => (btype + 1) % n
        case s => s - 2
      }
      if (next >= n) fail(s"block type $next out of range")
      prev = btype
      btype = next
      remaining = readBlockLen(r, countCode)
    }
  }

  private def readBlockLen(r: Reader, code: Prefix): Int = {
    val sym = code.read(r)
    if (sym >= 26) fail(s"block count symbol $sym")
    BlockLenBase(sym) + r.readBits(BlockLenExtra(sym))
  }

  private def readBlocks(r: Reader): Blocks = {
    val n = readVarLenCount(r)
    if (n >= 2) {
      val typeCode = readPrefixCode(r, n + 2)
      val countCode = readPrefixCode(r, 26)
      new Blocks(n, typeCode, countCode, readBlockLen(r, countCode))
    } else new Blocks(1, null, null, 1 << 28)
  }

  /** Context map decode + inverse-move-to-front (§7.3). */
  private def readContextMap(r: Reader, size: Int, ntrees: Int): Array[Byte] = {
    val map = new Array[Byte](size)
    if (ntrees == 1) return map
    val rleMax = if (r.readBit() == 1) r.readBits(4) + 1 else 0
    val code = readPrefixCode(r, ntrees + rleMax)
    var i = 0
    while (i < size) {
      val sym = code.read(r)
      if (sym == 0) { map(i) = 0; i += 1 }
      else if (sym <= rleMax) {
        var reps = (1 << sym) + r.readBits(sym)
        if (i + reps > size) fail("context-map run past end")
        while (reps > 0) { map(i) = 0; i += 1; reps -= 1 }
      } else {
        map(i) = (sym - rleMax).toByte
        i += 1
      }
    }
    if (r.readBit() == 1) {
      // inverse move-to-front
      val mtf = Array.tabulate[Byte](256)(_.toByte)
      var k = 0
      while (k < size) {
        val idx = map(k) & 0xff
        val v = mtf(idx)
        map(k) = v
        var j = idx
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = v
        k += 1
      }
    }
    map
  }

  /** Minimal conforming ENCODER: stored-mode only (a sequence of
    * uncompressed meta-blocks + the empty final meta-block, §9.2) — the
    * brotli analogue of deflate's "stored" blocks. Every conforming
    * decoder accepts the output; used to synthesize `br` HTTP payloads
    * for driver gates (the decode-side richness is pinned by
    * real-encoder vectors in BrotliSpec). Expansion is 5 bytes per
    * 65,520-byte chunk + 2 bytes of stream overhead.
    */
  def compressStored(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 8 + data.length / 65520 * 5)
    compressStoredStream(new java.io.ByteArrayInputStream(data), out)
    out.toByteArray
  }

  /** Streaming [[compressStored]] — reads `in` in window-size chunks,
    * writes the same stored-mode stream to `out` with bounded memory
    * (one 65,520-byte chunk), for whole-file WARC container writes of
    * any size. Byte-identical to the array form on the same input.
    */
  def compressStoredStream(in: java.io.InputStream,
                           out: java.io.OutputStream): Unit = {
    var acc = 0
    var accBits = 0
    def put(v: Int, n: Int): Unit = {
      acc |= (v & ((1 << n) - 1)) << accBits
      accBits += n
      while (accBits >= 8) { out.write(acc & 0xff); acc >>>= 8; accBits -= 8 }
    }
    def align(): Unit = if (accBits > 0) { out.write(acc & 0xff); acc = 0; accBits = 0 }
    // fill `buf` fully unless EOF comes first (InputStream.read may
    // return short counts mid-stream; a short chunk that is not the
    // last would change the block framing vs the array form)
    val buf = new Array[Byte](65520)
    def fill(): Int = {
      var got = 0
      var n = 0
      while (got < buf.length && n >= 0) {
        n = in.read(buf, got, buf.length - got)
        if (n > 0) got += n
      }
      got
    }
    put(0, 1) // WBITS = 16 (window 65520)
    var n = fill()
    while (n > 0) {
      put(0, 1) // ISLAST = 0 (uncompressed blocks cannot be last)
      put(0, 2) // MNIBBLES code 0 → 4 nibbles
      put(n - 1, 16) // MLEN ≤ window size
      put(1, 1) // ISUNCOMPRESSED
      align()
      out.write(buf, 0, n)
      n = if (n == buf.length) fill() else 0
    }
    put(1, 1); put(1, 1) // ISLAST + ISLASTEMPTY
    align()
  }

  /** Decompress a complete brotli stream. `maxOutput` bounds the
    * decompressed size (decompression-bomb guard for HTTP payloads).
    */
  def decompress(input: Array[Byte], maxOutput: Int = 1 << 30): Array[Byte] = {
    val r = new Reader(input)

    // WBITS (§9.1)
    val wbits =
      if (r.readBit() == 0) 16
      else {
        val n = r.readBits(3)
        if (n != 0) 17 + n
        else {
          val m = r.readBits(3)
          if (m == 1) fail("reserved WBITS code")
          else if (m != 0) 8 + m
          else 17
        }
      }
    val winSize = (1 << wbits) - 16

    // Long arithmetic: `input.length * 4` wraps negative past 512 MiB of
    // input. Output's max(64, ...) clamp happens to absorb that today,
    // but the hint should be correct on its own, not rescued downstream.
    val out = new Output(math.min(input.length.toLong * 4, 1L << 20).toInt, maxOutput)
    // Initial "four last distances" (§4): the spec lists 16, 15, 11, 4
    // OLDEST-first — the initial LAST distance is 4 (so short code 0
    // resolves to 4, code 7 = last+2 = 6), second-to-last 11, then 15,
    // 16. Stored here newest-first: ring(0) = last.
    val ring = Array(4, 11, 15, 16)
    var done = false

    while (!done) {
      // ---- meta-block header (§9.2)
      val isLast = r.readBit() == 1
      if (isLast && r.readBit() == 1) { done = true }
      else {
        val mnibbles = r.readBits(2) match {
          case 3 => 0
          case v => v + 4
        }
        if (mnibbles == 0) {
          // metadata meta-block: skip
          if (r.readBit() != 0) fail("reserved bit set in metadata block")
          val skipBytes = r.readBits(2)
          val skipLen =
            if (skipBytes == 0) 0
            else {
              val v = r.readBits(skipBytes * 8)
              if (skipBytes > 1 && (v >>> ((skipBytes - 1) * 8)) == 0)
                fail("non-minimal MSKIPBYTES")
              v + 1
            }
          r.align()
          val sink = new Array[Byte](skipLen)
          r.readBytes(sink, 0, skipLen)
          if (isLast) done = true
        } else {
          var mlen = r.readBits(mnibbles * 4) + 1
          if (mnibbles > 4 && (mlen - 1) >>> ((mnibbles - 1) * 4) == 0)
            fail("non-minimal MNIBBLES")
          val uncompressed = !isLast && r.readBit() == 1
          if (uncompressed) {
            r.align()
            val start = out.len
            val tmp = new Array[Byte](mlen)
            r.readBytes(tmp, 0, mlen)
            out.bytes(tmp, 0, mlen)
            if (out.len != start + mlen) fail("uncompressed copy length mismatch")
          } else {
            // ---- compressed meta-block body
            val litBlocks = readBlocks(r)
            val cmdBlocks = readBlocks(r)
            val dstBlocks = readBlocks(r)

            val npostfix = r.readBits(2)
            val ndirect = r.readBits(4) << npostfix
            val postfixMask = (1 << npostfix) - 1

            val cmodes = Array.fill(litBlocks.n)(r.readBits(2))

            val ntreesL = readVarLenCount(r)
            val cmapL = readContextMap(r, 64 * litBlocks.n, ntreesL)
            val ntreesD = readVarLenCount(r)
            val cmapD = readContextMap(r, 4 * dstBlocks.n, ntreesD)

            if (Debug) println(s"MB mlen=$mlen nbl=${litBlocks.n},${cmdBlocks.n},${dstBlocks.n} npostfix=$npostfix ndirect=$ndirect ntreesL=$ntreesL ntreesD=$ntreesD cmodes=${cmodes.toSeq} cmapD=${cmapD.toSeq}")
            val litCodes = Array.fill(ntreesL)(readPrefixCode(r, 256))
            val cmdCodes = Array.fill(cmdBlocks.n)(readPrefixCode(r, 704))
            val dstAlphabet = 16 + ndirect + (48 << npostfix)
            val dstCodes = Array.fill(ntreesD)(readPrefixCode(r, dstAlphabet))

            // ---- command loop (§9.3)
            while (mlen > 0) {
              if (cmdBlocks.remaining == 0) cmdBlocks.switchBlock(r)
              cmdBlocks.remaining -= 1
              val cmd = cmdCodes(cmdBlocks.btype).read(r)
              var rangeIdx = cmd >>> 6
              var implicitDist0 = false
              if (rangeIdx >= 2) rangeIdx -= 2 else implicitDist0 = true
              val insCode = InsertRangeLut(rangeIdx) + ((cmd >>> 3) & 7)
              val cpyCode = CopyRangeLut(rangeIdx) + (cmd & 7)
              val insLen = InsertBase(insCode) + r.readBits(InsertExtra(insCode))
              val cpyLen = CopyBase(cpyCode) + r.readBits(CopyExtra(cpyCode))
              if (Debug) println(s"CMD $cmd ins=$insLen cpy=$cpyLen implicit=$implicitDist0 mlen=$mlen")

              // insert literals with context modeling (§7.1)
              var i = 0
              while (i < insLen) {
                if (litBlocks.remaining == 0) litBlocks.switchBlock(r)
                litBlocks.remaining -= 1
                val mode = cmodes(litBlocks.btype)
                val p1 = if (out.len > 0) out.buf(out.len - 1) & 0xff else 0
                val p2 = if (out.len > 1) out.buf(out.len - 2) & 0xff else 0
                val ctx = (ContextLut(mode * 512 + p1) & 0xff) |
                  (ContextLut(mode * 512 + 256 + p2) & 0xff)
                val tree = cmapL(litBlocks.btype * 64 + ctx) & 0xff
                out.byte(litCodes(tree).read(r).toByte)
                i += 1
              }
              mlen -= insLen
              if (mlen < 0) fail("insert past meta-block length")
              if (mlen > 0) {
                // distance (§4)
                var distance = 0
                var distCode0 = implicitDist0
                if (implicitDist0) distance = ring(0)
                else {
                  if (dstBlocks.remaining == 0) dstBlocks.switchBlock(r)
                  dstBlocks.remaining -= 1
                  val dctx = if (cpyLen > 4) 3 else cpyLen - 2
                  val tree = cmapD(dstBlocks.btype * 4 + dctx) & 0xff
                  val dsym = dstCodes(tree).read(r)
                  if (Debug) println(s"  dsym=$dsym bitPos=${r.bitPos}")
                  if (dsym < 16) {
                    distCode0 = dsym == 0
                    distance = dsym match {
                      case 0 => ring(0)
                      case 1 => ring(1)
                      case 2 => ring(2)
                      case 3 => ring(3)
                      case s =>
                        val base = ring((s - 4) / 6) // 4..9 → last, 10..15 → second
                        val k = (s - 4) % 6
                        val delta = (k / 2) + 1
                        base + (if ((k & 1) == 0) -delta else delta)
                    }
                    if (distance <= 0) fail(s"invalid short distance $distance")
                  } else if (dsym < 16 + ndirect) {
                    distance = dsym - 16 + 1
                  } else {
                    val dcode0 = dsym - ndirect - 16
                    val postfix = dcode0 & postfixMask
                    val dcode = dcode0 >>> npostfix
                    val ndistbits = 1 + (dcode >>> 1)
                    val offset = ((2 + (dcode & 1)) << ndistbits) - 4
                    distance = ((offset + r.readBits(ndistbits)) << npostfix) +
                      postfix + ndirect + 1
                  }
                }
                val maxDist = math.min(out.len.toLong, winSize.toLong).toInt
                if (Debug) println(s"  DIST $distance maxDist=$maxDist ring=${ring.toSeq} out.len=${out.len}")
                if (distance <= maxDist) {
                  if (!distCode0) {
                    ring(3) = ring(2); ring(2) = ring(1); ring(1) = ring(0)
                    ring(0) = distance
                  }
                  out.copyBack(distance, cpyLen)
                  mlen -= cpyLen
                  if (mlen < 0) fail("copy past meta-block length")
                } else {
                  // static dictionary reference (§8)
                  if (cpyLen < 4 || cpyLen > 24) fail(s"dictionary copy length $cpyLen")
                  val bits = DictSizeBits(cpyLen)
                  if (bits == 0) fail(s"no dictionary words of length $cpyLen")
                  val wordId = distance - maxDist - 1
                  val index = wordId & ((1 << bits) - 1)
                  val tid = wordId >>> bits
                  if (tid >= Transforms.length) fail(s"transform $tid out of range")
                  val word = transformWord(DictOffsets(cpyLen) + index * cpyLen,
                    cpyLen, tid)
                  out.bytes(word, 0, word.length)
                  mlen -= word.length
                  if (mlen < 0) fail("dictionary word past meta-block length")
                }
              }
            }
          }
          if (isLast) done = true
        }
      }
    }
    r.align()
    if (!r.exhausted) fail("trailing data after final meta-block")
    out.result()
  }
}
