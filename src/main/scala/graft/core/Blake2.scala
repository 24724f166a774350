package graft.core

/** BLAKE2b-512 / BLAKE2s-256 (RFC 7693), pure Scala — closes two of the
  * reference's digest algorithms (/root/reference/src/digest.rs:99-116)
  * that have no JVM-native provider. Unkeyed, sequential, default output
  * lengths (the forms the reference's verify/digest paths use).
  *
  * Verified against the RFC 7693 appendix vectors plus independently
  * generated goldens (DigestsSpec).
  */
object Blake2 {

  private val Sigma: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0))

  private val IV64 = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val IV32 = Array(
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19)

  /** BLAKE2b, unkeyed, 64-byte digest. */
  def blake2b512(data: Array[Byte]): Array[Byte] = {
    val h = IV64.clone()
    h(0) ^= 0x01010000L ^ 64L // param block: digest_len=64, fanout=1, depth=1
    val nBlocks = math.max((data.length + 127) / 128, 1)
    val m = new Array[Long](16)
    var i = 0
    while (i < nBlocks) {
      val off = i * 128
      val isLast = i == nBlocks - 1
      val take = if (isLast) data.length - off else 128
      var w = 0
      while (w < 16) {
        var v = 0L
        var b = 7
        while (b >= 0) {
          val idx = off + w * 8 + b
          v = (v << 8) | (if (idx < off + take) data(idx) & 0xffL else 0L)
          b -= 1
        }
        m(w) = v
        w += 1
      }
      val t = (off + take).toLong // bytes processed so far (fits a long)
      compress64(h, m, t, isLast)
      i += 1
    }
    val out = new Array[Byte](64)
    var j = 0
    while (j < 8) {
      var b = 0
      while (b < 8) { out(j * 8 + b) = ((h(j) >>> (8 * b)) & 0xff).toByte; b += 1 }
      j += 1
    }
    out
  }

  private def compress64(h: Array[Long], m: Array[Long], t: Long, last: Boolean): Unit = {
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV64, 0, v, 8, 8)
    v(12) ^= t // t is never > 2^63 here; high word stays 0
    if (last) v(14) = ~v(14)
    def rotr(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))
    def g(a: Int, b: Int, c: Int, d: Int, x: Long, y: Long): Unit = {
      v(a) = v(a) + v(b) + x; v(d) = rotr(v(d) ^ v(a), 32)
      v(c) = v(c) + v(d); v(b) = rotr(v(b) ^ v(c), 24)
      v(a) = v(a) + v(b) + y; v(d) = rotr(v(d) ^ v(a), 16)
      v(c) = v(c) + v(d); v(b) = rotr(v(b) ^ v(c), 63)
    }
    var r = 0
    while (r < 12) {
      val s = Sigma(r % 10)
      g(0, 4, 8, 12, m(s(0)), m(s(1)))
      g(1, 5, 9, 13, m(s(2)), m(s(3)))
      g(2, 6, 10, 14, m(s(4)), m(s(5)))
      g(3, 7, 11, 15, m(s(6)), m(s(7)))
      g(0, 5, 10, 15, m(s(8)), m(s(9)))
      g(1, 6, 11, 12, m(s(10)), m(s(11)))
      g(2, 7, 8, 13, m(s(12)), m(s(13)))
      g(3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    var j = 0
    while (j < 8) { h(j) ^= v(j) ^ v(j + 8); j += 1 }
  }

  /** BLAKE2s, unkeyed, 32-byte digest. */
  def blake2s256(data: Array[Byte]): Array[Byte] = {
    val h = IV32.clone()
    h(0) ^= 0x01010000 ^ 32
    val nBlocks = math.max((data.length + 63) / 64, 1)
    val m = new Array[Int](16)
    var i = 0
    while (i < nBlocks) {
      val off = i * 64
      val isLast = i == nBlocks - 1
      val take = if (isLast) data.length - off else 64
      var w = 0
      while (w < 16) {
        var v = 0
        var b = 3
        while (b >= 0) {
          val idx = off + w * 4 + b
          v = (v << 8) | (if (idx < off + take) data(idx) & 0xff else 0)
          b -= 1
        }
        m(w) = v
        w += 1
      }
      compress32(h, m, (off + take).toLong, isLast)
      i += 1
    }
    val out = new Array[Byte](32)
    var j = 0
    while (j < 8) {
      var b = 0
      while (b < 4) { out(j * 4 + b) = ((h(j) >>> (8 * b)) & 0xff).toByte; b += 1 }
      j += 1
    }
    out
  }

  private def compress32(h: Array[Int], m: Array[Int], t: Long, last: Boolean): Unit = {
    val v = new Array[Int](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV32, 0, v, 8, 8)
    v(12) ^= t.toInt
    v(13) ^= (t >>> 32).toInt
    if (last) v(14) = ~v(14)
    def rotr(x: Int, n: Int): Int = (x >>> n) | (x << (32 - n))
    def g(a: Int, b: Int, c: Int, d: Int, x: Int, y: Int): Unit = {
      v(a) = v(a) + v(b) + x; v(d) = rotr(v(d) ^ v(a), 16)
      v(c) = v(c) + v(d); v(b) = rotr(v(b) ^ v(c), 12)
      v(a) = v(a) + v(b) + y; v(d) = rotr(v(d) ^ v(a), 8)
      v(c) = v(c) + v(d); v(b) = rotr(v(b) ^ v(c), 7)
    }
    var r = 0
    while (r < 10) {
      val s = Sigma(r)
      g(0, 4, 8, 12, m(s(0)), m(s(1)))
      g(1, 5, 9, 13, m(s(2)), m(s(3)))
      g(2, 6, 10, 14, m(s(4)), m(s(5)))
      g(3, 7, 11, 15, m(s(6)), m(s(7)))
      g(0, 5, 10, 15, m(s(8)), m(s(9)))
      g(1, 6, 11, 12, m(s(10)), m(s(11)))
      g(2, 7, 8, 13, m(s(12)), m(s(13)))
      g(3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    var j = 0
    while (j < 8) { h(j) ^= v(j) ^ v(j + 8); j += 1 }
  }
}
