package graft.core

/** BLAKE3 (default hash mode, 32-byte output) — from-spec pure-Scala
  * implementation (public BLAKE3 paper "BLAKE3: one function, fast
  * everywhere", Sect. 2; reference digest.rs:195-246 names the algorithm).
  *
  * Structure: 1024-byte chunks are hashed as chains of 64-byte blocks
  * with the ChaCha-derived 7-round compression (rotations 16/12/8/7, the
  * standard BLAKE3 message permutation between rounds); chunk chaining
  * values merge as a binary tree whose left subtree is the largest
  * power-of-two number of chunks strictly smaller than the total; the
  * final compression (single-chunk last block, or root parent) carries
  * the ROOT flag.
  *
  * Verification in this zero-egress container: the published test vectors
  * for the empty input and "abc" (Blake3Spec) — the empty vector pins
  * IV/flags/counter handling, and "abc" additionally pins the inter-round
  * message permutation (nonzero single-block message). Multi-chunk tree
  * shape is property-tested for incremental/one-shot consistency.
  */
object Blake3 {

  private val IV = Array[Int](
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19)

  private val MsgPermutation =
    Array(2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

  private final val ChunkStart = 1
  private final val ChunkEnd = 2
  private final val Parent = 4
  private final val Root = 8

  private final val BlockLen = 64
  private final val ChunkLen = 1024

  @inline private def rotr(x: Int, n: Int): Int = Integer.rotateRight(x, n)

  /** One compression: returns the full 16-word output vector
    * (words 0-7 = chaining value / hash words after feed-forward).
    */
  private def compress(h: Array[Int], block: Array[Int], counter: Long,
                       blockLen: Int, flags: Int): Array[Int] = {
    val v = new Array[Int](16)
    System.arraycopy(h, 0, v, 0, 8)
    v(8) = IV(0); v(9) = IV(1); v(10) = IV(2); v(11) = IV(3)
    v(12) = counter.toInt
    v(13) = (counter >>> 32).toInt
    v(14) = blockLen
    v(15) = flags

    var m = block
    var round = 0
    while (round < 7) {
      @inline def g(a: Int, b: Int, c: Int, d: Int, mx: Int, my: Int): Unit = {
        v(a) = v(a) + v(b) + mx
        v(d) = rotr(v(d) ^ v(a), 16)
        v(c) = v(c) + v(d)
        v(b) = rotr(v(b) ^ v(c), 12)
        v(a) = v(a) + v(b) + my
        v(d) = rotr(v(d) ^ v(a), 8)
        v(c) = v(c) + v(d)
        v(b) = rotr(v(b) ^ v(c), 7)
      }
      g(0, 4, 8, 12, m(0), m(1))
      g(1, 5, 9, 13, m(2), m(3))
      g(2, 6, 10, 14, m(4), m(5))
      g(3, 7, 11, 15, m(6), m(7))
      g(0, 5, 10, 15, m(8), m(9))
      g(1, 6, 11, 12, m(10), m(11))
      g(2, 7, 8, 13, m(12), m(13))
      g(3, 4, 9, 14, m(14), m(15))
      round += 1
      if (round < 7) {
        val p = new Array[Int](16)
        var i = 0
        while (i < 16) { p(i) = m(MsgPermutation(i)); i += 1 }
        m = p
      }
    }

    var i = 0
    while (i < 8) { v(i) = v(i) ^ v(i + 8); i += 1 }
    // words 8-15 feed forward the input chaining value (used only for
    // extended output, kept for completeness)
    i = 8
    while (i < 16) { v(i) = v(i) ^ h(i - 8); i += 1 }
    v
  }

  private def wordsOf(bytes: Array[Byte], off: Int, len: Int): Array[Int] = {
    val m = new Array[Int](16)
    var i = 0
    while (i < len) {
      m(i >> 2) |= (bytes(off + i) & 0xff) << ((i & 3) * 8)
      i += 1
    }
    m
  }

  /** Chaining value of one whole chunk (not the root). */
  private def chunkCv(data: Array[Byte], off: Int, len: Int,
                      chunkIndex: Long): Array[Int] = {
    var h = IV.clone()
    val nBlocks = math.max(1, (len + BlockLen - 1) / BlockLen)
    var b = 0
    while (b < nBlocks) {
      val bOff = b * BlockLen
      val bLen = math.min(BlockLen, len - bOff)
      var flags = 0
      if (b == 0) flags |= ChunkStart
      if (b == nBlocks - 1) flags |= ChunkEnd
      val out = compress(h, wordsOf(data, off + bOff, bLen), chunkIndex, bLen, flags)
      h = java.util.Arrays.copyOfRange(out, 0, 8)
      b += 1
    }
    h
  }

  private def parentCv(l: Array[Int], r: Array[Int], flags: Int): Array[Int] = {
    val block = new Array[Int](16)
    System.arraycopy(l, 0, block, 0, 8)
    System.arraycopy(r, 0, block, 8, 8)
    val out = compress(IV, block, 0L, BlockLen, Parent | flags)
    java.util.Arrays.copyOfRange(out, 0, 8)
  }

  /** Subtree chaining value over whole chunks [firstChunk, firstChunk+n). */
  private def subtreeCv(data: Array[Byte], off: Int, len: Int,
                        firstChunk: Long): Array[Int] =
    if (len <= ChunkLen) chunkCv(data, off, len, firstChunk)
    else {
      val nChunks = (len + ChunkLen - 1) / ChunkLen
      val left = Integer.highestOneBit(nChunks - 1) // largest power of two < nChunks
      val leftLen = left * ChunkLen
      parentCv(
        subtreeCv(data, off, leftLen, firstChunk),
        subtreeCv(data, off + leftLen, len - leftLen, firstChunk + left),
        0)
    }

  /** Default-mode 32-byte BLAKE3 hash. */
  def hash(data: Array[Byte]): Array[Byte] = {
    val len = data.length
    val out8 =
      if (len <= ChunkLen) {
        // single chunk: the last block carries ROOT
        var h = IV.clone()
        val nBlocks = math.max(1, (len + BlockLen - 1) / BlockLen)
        var b = 0
        var res: Array[Int] = null
        while (b < nBlocks) {
          val bOff = b * BlockLen
          val bLen = math.min(BlockLen, len - bOff)
          var flags = 0
          if (b == 0) flags |= ChunkStart
          if (b == nBlocks - 1) flags |= ChunkEnd | Root
          val out = compress(h, wordsOf(data, bOff, bLen), 0L, bLen, flags)
          if (b == nBlocks - 1) res = out
          else h = java.util.Arrays.copyOfRange(out, 0, 8)
          b += 1
        }
        res
      } else {
        // multi-chunk: root parent carries ROOT
        val nChunks = (len + ChunkLen - 1) / ChunkLen
        val left = Integer.highestOneBit(nChunks - 1)
        val leftLen = left * ChunkLen
        val l = subtreeCv(data, 0, leftLen, 0L)
        val r = subtreeCv(data, leftLen, len - leftLen, left.toLong)
        val block = new Array[Int](16)
        System.arraycopy(l, 0, block, 0, 8)
        System.arraycopy(r, 0, block, 8, 8)
        compress(IV, block, 0L, BlockLen, Parent | Root)
      }

    val out = new Array[Byte](32)
    var i = 0
    while (i < 8) {
      val w = out8(i)
      out(4 * i) = w.toByte
      out(4 * i + 1) = (w >>> 8).toByte
      out(4 * i + 2) = (w >>> 16).toByte
      out(4 * i + 3) = (w >>> 24).toByte
      i += 1
    }
    out
  }
}
