package graft

import graft.core.{Blake3, Digests}
import org.scalatest.funsuite.AnyFunSuite

/** BLAKE3 default-mode vectors + structural properties.
  *
  * The two digests below are the published BLAKE3 test vectors for the
  * empty input and "abc" (BLAKE3 reference repository test corpus). The
  * empty vector pins IV, flag and counter handling; "abc" is a nonzero
  * single-block message, so it additionally pins the inter-round message
  * permutation. The remaining structure (chunk chaining, tree shape) is
  * exercised by the boundary sweep below.
  */
class Blake3Spec extends AnyFunSuite {

  private def hex(b: Array[Byte]) = Digests.hexEncode(b)

  test("published vector: empty input") {
    assert(hex(Blake3.hash(Array.emptyByteArray)) ===
      "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262")
  }

  test("published vector: abc") {
    assert(hex(Blake3.hash("abc".getBytes("UTF-8"))) ===
      "6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85")
  }

  test("chunk/block boundary sweep is deterministic and collision-free") {
    // lengths straddling every structural boundary: block (64), chunk
    // (1024), the 2/3/4/5-chunk tree shapes, and off-by-ones
    val lens = Seq(1, 63, 64, 65, 1023, 1024, 1025, 2047, 2048, 2049,
      3072, 4095, 4096, 4097, 5120, 8192)
    val outs = lens.map { n =>
      val data = Array.tabulate[Byte](n)(i => (i % 251).toByte)
      hex(Blake3.hash(data))
    }
    assert(outs.distinct.size === outs.size)
    // stable across calls (no shared mutable state)
    val again = lens.map { n =>
      val data = Array.tabulate[Byte](n)(i => (i % 251).toByte)
      hex(Blake3.hash(data))
    }
    assert(outs === again)
  }

  test("single-bit flips change the digest (all structural positions)") {
    val n = 4097
    val base = Array.tabulate[Byte](n)(i => (i % 251).toByte)
    val h0 = hex(Blake3.hash(base))
    for (pos <- Seq(0, 63, 64, 1023, 1024, 2048, 4096)) {
      val mut = base.clone()
      mut(pos) = (mut(pos) ^ 1).toByte
      assert(hex(Blake3.hash(mut)) !== h0, s"flip at $pos")
    }
  }

  test("digest engine integration: compute/format/parse round-trip") {
    val d = Digests.computeText("blake3", "abc".getBytes("UTF-8"))
    assert(d === Some(
      "blake3:6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85"))
    val parsed = Digests.parseDigest(d.get)
    assert(parsed.map(_._1) === Some("blake3"))
    assert(parsed.map(p => Digests.hexEncode(p._2)) ===
      Some("6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85"))
  }
}
