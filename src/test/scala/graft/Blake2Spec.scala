package graft

import graft.core.{Blake2, Digests}
import org.scalatest.funsuite.AnyFunSuite

/** RFC 7693 BLAKE2 vectors: "abc" goldens are the RFC appendix-A/B
  * values; the rest were independently generated (python hashlib, which
  * matches the RFC appendix) — empty input, a full 256-byte block span,
  * and a multi-block 500-byte input.
  */
class Blake2Spec extends AnyFunSuite {

  private def hex(b: Array[Byte]) = Digests.hexEncode(b)

  private val bytes256 = Array.tabulate[Byte](256)(_.toByte)
  private val graft500 = ("graft" * 100).getBytes("US-ASCII")

  test("BLAKE2b-512 golden vectors (RFC 7693 appendix A + generated)") {
    assert(hex(Blake2.blake2b512(Array.empty)) ==
      "786a02f742015903c6c6fd852552d272912f4740e15847618a86e217f71f5419" +
        "d25e1031afee585313896444934eb04b903a685b1448b755d56f701afe9be2ce")
    assert(hex(Blake2.blake2b512("abc".getBytes)) ==
      "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1" +
        "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923")
    assert(hex(Blake2.blake2b512(bytes256)) ==
      "1ecc896f34d3f9cac484c73f75f6a5fb58ee6784be41b35f46067b9c65c63a67" +
        "94d3d744112c653f73dd7deb6666204c5a9bfa5b46081fc10fdbe7884fa5cbf8")
    assert(hex(Blake2.blake2b512(graft500)) ==
      "6f42e018c3e4e9597b3f18e960dee1da8a23d617c609fafde5f609d954dcc585" +
        "21849be8912996448f9036e2f7cd377ab31d26adba28c38c592785be846b950d")
  }

  test("BLAKE2s-256 golden vectors (RFC 7693 appendix B + generated)") {
    assert(hex(Blake2.blake2s256(Array.empty)) ==
      "69217a3079908094e11121d042354a7c1f55b6482ca1a51e1b250dfd1ed0eef9")
    assert(hex(Blake2.blake2s256("abc".getBytes)) ==
      "508c5e8c327c14e2e1a72ba34eeb452f37458b209ed63a294d999b4c86675982")
    assert(hex(Blake2.blake2s256(bytes256)) ==
      "5fdeb59f681d975f52c8e69c5502e02a12a3afcc5836ba58f42784c439228781")
    assert(hex(Blake2.blake2s256(graft500)) ==
      "e19b1646116fb7855ba8affacad921feef36dd3b4e9131dc34d641657ed795dd")
  }

  test("wired into the digest engine: compute + canonical text + reparse") {
    val data = "abc".getBytes
    assert(Digests.Computable.contains("blake2b") && Digests.Computable.contains("blake2s"))
    val t = Digests.computeText("blake2b", data).get
    assert(t.startsWith("blake2b:ba80a53f"))
    val (algo, v) = Digests.parseDigest(t).get
    assert(algo == "blake2b" && v.sameElements(Blake2.blake2b512(data)))
    assert(Digests.computeText("blake2s", data).get ==
      "blake2s:508c5e8c327c14e2e1a72ba34eeb452f37458b209ed63a294d999b4c86675982")
  }
}
