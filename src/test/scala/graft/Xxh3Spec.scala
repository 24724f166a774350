package graft

import graft.core.Xxh3
import org.scalatest.funsuite.AnyFunSuite

/** Pins XXH3-64 against the published sanity vectors from the public
  * xxHash repository (cli/xsum_sanity_check.c, seed 0 rows), recalled
  * from the public corpus — the container has no xxh3 source of truth.
  * The test buffer is the spec's multiplicative generator:
  * byteGen starts at 2654435761 (PRIME32) and each byte is the top
  * byte of byteGen before multiplying by 11400714785074694797
  * (the sanity harness's PRIME64).
  *
  * One vector per length class: 0 / 1–3 / 4–8 / 9–16 / 17–128 (three
  * sizes) / 129–240 / long within one 1024-byte block (403, 512) /
  * long crossing a block boundary exercising the scramble (2048).
  */
class Xxh3Spec extends AnyFunSuite {

  private val buffer: Array[Byte] = {
    val buf     = new Array[Byte](2048)
    var byteGen = 2654435761L
    var i       = 0
    while (i < buf.length) {
      buf(i) = (byteGen >>> 56).toByte
      byteGen *= 0x9E3779B185EBCA8DL // 11400714785074694797, the sanity harness's prime64
      i += 1
    }
    buf
  }

  private val vectors: Seq[(Int, Long)] = Seq(
    0    -> 0x2D06800538D394C2L,
    1    -> 0xC44BDFF4074EECDBL,
    6    -> 0x27B56A84CD2D7325L,
    12   -> 0xA713DAF0DFBB77E7L,
    24   -> 0xA3FE70BF9D3510EBL,
    48   -> 0x397DA259ECBA1F11L,
    80   -> 0xBCDEFBBB2C47C90AL,
    195  -> 0xCD94217EE362EC3AL,
    403  -> 0xCDEB804D65C6DEA4L,
    512  -> 0x617E49599013CB6BL,
    2048 -> 0xDD59E2C3A5F038E0L)

  test("sanity vectors, seed 0, default secret") {
    val results = vectors.map { case (len, expect) =>
      val got = Xxh3.hash(buffer, 0, len)
      (len, expect, got, got == expect)
    }
    val bad = results.filterNot(_._4)
    assert(
      bad.isEmpty,
      "mismatches: " + bad
        .map { case (len, e, g, _) => f"len=$len expect=$e%016x got=$g%016x" }
        .mkString(", "))
  }

  test("digest bytes are big-endian (digest.rs:229)") {
    val d = Xxh3.digest(Array.emptyByteArray)
    assert(d.length === 8)
    assert(d(0) === 0x2d.toByte && d(7) === 0xc2.toByte)
  }

  test("offset slice hashes like a copy") {
    val slice = java.util.Arrays.copyOfRange(buffer, 100, 100 + 300)
    assert(Xxh3.hash(buffer, 100, 300) === Xxh3.hash(slice))
  }
}
