package graft

import graft.ops.Brotli
import org.scalatest.funsuite.AnyFunSuite

/** RFC 7932 decoder vs reference-encoder streams: the vector file pins
  * (plaintext, compressed) pairs produced by the reference brotli
  * encoder (brotlicffi/libbrotli 1.2) at qualities 0–11 and window
  * sizes 10–24 over text / HTML / UTF-8 / random / repetitive inputs —
  * collectively exercising uncompressed meta-blocks, simple + complex
  * prefix codes, context modeling, block switching, multi-meta-block
  * streams, and static-dictionary word transforms.
  */
class BrotliSpec extends AnyFunSuite {

  private lazy val vectors: Seq[(String, Array[Byte], Array[Byte])] = {
    val in = getClass.getResourceAsStream("/graft/brotli_vectors.txt")
    require(in != null, "missing brotli_vectors.txt resource")
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    finally in.close()
    val b64 = java.util.Base64.getDecoder
    lines.filterNot(l => l.startsWith("#") || l.trim.isEmpty).map { l =>
      val Array(name, p, c) = l.split(" ", 3)
      (name, b64.decode(p), b64.decode(c))
    }
  }

  test("all reference-encoder vectors decode byte-exactly") {
    assert(vectors.size >= 30)
    for ((name, plain, comp) <- vectors) {
      val got = Brotli.decompress(comp)
      assert(got.length == plain.length,
        s"$name: length ${got.length} != ${plain.length}")
      assert(java.util.Arrays.equals(got, plain), {
        val i = got.zip(plain).indexWhere { case (a, b) => a != b }
        s"$name: first mismatch at $i (" +
          s"got ${got.slice(i - 8, i + 8).map(_ & 0xff).mkString(",")} want " +
          plain.slice(i - 8, i + 8).map(_ & 0xff).mkString(",") + ")"
      })
    }
  }

  test("stored-mode encoder round-trips through the decoder at chunk boundaries") {
    val rng = new java.util.Random(7)
    for (n <- Seq(0, 1, 2, 100, 65519, 65520, 65521, 131040, 200000)) {
      val plain = new Array[Byte](n)
      rng.nextBytes(plain)
      val comp = Brotli.compressStored(plain)
      assert(java.util.Arrays.equals(Brotli.decompress(comp), plain), s"n=$n")
      // stream overhead is the documented 2 + 5·ceil(n/65520)
      assert(comp.length <= n + 2 + 5 * ((n + 65519) / 65520) + 1, s"n=$n overhead")
    }
  }

  test("malformed inputs fail loudly, never return wrong bytes silently") {
    val (_, _, comp) = vectors.find(_._1.startsWith("text-q9")).get
    // truncations at every prefix length must throw (never misdecode)
    for (cut <- Seq(0, 1, comp.length / 2, comp.length - 1)) {
      intercept[Brotli.BrotliException](
        Brotli.decompress(comp.take(cut)))
    }
    // trailing garbage after the final meta-block
    intercept[Brotli.BrotliException](
      Brotli.decompress(comp ++ Array[Byte](1, 2, 3)))
  }

  test("output-size guard rejects a decompression bomb") {
    val (_, plain, comp) = vectors.find(_._1.startsWith("zeros")).get
    assert(plain.length > 1000)
    intercept[Brotli.BrotliException](Brotli.decompress(comp, maxOutput = 100))
  }

  test("single-byte corruption either throws or fails the length/equality gate") {
    // decoder robustness fuzz: flip one byte at a few positions — the
    // decoder must never loop forever; wrong output is acceptable only
    // if framing still parses (caller-level digests catch content drift)
    val (_, _, comp) = vectors.find(_._1.startsWith("html-q5")).get
    for (i <- Seq(1, 3, comp.length / 2, comp.length - 2)) {
      val bad = comp.clone()
      bad(i) = (bad(i) ^ 0x55).toByte
      try { Brotli.decompress(bad, maxOutput = 16 << 20); () }
      catch { case _: Brotli.BrotliException => () }
    }
  }
}
