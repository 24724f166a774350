package graft

import graft.core.{Digests, Field, HeaderSerde}
import graft.ops.{HttpOps, UrlPath}
import graft.sources.WarcBytes
import graft.synth.Synth
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Seeded property tests (FIXTURES.md §6 generalizations of the
  * reference's point tests). Raw scalacheck Gen + fixed seeds — fully
  * deterministic, no scalatestplus bridge needed.
  */
class PropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 5000).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127))
      .map(_.map(_.toByte).toArray))

  test("chunked transfer encode ⇄ decode round-trips any payload and chunk size") {
    for (i <- 0 until 50) {
      val body = sample(bytesGen, i.toLong)
      val chunkSize = 1 + sample(Gen.chooseNum(0, 2000), i + 1000L)
      val encoded = HttpOps.encodeChunked(body, chunkSize)
      val decoded = HttpOps.decodeChunked(encoded)
      assert(decoded.isRight, s"i=$i")
      assert(decoded.toOption.get._1.sameElements(body), s"i=$i")
    }
  }

  test("gzip member codec round-trips any block content") {
    for (i <- 0 until 20) {
      val recs = (0 until 3).map { j =>
        val block = sample(bytesGen, i * 10L + j)
        graft.core.WarcRecord(0L, "p", "WARC/1.1", Seq(
          Field("WARC-Record-ID", s"<urn:p:$i-$j>"),
          Field("Content-Length", block.length.toString)), block)
      }
      // fix positions to the exact serialized offsets
      var pos = 0L
      val fixed = recs.map { r =>
        val out = r.copy(position = pos)
        pos += HeaderSerde.recordLength(r.version, r.fields, r.bytes.length.toLong)
        out
      }
      val decoded = WarcBytes.decodeGzip(WarcBytes.encodeGzip(fixed), "p")
      assert(decoded.map(_.position) == fixed.map(_.position))
      decoded.zip(fixed).foreach { case (d, r) => assert(d.bytes.sameElements(r.bytes)) }
    }
  }

  test("base32 encode ⇄ decode round-trips; digest parse ∘ format = identity") {
    for (i <- 0 until 100) {
      val data = sample(bytesGen, 7000L + i)
      val enc = Digests.base32Encode(data)
      val dec = Digests.base32Decode(enc.replace("=", ""))
      assert(dec.exists(_.sameElements(data)), s"i=$i len=${data.length}")
    }
    for (i <- 0 until 50; algo <- Seq("md5", "sha1", "sha256", "crc32c")) {
      val data = sample(bytesGen, 9000L + i)
      val v = Digests.compute(algo, data).get
      val parsed = Digests.parseDigest(Digests.formatDigest(algo, v))
      assert(parsed.exists { case (a, b) => a == algo && b.sameElements(v) },
        s"$algo i=$i")
    }
  }

  test("canonicalization is idempotent over generated URLs") {
    import TestSpark.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val urls = (0 until 400).map { i =>
      val rng = new Synth.Rng(i.toLong)
      val scheme = if (rng.nextInt(2) == 0) "http" else "HTTPS"
      val host = s"H${rng.nextInt(50)}.Example.TEST" + ("." * rng.nextInt(2))
      val port = Seq("", ":80", ":443", ":8080")(rng.nextInt(4))
      val path = Seq("", "/", s"/p/${rng.nextInt(100)}", "/A/B")(rng.nextInt(4))
      val q = Seq("", "?b=2&a=1", "?z=9&y=8&x=7")(rng.nextInt(3))
      val frag = Seq("", "#f")(rng.nextInt(2))
      s"$scheme://$host$port$path$q$frag"
    }
    val once = urls.toDF("url")
      .select(graft.frontier.Canonical.canonicalUrl(col("url")).as("c"))
      .as[String].collect()
    val twice = once.toSeq.toDF("url")
      .select(graft.frontier.Canonical.canonicalUrl(col("url")).as("c"))
      .as[String].collect()
    assert(once.toSeq == twice.toSeq)
  }

  test("percent encode ⇄ decode round-trips %-free strings") {
    val strGen = Gen.listOf(Gen.oneOf(Gen.asciiPrintableChar, Gen.alphaChar,
      Gen.oneOf('/', '\\', ':', '?', '"', '<', '>', '|', 'ÿ', '漢')))
      .map(_.mkString.replace("%", ""))
    for (i <- 0 until 100) {
      val s = sample(strGen, 333L + i)
      assert(UrlPath.percentDecodeLossy(UrlPath.percentEncode(s)) == s, s"i=$i")
    }
  }

  test("header serialize ⇄ parse round-trips generated multimaps with duplicates") {
    val nameGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val valueGen = Gen.listOf(Gen.asciiPrintableChar).map(_.mkString.trim)
    for (i <- 0 until 100) {
      val base = sample(Gen.listOf(Gen.zip(nameGen, valueGen)), 555L + i)
        .map { case (n, v) => Field(n, v) }
      val fields = base ++ base.take(2) // force duplicate names (multimap)
      val parsed = HeaderSerde.parse(HeaderSerde.serialize("WARC/1.1", fields))
      assert(parsed.contains(("WARC/1.1", fields)), s"i=$i")
    }
  }
}
