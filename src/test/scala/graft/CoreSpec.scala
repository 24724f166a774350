package graft

import graft.core._
import graft.ops.{FilterOp, UrlPath}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden/table tests ported from the reference's own embedded tests —
  * values copied verbatim, logic re-implemented (SURVEY.md §5).
  */
class FieldOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    (1L, Seq(Field("Name-A", "v1"), Field("name-a", "v2"), Field("Other", "x")))
  ).toDF("id", "fields")

  test("fieldGet is first-match case-insensitive (fields.rs:111-120)") {
    val r = df.select(FieldOps.fieldGet($"fields", "NAME-A")).head.getString(0)
    assert(r == "v1")
  }

  test("fieldGetAll preserves order and duplicates (fields.rs:122-134)") {
    val r = df.select(FieldOps.fieldGetAll($"fields", "name-a")).head.getSeq[String](0)
    assert(r == Seq("v1", "v2"))
  }

  test("fieldContains / fieldCount") {
    val r = df.select(FieldOps.fieldContains($"fields", "other"),
      FieldOps.fieldCount($"fields", "NAME-a"),
      FieldOps.fieldContains($"fields", "missing")).head
    assert(r.getBoolean(0) && r.getInt(1) == 2 && !r.getBoolean(2))
  }

  test("fieldGetOrEmpty on missing → empty string (list.rs:38-41)") {
    assert(df.select(FieldOps.fieldGetOrEmpty($"fields", "nope")).head.getString(0) == "")
  }

  test("getU64Strict rejects +, whitespace, hex (parse.rs:56-62)") {
    val d = Seq(
      (Seq(Field("n", "123")), 1), (Seq(Field("n", "+123")), 2),
      (Seq(Field("n", " 123")), 3), (Seq(Field("n", "0x1f")), 4))
      .toDF("fields", "k")
    val rows = d.select($"k", FieldOps.getU64Strict($"fields", "n")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows(1).contains(123L) && rows(2).isEmpty && rows(3).isEmpty && rows(4).isEmpty)
  }
}

class FilterOpSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def allow(fields: Seq[Field], includes: Seq[FilterOp.Rule],
                    excludes: Seq[FilterOp.Rule]): Boolean =
    Seq(Tuple1(fields)).toDF("fields")
      .select(FilterOp.compile(includes, excludes)).head.getBoolean(0)

  test("exact include/exclude truth table (filter.rs:109-129)") {
    val inc = Seq(FilterOp.parseRule("n:dog"))
    val exc = Seq(FilterOp.parseRule("n:cat"))
    assert(!allow(Seq(Field("n", "cat")), inc, exc))
    assert(allow(Seq(Field("n", "dog")), inc, exc))
    assert(!allow(Seq(Field("n", "bird")), inc, exc))
    assert(!allow(Seq(Field("n", "cat-and-dog")), inc, exc)) // exact ≠ substring
  }

  test("bare name vs empty value (filter.rs:131-144)") {
    val inc = Seq(FilterOp.parseRule("a"))
    val exc = Seq(FilterOp.parseRule("b"))
    assert(allow(Seq(Field("a", "")), inc, exc))
    assert(!allow(Seq(Field("b", "")), inc, exc))
  }

  test("regex rules with word boundaries (filter.rs:146-167)") {
    val inc = Seq(FilterOp.parseRule("n:\\bdog\\b", regex = true))
    val exc = Seq(FilterOp.parseRule("n:\\bcat\\b", regex = true))
    assert(!allow(Seq(Field("n", "cat")), inc, exc))
    assert(allow(Seq(Field("n", "dog")), inc, exc))
    assert(!allow(Seq(Field("n", "bird")), inc, exc))
    assert(!allow(Seq(Field("n", "cat-and-dog")), inc, exc)) // exclude beats include
  }

  test("no includes → keep unless excluded (filter.rs:92-100)") {
    assert(allow(Seq(Field("x", "1")), Nil, Seq(FilterOp.parseRule("y"))))
    assert(!allow(Seq(Field("y", "1")), Nil, Seq(FilterOp.parseRule("y"))))
  }
}

class UrlPathSpec extends AnyFunSuite {
  import UrlPath._

  test("escape_component goldens (extract.rs:295-307)") {
    assert(escapeComponent("") == "")
    assert(escapeComponent(" ") == "_")
    assert(escapeComponent(".") == "_")
    assert(escapeComponent("..") == "__")
    assert(escapeComponent("/") == "%2F")
    assert(escapeComponent("nul") == "_nul")
    assert(escapeComponent("nul.tar.gz") == "_nul.tar.gz")
    assert(escapeComponent("?") == "%3F")
    assert(escapeComponent("\u00ff") == "%C3%BF")
    assert(escapeComponent("a" * 300) == "a" * 200)
  }

  test("url_to_path_components structure (extract.rs:168-196)") {
    assert(urlToPathComponents("https://example.com/a/b/c.html?q=1") ==
      Seq("https", "example.com", "a", "b", "c.html", "q=1"))
    assert(urlToPathComponents("https://example.com//x//") == Seq("https", "example.com", "x"))
    assert(urlToPathComponents("mailto:user@example.com") == Seq("mailto", "user@example.com"))
    assert(urlToPathComponents("not a url") == Seq(escapeComponent("not a url")))
    assert(urlToPathComponents("https://example.com/%2e%2e/x") ==
      Seq("https", "example.com", "__", "x"))
  }
}

class DigestsSpec extends AnyFunSuite {
  import Digests._

  private val md5Bytes = Array(0xb1, 0x94, 0x6a, 0xc9, 0x24, 0x92, 0xd2, 0x34,
    0x7c, 0x62, 0x35, 0xb4, 0xd2, 0x61, 0x11, 0x84).map(_.toByte)
  private val sha1Bytes = Array(0xaa, 0xf4, 0xc6, 0x1d, 0xdc, 0xc5, 0xe8, 0xa2,
    0xda, 0xbe, 0xde, 0x0f, 0x3b, 0x48, 0x2c, 0xd9, 0xae, 0xa9, 0x43, 0x4d).map(_.toByte)

  test("md5 parse: hex / padded base32 / lowercase nopad base32 (digest.rs:352-374)") {
    for (s <- Seq("md5:b1946ac92492d2347c6235b4d2611184",
      "MD5:WGKGVSJESLJDI7DCGW2NEYIRQQ======",
      "md5:wgkgvsjesljdi7dcgw2neyirqq")) {
      val Some((a, v)) = parseDigest(s)
      assert(a == "md5" && v.sameElements(md5Bytes), s)
    }
  }

  test("sha1 parse: compat label + base32, hex (digest.rs:376-390)") {
    val Some((a1, v1)) = parseDigest("Sha-1:VL2MMHO4YXUKFWV63YHTWSBM3GXKSQ2N")
    assert(a1 == "sha1" && v1.sameElements(sha1Bytes))
    val Some((a2, v2)) = parseDigest("sha1:aaf4c61ddcc5e8a2dabede0f3b482cd9aea9434d")
    assert(a2 == "sha1" && v2.sameElements(sha1Bytes))
  }

  test("canonical format: sha1 → base32 upper (digest.rs:392-400)") {
    assert(formatDigest("sha1", sha1Bytes) == "sha1:VL2MMHO4YXUKFWV63YHTWSBM3GXKSQ2N")
    assert(formatDigest("md5", md5Bytes) == "md5:b1946ac92492d2347c6235b4d2611184")
  }

  test("sha1 hash vector (digest.rs:402-414)") {
    val out = compute("sha1",
      "abcdbcdecdefdefgefghfghighijhijkijkljklmklmnlmnomnopnopq".getBytes).get
    assert(hexEncode(out) == "84983e441c3bd26ebaae4aa1f95129e5e54670f1")
  }

  test("crc32 / crc32c / sha3 compute") {
    assert(hexEncode(compute("crc32", "hello".getBytes).get) == "3610a686")
    assert(computeText("sha256", "".getBytes).get ==
      "sha256:e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
    assert(compute("sha3-256", "x".getBytes).isDefined)
    assert(compute("blake3", "x".getBytes).isDefined) // vectors in Blake3Spec
    assert(hexEncode(compute("xxh3", "".getBytes).get) == "2d06800538d394c2") // vectors in Xxh3Spec
  }
}

class HeaderSerdeSpec extends AnyFunSuite {
  import org.scalacheck.Gen

  test("serialize is byte-exact (header.rs:114-128)") {
    val bytes = HeaderSerde.serialize("WARC/1.1",
      Seq(Field("WARC-Type", "resource"), Field("Content-Length", "0")))
    assert(new String(bytes, "UTF-8") ==
      "WARC/1.1\r\nWARC-Type: resource\r\nContent-Length: 0\r\n\r\n")
  }

  test("parse ∘ serialize = identity (header.rs:131-152 as a property)") {
    val nameGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val valueGen = Gen.listOf(Gen.asciiPrintableChar).map(_.mkString.trim)
    val fieldsGen = Gen.listOf(Gen.zip(nameGen, valueGen).map { case (n, v) => Field(n, v) })
    (0 until 200).foreach { i =>
      val fields = fieldsGen.pureApply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong))
      val rt = HeaderSerde.parse(HeaderSerde.serialize("WARC/1.1", fields))
      assert(rt.contains(("WARC/1.1", fields)), s"seed $i: $fields")
    }
  }

  test("line folding removal (parse.rs:65-68)") {
    val folded = "WARC/1.1\r\nA: one\r\n\ttwo\r\n\r\n".getBytes("UTF-8")
    assert(HeaderSerde.parse(folded).get._2 == Seq(Field("A", "one two")))
  }
}
