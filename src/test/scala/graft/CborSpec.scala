package graft

import graft.core.Cbor
import graft.core.Cbor._
import graft.ops.MessageCbor
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CBOR codec against the RFC 8949 Appendix A examples, plus the Spark
  * message-interchange round-trip.
  */
class CborSpec extends AnyFunSuite {
  import TestSpark.spark

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("RFC 8949 Appendix A integer examples") {
    val cases = Seq[(Long, String)](
      0L -> "00", 1L -> "01", 10L -> "0a", 23L -> "17", 24L -> "1818",
      25L -> "1819", 100L -> "1864", 1000L -> "1903e8",
      1000000L -> "1a000f4240", 1000000000000L -> "1b000000e8d4a51000",
      -1L -> "20", -10L -> "29", -100L -> "3863", -1000L -> "3903e7")
    cases.foreach { case (n, h) =>
      assert(hex(Cbor.encode(CInt(n))) == h, s"encode $n")
      val (v, off) = Cbor.decodeOne(Cbor.encode(CInt(n)), 0)
      assert(v == CInt(n) && off == h.length / 2, s"decode $n")
    }
  }

  test("RFC 8949 Appendix A string/array/map examples") {
    assert(hex(Cbor.encode(CText(""))) == "60")
    assert(hex(Cbor.encode(CText("a"))) == "6161")
    assert(hex(Cbor.encode(CText("IETF"))) == "6449455446")
    assert(hex(Cbor.encode(CBytes(Array[Byte]()))) == "40")
    assert(hex(Cbor.encode(CBytes(Array[Byte](1, 2, 3, 4)))) == "4401020304")
    assert(hex(Cbor.encode(CArr(Vector()))) == "80")
    assert(hex(Cbor.encode(CArr(Vector(CInt(1), CInt(2), CInt(3))))) == "83010203")
    assert(hex(Cbor.encode(CArr(Vector(CInt(1),
      CArr(Vector(CInt(2), CInt(3))), CArr(Vector(CInt(4), CInt(5))))))) ==
      "8301820203820405")
    assert(hex(Cbor.encode(CMap(Vector()))) == "a0")
    assert(hex(Cbor.encode(CMap(Vector(CInt(1) -> CInt(2), CInt(3) -> CInt(4))))) ==
      "a201020304")
    assert(hex(Cbor.encode(CMap(Vector(
      CText("a") -> CInt(1),
      CText("b") -> CArr(Vector(CInt(2), CInt(3))))))) == "a26161016162820203")
    assert(hex(Cbor.encode(CBool(false))) == "f4")
    assert(hex(Cbor.encode(CBool(true))) == "f5")
    assert(hex(Cbor.encode(CNull)) == "f6")
    // 25-element array crosses the 1-byte length threshold
    val arr = CArr((1 to 25).map(i => CInt(i.toLong)).toVector)
    assert(hex(Cbor.encode(arr)).startsWith("9819"))
    assert(Cbor.decodeOne(Cbor.encode(arr), 0)._1 == arr)
  }

  test("RFC 8949 Appendix A indefinite-length examples decode (decoder " +
    "generality; the encoder stays definite-length)") {
    def fromHex(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def dec(h: String): Val = {
      val b = fromHex(h)
      val (v, off) = Cbor.decodeOne(b, 0)
      assert(off == b.length, s"short decode of $h")
      v
    }
    // indefinite byte string: (_ h'0102', h'030405')
    assert(dec("5f42010243030405ff") == CBytes(Array[Byte](1, 2, 3, 4, 5))
      || dec("5f42010243030405ff").asInstanceOf[CBytes].v.sameElements(
        Array[Byte](1, 2, 3, 4, 5)))
    // indefinite text string: (_ "strea", "ming")
    assert(dec("7f657374726561646d696e67ff") == CText("streaming"))
    // indefinite arrays, all Appendix A shapes
    assert(dec("9fff") == CArr(Vector()))
    val nested = CArr(Vector(CInt(1), CArr(Vector(CInt(2), CInt(3))),
      CArr(Vector(CInt(4), CInt(5)))))
    assert(dec("9f018202039f0405ffff") == nested)
    assert(dec("9f01820203820405ff") == nested)
    assert(dec("83018202039f0405ff") == nested)
    assert(dec("83019f0203ff820405") == nested)
    assert(dec("9f0102030405060708090a0b0c0d0e0f101112131415161718181819ff") ==
      CArr((1 to 25).map(i => CInt(i.toLong)).toVector))
    // indefinite maps
    assert(dec("bf61610161629f0203ffff") == CMap(Vector(
      CText("a") -> CInt(1), CText("b") -> CArr(Vector(CInt(2), CInt(3))))))
    assert(dec("826161bf61626163ff") == CArr(Vector(CText("a"),
      CMap(Vector(CText("b") -> CText("c"))))))
    assert(dec("bf6346756ef563416d7421ff") == CMap(Vector(
      CText("Fun") -> CBool(true), CText("Amt") -> CInt(-2))))
    // tags decode as their content (skip semantics)
    assert(dec("c074323031332d30332d32315432303a30343a30305a") ==
      CText("2013-03-21T20:04:00Z"))
    assert(dec("c11a514b67b0") == CInt(0x514b67b0L))
    dec("d74401020304") match {
      case CBytes(x) => assert(x.sameElements(Array[Byte](1, 2, 3, 4)))
      case other => fail(s"tag 23 content: $other")
    }
    // malformed indefinite forms still fail loudly
    intercept[IllegalArgumentException](Cbor.decodeOne(fromHex("5f42010201ff"), 0)) // int chunk
    intercept[IllegalArgumentException](Cbor.decodeOne(fromHex("5f5f4101ffff"), 0)) // nested indefinite chunk
    intercept[IllegalArgumentException](Cbor.decodeOne(fromHex("9f01"), 0)) // missing break
    intercept[IllegalArgumentException](Cbor.decodeOne(fromHex("ff"), 0)) // bare break
    intercept[IllegalArgumentException](Cbor.decodeOne(fromHex("1f"), 0)) // indefinite int
  }

  test("decodeSeq splits concatenated items; malformed input throws") {
    val seq = Cbor.encode(CInt(7)) ++ Cbor.encode(CText("hi")) ++
      Cbor.encode(CMap(Vector(CText("k") -> CBytes(Array[Byte](9)))))
    val items = Cbor.decodeSeq(seq)
    assert(items.take(2) == Vector(CInt(7), CText("hi")))
    // byte-compare CBytes structurally (Array == is reference equality)
    assert(items(2) match {
      case CMap(Vector((CText("k"), CBytes(b)))) => b.sameElements(Array[Byte](9))
      case _ => false
    })
    assertThrows[IllegalArgumentException](Cbor.decodeSeq(Array[Byte](0xf8.toByte)))
    assertThrows[IllegalArgumentException](Cbor.decodeSeq(Array[Byte](0x5f.toByte)))
  }

  test("property: arbitrary nested values round-trip byte-exactly") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val leaf: Gen[Val] = Gen.oneOf(
      Gen.choose(Long.MinValue + 1, Long.MaxValue).map(CInt.apply),
      Gen.asciiPrintableStr.map(CText.apply),
      Gen.listOf(Gen.choose(-128, 127).map(_.toByte)).map(b => CBytes(b.toArray)),
      Gen.oneOf(CBool(true), CBool(false), CNull))
    def tree(depth: Int): Gen[Val] =
      if (depth == 0) leaf
      else Gen.frequency(
        3 -> leaf,
        1 -> Gen.listOfN(3, tree(depth - 1)).map(v => CArr(v.toVector)),
        1 -> Gen.listOfN(2, Gen.zip(Gen.alphaStr.map(CText.apply), tree(depth - 1)))
          .map(kv => CMap(kv.toVector)))
    // structural equality with byte-array awareness
    def eq(a: Val, b: Val): Boolean = (a, b) match {
      case (CBytes(x), CBytes(y)) => x.sameElements(y)
      case (CArr(x), CArr(y)) => x.size == y.size && x.zip(y).forall((eq _).tupled)
      case (CMap(x), CMap(y)) =>
        x.size == y.size && x.zip(y).forall { case ((k1, v1), (k2, v2)) =>
          eq(k1, k2) && eq(v1, v2)
        }
      case _ => a == b
    }
    (1 to 200).foreach { i =>
      val v = tree(3).apply(Gen.Parameters.default, Seed(i.toLong)).get
      val enc = Cbor.encode(v)
      val (dec, off) = Cbor.decodeOne(enc, 0)
      assert(off == enc.length, s"seed $i: trailing bytes")
      assert(eq(dec, v), s"seed $i: $v != $dec")
      // foreign-encoder form (indefinite framing + tags) decodes to the
      // SAME value — the decoder-generality contract
      val fenc = Cbor.encodeIndefinite(v)
      val (fdec, foff) = Cbor.decodeOne(fenc, 0)
      assert(foff == fenc.length, s"seed $i: foreign trailing bytes")
      assert(eq(fdec, v), s"seed $i foreign: $v != $fdec")
    }
  }

  test("64-bit arguments past 2^63 are rejected, not wrapped") {
    // a Long-wrapping length would PASS the bound checks negative and
    // toInt-truncate (a claimed 2^63+5-byte string decoding as 5 bytes);
    // a wrapping uint64 would decode as the wrong negative CInt
    for (bad <- Seq(
        // uint64 value 2^63 (major 0, 8-byte arg, top bit set)
        Array(0x1b, 0x80, 0, 0, 0, 0, 0, 0, 0).map(_.toByte),
        // byte string claiming length 2^63+5 with 5 bytes present
        Array(0x5b, 0x80, 0, 0, 0, 0, 0, 0, 5, 1, 2, 3, 4, 5).map(_.toByte),
        // array claiming 2^63 elements
        Array(0x9b, 0x80, 0, 0, 0, 0, 0, 0, 0).map(_.toByte))) {
      val e = intercept[IllegalArgumentException](Cbor.decodeOne(bad, 0))
      assert(e.getMessage.contains("supported range"), s"${hex(bad)}: ${e.getMessage}")
    }
  }

  test("truncated multi-byte arguments and deep nesting fail cleanly") {
    // header byte promises an 8-byte argument, buffer has 3: must be the
    // documented IllegalArgumentException, not ArrayIndexOutOfBounds
    for (bad <- Seq(
        Array(0x1b, 0x00, 0x00).map(_.toByte),          // uint64 arg cut short
        Array(0x19, 0x01).map(_.toByte),                // uint16 arg cut short
        Array(0x5a, 0xff, 0xff, 0xff, 0xff).map(_.toByte), // bytes len 4G, no data
        // length 2^63-1 (valid Long): `off + len` would wrap negative and
        // pass a naive `<= b.length` bound — must still say "truncated"
        Array(0x5b, 0x7f, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 1).map(_.toByte),
        Array(0x7b, 0x7f, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x61).map(_.toByte),
        Array(0x9b, 0x7f, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff).map(_.toByte))) {
      val e = intercept[IllegalArgumentException](Cbor.decodeOne(bad, 0))
      assert(e.getMessage.contains("truncated") || e.getMessage.contains("nesting"),
        s"${hex(bad)}: ${e.getMessage}")
    }
    // 1000 nested single-element arrays (0x81 ...) in 1001 bytes: the
    // depth cap must reject it instead of StackOverflowError
    val deep = Array.fill(1000)(0x81.toByte) :+ 0x00.toByte
    val e = intercept[IllegalArgumentException](Cbor.decodeOne(deep, 0))
    assert(e.getMessage.contains("nesting"))
    // well-formed nesting below the cap still decodes
    val ok = Array.fill(100)(0x81.toByte) :+ 0x07.toByte
    assert(Cbor.decodeOne(ok, 0)._2 == ok.length)
  }

  test("non-ASCII payloads round-trip (Content-Length in octets, not chars)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "héllo wörld — ünïcode"),     // 2-byte UTF-8 sequences
      (2L, "日本語テキスト" * 20),          // 3-byte sequences, multi-chunk
      (3L, "emoji 😀 mix"))     // 4-byte astral pair
      .toDF("id", "payload")
    val seq = MessageCbor.toCborSeq(MessageCbor.exportCborMessages(docs, "id", "payload"))
    val validated = MessageCbor.importValidate(MessageCbor.fromCborSeq(seq))
      .orderBy("id").collect()
    assert(validated.forall(_.getBoolean(3)),
      "roundtrip_ok must hold for non-ASCII payloads")
    assert(validated.map(_.getString(2)).toSeq ==
      Seq("héllo wörld — ünïcode", "日本語テキスト" * 20, "emoji 😀 mix"))
  }

  test("message run: export → seq → decode → validate round-trips") {
    import spark.implicits._
    val docs = Seq(
      (1L, "short"),
      (2L, "x" * 200),   // 4 chunks at ChunkSize=64
      (3L, ""))          // empty payload → one empty chunk
      .toDF("id", "payload")
    val messages = MessageCbor.exportCborMessages(docs, "id", "payload")
    val seq = MessageCbor.toCborSeq(messages)
    val validated = MessageCbor.importValidate(MessageCbor.fromCborSeq(seq))
      .orderBy("id").collect()
    assert(validated.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(validated.forall(_.getBoolean(3)), "roundtrip_ok must hold for all")
    // n_messages = Metadata + Header + chunks + BlockEnd
    assert(validated.map(_.getLong(1)).toSeq == Seq(4L, 7L, 4L))
    assert(validated.map(_.getString(2)).toSeq == Seq("short", "x" * 200, ""))
  }

  test("Extract*/EndOfFile variants decode with their fields (model.rs:5-15 parity)") {
    import spark.implicits._
    val seq = Seq(
      Cbor.encode(CMap(Vector(CText("ExtractMetadata") -> CMap(Vector(
        CText("has_content") -> CBool(true),
        CText("file_path_components") -> CArr(Vector(CText("https"), CText("h.test"), CText("a"))),
        CText("is_truncated") -> CBool(false)))))),
      Cbor.encode(CMap(Vector(CText("ExtractChunk") -> CMap(Vector(
        CText("data") -> CBytes("chunk!".getBytes("UTF-8"))))))),
      Cbor.encode(CMap(Vector(CText("ExtractEnd") -> CMap(Vector(
        CText("crc32") -> CInt(7), CText("crc32c") -> CInt(8), CText("xxh3") -> CInt(9)))))),
      Cbor.encode(CMap(Vector(CText("EndOfFile") -> CMap(Vector()))))).reduce(_ ++ _)
    val parsed = MessageCbor.fromCborSeq(Seq((1L, seq)).toDF("id", "seq"))
      .selectExpr("msg_seq", "m.variant", "m.has_content", "m.file_path_components",
        "m.is_truncated", "m.data", "m.crc32c")
      .orderBy("msg_seq").collect()
    assert(parsed.map(_.getString(1)).toSeq ==
      Seq("ExtractMetadata", "ExtractChunk", "ExtractEnd", "EndOfFile"))
    assert(parsed(0).getBoolean(2) && !parsed(0).getBoolean(4))
    assert(parsed(0).getSeq[String](3) == Seq("https", "h.test", "a"))
    assert(new String(parsed(1).getAs[Array[Byte]](5), "UTF-8") == "chunk!")
    assert(parsed(2).getLong(6) == 8L)
  }

  test("corrupted byte fails the handshake") {
    import spark.implicits._
    val docs = Seq((1L, "payload-under-test")).toDF("id", "payload")
    val seq = MessageCbor.toCborSeq(MessageCbor.exportCborMessages(docs, "id", "payload"))
    val corrupt = udf((b: Array[Byte]) => {
      val c = b.clone()
      // flip a byte inside the chunk DATA (the checksummed region)
      val payload = "payload-under-test".getBytes("UTF-8")
      val i = c.indexOfSlice(payload)
      assert(i >= 0, "chunk bytes not found in seq")
      c(i) = (c(i) ^ 0x01).toByte
      c
    })
    val validated = MessageCbor.importValidate(
      MessageCbor.fromCborSeq(seq.select(col("id"), corrupt(col("seq")).as("seq"))))
    // either decode throws (caught as a query error upstream) or the
    // checksums mismatch — when it decodes, ok must be false
    val rows = try validated.collect() catch { case _: Exception => Array.empty[org.apache.spark.sql.Row] }
    assert(rows.isEmpty || rows.forall(!_.getBoolean(3)))
  }
}
