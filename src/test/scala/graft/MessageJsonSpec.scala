package graft

import graft.ops.MessageJson
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** F15 — externally-tagged JSON message interchange + RFC 7464 framing
  * (reference src/app/model.rs:5-15, doc/export_import.md:163-178,
  * dataseq.rs:21-104).
  */
class MessageJsonSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "short"),
    (2L, ""), // empty payload → exactly one empty chunk (common.rs:171)
    (3L, "x" * 200) // multi-chunk (64-byte chunks)
  ).toDF("doc_id", "text")

  test("extract-message run: ExtractMetadata + chunks + ExtractEnd round-trip") {
    val extracted = Seq(
      (10L, "payload-bytes-here".getBytes("UTF-8"), Seq("https", "h.test", "a"), false),
      (11L, "y".getBytes("UTF-8") ++ Array.fill(130)('z'.toByte), Seq("https", "h.test", "b"), true))
      .toDF("position", "extracted", "path_components", "is_truncated")
    val msgs = MessageJson.exportExtractMessages(extracted)
    val parsed = MessageJson.fromJsonSeq(MessageJson.toJsonSeq(msgs))
    val rows = parsed.orderBy("id", "msg_seq").collect()
    val byId = rows.groupBy(_.getLong(0))
    // run shape: ExtractMetadata, chunks, ExtractEnd
    val r10 = byId(10L)
    assert(r10.head.getAs[org.apache.spark.sql.Row]("m").getAs[org.apache.spark.sql.Row]("ExtractMetadata") != null)
    assert(r10.last.getAs[org.apache.spark.sql.Row]("m").getAs[org.apache.spark.sql.Row]("ExtractEnd") != null)
    // reassemble chunk data and compare to the original bytes
    val payload10 = r10.flatMap { r =>
      val m = r.getAs[org.apache.spark.sql.Row]("m")
      Option(m.getAs[org.apache.spark.sql.Row]("ExtractChunk"))
        .map(c => java.util.Base64.getDecoder.decode(c.getString(0)))
    }.reduce(_ ++ _)
    assert(new String(payload10, "UTF-8") == "payload-bytes-here")
    // metadata fields survive (truncation + components)
    val meta11 = byId(11L).head.getAs[org.apache.spark.sql.Row]("m")
      .getAs[org.apache.spark.sql.Row]("ExtractMetadata")
    assert(meta11.getBoolean(0) && meta11.getSeq[String](1) == Seq("https", "h.test", "b")
      && meta11.getBoolean(2))
    assert(byId(11L).length == 2 + math.ceil(131 / 64.0).toInt)
  }

  test("export is externally tagged with the reference's variant shapes") {
    val msgs = MessageJson.exportJsonMessages(docs, "doc_id", "text")
      .where(col("id") === 1L).orderBy("msg_seq").collect().map(_.getString(2))
    assert(msgs(0).startsWith("""{"Metadata":{"file":"graft.seq","position":1"""))
    assert(msgs(1).contains(""""Header":{"version":"WARC/1.1","fields":[["WARC-Record-ID","<urn:graft:1>"]"""))
    assert(msgs(2) == s"""{"BlockChunk":{"data":"${java.util.Base64.getEncoder
      .encodeToString("short".getBytes)}"}}""")
    assert(msgs(3).startsWith("""{"BlockEnd":{"crc32":"""))
  }

  test("frame → unframe → parse → reassemble round-trips with checksums") {
    val msgs = MessageJson.exportJsonMessages(docs, "doc_id", "text")
    val out = MessageJson.importValidate(
      MessageJson.fromJsonSeq(MessageJson.toJsonSeq(msgs)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getBoolean(3)))
      .toMap
    assert(out(1L) == ((4L, "short", true)))
    assert(out(2L) == ((4L, "", true)))
    assert(out(3L) == ((3L + math.ceil(200 / 64.0).toLong, "x" * 200, true)))
  }

  test("corrupted chunk fails the handshake; EndOfFile and Extract* variants parse") {
    val msgs = MessageJson.exportJsonMessages(docs, "doc_id", "text")
      .withColumn("msg",
        when(col("id") === 3L && col("msg_seq") === 2L,
          regexp_replace(col("msg"), """"data":"e""", "\"data\":\"f")) // flip first b64 char
          .otherwise(col("msg")))
    val out = MessageJson.importValidate(
      MessageJson.fromJsonSeq(MessageJson.toJsonSeq(msgs)))
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out(1L) && out(2L) && !out(3L))

    val extra = Seq(
      (9L, 0L, MessageJson.endOfFile),
      (9L, 1L, """{"ExtractMetadata":{"has_content":true,"file_path_components":["a","b"],"is_truncated":false}}"""),
      (9L, 2L, """{"ExtractChunk":{"data":"AA=="}}"""),
      (9L, 3L, """{"ExtractEnd":{"crc32":1,"crc32c":2,"xxh3":3}}"""))
      .toDF("id", "msg_seq", "msg")
    val parsed = MessageJson.fromJsonSeq(MessageJson.toJsonSeq(extra))
      .select(col("msg_seq"),
        col("m.EndOfFile").isNotNull.as("eof"),
        col("m.ExtractMetadata.file_path_components").as("pc"),
        col("m.ExtractChunk.data").as("ec"),
        col("m.ExtractEnd.xxh3").as("ee"))
      .orderBy("msg_seq").collect()
    assert(parsed(0).getBoolean(1)) // {"EndOfFile":{}} → present
    assert(parsed(1).getSeq[String](2) == Seq("a", "b"))
    assert(parsed(2).getString(3) == "AA==")
    assert(parsed(3).getLong(4) == 3L)
  }
}
