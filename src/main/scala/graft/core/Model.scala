package graft.core

import java.sql.Timestamp

/** Core typed model — mirrors the reference's record structures
  * (chfoo/warcat-rs), re-expressed as Spark-encodable case classes.
  *
  * Header = ordered, case-insensitive multimap → `Seq[Field]`, NOT a Map
  * (reference: src/fields.rs:56-58 — insertion order + duplicates preserved;
  * lookups are first-match case-insensitive, src/fields.rs:111-120).
  */
final case class Field(name: String, value: String)

/** One WARC record as a row (reference: src/warc/decode.rs:34-40 — the
  * record stream; ordering materialized as `position`, src/warc/decode.rs:448-453).
  */
final case class WarcRecord(
    position: Long,
    file: String,
    version: String,
    fields: Seq[Field],
    bytes: Array[Byte]
)

/** Verify output row (reference: src/verify.rs:112-125). */
final case class Problem(position: Long, recordId: String, kind: String, detail: String)

/** The graft input table row (BASELINE.json input_hint). */
final case class ImageRow(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long
)

/** Frontier URL row (north rule). */
final case class FrontierUrl(
    url: String,
    priority_band: Int,
    discovered_at: Timestamp,
    via_image_id: String
)

/** Politeness fixture row (robots cache, broadcast side). */
final case class RobotsRule(host: String, crawl_delay_ms: Int, disallow_prefixes: Seq[String])

/** Export/import message-stream row (reference: src/app/model.rs:6-15).
  * A record explodes to Metadata, Header, BlockChunk*, BlockEnd; a file
  * stream ends with EndOfFile (doc/export_import.md:163-178).
  */
final case class WarcMessage(
    msg_type: String, // Metadata | Header | BlockChunk | BlockEnd | EndOfFile
    record_seq: Long,
    msg_seq: Long,
    position: Long,
    file: String,
    version: String,
    fields: Seq[Field],
    chunk: Array[Byte],
    crc32: Long,
    xxh3: Long
)
