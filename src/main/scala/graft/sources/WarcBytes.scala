package graft.sources

import graft.core.{Field, HeaderSerde, WarcRecord}

import java.io.{ByteArrayOutputStream, EOFException}
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, Inflater}

/** WARC byte-level codec — the engine's equivalent of the reference's
  * decoder/encoder cores (/root/reference/src/warc/decode.rs:109-180,
  * src/warc/encode.rs:41-132), as pure executor-side functions consumed by
  * [[WarcSource]] inside `mapPartitions`.
  *
  * Framing (decode.rs:547-668): version line + header fields + CRLF CRLF,
  * then exactly Content-Length block bytes, then "\r\n\r\n". `position` is
  * the record's byte offset in the (uncompressed) stream — boundary
  * offsets are the reference's own integration-test oracle
  * (tests/test_decode.rs:77-78).
  *
  * Compression (compress.rs:62-76): record-at-time concatenated gzip
  * members — each record is one gzip member, so members can be decoded
  * independently; [[decodeAuto]] detects WARC/ vs gzip magic bytes the
  * same way detect_header does (decode.rs:811-821).
  */
object WarcBytes {

  val GzipMagic: Array[Byte] = Array(0x1f.toByte, 0x8b.toByte)
  val ZstdMagic: Array[Byte] = Array(0x28.toByte, 0xb5.toByte, 0x2f.toByte, 0xfd.toByte)

  /** Magic detection (decode.rs:811-821): "warc" | "gzip" | "zstd" |
    * "unknown". Zstd skippable frames (0x184D2A50..5F little-endian, incl.
    * the dictionary frame 0x184D2A5D) also identify as zstd.
    */
  def detectFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 5 &&
      new String(bytes, 0, 5, StandardCharsets.US_ASCII) == "WARC/") "warc"
    else if (bytes.length >= 2 && bytes(0) == GzipMagic(0) && bytes(1) == GzipMagic(1)) "gzip"
    else if (bytes.length >= 4 && bytes.take(4).sameElements(ZstdMagic)) "zstd"
    else if (bytes.length >= 4 && (readLe32(bytes, 0) & 0xfffffff0) == 0x184d2a50) "zstd"
    else "unknown"

  private val HeaderTerminator = "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)

  private def indexOfSeq(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    while (i + needle.length <= hay.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Decode a plain (uncompressed) WARC byte stream into records with
    * exact byte-offset positions. Malformed input throws
    * IllegalArgumentException with the byte offset (the decoder's
    * typestate errors, decode.rs:217-303).
    */
  def decodeRecords(bytes: Array[Byte], file: String): Seq[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var pos = 0
    while (pos < bytes.length) {
      val headerEnd = indexOfSeq(bytes, HeaderTerminator, pos)
      require(headerEnd >= 0, s"missing header terminator at offset $pos")
      // header INCLUDES one trailing CRLF (blank line), per serialize form
      val headerBytes = bytes.slice(pos, headerEnd + 4)
      val (version, fields) = HeaderSerde.parse(headerBytes)
        .getOrElse(throw new IllegalArgumentException(s"bad header at offset $pos"))
      val lenStr = fields.find(_.name.equalsIgnoreCase("Content-Length")).map(_.value)
        .getOrElse(throw new IllegalArgumentException(s"no Content-Length at offset $pos"))
      require(lenStr.forall(_.isDigit) && lenStr.nonEmpty,
        s"bad Content-Length '$lenStr' at offset $pos")
      val blockLen = lenStr.toLong.toInt
      val blockStart = headerEnd + 4
      require(blockStart + blockLen + 4 <= bytes.length,
        s"truncated block at offset $pos")
      val block = bytes.slice(blockStart, blockStart + blockLen)
      val term = bytes.slice(blockStart + blockLen, blockStart + blockLen + 4)
      require(term.sameElements(HeaderTerminator),
        s"missing record terminator at offset ${blockStart + blockLen}")
      out += WarcRecord(pos.toLong, file, version, fields, block)
      pos = blockStart + blockLen + 4
    }
    out.result()
  }

  /** Encode records back to WARC bytes (encode.rs:41-132): header +
    * exactly Content-Length block bytes + CRLF CRLF. The Content-Length
    * header must equal the block length (ContentLengthMismatch,
    * encode.rs:119-132).
    */
  def encodeRecords(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val declared = r.fields.find(_.name.equalsIgnoreCase("Content-Length")).map(_.value)
      require(declared.contains(r.bytes.length.toString),
        s"Content-Length mismatch at position ${r.position}: " +
          s"declared ${declared.orNull}, block ${r.bytes.length}")
      out.write(HeaderSerde.serialize(r.version, r.fields))
      out.write(r.bytes)
      out.write(HeaderTerminator)
    }
    out.toByteArray
  }

  // ---- record-at-time gzip (one member per record, compress.rs:62-76) ----

  /** Gzip-compress each record as its own member and concatenate —
    * record-at-time compression (encode.rs:108-113 → compress.rs:174-196).
    */
  def encodeGzip(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val plain = encodeRecords(Seq(r))
      val gz = new java.util.zip.GZIPOutputStream(out) { `def`.setLevel(Deflater.BEST_SPEED) }
      gz.write(plain)
      gz.finish()
    }
    out.toByteArray
  }

  /** Decode concatenated gzip members into the logical record stream.
    * Positions are offsets in the UNCOMPRESSED stream (what the logical
    * record order keys on); `member_offset` consumers needing compressed
    * offsets track the member starts below.
    */
  def decodeGzip(bytes: Array[Byte], file: String): Seq[WarcRecord] = {
    decodeRecords(gunzipConcatenated(bytes), file)
  }

  /** Inflate ALL concatenated gzip members. Manual `Inflater` over the
    * byte array (GZIPInputStream can desync at member boundaries because
    * its internal buffering overshoots) — `getBytesRead` gives the exact
    * member end, mirroring the reference's deferred-input bookkeeping
    * (decode.rs:733-753, compress.rs start_next_segment).
    */
  def gunzipConcatenated(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length * 3)
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 2 <= bytes.length &&
        bytes(pos) == GzipMagic(0) && bytes(pos + 1) == GzipMagic(1),
        s"bad gzip magic at offset $pos")
      pos = skipGzipHeader(bytes, pos + 2)
      val inf = new Inflater(true)
      inf.setInput(bytes, pos, bytes.length - pos)
      val buf = new Array[Byte](65536)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (inf.needsInput()) throw new EOFException(s"truncated deflate data at $pos")
      }
      pos += inf.getBytesRead.toInt
      inf.end()
      require(pos + 8 <= bytes.length, s"truncated gzip trailer at offset $pos")
      pos += 8 // CRC32 + ISIZE
    }
    out.toByteArray
  }

  // ---- record-at-time zstd (one frame per record; dictionary in a
  //      skippable frame, reference src/compress/zstd.rs:13-58) ----

  /** The reference's dictionary skippable-frame magic (zstd.rs:13). */
  val ZstdDictFrameMagic = 0x184d2a5d

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def readLe32(b: Array[Byte], pos: Int): Int =
    (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
      ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)

  /** Zstd-compress each record as its own frame; optional dictionary is
    * written first inside skippable frame 0x184D2A5D (itself optionally
    * zstd-compressed, like the reference's compressed-dictionary mode).
    */
  def encodeZstd(records: Seq[WarcRecord], level: Int = 3,
                 dict: Option[Array[Byte]] = None,
                 compressDict: Boolean = false): Array[Byte] = {
    import com.github.luben.zstd.{Zstd, ZstdCompressCtx}
    val out = new ByteArrayOutputStream()
    dict.foreach { d =>
      val payload = if (compressDict) Zstd.compress(d, level) else d
      out.write(le32(ZstdDictFrameMagic))
      out.write(le32(payload.length))
      out.write(payload)
    }
    records.foreach { r =>
      val ctx = new ZstdCompressCtx()
      try {
        ctx.setLevel(level)
        dict.foreach(ctx.loadDict)
        out.write(ctx.compress(encodeRecords(Seq(r))))
      } finally ctx.close()
    }
    out.toByteArray
  }

  /** Decode concatenated zstd frames (dictionary skippable frame honored,
    * compressed dictionaries auto-detected by magic, zstd.rs:38-52).
    */
  def decodeZstd(bytes: Array[Byte], file: String): Seq[WarcRecord] =
    decodeRecords(unzstdConcatenated(bytes), file)

  def unzstdConcatenated(bytes: Array[Byte]): Array[Byte] = {
    import com.github.luben.zstd.{Zstd, ZstdInputStreamNoFinalizer}
    var pos = 0
    var dict: Option[Array[Byte]] = None
    if (bytes.length >= 8 && readLe32(bytes, 0) == ZstdDictFrameMagic) {
      val len = readLe32(bytes, 4)
      require(8 + len <= bytes.length, "truncated zstd dictionary frame")
      val payload = bytes.slice(8, 8 + len)
      dict = Some(
        if (payload.length >= 4 && payload.take(4).sameElements(ZstdMagic)) {
          val size = Zstd.getFrameContentSize(payload)
          require(size > 0, "compressed dictionary without content size")
          Zstd.decompress(payload, size.toInt)
        } else payload)
      pos = 8 + len
    }
    val in = new ZstdInputStreamNoFinalizer(
      new java.io.ByteArrayInputStream(bytes, pos, bytes.length - pos))
    try {
      in.setContinuous(true)
      dict.foreach(in.setDict)
      val out = new ByteArrayOutputStream(bytes.length * 3)
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** Skip a gzip member header starting AFTER the 2 magic bytes; returns
    * the offset of the deflate data.
    */
  private def skipGzipHeader(bytes: Array[Byte], start: Int): Int = {
    def u8(i: Int): Int = {
      if (i >= bytes.length) throw new EOFException("truncated gzip header")
      bytes(i) & 0xff
    }
    var pos = start
    val cm = u8(pos); require(cm == 8, "unsupported gzip compression method")
    val flg = u8(pos + 1)
    pos += 8 // CM FLG MTIME(4) XFL OS
    if ((flg & 0x04) != 0) { // FEXTRA
      val xlen = u8(pos) | (u8(pos + 1) << 8)
      pos += 2 + xlen
    }
    if ((flg & 0x08) != 0) { while (u8(pos) != 0) pos += 1; pos += 1 } // FNAME
    if ((flg & 0x10) != 0) { while (u8(pos) != 0) pos += 1; pos += 1 } // FCOMMENT
    if ((flg & 0x02) != 0) pos += 2 // FHCRC
    pos
  }
}
