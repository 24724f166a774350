package graft.core

import java.nio.charset.StandardCharsets

/** WARC header serialization (reference src/header.rs:114-128): version
  * line + `name: value` CRLF pairs in insertion order + blank line.
  * Byte-exact round-trip is a reference test (header.rs:131-152); ours is
  * a ScalaTest property test.
  */
object HeaderSerde {

  def serialize(version: String, fields: Seq[Field]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(version).append("\r\n")
    fields.foreach(f => sb.append(f.name).append(": ").append(f.value).append("\r\n"))
    sb.append("\r\n")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Parse bytes back into (version, fields). Rejects non-UTF8 the same
    * way the reference does (header.rs:67,72-73) by replacement-char
    * detection; folded lines unfolded per parse.rs:65-68.
    */
  def parse(bytes: Array[Byte]): Option[(String, Seq[Field])] = {
    // strict decode (CodingErrorAction.REPORT) so malformed UTF-8 is
    // REJECTED (reference behavior, header.rs:67,72-73) while a header
    // that legitimately encodes a literal U+FFFD still parses — the
    // lenient String constructor can't tell the two apart because it
    // substitutes U+FFFD for invalid sequences.
    val text =
      try StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        .decode(java.nio.ByteBuffer.wrap(bytes)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return None }
    val unfolded = text.replaceAll("(?:\r\n|\n)[ \t]+", " ")
    val lines = unfolded.split("\r\n", -1)
    if (lines.length < 2 || !lines.head.startsWith("WARC/")) None
    else {
      val fields = lines.tail.takeWhile(_.nonEmpty).flatMap { l =>
        l.indexOf(':') match {
          case -1 => return None
          case i  => Some(Field(l.substring(0, i).trim, l.substring(i + 1).trim))
        }
      }
      Some((lines.head, fields.toSeq))
    }
  }

  /** Serialized record length: header + block + CRLF CRLF terminator
    * (encode.rs:108-113) — drives the synthetic `position` offsets.
    */
  def recordLength(version: String, fields: Seq[Field], blockLen: Long): Long =
    serialize(version, fields).length.toLong + blockLen + 4
}
