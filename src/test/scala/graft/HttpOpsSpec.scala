package graft

import graft.ops.HttpOps
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1

/** HTTP receiver scenarios ported from the reference
  * (src/http/h1/recv.rs:296-527 + framing table recv.rs:111-165,
  * chunked codec chunked.rs:216-293).
  */
class HttpOpsSpec extends AnyFunSuite {

  private def resp(s: String) = HttpOps.parseResponse(s.getBytes(ISO_8859_1))

  test("content-length framing") {
    val p = resp("HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nhelloEXTRA")
    assert(p.ok && p.status == 200 && new String(p.body) == "hello")
  }

  test("204/304/1xx → zero body regardless of headers (recv.rs:115-124)") {
    for (code <- Seq(204, 304, 100)) {
      val p = resp(s"HTTP/1.1 $code X\r\nContent-Length: 5\r\n\r\nhello")
      assert(p.ok && p.body.isEmpty, s"code $code")
    }
  }

  test("response without framing reads to end (recv.rs:159-165)") {
    val p = resp("HTTP/1.1 200 OK\r\n\r\nunframed body")
    assert(p.ok && new String(p.body) == "unframed body")
  }

  test("chunked transfer decoding with trailer (chunked.rs:216-293)") {
    val p = resp("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "5\r\nhello\r\n6;ext=1\r\n world\r\n0\r\nX-Trailer: t\r\n\r\n")
    assert(p.ok && new String(p.body) == "hello world")
  }

  test("TE beats Content-Length (recv.rs:134-148)") {
    val p = resp("HTTP/1.1 200 OK\r\nContent-Length: 999\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n2\r\nok\r\n0\r\n\r\n")
    assert(p.ok && new String(p.body) == "ok")
  }

  test("last TE not chunked → unframed response (recv.rs:136-146)") {
    val body = "raw-until-eof"
    val gz = gzipBytes(body.getBytes(ISO_8859_1))
    val payload = "HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip\r\n\r\n".getBytes(ISO_8859_1) ++ gz
    val p = HttpOps.parseResponse(payload)
    assert(p.ok && new String(p.body) == body)
  }

  test("chunked + gzip content-encoding pipeline (recv.rs:428-470 shape)") {
    val body = "the compressed payload body"
    val gz = gzipBytes(body.getBytes(ISO_8859_1))
    val chunked = HttpOps.encodeChunked(gz, 7)
    val payload = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n").getBytes(ISO_8859_1) ++ chunked
    val p = HttpOps.parseResponse(payload)
    assert(p.ok && new String(p.body) == body)
  }

  test("deflate content-encoding (zlib wrapper)") {
    val body = "deflated".getBytes(ISO_8859_1)
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.util.zip.DeflaterOutputStream(out)
    d.write(body); d.close()
    val payload = ("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n" +
      s"Content-Length: ${out.size}\r\n\r\n").getBytes(ISO_8859_1) ++ out.toByteArray
    val p = HttpOps.parseResponse(payload)
    assert(p.ok && p.body.sameElements(body))
  }

  test("body shorter than Content-Length → truncated_body error") {
    val p = resp("HTTP/1.1 200 OK\r\nContent-Length: 50\r\n\r\nonly-15-bytes..")
    assert(!p.ok && p.error == "truncated_body" && p.body.isEmpty)
    // exact length still fine; 204 ignores Content-Length entirely
    assert(resp("HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\nok").ok)
    assert(resp("HTTP/1.1 204 No Content\r\nContent-Length: 50\r\n\r\n").ok)
  }

  test("unsupported encoding → error (error.rs:388-390)") {
    val p = resp("HTTP/1.1 200 OK\r\nContent-Encoding: bzip2\r\nContent-Length: 2\r\n\r\nxx")
    assert(!p.ok && p.error == "unsupported_encoding:bzip2")
  }

  test("brotli content-encoding: real-encoder stream and stored-mode stream") {
    // a reference-encoder (q9) stream from the BrotliSpec vector set
    val in = getClass.getResourceAsStream("/graft/brotli_vectors.txt")
    val line = try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .find(_.startsWith("text-q9-w22 ")).get finally in.close()
    val Array(_, p64, c64) = line.split(" ", 3)
    val b64 = java.util.Base64.getDecoder
    val plain = b64.decode(p64)
    val comp = b64.decode(c64)
    val payload = ("HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n" +
      s"Content-Length: ${comp.length}\r\n\r\n").getBytes(ISO_8859_1) ++ comp
    val parsed = HttpOps.parseResponse(payload)
    assert(parsed.ok && parsed.body.sameElements(plain))
    // stored-mode (the q35 synthesis path) round-trips through the pipeline
    val body = "stored-mode brotli body é漢".getBytes("UTF-8")
    val stored = graft.ops.Brotli.compressStored(body)
    val payload2 = ("HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n" +
      s"Content-Length: ${stored.length}\r\n\r\n").getBytes(ISO_8859_1) ++ stored
    val parsed2 = HttpOps.parseResponse(payload2)
    assert(parsed2.ok && parsed2.body.sameElements(body))
    // truncated stream → loud error, not silent wrong bytes
    val bad = comp.take(comp.length / 2)
    val p3 = HttpOps.parseResponse(("HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n" +
      s"Content-Length: ${bad.length}\r\n\r\n").getBytes(ISO_8859_1) ++ bad)
    assert(!p3.ok && p3.error.startsWith("brotli_error:"))
  }

  test("lenient status line, bad inputs") {
    assert(resp("HTTP/1.1 200\r\n\r\n").ok)       // no reason phrase
    assert(!resp("GARBAGE\r\n\r\n").ok)
    assert(!resp("no terminator at all").ok)
    val trunc = resp("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n5\r\nhel")
    assert(!trunc.ok && trunc.error == "chunked_truncated")
    // attacker-shaped numerics must yield error rows, never throw out of
    // the UDF: oversized status code, >Long Content-Length, >Long hex
    // chunk size
    val bigStatus = resp("HTTP/1.1 99999999999 OK\r\n\r\n")
    assert(!bigStatus.ok && bigStatus.error == "bad_status_code")
    val bigCl = resp("HTTP/1.1 200 OK\r\nContent-Length: 99999999999999999999\r\n\r\nx")
    assert(!bigCl.ok && bigCl.error == "invalid_content_length")
    val bigChunk = resp(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nFFFFFFFFFFFFFFFF\r\nx")
    assert(!bigChunk.ok && bigChunk.error == "chunked_bad_size")
  }

  test("comma-list split: lowercase, trim, order (h1/header/fields.rs:15-31)") {
    assert(HttpOps.commaList(" Gzip , CHUNKED ,, x ") == Seq("gzip", "chunked", "x"))
  }

  private def gzipBytes(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(out)
    g.write(data); g.close()
    out.toByteArray
  }

  test("decompression bomb guard: output past the cap fails the record " +
    "cleanly (OutputTooLarge), never materializes") {
    // 64 KiB of zeros gzips to ~80 bytes; decode through a 1000-byte cap
    // exercises exactly the guard the 1 GiB production bound uses
    val bomb = gzipBytes(new Array[Byte](65536))
    val e = intercept[Exception](HttpOps.readAll(
      new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bomb)), 1000L))
    // decompress() reports errors as "<codec>_error:<SimpleName>" — pin
    // the name the error row will carry
    assert(e.getClass.getSimpleName == "OutputTooLarge")
    // sanity: the same stream under the real cap decodes fine
    assert(HttpOps.decompress("gzip", bomb).exists(_.length == 65536))
  }
}
