package graft

import graft.ops.UrlPath
import org.scalatest.funsuite.AnyFunSuite

/** Filesystem-sink conflict-marker semantics
  * (reference src/app/extract.rs:186-221 create_target_path;
  * marker char src/extract.rs:12).
  */
class ExtractPathSpec extends AnyFunSuite {

  private val none = (_: Seq[String]) => false

  test("mediaType: duplicate parameter names dedupe (first wins), never throw") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the default EXCEPTION map-key policy made str_to_map THROW on
    // ';msgtype=a;msgtype=b' — legal-shaped, attacker-common input
    val mt = Seq("application/http;msgtype=response;msgtype=request",
        "text/plain", "image/png;a=1;b=2")
      .toDF("v").select(graft.core.FieldOps.mediaType(col("v")).as("mt"))
      .select(col("mt.ok"), col("mt.type"), col("mt.parameters"))
      .collect()
    assert(mt(0).getBoolean(0) &&
      mt(0).getMap[String, String](2).get("msgtype").contains("response"))
    assert(mt(1).getBoolean(0) && mt(1).getMap[String, String](2).isEmpty)
    assert(mt(2).getMap[String, String](2) == Map("a" -> "1", "b" -> "2"))
  }

  test("no conflicts → components unchanged") {
    assert(UrlPath.resolveTargetPath(Seq("https", "h.test", "a", "b.html"),
      isTruncated = false, 0x1234L, none, none) ==
      Seq("https", "h.test", "a", "b.html"))
  }

  test("truncated record marks the final component (app/extract.rs:194-197)") {
    assert(UrlPath.resolveTargetPath(Seq("https", "h.test", "b.html"),
      isTruncated = true, 0L, none, none).last == "b.html⬧truncated")
  }

  test("existing target appends the 16-hex conflict id (app/extract.rs:199-208)") {
    val exists = (p: Seq[String]) => p == Seq("https", "h.test", "b.html")
    assert(UrlPath.resolveTargetPath(Seq("https", "h.test", "b.html"),
      isTruncated = false, 0xabcL, exists, none).last == "b.html⬧0000000000000abc")
  }

  test("truncation + existing target compose: base name first, then id") {
    val exists = (p: Seq[String]) => p.last == "b.html⬧truncated"
    assert(UrlPath.resolveTargetPath(Seq("h.test", "b.html"),
      isTruncated = true, 1L, exists, none).last ==
      "b.html⬧truncated⬧0000000000000001")
  }

  test("file in place of a directory component gets ⬧d (app/extract.rs:210-216)") {
    val isFile = (p: Seq[String]) => p == Seq("https", "h.test", "a")
    assert(UrlPath.resolveTargetPath(Seq("https", "h.test", "a", "b.html"),
      isTruncated = false, 0L, none, isFile) ==
      Seq("https", "h.test", "a⬧d", "b.html"))
  }

  test("conversion marker (extract.rs:104-107)") {
    assert(UrlPath.markConversion("b.html") == "b.html⬧conversion")
  }

  test("writeTree writes a real conflict-resolved tree (one task per host)") {
    import TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tree").toString
    // row 2 hits row 1's target → 16-hex conflict suffix; row 3's
    // intermediate 'a' is now a FILE → ⬧d; row 4 is truncated
    val df = Seq(
      (1L, Seq("https", "h.test", "a"), "first".getBytes("UTF-8"), false, 0x1L),
      (2L, Seq("https", "h.test", "a"), "second".getBytes("UTF-8"), false, 0xabcL),
      (3L, Seq("https", "h.test", "a", "b.html"), "under".getBytes("UTF-8"), false, 0x2L),
      (4L, Seq("https", "h.test", "t.bin"), "cut".getBytes("UTF-8"), true, 0x3L))
      .toDF("position", "path_components", "extracted", "is_truncated", "conflict_id")
    val lineage = graft.ops.ExtractOp.writeTree(df, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    def read(p: String) = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, p)), "UTF-8")
    assert(read("https/h.test/a") == "first")
    assert(read("https/h.test/a⬧0000000000000abc") == "second")
    assert(read("https/h.test/a⬧d/b.html") == "under")
    assert(read("https/h.test/t.bin⬧truncated") == "cut")
    assert(lineage.keySet == Set("https/h.test/a", "https/h.test/a⬧0000000000000abc",
      "https/h.test/a⬧d/b.html", "https/h.test/t.bin⬧truncated"))
    assert(lineage("https/h.test/a⬧d/b.html") == 5L)
    // replay idempotence: resolution is computed from the ROW SET, not
    // the live tree — a retry/second action writes the same paths
    val lineage2 = graft.ops.ExtractOp.writeTree(df, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(lineage2 == lineage)
    def countFiles(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      // Hadoop's local ChecksumFileSystem writes .crc sidecars — not tree content
      try s.filter(f => java.nio.file.Files.isRegularFile(f) &&
        !f.getFileName.toString.endsWith(".crc")).count()
      finally s.close()
    }
    assert(countFiles(java.nio.file.Paths.get(dir)) == 4L)
  }
}
