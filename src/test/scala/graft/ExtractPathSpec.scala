package graft

import graft.ops.UrlPath
import org.scalatest.funsuite.AnyFunSuite

/** Filesystem-sink conflict-marker semantics
  * (reference src/app/extract.rs:186-221 create_target_path;
  * marker char src/extract.rs:12).
  */
class ExtractPathSpec extends AnyFunSuite {

  private val none = (_: Seq[String]) => false

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
}
