package graft

import graft.core.Field
import graft.ops.VerifyOp
import org.scalatest.funsuite.AnyFunSuite

/** Direct unit coverage of the scalar rule engine (verify.rs check set). */
class VerifyChecksSpec extends AnyFunSuite {

  private def base(tpe: String, extra: (String, String)*): Seq[Field] =
    Seq(Field("WARC-Record-ID", "<urn:x:1>"), Field("WARC-Type", tpe),
      Field("WARC-Date", "2025-01-01T00:00:00Z"), Field("Content-Length", "0"),
      Field("WARC-Target-URI", "urn:example:test")) ++
      extra.map { case (n, v) => Field(n, v) }

  private def kinds(fields: Seq[Field]): Seq[String] =
    VerifyOp.checkFields(fields).map(_._1)

  test("clean records of every known type verify clean") {
    assert(kinds(base("resource")).isEmpty)
    assert(kinds(base("response")).isEmpty)
    assert(kinds(base("revisit", "WARC-Profile" ->
      "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest")).isEmpty)
  }

  test("revisit requires a profile; <>-wrapped profile is bad spec (verify.rs:620-629)") {
    assert(kinds(base("revisit")) == Seq("missing_profile"))
    assert(kinds(base("revisit", "WARC-Profile" -> "<http://p>")) == Seq("bad_spec_profile"))
  }

  test("Refers-To-Target-URI/Date only on revisit (verify.rs:510-550)") {
    assert(kinds(base("response", "WARC-Refers-To-Target-URI" -> "urn:a"))
      == Seq("prohibited_field"))
    assert(kinds(base("revisit", "WARC-Profile" -> "p",
      "WARC-Refers-To-Target-URI" -> "urn:a",
      "WARC-Refers-To-Date" -> "2025-01-01T00:00:00Z")).isEmpty)
    assert(kinds(base("revisit", "WARC-Profile" -> "p",
      "WARC-Refers-To-Date" -> "junk")) == Seq("invalid_date"))
  }

  test("mandatory fields, unknown type, strict content-length, dates") {
    assert(kinds(Seq(Field("WARC-Type", "resource"))).toSet ==
      Set("missing_mandatory_field", "missing_target_uri"))
    assert(kinds(base("bogus")).contains("unknown_record_type"))
    assert(kinds(base("resource").map(f =>
      if (f.name == "Content-Length") Field(f.name, "+12") else f))
      == Seq("invalid_content_length"))
    assert(kinds(base("resource").map(f =>
      if (f.name == "WARC-Date") Field(f.name, "2025-13-45T99:00:00Z") else f))
      == Seq("invalid_date"))
  }

  test("segment / truncated / filename / ip prohibitions") {
    assert(kinds(base("continuation")).toSet ==
      Set("missing_segment_number", "missing_segment_origin"))
    assert(kinds(base("resource", "WARC-Segment-Total-Length" -> "5"))
      == Seq("prohibited_field"))
    assert(kinds(base("resource", "WARC-Truncated" -> "because"))
      == Seq("invalid_truncated_reason"))
    assert(kinds(base("resource", "WARC-Truncated" -> "LENGTH")).isEmpty)
    assert(kinds(base("resource", "WARC-Filename" -> "x.warc"))
      == Seq("prohibited_field"))
    assert(kinds(base("conversion", "WARC-IP-Address" -> "10.0.0.1"))
      == Seq("prohibited_field"))
    assert(kinds(base("response", "WARC-IP-Address" -> "10.0.0.999"))
      == Seq("invalid_ip_address"))
  }

  test("IP literal grammar: real IPv6 incl. IPv4-mapped; colon garbage rejected") {
    import graft.core.FieldOps.isValidIp
    // valid v6 forms the old [0-9A-Fa-f:]+ stand-in mishandled
    for (ip <- Seq("::", "::1", "fe80::1", "2001:db8::8a2e:370:7334",
                   "1:2:3:4:5:6:7:8", "::ffff:192.0.2.128",
                   "1:2:3:4:5:6:192.0.2.128", "10.0.0.1"))
      assert(isValidIp(ip), ip)
    for (ip <- Seq(":::::", ":", "1::2::3", "1:2:3:4:5:6:7:8:9",
                   "1:2:3:4:5:6:7", "12345::", "g::1", "::ffff:192.0.2.999",
                   "1.2.3", "", "example.test", "::ffff:1.2.3.4:5"))
      assert(!isValidIp(ip), ip)
    assert(kinds(base("response", "WARC-IP-Address" -> "::ffff:192.0.2.128")).isEmpty)
    assert(kinds(base("response", "WARC-IP-Address" -> ":::::"))
      == Seq("invalid_ip_address"))
  }

  test("case-insensitive multimap semantics: first match wins, any casing") {
    val f = base("resource").map(x =>
      if (x.name == "WARC-Type") Field("wArC-tYpE", "resource") else x)
    assert(kinds(f).isEmpty)
  }
}
