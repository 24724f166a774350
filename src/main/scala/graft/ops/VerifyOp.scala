package graft.ops

import graft.core.FieldOps._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The verify rule engine (reference src/verify.rs): per-record checks
  * compile to ONE `select` producing an array<struct(kind, detail)> that
  * Catalyst fuses into a single codegen stage; cross-record checks are the
  * two joins the reference hides in redb cursor batches:
  * reference-integrity LEFT ANTI (J1, verify.rs:230-264) and segment
  * reassembly aggregation (J2, verify.rs:266-319).
  *
  * Problem kinds mirror verify.rs:77-110 (snake_cased).
  */
object VerifyOp {

  val KnownTypes: Seq[String] = Seq(
    "warcinfo", "response", "resource", "request", "metadata",
    "revisit", "conversion", "continuation")

  private def problem(cond: Column, kind: String, detail: Column): Column =
    when(cond, struct(lit(kind).as("kind"), detail.as("detail")))

  private def problem(cond: Column, kind: String, detail: String): Column =
    problem(cond, kind, lit(detail))

  /** All per-record checks over a records DF(position, fields, ...).
    * Returns the input plus `problems: array<struct(kind, detail)>`.
    * Check selection mirrors `Check::all()` (verify.rs:52-75).
    */
  def checkRecords(records: DataFrame): DataFrame = {
    // Materialize every header lookup ONCE into intermediate columns: the
    // checks below reference each value several times, and re-inlining the
    // array-lambda fieldGet per use would traverse the fields array ~60×
    // per row (measured ~4× slower end-to-end). CollapseProject keeps
    // non-cheap aliases used more than once, so these stay single-eval.
    val f = col("fields")
    val staged = records.withColumns(Map(
      "_rec_type" -> lower(fieldGet(f, "WARC-Type")),
      "_clen" -> fieldGet(f, "Content-Length"),
      "_date" -> fieldGet(f, "WARC-Date"),
      "_ctype" -> fieldGet(f, "Content-Type"),
      "_uri" -> fieldGet(f, "WARC-Target-URI"),
      "_ip" -> fieldGet(f, "WARC-IP-Address"),
      "_truncated" -> fieldGet(f, "WARC-Truncated"),
      "_filename" -> fieldGet(f, "WARC-Filename"),
      "_seg_num" -> fieldGet(f, "WARC-Segment-Number"),
      "_seg_origin" -> fieldGet(f, "WARC-Segment-Origin-ID"),
      "_seg_total" -> fieldGet(f, "WARC-Segment-Total-Length"),
      "_has_type" -> fieldContains(f, "WARC-Type"),
      "_has_concurrent" -> fieldContains(f, "WARC-Concurrent-To"),
      "_has_refers" -> fieldContains(f, "WARC-Refers-To")
    ))
    val recType = col("_rec_type")
    val clen = col("_clen")
    val date = col("_date")
    val ctype = col("_ctype")
    val uri = col("_uri")
    val ip = col("_ip")
    val truncated = col("_truncated")
    val filename = col("_filename")
    val segNum = col("_seg_num")
    val segOrigin = col("_seg_origin")
    val segTotal = col("_seg_total")

    def isType(ts: String*): Column = recType.isin(ts: _*)

    // MandatoryFields (verify.rs:414-437)
    val mandatory = Seq(
      problem(!fieldContains(f, "WARC-Record-ID"), "missing_mandatory_field", "WARC-Record-ID"),
      problem(clen.isNull, "missing_mandatory_field", "Content-Length"),
      problem(date.isNull, "missing_mandatory_field", "WARC-Date"),
      problem(!col("_has_type"), "missing_mandatory_field", "WARC-Type"))
    val checks: Seq[Column] = mandatory ++ Seq(
      problem(col("_has_type") && !recType.isin(KnownTypes: _*),
        "unknown_record_type", recType),
      problem(clen.isNotNull && !clen.rlike("^[0-9]+$"), "invalid_content_length", clen),
      problem(date.isNotNull &&
        try_to_timestamp(date, lit("yyyy-MM-dd'T'HH:mm:ssXXX")).isNull &&
        try_to_timestamp(date, lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")).isNull,
        "invalid_date", date),
      // ContentType: media-type must parse (verify.rs:439-445)
      problem(ctype.isNotNull && !mediaType(ctype).getField("ok"), "invalid_content_type", ctype),
      // ConcurrentTo prohibited on warcinfo/conversion/continuation (447-468)
      problem(col("_has_concurrent") &&
        isType("warcinfo", "conversion", "continuation"),
        "prohibited_field", "WARC-Concurrent-To"),
      // IpAddress prohibited + must parse (470-480)
      problem(ip.isNotNull && isType("warcinfo", "conversion", "continuation"),
        "prohibited_field", "WARC-IP-Address"),
      problem(ip.isNotNull && !(ipParses(ip)), "invalid_ip_address", ip),
      // RefersTo prohibited on 5 types (482-508)
      problem(col("_has_refers") &&
        isType("warcinfo", "response", "resource", "request", "continuation"),
        "prohibited_field", "WARC-Refers-To"),
      // TargetUri: prohibited on warcinfo; required on 6 types; <> = bad spec (552-581)
      problem(uri.isNotNull && isType("warcinfo"), "prohibited_field", "WARC-Target-URI"),
      problem(uri.isNull && isType("response", "resource", "request", "revisit",
        "conversion", "continuation"), "missing_target_uri", recType),
      problem(uri.isNotNull && uri.startsWith("<") && uri.endsWith(">"),
        "bad_spec_uri", uri),
      problem(uri.isNotNull && !uri.startsWith("<") && !urlParses(uri), "invalid_uri", uri),
      // Truncated reason whitelist (583-591)
      problem(truncated.isNotNull &&
        !lower(truncated).isin("length", "time", "disconnect", "unspecified"),
        "invalid_truncated_reason", truncated),
      // Filename only on warcinfo (612-618)
      problem(filename.isNotNull && !isType("warcinfo"), "prohibited_field", "WARC-Filename"),
      // Segment: continuation requires all three; others prohibit (631-726)
      problem(isType("continuation") && segNum.isNull, "missing_segment_number", recType),
      problem(isType("continuation") && segOrigin.isNull, "missing_segment_origin", recType),
      problem(!isType("continuation") && segNum.isNotNull && !(segNum === "1"),
        "prohibited_field", "WARC-Segment-Number"),
      problem(!isType("continuation") && segTotal.isNotNull,
        "prohibited_field", "WARC-Segment-Total-Length")
    )
    staged
      .withColumn("problems", filter(array(checks: _*), p => p.isNotNull))
      .drop(staged.columns.filter(_.startsWith("_")): _*)
  }

  /** Explode to a Problem dataset (position, record_id, kind, detail). */
  def problems(records: DataFrame): DataFrame =
    checkRecords(records)
      .select(col("position"),
        coalesce(fieldGet(col("fields"), "WARC-Record-ID"), lit("")).as("record_id"),
        explode(col("problems")).as("p"))
      .select(col("position"), col("record_id"),
        col("p.kind").as("kind"), col("p.detail").as("detail"))

  /** J1 — reference-integrity anti-join (verify.rs:230-264): every
    * (record → target id) reference whose target is not a known record id
    * is a `referenced_record_missing` problem. `refFields` lists the
    * reference-carrying headers (Concurrent-To / Refers-To / Warcinfo-ID).
    */
  def missingReferences(records: DataFrame,
                        refFields: Seq[String] = Seq(
                          "WARC-Concurrent-To", "WARC-Refers-To", "WARC-Warcinfo-ID")): DataFrame = {
    val ids = records.select(
      fieldGet(col("fields"), "WARC-Record-ID").as("target_id")).where(col("target_id").isNotNull)
    val refs = refFields.map { rf =>
      records.select(col("position"),
        fieldGet(col("fields"), "WARC-Record-ID").as("record_id"),
        explode(fieldGetAll(col("fields"), rf)).as("target_id"),
        lit(rf).as("via"))
    }.reduce(_ unionByName _)
    refs.join(ids.distinct(), Seq("target_id"), "left_anti")
      .select(col("position"), col("record_id"),
        lit("referenced_record_missing").as("kind"),
        concat(col("via"), lit(" -> "), col("target_id")).as("detail"))
  }

  /** J2 — segment reassembly check (verify.rs:266-319): group continuation
    * chains by origin id; numbers must be contiguous 1..n
    * (`missing_segment`) and sum(len) must equal the declared total on the
    * last segment (`mismatched_segment_length`).
    */
  def segmentProblems(records: DataFrame): DataFrame = {
    val f = col("fields")
    val segs = records.select(
      coalesce(fieldGet(f, "WARC-Segment-Origin-ID"),
        when(fieldGet(f, "WARC-Segment-Number") === "1", fieldGet(f, "WARC-Record-ID")))
        .as("origin_id"),
      getU64Strict(f, "WARC-Segment-Number").as("n"),
      getU64Strict(f, "Content-Length").as("len"),
      getU64Strict(f, "WARC-Segment-Total-Length").as("total_len"))
      .where(col("origin_id").isNotNull && col("n").isNotNull)
    val agg = segs.groupBy("origin_id").agg(
      count(lit(1)).as("n_segs"),
      max("n").as("max_n"),
      sum("len").as("sum_len"),
      max("total_len").as("total_len"))
    val gap = agg.where(col("max_n") =!= col("n_segs"))
      .select(col("origin_id"), lit("missing_segment").as("kind"),
        concat(lit("have "), col("n_segs"), lit(" of "), col("max_n")).as("detail"))
    val badLen = agg.where(col("total_len").isNotNull && col("sum_len") =!= col("total_len"))
      .select(col("origin_id"), lit("mismatched_segment_length").as("kind"),
        concat(col("sum_len"), lit(" != "), col("total_len")).as("detail"))
    gap.unionByName(badLen)
  }
}
