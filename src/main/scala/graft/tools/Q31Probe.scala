package graft.tools

import graft.SparkEntry
import graft.ops.VerifyOp
import org.apache.spark.sql.SparkSession

object Q31Probe {
  private def time[A](label: String, f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirty = SparkEntry.dirtyRecordsFor(spark, "/root/testdata/sf0.1")
    time("dirty-count", dirty.count())
    time("problems", VerifyOp.problems(dirty).count())
    time("problems2", VerifyOp.problems(dirty).count())
    time("missing-refs", VerifyOp.missingReferences(dirty, Seq("WARC-Refers-To")).count())

    // hypothesis isolation
    import org.apache.spark.sql.functions._
    import graft.core.FieldOps._
    val f = col("fields")
    time("fieldgets-only", dirty.select(
      lower(fieldGet(f, "WARC-Type")).as("a"), fieldGet(f, "Content-Length").as("b"),
      fieldGet(f, "WARC-Date").as("c"), fieldGet(f, "Content-Type").as("d"),
      fieldGet(f, "WARC-Target-URI").as("e"), fieldGet(f, "WARC-IP-Address").as("g"),
      fieldGet(f, "WARC-Truncated").as("h"), fieldGet(f, "WARC-Filename").as("i"),
      fieldGet(f, "WARC-Segment-Number").as("j"),
      fieldGet(f, "WARC-Segment-Origin-ID").as("k"),
      fieldGet(f, "WARC-Segment-Total-Length").as("l"))
      .where(col("a").isNotNull).count())
    val date = fieldGet(f, "WARC-Date")
    time("date-try-ts", dirty.select(
      (try_to_timestamp(date, lit("yyyy-MM-dd'T'HH:mm:ssXXX")).isNull &&
        try_to_timestamp(date, lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")).isNull).as("bad"))
      .where(col("bad")).count())
    time("date-regex", dirty.select(
      (!date.rlike("^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?(Z|[+-]\\d{2}:\\d{2})$")).as("bad"))
      .where(col("bad")).count())
    val mt = fieldGet(f, "Content-Type")
    time("mediatype", dirty.select(mediaType(mt).getField("ok").as("ok"))
      .where(!col("ok")).count())
    spark.stop()
  }
}
