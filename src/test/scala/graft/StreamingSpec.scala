package graft

import graft.streaming.FrontierStream
import graft.streaming.FrontierStream.{ScheduledUrl, StreamUrl}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  private def u(host: String, n: Int, band: Int = 0, atSec: Long = 0) =
    StreamUrl(s"https://$host/p/$n", host, band, 100L, ts(atSec))

  test("stateful politeness continues host_seq across micro-batches") {
    val input = MemoryStream[StreamUrl](spark)
    val q = FrontierStream.politenessSchedule(input.toDS())
      .writeStream.format("memory").queryName("sched")
      .outputMode("append").start()
    try {
      input.addData(u("a.test", 1), u("a.test", 2), u("b.test", 1))
      q.processAllAvailable()
      input.addData(u("a.test", 3), u("b.test", 2, band = 1))
      q.processAllAvailable()
      val rows = spark.table("sched").as[ScheduledUrl].collect()
        .map(r => (r.host, r.canonical_url, r.host_seq, r.scheduled_ms)).sorted
      assert(rows.toSeq == Seq(
        ("a.test", "https://a.test/p/1", 1L, 0L),
        ("a.test", "https://a.test/p/2", 2L, 100L),
        ("a.test", "https://a.test/p/3", 3L, 200L), // batch 2 continues at 3
        ("b.test", "https://b.test/p/1", 1L, 0L),
        ("b.test", "https://b.test/p/2", 2L, 100L)))
    } finally q.stop()
  }

  test("streaming seen-dedupe emits first sightings only, state survives batches") {
    import graft.streaming.FrontierStream.KeyedUrl
    val input = MemoryStream[KeyedUrl](spark)
    def k(n: Long) = KeyedUrl(n * 7919L, s"https://h.test/p/$n", 0)
    val q = FrontierStream.seenDedupe(input.toDS(), numBuckets = 4,
        expectedPerBucket = 1 << 10)
      .writeStream.format("memory").queryName("seen")
      .outputMode("append").start()
    try {
      input.addData(k(1), k(2), k(3), k(2)) // in-batch dup of 2
      q.processAllAvailable()
      val b1 = spark.table("seen").as[KeyedUrl].collect().map(_.canonical_url).sorted
      assert(b1.toSeq == Seq(1, 2, 3).map(n => s"https://h.test/p/$n"))
      input.addData(k(2), k(3), k(4), k(5)) // 2,3 seen in batch 1
      q.processAllAvailable()
      val all = spark.table("seen").as[KeyedUrl].collect().map(_.canonical_url).sorted
      assert(all.toSeq == Seq(1, 2, 3, 4, 5).map(n => s"https://h.test/p/$n"))
    } finally q.stop()
  }

  test("within-batch order is (priority_band, canonical_url) — batch parity") {
    val input = MemoryStream[StreamUrl](spark)
    val q = FrontierStream.politenessSchedule(input.toDS())
      .writeStream.format("memory").queryName("sched2")
      .outputMode("append").start()
    try {
      // arrival order deliberately scrambled; band 0 must schedule first
      input.addData(u("c.test", 9, band = 1), u("c.test", 5, band = 0),
        u("c.test", 7, band = 0))
      q.processAllAvailable()
      val rows = spark.table("sched2").as[ScheduledUrl].collect().sortBy(_.host_seq)
      assert(rows.map(_.canonical_url).toSeq == Seq(
        "https://c.test/p/5", "https://c.test/p/7", "https://c.test/p/9"))
    } finally q.stop()
  }

  test("watermarked windowed per-host counts aggregate event-time") {
    val input = MemoryStream[StreamUrl](spark)
    val counts = FrontierStream.hostWindowCounts(
      input.toDS().toDF(), windowLen = "1 minute", watermark = "1 minute")
    val q = counts.writeStream.format("memory").queryName("wins")
      .outputMode("complete").start()
    try {
      input.addData(u("d.test", 1, atSec = 0), u("d.test", 2, atSec = 30),
        u("d.test", 3, atSec = 90), u("e.test", 1, atSec = 10))
      q.processAllAvailable()
      val rows = spark.table("wins")
        .select(col("host"), col("n_urls")).as[(String, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(rows == Map("d.test" -> 3L, "e.test" -> 1L))
      // d.test spans two 1-minute windows
      assert(spark.table("wins").where(col("host") === "d.test").count() == 2)
    } finally q.stop()
  }

  test("streaming canonicalize matches the batch contract") {
    val input = MemoryStream[(String, Int)](spark)
    val canon = FrontierStream.canonicalize(
      input.toDS().toDF("url", "priority_band"))
    val q = canon.writeStream.format("memory").queryName("canon")
      .outputMode("append").start()
    try {
      input.addData(("https://EX.com:443/a?b=2&a=1#f", 0))
      q.processAllAvailable()
      val row = spark.table("canon").select("canonical_url", "host").head
      assert(row.getString(0) == "https://ex.com/a?a=1&b=2")
      assert(row.getString(1) == "ex.com")
    } finally q.stop()
  }
}
