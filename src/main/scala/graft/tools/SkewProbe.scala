package graft.tools

import graft.frontier.Scheduler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-host skew probe: times one frontier round over a frontier where
  * ONE host owns half the URLs — uncapped (the politeness window sorts
  * the hot host in a single reducer) vs capped
  * (Politeness.capPerHost two-phase top-k). Args: [n] [capBatches].
  * Prints SKEW_UNCAPPED_SEC / SKEW_CAPPED_SEC / rows.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 4000000
    val capBatches = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // half the frontier on one host, the rest across 10k hosts
    def frontier = spark.range(n).select(
      when(col("id") % 2 === 0,
        concat(lit("https://hot.example.test/p/"), col("id")))
        .otherwise(concat(lit("https://h"), pmod(col("id"), lit(10000)),
          lit(".example.test/p/"), col("id"))).as("url"),
      pmod(col("id"), lit(4)).cast("int").as("priority_band"))
    val robots = spark.range(0).select(lit("x").as("host"),
      lit(1000).as("crawl_delay_ms"), array().cast("array<string>").as("disallow_prefixes"))
    val seen = Scheduler.loadSeen(spark, "/tmp/graft-skew-none")

    def time(maxPerHost: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = Scheduler.runRound(frontier, seen, robots,
        maxPerHostPerRound = maxPerHost).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    time(100 * capBatches) // warm-up
    val (cappedSec, cappedRows) = time(100 * capBatches)
    val (uncappedSec, uncappedRows) = time(0)
    println("SKEW_CAPPED_SEC=%.2f ROWS=%d".formatLocal(java.util.Locale.US, cappedSec, cappedRows))
    println("SKEW_UNCAPPED_SEC=%.2f ROWS=%d".formatLocal(java.util.Locale.US, uncappedSec, uncappedRows))
    spark.stop()
  }
}
