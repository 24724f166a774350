package graft

import graft.frontier.Scheduler
import graft.synth.Synth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One isolated frontier-round measurement: fresh JVM (spawned by Bench),
  * one SparkSession, one warm-up round, one timed round. Prints
  * `ROUND_SEC=<seconds>` on stdout. Args: cores n nHosts [shufflePartitions].
  */
object BenchRound {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toInt
    val nHosts = args(2).toInt
    val parts = if (args.length > 3) args(3).toInt else 64
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def round(rows: Int): Long = {
      val frontier = Synth.frontierSeed(spark, rows, nHosts).toDF()
        .select(col("url"), col("priority_band"))
      val robots = Synth.robots(spark, nHosts).toDF()
      val seen = Scheduler.loadSeen(spark, "/tmp/graft-bench-none")
      Scheduler.runRound(frontier, seen, robots).count()
    }

    round(n / 4) // JIT/codegen + heap-expansion warm-up. n/8 was tried and
                 // REVERTED: a 2M warm-up leaves the (lazily grown) heap
                 // far below the 16M round's working size, and the timed
                 // round then GC-walls at 8-core allocation rates
                 // (measured 5×: 17 s → ~100 s)
    val t0 = System.nanoTime()
    val scheduled = round(n)
    val sec = (System.nanoTime() - t0) / 1e9
    // Locale.US: a comma-decimal default locale would break the parent's
    // "[0-9.]+" match and abort the whole bench
    println("ROUND_SEC=%.4f ROUND_ROWS=%d"
      .formatLocal(java.util.Locale.US, sec, scheduled))
    spark.stop()
  }
}
