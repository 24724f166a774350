package graft.tools

import graft.frontier.Scheduler
import graft.synth.Synth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: time each stage of the frontier round at two core counts. */
object ScalingProbe {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", 2 * cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](label: String, f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val n = 4000000
    val nHosts = 10000
    for (cores <- Seq(32, 8, 32, 8, 16, 4, 2)) {
      val spark = session(cores)
      println(s"--- cores=$cores ---")
      time(s"synth-only c=$cores", Synth.frontierSeed(spark, n, nHosts).toDF().count())
      val frontier = Synth.frontierSeed(spark, n, nHosts).toDF()
        .select(col("url"), col("priority_band"))
      time(s"canonicalize c=$cores",
        Scheduler.canonicalize(frontier).count())
      time(s"dedupe c=$cores",
        Scheduler.dedupeWithinBatch(Scheduler.canonicalize(frontier)).count())
      val robots = Synth.robots(spark, nHosts).toDF()
      val seen = Scheduler.loadSeen(spark, "/tmp/graft-bench-none")
      time(s"fullround c=$cores",
        Scheduler.runRound(frontier, seen, robots).count())
      time(s"fullround2 c=$cores",
        Scheduler.runRound(frontier, seen, robots).count())
      spark.stop()
    }
  }
}
