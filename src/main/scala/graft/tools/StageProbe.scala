package graft.tools

import graft.frontier.{Politeness, Scheduler}
import graft.synth.Synth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level scaling diagnosis: time each cumulative prefix of the
  * frontier round in one JVM. Args: cores [n] [parts] [trials].
  * Prints STAGE <name> <sec> lines (min over trials, after warm-up).
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = if (args.length > 1) args(1).toInt else 16000000
    val parts = if (args.length > 2) args(2).toInt else 64
    val trials = if (args.length > 3) args(3).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def frontier = Synth.frontierSeed(spark, n, 10000).toDF()
      .select(col("url"), col("priority_band"))
    val robots = Synth.robots(spark, 10000).toDF()
    val seen = Scheduler.loadSeen(spark, "/tmp/graft-stage-none")

    val stages: Seq[(String, () => Long)] = Seq(
      "synth" -> (() => frontier.count()),
      "canon" -> (() => Scheduler.canonicalize(frontier).count()),
      "dedupe" -> (() => Scheduler.dedupeWithinBatch(Scheduler.canonicalize(frontier)).count()),
      "robots" -> (() => Politeness.applyRobots(
        Scheduler.dedupeWithinBatch(Scheduler.canonicalize(frontier)), robots).count()),
      "window" -> (() => Politeness.schedule(Politeness.applyRobots(
        Scheduler.dedupeWithinBatch(Scheduler.canonicalize(frontier)), robots)).count()),
      "full" -> (() => Scheduler.runRound(frontier, seen, robots).count()))

    // warm-up: full round at n/8
    Scheduler.runRound(Synth.frontierSeed(spark, n / 8, 10000).toDF()
      .select(col("url"), col("priority_band")), seen, robots).count()

    stages.foreach { case (name, f) =>
      val secs = (1 to trials).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println("STAGE %s c=%d %.2f (all: %s)".formatLocal(java.util.Locale.US,
        name, cores, secs.min, secs.map(s => "%.2f".formatLocal(java.util.Locale.US, s)).mkString(",")))
    }
    spark.stop()
  }
}
