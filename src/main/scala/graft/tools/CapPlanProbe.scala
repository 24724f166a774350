package graft.tools

import graft.frontier.{Politeness, Scheduler}
import graft.synth.Synth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Print the executed plan of the capped vs uncapped fused round over
  * the StageProbe bucketed fixture. Historical note: this probe was
  * written chasing a "26 s cap-filter premium" FullGapProbe appeared to
  * measure at 40M — that delta was an artifact of count()-pruned legs
  * (the uncapped leg's politeness window was column-pruned away while
  * the capped leg's host_seq reference kept it), i.e. it was the
  * window's cost, not the filter's; FullGapProbe now consumes plans via
  * toRdd so the legs are comparable. Args: n.
  */
object CapPlanProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val srcPath = s"/tmp/graft-stage-frontier-$n-bucketed"
    // CREATE TABLE ... LOCATION on a missing path "succeeds" with zero
    // rows and prints plans over an empty frontier — require the
    // StageProbe fixture instead of silently diagnosing nothing
    require(new java.io.File(srcPath, "_SUCCESS").isFile,
      s"fixture $srcPath missing — run StageProbe <cores> $n first")
    spark.sql("DROP TABLE IF EXISTS graft_stage_frontier")
    spark.sql("CREATE TABLE graft_stage_frontier " +
      "(url STRING, priority_band INT, host STRING) USING parquet " +
      s"CLUSTERED BY (host) INTO 64 BUCKETS LOCATION '$srcPath'")
    val frontier = spark.table("graft_stage_frontier")
    val robotsBc = Politeness.robotsBroadcast(Synth.robots(spark, 10000).toDF())
    val seen = Scheduler.loadSeen(spark, "/tmp/graft-stage-none")
    println("=== capped (cap=10000) ===")
    println(Scheduler.runRoundCached(frontier, seen, robotsBc,
      frontierHostClustered = true, knownHotHosts = Some(Array.empty))
      .queryExecution.executedPlan.toString.take(4000))
    println("=== uncapped (cap=MaxValue) ===")
    println(Scheduler.runRoundCached(frontier, seen, robotsBc,
      maxPerHostPerRound = Int.MaxValue,
      frontierHostClustered = true, knownHotHosts = Some(Array.empty))
      .queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
