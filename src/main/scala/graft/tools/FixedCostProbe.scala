package graft.tools

import graft.frontier.Scheduler
import graft.synth.Synth
import org.apache.spark.sql.SparkSession

/** Decompose the frontier round's FIXED per-round cost f (the term that
  * Amdahl-caps the bench's low/high-core ratio: eff = (f+W)/(4f+W)).
  * Components probed per round, on the bucketed exchange-free path:
  *   - dfbuild: DataFrame construction (analysis)
  *   - plan:    queryExecution.executedPlan materialization (optimizer +
  *              physical planning — driver-side, core-count-invariant)
  *   - exec:    first count() on the planned df
  *   - reexec:  count() again on the SAME df (plan + codegen cached) —
  *              fresh-round exec minus reexec isolates nothing further,
  *              but reexec vs exec shows any first-execution-only cost.
  * Args: cores [n]. Env: SPARK_GRAFT_FRONTIER_BUCKETED (required).
  */
object FixedCostProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = if (args.length > 1) args(1).toInt else 10000000
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = sys.env("SPARK_GRAFT_FRONTIER_BUCKETED")
    spark.sql("DROP TABLE IF EXISTS graft_bench_frontier")
    spark.sql("CREATE TABLE graft_bench_frontier " +
      "(url STRING, priority_band INT, host STRING) USING parquet " +
      s"CLUSTERED BY (host) INTO 64 BUCKETS LOCATION '$path'")
    val robotsBc = graft.frontier.Politeness.robotsBroadcast(
      Synth.robots(spark, 10000).toDF())
    val seen = Scheduler.loadSeen(spark, "/tmp/graft-bench-none")
    val knownHot = Some(Scheduler.hotHosts(spark.table("graft_bench_frontier")))

    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    // warm-up: two full rounds (JIT + codegen + heap)
    for (_ <- 1 to 2)
      Scheduler.runRoundCached(spark.table("graft_bench_frontier"), seen,
        robotsBc, frontierHostClustered = true, knownHotHosts = knownHot).count()

    for (trial <- 1 to 3) {
      val (tBuild, df) = t(Scheduler.runRoundCached(
        spark.table("graft_bench_frontier"), seen, robotsBc,
        frontierHostClustered = true, knownHotHosts = knownHot))
      val (tPlan, _) = t(df.queryExecution.executedPlan)
      val (tExec, _) = t(df.count())
      val (tReexec, _) = t(df.count())
      println(("FIXED c=%d trial=%d dfbuild=%.3f plan=%.3f exec=%.3f " +
        "reexec=%.3f").formatLocal(java.util.Locale.US,
        cores, trial, tBuild, tPlan, tExec, tReexec))
    }
    spark.stop()
  }
}
