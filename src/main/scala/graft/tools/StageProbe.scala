package graft.tools

import graft.frontier.{Canonical, Politeness, Scheduler}
import graft.synth.Synth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level scaling diagnosis over the BENCH path (probe-free fused
  * cold round, crawl-lifetime robots broadcast — what BenchRound runs):
  * times each cumulative prefix in one JVM. Args: cores [n] [parts]
  * [trials]. Env: SPARK_GRAFT_AQE (default false, matching BenchRound),
  * SPARK_GRAFT_SRC=synth|parquet (frontier from the generator each
  * round, or scanned from a once-written parquet — the shape a real
  * round reading an Iceberg frontier table has).
  * Prints STAGE <name> <sec> lines (min over trials, after warm-up).
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = if (args.length > 1) args(1).toInt else 8000000
    val parts = if (args.length > 2) args(2).toInt else 64
    val trials = if (args.length > 3) args(3).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val robotsBc = Politeness.robotsBroadcast(Synth.robots(spark, 10000).toDF())
    val seen = Scheduler.loadSeen(spark, "/tmp/graft-stage-none")

    val srcMode = sys.env.getOrElse("SPARK_GRAFT_SRC", "synth")
    val parquetSrc = srcMode == "parquet" || srcMode == "bucketed"
    val bucketedSrc = srcMode == "bucketed"
    val srcPath =
      if (bucketedSrc) s"/tmp/graft-stage-frontier-$n-bucketed"
      else s"/tmp/graft-stage-frontier-$n"
    if (bucketedSrc) {
      if (!new java.io.File(srcPath, "_SUCCESS").isFile) {
        spark.sql("DROP TABLE IF EXISTS graft_stage_frontier_src")
        Synth.frontierSeed(spark, n, 10000).toDF()
          .select(col("url"), col("priority_band"))
          .withColumn("host", Canonical.hostOf(col("url")))
          .repartition(parts, col("host"))
          .write.mode("overwrite").bucketBy(parts, "host")
          .option("path", srcPath).saveAsTable("graft_stage_frontier_src")
      }
      spark.sql("DROP TABLE IF EXISTS graft_stage_frontier")
      spark.sql("CREATE TABLE graft_stage_frontier " +
        "(url STRING, priority_band INT, host STRING) USING parquet " +
        s"CLUSTERED BY (host) INTO $parts BUCKETS LOCATION '$srcPath'")
    } else if (parquetSrc) {
      // same shape as the bench frontier table: host materialized,
      // fixed 64-way layout (see Bench's frontierTablePath write)
      Synth.frontierSeed(spark, n, 10000).toDF()
        .select(col("url"), col("priority_band"))
        .withColumn("host", Canonical.hostOf(col("url")))
        .repartition(64)
        .write.mode("overwrite").parquet(srcPath)
    }
    def frontier =
      if (bucketedSrc) spark.table("graft_stage_frontier")
      else if (parquetSrc) spark.read.parquet(srcPath)
      else Synth.frontierSeed(spark, n, 10000).toDF()
        .select(col("url"), col("priority_band"))

    // the fused cold leg, piecewise (mirrors Scheduler.runRoundImpl's
    // probe-free branch minus the tiny hot leg); in parquet mode the
    // stored host column is trusted like the round does
    def withHost =
      if (parquetSrc) frontier
      else frontier.withColumn("host", Canonical.hostOf(col("url")))
    // bucketed source: the scan's hashpartitioning(host) already
    // satisfies every downstream distribution — no explicit exchange
    // (the exchange-free plan BenchRound measures)
    def exchanged =
      (if (bucketedSrc) withHost else withHost.repartition(col("host")))
        .withColumn("canonical_url", Canonical.canonicalUrl(col("url")))
    def deduped =
      if (parquetSrc) Scheduler.dedupeWithinHostAgg(exchanged)
      else Scheduler.dedupeWithinHost(exchanged)
    def robotted = Politeness.applyRobotsMap(deduped, robotsBc)
    def scheduled = Politeness.schedule(robotted)
    def batched = Politeness.fetchBatches(scheduled, 100)
    val knownHot: Option[Array[String]] =
      if (bucketedSrc) Some(Scheduler.hotHosts(frontier)) else None

    val stages: Seq[(String, () => Long)] = Seq(
      "synth" -> (() => frontier.count()),
      "host+exchange" -> (() =>
        (if (bucketedSrc) withHost else withHost.repartition(col("host"))).count()),
      "canon(post-ex)" -> (() => exchanged.count()),
      "win-dedupe" -> (() => deduped.count()),
      "robots" -> (() => robotted.count()),
      "window" -> (() => scheduled.count()),
      "batches" -> (() => batched.count()),
      "full" -> (() => Scheduler.runRoundCached(frontier, seen, robotsBc,
        frontierHostClustered = bucketedSrc, knownHotHosts = knownHot).count()))

    Scheduler.runRoundCached(Synth.frontierSeed(spark, n / 8, 10000).toDF()
      .select(col("url"), col("priority_band")), seen, robotsBc).count()
    if (parquetSrc) stages.last._2() // JIT the real scan path too

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
