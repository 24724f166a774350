package graft.tools

import graft.frontier.{Canonical, Politeness, Scheduler}
import graft.synth.Synth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose the `full - batches` gap StageProbe exposed at 40M (3.1 s
  * at 10M vs 16.7 s at 4x the rows, both c4): how much is the hot-host
  * leg activating (over-cap hosts exist at 40M but not 10M?), how much
  * is url_key/host_hash derivation, how much is finish()'s
  * sortWithinPartitions. Args: cores n [parts]. Reuses StageProbe's
  * bucketed fixture path.
  *
  * Piecewise legs are consumed via `queryExecution.toRdd.count()`, NOT
  * `Dataset.count()`: count() plans an agg on top, which column-prunes
  * the politeness window away whenever host_seq/scheduled_ms go
  * unreferenced and EliminateSorts drops sortWithinPartitions — the
  * original count()-based legs timed "sched+keys" WITHOUT its window
  * while the CAPFILTER leg (whose filter references host_seq) kept it,
  * so their delta was the window's entire cost misread as the cap
  * filter's. toRdd executes the plan exactly as written.
  */
object FullGapProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toInt
    val parts = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val srcPath = s"/tmp/graft-stage-frontier-$n-bucketed"
    require(new java.io.File(srcPath, "_SUCCESS").isFile, s"run StageProbe $cores $n first")
    spark.sql("DROP TABLE IF EXISTS graft_stage_frontier")
    spark.sql("CREATE TABLE graft_stage_frontier " +
      "(url STRING, priority_band INT, host STRING) USING parquet " +
      s"CLUSTERED BY (host) INTO $parts BUCKETS LOCATION '$srcPath'")
    val frontier = spark.table("graft_stage_frontier")

    // 1. host-count distribution vs the default cap (100*100)
    val cap = 100 * Scheduler.DefaultMaxBatchesPerHost
    val counts = frontier.groupBy("host").agg(count(lit(1)).as("c"))
      .agg(max("c").as("max"), expr(s"count_if(c > $cap)").as("over"),
        expr(s"sum(if(c > $cap, c, 0))").as("hot_rows"), count(lit(1)).as("hosts")).head()
    println(s"HOSTDIST n=$n max=${counts.getLong(0)} hostsOverCap=${counts.getLong(1)} " +
      s"hotRows=${counts.getLong(2)} hosts=${counts.getLong(3)} cap=$cap")

    val robotsBc = Politeness.robotsBroadcast(Synth.robots(spark, 10000).toDF())
    val knownHot = Scheduler.hotHosts(frontier)
    println(s"KNOWNHOT ${knownHot.length}")
    val seen = Scheduler.loadSeen(spark, "/tmp/graft-stage-none")

    def t(label: String)(f: => Long): Unit = {
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println("GAP %s c=%d %.2f (all: %s)".formatLocal(java.util.Locale.US,
        label, cores, secs.min, secs.map(s => "%.2f".formatLocal(java.util.Locale.US, s)).mkString(",")))
    }

    // warm
    Scheduler.runRoundCached(Synth.frontierSeed(spark, n / 8, 10000).toDF()
      .select(col("url"), col("priority_band")), seen, robotsBc).count()

    // full round with the hot leg forced EMPTY (cap above max host count)
    t("full(noHot)") {
      Scheduler.runRoundCached(frontier, seen, robotsBc,
        maxPerHostPerRound = Int.MaxValue,
        frontierHostClustered = true, knownHotHosts = Some(Array.empty)).count()
    }
    // full round as the bench runs it
    t("full(knownHot)") {
      Scheduler.runRoundCached(frontier, seen, robotsBc,
        frontierHostClustered = true, knownHotHosts = Some(knownHot)).count()
    }
    t("full(noHot)2") {
      Scheduler.runRoundCached(frontier, seen, robotsBc,
        maxPerHostPerRound = Int.MaxValue,
        frontierHostClustered = true, knownHotHosts = Some(Array.empty)).count()
    }
    // batches-stage twin + key derivation + the finish sort, piecewise
    def scheduled = Politeness.schedule(Politeness.applyRobotsMap(
      Scheduler.dedupeWithinHostAgg(
        frontier.withColumn("canonical_url", Canonical.canonicalUrl(col("url")))), robotsBc))
    def keyed = scheduled
      .withColumn("url_key", Canonical.urlKey(col("canonical_url")))
      .withColumn("host_hash", Canonical.hostHash(col("host")))
    def consume(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    t("sched+keys") { consume(keyed) }
    t("sched+CAPFILTER+keys") {
      consume(Politeness.schedule(Politeness.applyRobotsMap(
        Scheduler.dedupeWithinHostAgg(
          frontier.withColumn("canonical_url", Canonical.canonicalUrl(col("url")))), robotsBc))
        .where(col("host_seq") <= 10000)
        .withColumn("url_key", Canonical.urlKey(col("canonical_url")))
        .withColumn("host_hash", Canonical.hostHash(col("host"))))
    }
    t("sched+keys+batches") { consume(Politeness.fetchBatches(keyed, 100)) }
    t("sched+keys+batches+sort") {
      consume(Politeness.fetchBatches(keyed, 100)
        .sortWithinPartitions("priority_band", "scheduled_ms", "host_hash", "canonical_url"))
    }
    spark.stop()
  }
}
