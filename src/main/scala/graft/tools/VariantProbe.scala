package graft.tools

import graft.frontier.{Canonical, Politeness, Scheduler}
import graft.synth.Synth
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-variant A/B for the probe-free frontier round (one JVM,
  * min over trials): V0 = current full round; V1 = hash-agg dedupe
  * (groupBy(host, canonical_url) + packed-string min) instead of the
  * window dedupe; V2 = V0 without the finish layout sort (does the
  * sort execute under count()?); V3 = cold pipeline only (no hot split
  * machinery). Args: cores [n] [trials]. Env: SPARK_GRAFT_AQE,
  * SPARK_GRAFT_SRC=synth|parquet.
  */
object VariantProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = if (args.length > 1) args(1).toInt else 8000000
    val trials = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val robotsBc = Politeness.robotsBroadcast(Synth.robots(spark, 10000).toDF())
    val seen = Scheduler.loadSeen(spark, "/tmp/graft-variant-none")
    val parquetSrc = sys.env.get("SPARK_GRAFT_SRC").contains("parquet")
    val srcPath = s"/tmp/graft-bench-frontier-8m"
    def frontier =
      if (parquetSrc) spark.read.parquet(srcPath)
      else Synth.frontierSeed(spark, n, 10000).toDF()
        .select(col("url"), col("priority_band"))

    def coldPipeline(dedupe: DataFrame => DataFrame): DataFrame = {
      val exchanged = frontier
        .withColumn("host", Canonical.hostOf(col("url")))
        .repartition(col("host"))
        .withColumn("canonical_url", Canonical.canonicalUrl(col("url")))
      val sched = Politeness.schedule(
        Politeness.applyRobotsMap(dedupe(exchanged), robotsBc))
        .withColumn("url_key", Canonical.urlKey(col("canonical_url")))
        .withColumn("host_hash", Canonical.hostHash(col("host")))
      Politeness.fetchBatches(sched, 100)
    }

    def aggDedupe(df: DataFrame): DataFrame = {
      val packed = concat(lpad(col("priority_band").cast("string"), 5, "0"),
        coalesce(col("url"), lit("")))
      df.groupBy(col("host"), col("canonical_url"))
        .agg(min(packed).as("__p"))
        .select(col("host"), col("canonical_url"),
          substring(col("__p"), 1, 5).cast("int").as("priority_band"),
          substring(col("__p"), 6, Int.MaxValue).as("url"))
    }

    val variants: Seq[(String, () => Long)] = Seq(
      "V0-full" -> (() => Scheduler.runRoundCached(frontier, seen, robotsBc).count()),
      "V1-aggdedupe-cold" -> (() => coldPipeline(aggDedupe)
        .sortWithinPartitions("priority_band", "scheduled_ms", "host_hash", "canonical_url")
        .count()),
      "V2-cold-sorted" -> (() => coldPipeline(Scheduler.dedupeWithinHost)
        .sortWithinPartitions("priority_band", "scheduled_ms", "host_hash", "canonical_url")
        .count()),
      "V3-cold-nosort" -> (() => coldPipeline(Scheduler.dedupeWithinHost).count()))

    // V4: frontier as a BUCKETED table (CLUSTERED BY host, one file per
    // bucket) + the clustered round — the storage layout replaces the
    // per-round exchange. Built from whatever `frontier` resolves to.
    val bucketPath = s"/tmp/graft-variant-bucketed-$n"
    val bucketed: Option[() => Long] =
      try {
        frontier
          .withColumn("host", Canonical.hostOf(col("url")))
          .repartition(64, col("host"))
          .write.mode("overwrite")
          .bucketBy(64, "host")
          .option("path", bucketPath)
          .saveAsTable("graft_variant_frontier")
        val t = spark.table("graft_variant_frontier")
        val plan = Scheduler.runRoundCached(t, seen, robotsBc,
          frontierHostClustered = true)
        val nEx = plan.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }.size
        val nExOld = Scheduler.runRoundCached(t, seen, robotsBc)
          .queryExecution.executedPlan.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
          }.size
        println(s"V4 shuffle-exchanges: clustered=$nEx vs repartitioned=$nExOld")
        if (sys.env.contains("SPARK_GRAFT_PLAN")) {
          println("==== clustered plan ====")
          println(plan.queryExecution.executedPlan.treeString.take(8000))
        }
        Some(() => Scheduler.runRoundCached(t, seen, robotsBc,
          frontierHostClustered = true).count())
      } catch { case e: Exception =>
        println(s"V4 bucketed setup failed: ${e.getMessage}"); None
      }
    val allVariants = variants ++ bucketed.map("V4-bucketed-clustered" -> _)

    // warm-up
    Scheduler.runRoundCached(Synth.frontierSeed(spark, n / 8, 10000).toDF()
      .select(col("url"), col("priority_band")), seen, robotsBc).count()

    allVariants.foreach { case (name, f) =>
      val secs = (1 to trials).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println("VARIANT %s c=%d rows=%d %.2f (all: %s)".formatLocal(java.util.Locale.US,
        name, cores, n, secs.min,
        secs.map(s => "%.2f".formatLocal(java.util.Locale.US, s)).mkString(",")))
    }
    spark.stop()
  }
}
