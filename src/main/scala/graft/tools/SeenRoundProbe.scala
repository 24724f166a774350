package graft.tools

import graft.frontier.{Canonical, Politeness, Scheduler}
import graft.synth.Synth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the STEADY-STATE seen round: fused zero-exchange path (both
  * tables host-clustered) vs the bloom-probe + anti-join-confirm path,
  * same seed, same seen set (half the frontier's keys). Args: cores [n]
  * [trials]. Writes/reuses bucketed tables under /tmp/graft-seenprobe.
  */
object SeenRoundProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = if (args.length > 1) args(1).toInt else 8000000
    val trials = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = s"/tmp/graft-seenprobe-$n"
    val robotsBc = Politeness.robotsBroadcast(Synth.robots(spark, 10000).toDF())

    if (!new java.io.File(s"$base/frontier/_SUCCESS").isFile) {
      val seed = Synth.frontierSeed(spark, n, 10000).toDF()
        .select(col("url"), col("priority_band"))
        .withColumn("host", Canonical.hostOf(col("url")))
      spark.sql("DROP TABLE IF EXISTS graft_seenprobe_w")
      seed.repartition(64, col("host"))
        .write.mode("overwrite").bucketBy(64, "host")
        .option("path", s"$base/frontier").saveAsTable("graft_seenprobe_w")
      // seen = every other canonical of the same seed
      Scheduler.saveSeenClustered(
        Scheduler.canonicalize(seed.drop("host"))
          .where(pmod(xxhash64(col("canonical_url")), lit(2)) === 0)
          .select(col("host"), col("url_key")),
        s"$base/seen", buckets = 64)
      println("tables written")
    }
    spark.sql("DROP TABLE IF EXISTS graft_seenprobe_frontier")
    spark.sql("CREATE TABLE graft_seenprobe_frontier " +
      "(url STRING, priority_band INT, host STRING) USING parquet " +
      s"CLUSTERED BY (host) INTO 64 BUCKETS LOCATION '$base/frontier'")
    val frontier = spark.table("graft_seenprobe_frontier")
    val seenClustered = Scheduler.loadSeenClustered(spark, s"$base/seen", 64)
    val knownHot = Some(Scheduler.hotHosts(frontier))

    def fused() = Scheduler.runRoundCached(frontier, seenClustered, robotsBc,
      frontierHostClustered = true, seenHostClustered = true,
      knownHotHosts = knownHot).count()
    def probe() = Scheduler.runRoundCached(frontier, seenClustered, robotsBc,
      knownHotHosts = knownHot).count()

    fused(); probe() // warm both paths
    for (t <- 1 to trials) {
      for ((name, f) <- Seq("fused" -> (fused _), "probe" -> (probe _))) {
        val t0 = System.nanoTime(); val rows = f()
        println("SEEN %s c=%d trial=%d %.2f s rows=%d".formatLocal(
          java.util.Locale.US, name, cores, t,
          (System.nanoTime() - t0) / 1e9, rows))
      }
    }
    spark.stop()
  }
}
