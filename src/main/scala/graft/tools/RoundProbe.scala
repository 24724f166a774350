package graft.tools

import graft.frontier.{Politeness, Scheduler, SeenSet}
import graft.synth.Synth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object RoundProbe {
  private def time[A](label: String, f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 4000000
    val frontier = Synth.frontierSeed(spark, n, 10000).toDF()
      .select(col("url"), col("priority_band"))
    val robots = Synth.robots(spark, 10000).toDF()
    val canon = Scheduler.dedupeWithinBatch(Scheduler.canonicalize(frontier))
    time("warm-canon-dedupe", canon.count())
    val polite = Politeness.applyRobots(canon, robots)
    time("polite", polite.count())
    val schedThenRange = Politeness.fetchBatches(Politeness.schedule(polite), 100)
      .repartitionByRange(col("priority_band"), col("host_hash"))
      .sortWithinPartitions("priority_band", "scheduled_ms", "host_hash", "canonical_url")
    time("window-then-range", schedThenRange.count())
    time("window-then-range2", schedThenRange.count())
    val rangeThenWindow = Politeness.fetchBatches(
      Politeness.schedule(polite.repartitionByRange(col("priority_band"), col("host_hash"))), 100)
      .sortWithinPartitions("priority_band", "scheduled_ms", "host_hash", "canonical_url")
    time("range-then-window", rangeThenWindow.count())
    time("range-then-window2", rangeThenWindow.count())

    // q41 shape at sf0.1
    val dir = "/root/testdata/sf0.1"
    val orders = spark.read.parquet(s"$dir/orders.parquet").repartition(32)
    val urlExpr = {
      val p = pmod(col("o_orderkey"), lit(3000)).cast("string")
      val h = pmod(pmod(col("o_orderkey"), lit(3000)), lit(37)).cast("string")
      val v = pmod(col("o_orderkey"), lit(4))
      when(v === 0, concat(lit("https://H"), h, lit(".Example.Test:443/p/"), p, lit("?b=2&a=1#frag")))
        .when(v === 1, concat(lit("http://h"), h, lit(".example.test:80/p/"), p))
        .when(v === 2, concat(lit("https://h"), h, lit(".example.test:8443/p/"), p, lit("?x=1")))
        .otherwise(concat(lit("http://h"), h, lit(".example.test.")))
    }
    val cand = Scheduler.dedupeWithinBatch(Scheduler.canonicalize(
      orders.select(urlExpr.as("url"),
        pmod(floor(col("o_orderkey") / 3000), lit(4)).cast("int").as("priority_band"))))
    val seenKeys = Scheduler.canonicalize(
      orders.where(pmod(col("o_orderkey"), lit(2)) === 0)
        .select(urlExpr.as("url"), lit(0).as("priority_band")))
      .select(col("url_key")).distinct()
    time("q41-buildBuckets", SeenSet.buildBuckets(seenKeys, "url_key", 16, 1 << 16).count())
    val buckets = SeenSet.buildBuckets(seenKeys, "url_key", 16, 1 << 16)
    time("q41-probeconfirm",
      SeenSet.probeAndConfirm(cand, seenKeys, "url_key", buckets, 16).count())
    time("q41-probeconfirm2",
      SeenSet.probeAndConfirm(cand, seenKeys, "url_key", buckets, 16).count())
    spark.stop()
  }
}
