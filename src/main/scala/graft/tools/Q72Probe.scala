package graft.tools

import graft.frontier.{Canonical, Scheduler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase probe for the K-round endurance gate (q72): times each call in
  * the round loop so optimization targets the real sink. Mirrors the
  * gate's construction (same slices, same kill at round 3).
  */
object Q72Probe {
  private def time[A](label: String, f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"Q72 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark

    def ft(name: String): DataFrame =
      s.read.parquet(s"$dir/$name.parquet").repartition(s.sparkContext.defaultParallelism)
    def frontierUrl = {
      val p = pmod(col("o_orderkey"), lit(3000)).cast("string")
      val h = pmod(pmod(col("o_orderkey"), lit(3000)), lit(37)).cast("string")
      val v = pmod(col("o_orderkey"), lit(4))
      when(v === 0, concat(lit("https://H"), h, lit(".Example.Test:443/p/"), p, lit("?b=2&a=1#frag")))
        .when(v === 1, concat(lit("http://h"), h, lit(".example.test:80/p/"), p))
        .when(v === 2, concat(lit("https://h"), h, lit(".example.test:8443/p/"), p, lit("?x=1")))
        .otherwise(concat(lit("http://h"), h, lit(".example.test.")))
    }
    def derivedRobots = s.read.parquet(s"$dir/orders.parquet")
      .select(pmod(pmod(col("o_orderkey"), lit(3000)), lit(37)).as("hn")).distinct()
      .select(
        concat(lit("h"), col("hn").cast("string"), lit(".example.test")).as("host"),
        (lit(250) * (lit(1) + pmod(col("hn"), lit(4)))).cast("int").as("crawl_delay_ms"),
        when(pmod(col("hn"), lit(7)) === 0, array(lit("/p/1")))
          .otherwise(array().cast("array<string>")).as("disallow_prefixes"))

    for (pass <- 1 to 2) {
      val K = 5
      val base = "/tmp/graft-q72probe"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      import org.apache.spark.sql.types.{StructType, StructField, StringType, LongType}
      val emptySeen = s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("host", StringType),
          StructField("url_key", LongType))))
      time(s"$pass.saveSeen-empty", Scheduler.saveSeenClustered(emptySeen, s"$base/seenc", buckets = 8))
      val sliceCol = pmod(floor(col("o_orderkey") / 7), lit(K))
      var robots = time(s"$pass.robots", derivedRobots.persist())
      (0 until K).foreach { r =>
        if (r == 3) {
          s.catalog.clearCache()
          s.sql("DROP TABLE IF EXISTS graft_q72p_frontier")
          robots = derivedRobots.persist()
        }
        val slice = ft("orders").where(sliceCol === r)
          .select(frontierUrl.as("url"),
            pmod(floor(col("o_orderkey") / 3000), lit(4)).cast("int").as("priority_band"))
          .withColumn("host", Canonical.hostOf(col("url")))
        s.sql("DROP TABLE IF EXISTS graft_q72p_frontier")
        time(s"$pass.r$r.frontier-write", {
          slice.repartition(8, col("host"))
            .write.mode("overwrite").bucketBy(8, "host")
            .option("path", s"$base/frontier-$r").saveAsTable("graft_q72p_frontier")
        })
        val sched = time(s"$pass.r$r.runRound-construct",
          Scheduler.runRound(s.table("graft_q72p_frontier"),
            Scheduler.loadSeenClustered(s, s"$base/seenc", buckets = 8),
            robots, maxPerHostPerRound = 40,
            frontierHostClustered = true, seenHostClustered = true))
        time(s"$pass.r$r.checkpointRound", Scheduler.checkpointRound(sched, base, r))
        time(s"$pass.r$r.appendSeen", Scheduler.appendSeenClustered(
          s.read.parquet(s"$base/rounds/round=$r").select(col("host"), col("url_key")),
          s"$base/seenc", buckets = 8))
      }
      val n = time(s"$pass.final-union-count", (0 until K).map { r =>
        s.read.parquet(s"$base/rounds/round=$r")
      }.reduce(_.unionAll(_)).count())
      println(s"Q72 $pass rows=$n")
    }
    spark.stop()
  }
}
