package graft.tools

import graft.frontier.{Canonical, Scheduler, SeenSet}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 phase probe: breaks the expensive gate queries (q70, q69,
  * q66, q41, q56) into their component jobs and times each one, so the
  * optimization work targets the real sink instead of the guessed one.
  * Bench-shaped session (local[32], 64 shuffle partitions, AQE on).
  */
object R06Probe {
  private def time[A](label: String, f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"R06 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
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
    def derivedFrontier = ft("orders").select(
      frontierUrl.as("url"),
      pmod(floor(col("o_orderkey") / 3000), lit(4)).cast("int").as("priority_band"))
    def derivedRobots = s.read.parquet(s"$dir/orders.parquet")
      .select(pmod(pmod(col("o_orderkey"), lit(3000)), lit(37)).as("hn")).distinct()
      .select(
        concat(lit("h"), col("hn").cast("string"), lit(".example.test")).as("host"),
        (lit(250) * (lit(1) + pmod(col("hn"), lit(4)))).cast("int").as("crawl_delay_ms"),
        when(pmod(col("hn"), lit(7)) === 0, array(lit("/p/1")))
          .otherwise(array().cast("array<string>")).as("disallow_prefixes"))

    // ---------------- q70 phases (mirrors the CURRENT gate: persisted
    // inputs + memoized quarters) ----------------
    for (pass <- 1 to 2) {
      val robots = derivedRobots.persist()
      val withHost = derivedFrontier.withColumn("host", Canonical.hostOf(col("url"))).persist()
      val quarter: Int => DataFrame = {
        val memo = scala.collection.mutable.Map.empty[Int, DataFrame]
        r => memo.getOrElseUpdate(r, Scheduler.canonicalize(
          ft("orders").where(pmod(col("o_orderkey"), lit(4)) === r)
            .select(frontierUrl.as("url"),
              pmod(floor(col("o_orderkey") / 3000), lit(4)).cast("int").as("priority_band")))
          .select(col("host"), col("url_key")).distinct().persist())
      }
      val base = s"/tmp/graft-r06probe/q70"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      s.sql("DROP TABLE IF EXISTS graft_r06_frontier")
      time(s"q70.$pass.bucketed-frontier-write", {
        withHost.repartition(8, col("host"))
          .write.mode("overwrite").bucketBy(8, "host")
          .option("path", s"$base/frontier").saveAsTable("graft_r06_frontier")
      })
      time(s"q70.$pass.saveSeenClustered", Scheduler.saveSeenClustered(quarter(0), s"$base/seen", buckets = 8))
      time(s"q70.$pass.appendSeenClustered", Scheduler.appendSeenClustered(quarter(1), s"$base/seen", buckets = 8))
      def sel(df: DataFrame) = df.select(col("canonical_url"), col("host"),
        col("host_seq"), col("scheduled_ms").cast("long").as("scheduled_ms"))
      val fused = time(s"q70.$pass.fused-construct", sel(Scheduler.runRound(s.table("graft_r06_frontier"),
        Scheduler.loadSeenClustered(s, s"$base/seen", buckets = 8), robots,
        maxPerHostPerRound = 40,
        frontierHostClustered = true, seenHostClustered = true)).persist())
      time(s"q70.$pass.fused-count", fused.count())
      val probe = time(s"q70.$pass.probe-construct", sel(Scheduler.runRound(withHost,
        quarter(0).unionByName(quarter(1)), robots, maxPerHostPerRound = 40)).persist())
      time(s"q70.$pass.probe-count", probe.count())
      time(s"q70.$pass.except-folds",
        fused.unionAll(probe.exceptAll(fused)).unionAll(fused.exceptAll(probe)).count())
      fused.unpersist(); probe.unpersist()
    }

    // ---------------- q66 phases ----------------
    for (pass <- 1 to 2) {
      val robots = derivedRobots
      val half1 = ft("orders").where(pmod(col("o_orderkey"), lit(2)) === 0)
        .select(frontierUrl.as("url"),
          pmod(floor(col("o_orderkey") / 3000), lit(4)).cast("int").as("priority_band"))
      val ck = "/tmp/graft-r06probe/q66-ck"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
      val r1 = time(s"q66.$pass.round1-construct", Scheduler.runRound(half1,
        Scheduler.loadSeen(s, ck + "-none"), robots))
      time(s"q66.$pass.checkpointRound", Scheduler.checkpointRound(r1, ck, 1))
      val seen = Scheduler.loadSeen(s, ck)
      val r2 = time(s"q66.$pass.round2-construct", Scheduler.runRound(derivedFrontier, seen, robots))
      time(s"q66.$pass.round2-count", r2.count())
    }

    // ---------------- q41 phases ----------------
    for (pass <- 1 to 2) {
      val candidates = Scheduler.dedupeWithinBatch(
        Scheduler.canonicalize(derivedFrontier))
      val seenKeys = Scheduler.canonicalize(
        ft("orders").where(pmod(col("o_orderkey"), lit(2)) === 0)
          .select(frontierUrl.as("url"), lit(0).as("priority_band")))
        .select(col("url_key")).distinct()
      val buckets = time(s"q41.$pass.buildBuckets-construct",
        SeenSet.buildBuckets(seenKeys, "url_key", 16, 1 << 16))
      val res = time(s"q41.$pass.probeAndConfirm-construct",
        SeenSet.probeAndConfirm(candidates, seenKeys, "url_key", buckets, 16)
          .select(col("canonical_url"), col("priority_band")))
      time(s"q41.$pass.count", res.count())
    }

    // ---------------- q56 phases ----------------
    for (pass <- 1 to 2) {
      val deduped = Scheduler.dedupeWithinBatch(
        Scheduler.canonicalize(derivedFrontier))
      val bodies = s.read.parquet(s"$dir/orders.parquet")
        .select(pmod(pmod(col("o_orderkey"), lit(3000)), lit(37)).as("hn")).distinct()
        .select(
          concat(lit("h"), col("hn").cast("string"), lit(".example.test")).as("host"),
          concat(
            lit("# synthetic robots\nUser-agent: otherbot\nDisallow: /\n\n" +
              "User-agent: *\nCrawl-delay: "),
            ((lit(250) * (lit(1) + pmod(col("hn"), lit(4)))) / lit(1000.0))
              .cast("string"),
            lit("\n"),
            when(pmod(col("hn"), lit(7)) === 0, lit("Disallow: /p/1\n")).otherwise(lit("")),
            when(pmod(col("hn"), lit(14)) === 0, lit("Allow: /p/12\n")).otherwise(lit("")))
            .as("body"))
      val withPath = deduped.withColumn("path",
        regexp_extract(col("canonical_url"),
          "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1))
      def run(maxBc: Long) = graft.frontier.Robots
        .applyRawRobots(withPath, bodies, "graftbot/1.0", 1000L, maxBroadcastBytes = maxBc)
        .select(col("canonical_url"), col("host"), col("crawl_delay_ms"))
      val bcast = time(s"q56.$pass.bcast-construct", run(256L << 20).persist())
      time(s"q56.$pass.bcast-count", bcast.count())
      val dist = time(s"q56.$pass.dist-construct", run(0L).persist())
      time(s"q56.$pass.dist-count", dist.count())
      time(s"q56.$pass.except-folds",
        bcast.unionAll(dist.exceptAll(bcast)).unionAll(bcast.exceptAll(dist)).count())
      bcast.unpersist(); dist.unpersist()
    }

    spark.stop()
  }
}
