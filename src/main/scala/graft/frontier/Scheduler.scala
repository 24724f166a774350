package graft.frontier

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The priority frontier round: canonicalize → dedupe (bloom probe +
  * anti-join confirm) → politeness-gated schedule → fetch-batch emit, with
  * per-partition lineage + metrics and parquet-checkpointed resume
  * (north rule; Iceberg snapshots stand in as partitioned parquet round
  * directories in-sandbox — same append-only contract).
  *
  * Shuffle plan at 10^10 URLs:
  *   - canonicalization is narrow (zero shuffle);
  *   - dedupe shuffles on url_key once (bloom prefilter shrinks the probe
  *     side first);
  *   - the politeness window hash-partitions on host, so each output
  *     partition owns whole hosts — scheduling is partition-local and hot
  *     hosts can't straddle partitions (no separate range exchange; a
  *     range write layout is applied at the sink when needed);
  *   - host-level aggregates use two-phase salted aggregation
  *     ([[saltedHostCounts]]) so a hot host can't skew a single reducer;
  *   - robots is broadcast (host-cardinality).
  */
object Scheduler {

  /** Canonicalize + key a raw frontier(url, priority_band, ...) — narrow. */
  def canonicalize(frontier: DataFrame): DataFrame =
    frontier
      .withColumn("canonical_url", Canonical.canonicalUrl(col("url")))
      .withColumn("host", Canonical.hostOf(col("url")))
      .withColumn("url_key", Canonical.urlKey(col("canonical_url")))
      .withColumn("host_hash", Canonical.hostHash(col("host")))

  /** In-batch dedupe: first sighting wins. Deterministic winner = the
    * lexicographic minimum of (priority_band, url, …rest) per canonical
    * key — partial aggregation collapses duplicates before the shuffle,
    * and ties are totally ordered (the row_number formulation sorts
    * every partition and breaks ties arbitrarily).
    *
    * Plan note: `min(struct)` cannot hash-aggregate (struct agg buffers
    * are immutable), so Catalyst plans partial+final SortAggregate. A
    * packed-string variant (`min(lpad(band) || url)` → HashAggregate,
    * re-deriving the other columns from the winner url) was built and
    * A/B-measured at 16M URLs / 8 cores: 16.5 s vs 14.9 s — SLOWER,
    * because recomputing the canonicalize UDF on 15.6M winners costs
    * more than the two sorts save. Kept the struct form.
    */
  def dedupeWithinBatch(canonical: DataFrame): DataFrame = {
    val cols = canonical.columns.toSeq
    val orderedFirst = Seq("priority_band", "url")
    val rest = cols.filterNot(orderedFirst.contains)
    val packed = struct((orderedFirst ++ rest).map(col): _*)
    canonical
      .groupBy(col("url_key").as("k"))
      .agg(min(packed).as("m"))
      .select(cols.map(c => col(s"m.$c").as(c)): _*)
  }

  /** Batches a host may fill in one round before the default cap holds
    * back its tail: default cap = perHostBudget × this. At the default
    * budget (100) that is 10k URLs/host/round — far above any polite
    * per-round fetch capacity, so the cap only ever trims DEGENERATE
    * hosts (the 10^8-URL host that would otherwise tail-stall the
    * politeness window's one reducer); trimmed URLs simply stay in the
    * frontier for later rounds.
    */
  val DefaultMaxBatchesPerHost = 100

  /** One full scheduling round. `seenKeys` may be empty (first round).
    * Returns the batch-ready frontier, hash-partitioned by host (whole
    * hosts per partition) and sorted within partitions by
    * (priority_band, scheduled_ms, host_hash, canonical_url). Row CONTENT
    * (host_seq, scheduled_ms, batch_id) is a deterministic function of the
    * input at any parallelism; only the partition file layout varies with
    * the partition count.
    *
    * `maxPerHostPerRound`: -1 (default) = skew-safe auto cap of
    * perHostBudget × [[DefaultMaxBatchesPerHost]] URLs per host per
    * round; 0 = explicit opt-OUT (uncapped — one degenerate host can
    * serialize the politeness window's reducer); >0 = exact cap.
    */
  def runRound(rawFrontier: DataFrame, seenKeys: DataFrame, robots: DataFrame,
               perHostBudget: Int = 100, numBloomBuckets: Int = 64,
               maxPerHostPerRound: Int = -1): DataFrame =
    runRoundImpl(rawFrontier, seenKeys, Politeness.applyRobots(_, robots),
      perHostBudget, numBloomBuckets, maxPerHostPerRound)

  /** [[runRound]] over a crawl-lifetime robots cache
    * ([[Politeness.robotsBroadcast]]): identical output, but the robots
    * stage is a narrow map-side lookup with no per-round broadcast
    * build — the form a long-running crawl loop (and the bench) uses.
    */
  def runRoundCached(rawFrontier: DataFrame, seenKeys: DataFrame,
                     robotsBc: org.apache.spark.broadcast.Broadcast[
                       Map[String, (Long, Array[String])]],
                     perHostBudget: Int = 100, numBloomBuckets: Int = 64,
                     maxPerHostPerRound: Int = -1): DataFrame =
    runRoundImpl(rawFrontier, seenKeys, Politeness.applyRobotsMap(_, robotsBc),
      perHostBudget, numBloomBuckets, maxPerHostPerRound)

  /** [[runRound]] over an arbitrary robots stage — pair with
    * [[Politeness.robotsStage]] for the size-aware auto form (map
    * broadcast under the guard, per-round join past it) that is safe to
    * call without knowing the robots-table cardinality.
    */
  def runRoundStaged(rawFrontier: DataFrame, seenKeys: DataFrame,
                     robotsStage: DataFrame => DataFrame,
                     perHostBudget: Int = 100, numBloomBuckets: Int = 64,
                     maxPerHostPerRound: Int = -1): DataFrame =
    runRoundImpl(rawFrontier, seenKeys, robotsStage,
      perHostBudget, numBloomBuckets, maxPerHostPerRound)

  /** Dedupe with the SAME winner as [[dedupeWithinBatch]] (first row per
    * canonical_url in (canonical_url, priority_band, url) order = the
    * min-(band, url) row) but expressed as a window over hash(host)
    * partitioning — so the politeness window downstream REUSES the
    * exchange instead of adding a second full-frontier shuffle. Only
    * safe where per-host row counts are bounded (the hot-host split
    * guarantees ≤ cap rows per cold host); url_key hash collisions
    * across distinct canonical urls are kept (2^-64), where the agg
    * form would collapse them — both deterministic.
    */
  private[frontier] def dedupeWithinHost(canonical: DataFrame): DataFrame = {
    // partitionBy(host, canonical_url): hashpartitioning(host) satisfies
    // the clustered distribution (subset rule) so no extra exchange, and
    // the window sort (host, canonical_url, band, url) is the same total
    // order the previous lag-over-host form sorted by. row_number==1
    // keeps the min-(band, url) row per canonical key — including the
    // all-null canonical group (null url rows), which the earlier
    // lag(...) === ... comparison silently kept in full (null === null
    // is null): dedupeWithinBatch collapses those to one row, and now
    // this form does too.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host", "canonical_url")
      .orderBy(col("priority_band").asc, col("url").asc)
    canonical
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  private def runRoundImpl(rawFrontier: DataFrame, seenKeys: DataFrame,
                           robotsStage: DataFrame => DataFrame,
                           perHostBudget: Int, numBloomBuckets: Int,
                           maxPerHostPerRound: Int): DataFrame = {
    val canon = canonicalize(rawFrontier)
    // hot-host round cap ON BY DEFAULT, as a two-pass hot split: pass 1
    // counts per host over the RAW frontier (narrow host extract +
    // salted partial agg — k rows cross the wire) and broadcasts the
    // over-cap host set; only THOSE hosts' rows pay the salted two-phase
    // top-k. Pre-filter counts can only OVERcount (dedupe/robots only
    // remove rows), and capping a below-cap host is a no-op, so the
    // result is identical to capping everything — but the steady-state
    // cost is one cheap count pass instead of an extra full-frontier
    // (host, salt) exchange + sort (measured: the always-cap form ran
    // the 16M-URL bench round 2.4× slower). Hot-set size is bounded by
    // rows/cap (10^10 URLs / 10^4 cap → ≤10^6 hosts — broadcastable).
    val cap =
      if (maxPerHostPerRound < 0) perHostBudget * DefaultMaxBatchesPerHost
      else maxPerHostPerRound

    def finish(scheduled: DataFrame): DataFrame =
      Politeness.fetchBatches(scheduled, perHostBudget)
        .sortWithinPartitions("priority_band", "scheduled_ms", "host_hash", "canonical_url")

    if (seenKeys.isEmpty && cap > 0) {
      // PROBE-FREE round (round 1 of a crawl — and the headline bench):
      // fully fused cold path, ONE full-frontier exchange. Hosts never
      // straddle the hot/cold split, so each leg schedules its hosts
      // completely and the legs union AFTER their windows:
      //  - cold leg: Exchange(host) → window-dedupe → robots filter →
      //    politeness window — dedupe, robots and schedule all share the
      //    one hash(host) exchange (robots is a narrow filter; the
      //    dedupe window's reducers are BOUNDED because every cold host
      //    has raw count ≤ cap by the hot-split definition);
      //  - hot leg: the url_key-agg dedupe (spreads a degenerate host
      //    across reducers) + salted two-phase cap, as before — a few
      //    small exchanges over the tiny hot subset.
      // Seen-rounds keep the two-exchange composition below: the exact-
      // confirm's internal union breaks partitioning anyway, and the
      // url_key-agg dedupe's map-side partial collapse is worth more
      // there. (A fully-fused seen path exists on paper — confirm via a
      // broadcast of seen∩bloom-positive keys instead of an anti-join —
      // and is the documented next step if profiling demands it.)
      // Cold-leg shuffle carries ONLY (url, priority_band, host, …input
      // cols): canonical_url, url_key and host_hash are all derivable
      // from url/host, so they are computed POST-exchange (executor-side,
      // same stage as the window sort) instead of being materialized into
      // the full-frontier shuffle. At ~45 B of canonical string + 16 B of
      // hashes per row that is ~45% of the round's full-frontier shuffle
      // bytes — network cost at cluster scale, memory-bandwidth pressure
      // in local mode (the measured reason the 8-thread side degraded
      // harder under slow ambient windows, BENCH.md). The explicit
      // repartition(host) IS the one exchange: hashpartitioning(host)
      // satisfies every downstream window's required distribution, so
      // dedupe, robots and the politeness window all reuse it.
      val hotHosts = hotHostSet(rawFrontier, cap)
      val withHost = rawFrontier.withColumn("host", Canonical.hostOf(col("url")))
      val flagged = withHost.join(broadcast(hotHosts), Seq("host"), "left")
      val hot = flagged.where(col("__hot")).drop("__hot")
      val cold = flagged.where(col("__hot").isNull).drop("__hot")
      // hot leg (tiny, over-cap hosts only): derive keys up front — the
      // url_key agg-dedupe needs them pre-exchange anyway
      val hotKeyed = hot
        .withColumn("canonical_url", Canonical.canonicalUrl(col("url")))
        .withColumn("url_key", Canonical.urlKey(col("canonical_url")))
        .withColumn("host_hash", Canonical.hostHash(col("host")))
      val hotSched = Politeness.schedule(
        Politeness.capPerHost(robotsStage(dedupeWithinBatch(hotKeyed)), cap))
      val coldSched = Politeness.schedule(robotsStage(dedupeWithinHost(
          cold.repartition(col("host"))
            .withColumn("canonical_url", Canonical.canonicalUrl(col("url"))))))
        .withColumn("url_key", Canonical.urlKey(col("canonical_url")))
        .withColumn("host_hash", Canonical.hostHash(col("host")))
      finish(hotSched.unionByName(coldSched))
    } else {
      val deduped = dedupeWithinBatch(canon)
      val fresh =
        if (seenKeys.isEmpty) deduped
        else {
          val buckets = SeenSet.buildBuckets(seenKeys, "url_key", numBloomBuckets)
          SeenSet.probeAndConfirm(deduped, seenKeys, "url_key", buckets, numBloomBuckets)
        }
      val robotted = robotsStage(fresh)
      val polite =
        if (cap > 0) {
          val flagged = robotted.join(broadcast(hotHostSet(rawFrontier, cap)),
            Seq("host"), "left")
          val hot = flagged.where(col("__hot")).drop("__hot")
          val cold = flagged.where(col("__hot").isNull).drop("__hot")
          Politeness.capPerHost(hot, cap).unionByName(cold)
        } else robotted
      finish(Politeness.schedule(polite))
    }
  }

  /** Hosts whose RAW frontier row count exceeds `cap` (the hot side of
    * the two-pass split), as a broadcastable (host, __hot) table.
    */
  private def hotHostSet(rawFrontier: DataFrame, cap: Int): DataFrame =
    rawFrontier
      .select(Canonical.hostOf(col("url")).as("host"),
        pmod(xxhash64(col("url")), lit(16L)).as("salt"))
      .groupBy("host", "salt").agg(count(lit(1)).as("c"))
      .groupBy("host").agg(sum("c").as("n"))
      .where(col("n") > cap)
      .select(col("host"), lit(true).as("__hot"))

  /** Per-partition lineage + fetch metrics (north rule observability):
    * one row per (partition, host) with URL counts and schedule span.
    */
  def partitionMetrics(batches: DataFrame): DataFrame =
    batches
      .withColumn("partition_id", spark_partition_id().cast("long"))
      .groupBy("partition_id", "host")
      .agg(count(lit(1)).as("n_urls"),
        max("scheduled_ms").as("span_ms"),
        countDistinct("batch_id").as("n_batches"))

  /** Two-phase salted host aggregation: phase 1 groups on
    * (host, salt = pmod(xxhash64(url), nSalt)) so a hot host fans across
    * nSalt reducers; phase 2 merges the per-salt partials. Result is
    * identical to a plain groupBy(host).count() — the salt only reshapes
    * the shuffle.
    */
  def saltedHostCounts(canonical: DataFrame, nSalt: Int = 16): DataFrame =
    canonical
      .groupBy(col("host"), pmod(xxhash64(col("url")), lit(nSalt.toLong)).as("salt"))
      .agg(count(lit(1)).as("c"))
      .groupBy("host").agg(sum("c").as("n_urls"))

  /** Checkpoint a round: append batches + newly-seen keys as parquet round
    * dirs (the sandbox stand-in for Iceberg snapshot append).
    */
  def checkpointRound(batches: DataFrame, outDir: String, round: Int): Unit = {
    // the STORED frontier snapshot is range-partitioned on
    // (priority_band, host_hash) — the north rule's table layout: band
    // pruning reads only the files of the bands a consumer wants, and
    // host ranges spread hot hosts across files. Compute stages keep
    // the hash(host) layout (see runRound); the range exchange happens
    // exactly once, at the write.
    batches
      .repartitionByRange(col("priority_band"), col("host_hash"))
      .sortWithinPartitions("priority_band", "host_hash", "scheduled_ms", "canonical_url")
      .write.mode("overwrite").parquet(s"$outDir/rounds/round=$round")
    batches.select("url_key").distinct()
      .write.mode("overwrite").parquet(s"$outDir/seen/round=$round")
  }

  /** Resume: union all checkpointed seen keys (empty DataFrame when no
    * rounds exist yet).
    */
  def loadSeen(spark: SparkSession, outDir: String): DataFrame = {
    val dir = new java.io.File(s"$outDir/seen")
    if (dir.exists && dir.listFiles != null && dir.listFiles.nonEmpty)
      spark.read.parquet(s"$outDir/seen")
    else {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("url_key", LongType))))
    }
  }
}
