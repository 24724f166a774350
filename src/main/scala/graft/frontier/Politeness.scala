package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-host politeness: robots.txt cache broadcast + deterministic
  * token-bucket scheduling (north rule).
  *
  * The schedule is WINDOW-BASED, not wall-clock: within each host, URLs are
  * totally ordered by (priority_band, canonical_url) and the i-th URL is
  * scheduled at `i * crawl_delay_ms`. Same input ⇒ same schedule at ANY
  * parallelism — this is what makes crawl ordering reproducible across
  * cluster sizes (SURVEY.md §7.4 #1).
  */
object Politeness {

  val DefaultDelayMs = 1000L

  /** Single-pass disallow check: extract the URL path (everything from
    * the first '/' after the authority up to '?' or '#') and test the
    * prefix list. One scalar UDF replaces a per-row `regexp_extract` plus
    * an `exists()` higher-order function — HOF lambdas are
    * CodegenFallback (interpreted per row) and were measured as the
    * frontier round's worst-scaling stage (robots stage 2.6× from 2→8
    * cores before, vs ~4× for the narrow stages). Same truth table as
    * `exists(prefixes, p -> path.startsWith(p))` with regex path capture
    * `^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)`.
    */
  /** Path component of a canonical URL (empty for null/host-only/
    * unparseable) — the ONE implementation both robots filters share:
    * their spec-tested output equality rides on this scan being
    * bit-identical in the join and map forms.
    */
  private def pathOf(url: String): String = {
    val schemeEnd = if (url == null) -1 else url.indexOf("://")
    if (schemeEnd < 0) ""
    else {
      val slash = url.indexOf('/', schemeEnd + 3)
      if (slash < 0) ""
      else {
        var end = url.indexOf('?', slash)
        val hash = url.indexOf('#', slash)
        if (hash >= 0 && (end < 0 || hash < end)) end = hash
        if (end < 0) url.substring(slash) else url.substring(slash, end)
      }
    }
  }

  private val disallowedUdf = udf { (url: String, prefixes: Seq[String]) =>
    if (url == null || prefixes == null || prefixes.isEmpty) false
    else {
      val path = pathOf(url)
      prefixes.exists(path.startsWith)
    }
  }

  /** Robots filter: drop URLs whose path starts with a disallowed prefix.
    * `robots(host, crawl_delay_ms, disallow_prefixes)` is broadcast — it is
    * host-cardinality (small) while the frontier is URL-cardinality (huge).
    * Rows with no robots entry keep the default delay.
    */
  def applyRobots(frontier: DataFrame, robots: DataFrame): DataFrame =
    frontier
      .join(broadcast(robots), Seq("host"), "left")
      // clamped at 0: a negative delay in the robots table (a plausible
      // 'unknown' encoding) must not conflate with the map form's -1
      // dropped sentinel — both forms clamp, keeping their spec-tested
      // output equality
      .withColumn("crawl_delay_ms",
        greatest(lit(0L), coalesce(col("crawl_delay_ms").cast("long"),
          lit(DefaultDelayMs))))
      .where(!disallowedUdf(col("canonical_url"), col("disallow_prefixes")))
      .drop("disallow_prefixes")

  /** A robots cache built ONCE per crawl and reused across rounds — the
    * north rule's "robots.txt cache broadcast as a map-side lookup"
    * taken literally. [[applyRobots]] rebuilds its broadcast-join hash
    * relation on the driver for EVERY round's plan (~1 s of fixed
    * per-round cost measured at 10k hosts); a long-running crawl loop
    * instead collects the host-cardinality table once, ships one
    * Broadcast, and every subsequent round is a narrow projection.
    * Size guard: refuse tables past `maxHosts` (at 10^8-host scale keep
    * the per-round join — or shard the crawl loop by host range).
    */
  def robotsBroadcast(robots: DataFrame,
                      maxHosts: Long = 20000000L): org.apache.spark.broadcast.Broadcast[
      Map[String, (Long, Array[String])]] = {
    val n = robots.count()
    require(n <= maxHosts,
      s"robots table has $n hosts > $maxHosts: use the per-round broadcast join")
    robotsBroadcastUnchecked(robots)
  }

  /** The collect+broadcast itself, size check already done by the
    * caller ([[robotsBroadcast]] counts; [[robotsStage]] reuses ITS
    * guard count instead of running a second one).
    */
  private def robotsBroadcastUnchecked(robots: DataFrame)
      : org.apache.spark.broadcast.Broadcast[Map[String, (Long, Array[String])]] = {
    val spark = robots.sparkSession
    val m = robots
      .select(col("host"), col("crawl_delay_ms").cast("long"),
        col("disallow_prefixes"))
      .collect()
      .map(r => r.getString(0) -> (
        // clamped at 0 like applyRobots — see the comment there
        (if (r.isNullAt(1)) DefaultDelayMs else math.max(0L, r.getLong(1))),
        (if (r.isNullAt(2)) Array.empty[String]
         else r.getSeq[String](2).toArray)))
      .toMap
    spark.sparkContext.broadcast(m)
  }

  /** Size-aware robots stage, safe to call blind: collects the table
    * into a crawl-lifetime map broadcast ([[robotsBroadcast]], the
    * zero-per-round-cost form) while it fits under `maxHosts`, and
    * FALLS BACK to the per-round broadcast join ([[applyRobots]]) past
    * it instead of throwing — [[robotsBroadcast]]'s hard `require` made
    * the cached round path unsafe to call without a prior size check.
    * Output equality of the two forms is spec-tested (EngineSpec) and
    * oracle-gated (q26 runs both paths).
    */
  def robotsStage(robots: DataFrame,
                  maxHosts: Long = 20000000L): DataFrame => DataFrame =
    if (robots.count() <= maxHosts) {
      val bc = robotsBroadcastUnchecked(robots)
      applyRobotsMap(_, bc)
    } else applyRobots(_, robots)

  /** [[applyRobots]] semantics over a pre-built [[robotsBroadcast]] —
    * one scalar UDF (map lookup + prefix test), zero joins, zero
    * per-round broadcast builds. Returns the same rows and
    * crawl_delay_ms as the join form (equality spec-tested).
    */
  def applyRobotsMap(frontier: DataFrame,
                     bc: org.apache.spark.broadcast.Broadcast[
                       Map[String, (Long, Array[String])]]): DataFrame = {
    val delayOrDropUdf = udf { (host: String, url: String) =>
      bc.value.get(host) match {
        case None => DefaultDelayMs
        case Some((delay, prefixes)) =>
          val path = pathOf(url)
          var i = 0
          var hit = false
          while (i < prefixes.length && !hit) {
            hit = path.startsWith(prefixes(i)); i += 1
          }
          if (hit) -1L else delay
      }
    }
    frontier
      .withColumn("crawl_delay_ms",
        delayOrDropUdf(col("host"), col("canonical_url")))
      .where(col("crawl_delay_ms") >= 0L)
  }

  /** Deterministic token-bucket schedule: per host, ordered by
    * (priority_band asc, canonical_url asc), the n-th URL fetches at
    * (n-1) * crawl_delay_ms. Requires columns: host, canonical_url,
    * priority_band, crawl_delay_ms. Adds host_seq + scheduled_ms.
    */
  def schedule(frontier: DataFrame): DataFrame = {
    val w = Window.partitionBy("host").orderBy(col("priority_band").asc, col("canonical_url").asc)
    frontier
      .withColumn("host_seq", row_number().over(w).cast("long"))
      .withColumn("scheduled_ms", (col("host_seq") - 1) * col("crawl_delay_ms"))
  }

  /** Fetch-batch emission: cap each host at `perHostBudget` URLs per batch;
    * batch_id = (host_seq-1) / budget. The per-host LIMIT of SURVEY.md §2.6.
    */
  def fetchBatches(scheduled: DataFrame, perHostBudget: Int): DataFrame =
    scheduled.withColumn("batch_id",
      floor((col("host_seq") - 1) / perHostBudget).cast("long"))

  /** Deterministic per-host round cap WITHOUT serializing a hot host onto
    * one reducer (hot-host skew mitigation): phase 1 takes the top-`cap`
    * per (host, salt) — a 10^8-URL host fans across `nSalt` window
    * reducers — and phase 2 takes the exact top-`cap` per host over the
    * ≤ nSalt·cap survivors. Two-phase top-k: the result is IDENTICAL to a
    * single row_number-over-host cap (phase 1 can only drop rows ranked
    * below `cap` within a salt, which are ranked below `cap` globally),
    * but the full hot-host row set never sorts in one task. Order is the
    * politeness order (priority_band, canonical_url) so the cap keeps
    * exactly the URLs [[schedule]] would fetch first.
    */
  def capPerHost(frontier: DataFrame, cap: Int, nSalt: Int = 16): DataFrame = {
    val order = Seq(col("priority_band").asc, col("canonical_url").asc)
    val w1 = Window
      .partitionBy(col("host"), pmod(xxhash64(col("canonical_url")), lit(nSalt.toLong)))
      .orderBy(order: _*)
    val w2 = Window.partitionBy("host").orderBy(order: _*)
    frontier
      .withColumn("r1", row_number().over(w1)).where(col("r1") <= cap).drop("r1")
      .withColumn("r2", row_number().over(w2)).where(col("r2") <= cap).drop("r2")
  }
}
