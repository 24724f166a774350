package graft.streaming

import graft.frontier.Scheduler
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming-ingest variant of the frontier (SURVEY.md §2.11).
  *
  * The reference is a bounded single-pass stream with pull/push
  * backpressure (/root/reference/src/warc/decode.rs:317-334); the engine's
  * batch rounds are the primary mode (deterministic ordering), but fetch-
  * result ingest maps naturally onto Structured Streaming: readStream →
  * narrow canonicalize → watermarked windowed per-host metrics, plus a
  * politeness token-bucket realized as flatMapGroupsWithState keyed by
  * host — the state is ONLY the next per-host sequence number (constant
  * size per host), so state store pressure is O(#hosts), not O(#urls).
  */
object FrontierStream {

  /** One URL arriving from the discovery stream (post-canonicalize). */
  final case class StreamUrl(
      canonical_url: String,
      host: String,
      priority_band: Int,
      crawl_delay_ms: Long,
      discovered_at: java.sql.Timestamp)

  /** Per-host politeness state: next host_seq to assign. */
  final case class HostState(nextSeq: Long)

  final case class ScheduledUrl(
      canonical_url: String,
      host: String,
      host_seq: Long,
      scheduled_ms: Long)

  /** Narrow canonicalization — identical contract to the batch path
    * (same Catalyst expressions, so batch and stream agree bit-for-bit).
    */
  def canonicalize(raw: DataFrame): DataFrame = Scheduler.canonicalize(raw)

  /** Watermarked per-host discovery-rate metrics: event-time windows over
    * `discovered_at`; late data beyond the watermark is dropped (the
    * streaming analog of the batch lineage metrics).
    */
  def hostWindowCounts(canonical: DataFrame,
                       windowLen: String = "10 minutes",
                       watermark: String = "5 minutes"): DataFrame =
    canonical
      .withWatermark("discovered_at", watermark)
      .groupBy(window(col("discovered_at"), windowLen), col("host"))
      .agg(count(lit(1)).as("n_urls"))
      .select(col("window.start").as("win_start"), col("host"), col("n_urls"))

  /** One keyed URL on the discovery stream (url_key = xxhash64 of the
    * canonical URL, as in the batch path).
    */
  final case class KeyedUrl(url_key: Long, canonical_url: String, priority_band: Int)

  /** Per-bucket dedupe state: one serialized cuckoo filter. */
  final case class BucketState(filter: Array[Byte])

  /** Streaming URL-seen dedupe: emits only first sightings, state = one
    * cuckoo filter per key bucket (the streaming face of the batch
    * [[graft.frontier.CuckooSeenSet]] — same keying, and deletable state
    * if a control stream later needs to unsee).
    *
    * State size is O(buckets · filter), NOT O(urls): each bucket holds a
    * fixed-capacity filter (2 bytes/slot), updated once per bucket per
    * micro-batch. Approximation contract: a cuckoo false positive
    * (≈ 0.012% at 16-bit fingerprints) suppresses a genuinely-new URL;
    * for a crawl frontier that only delays discovery until the batch
    * reconciliation pass (exact anti-join) recovers it — the streaming
    * path never emits a duplicate. Production state store: RocksDB
    * (incremental checkpoints); the HDFS store rewrites each bucket's
    * filter per batch.
    */
  def seenDedupe(urls: Dataset[KeyedUrl], numBuckets: Int = 64,
                 expectedPerBucket: Long = 1 << 20): Dataset[KeyedUrl] = {
    import urls.sparkSession.implicits._
    import graft.frontier.CuckooFilter
    urls.groupByKey(u => math.floorMod(u.url_key, numBuckets).toLong)
      .flatMapGroupsWithState[BucketState, KeyedUrl](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[KeyedUrl], state: GroupState[BucketState]) =>
          val cf = if (state.exists) CuckooFilter.deserialize(state.get.filter)
                   else CuckooFilter.create(expectedPerBucket)
          // deterministic in-batch winner: two sightings of one url_key
          // in the same micro-batch must emit the SAME row on replay —
          // the group iterator's order is undefined, so sort by the
          // batch scheduler's total order first (dedupeWithinBatch picks
          // the min (priority_band, url) winner; politenessSchedule
          // sorts the same way)
          val batch = it.toVector
            .sortBy(u => (u.priority_band, u.canonical_url, u.url_key))
          val out = batch.filter { u =>
            !cf.mightContain(u.url_key) && {
              // loud failure like the batch build: an over-capacity
              // bucket silently dropping inserts would re-emit every
              // later sighting as new — a sizing error, not a fallback
              require(cf.insert(u.url_key),
                s"cuckoo state bucket over capacity (expectedPerBucket=$expectedPerBucket)")
              true
            }
          }
          // skip the state rewrite when nothing was inserted: an
          // all-seen batch otherwise reserializes ~2 MB per bucket into
          // the state store for an unchanged filter
          if (out.nonEmpty) state.update(BucketState(cf.serialize()))
          out.iterator
      }
  }

  /** Stateful politeness: continues the deterministic token-bucket across
    * micro-batches. Within a batch the group is sorted by
    * (priority_band, canonical_url) — the same total order as the batch
    * scheduler — so replaying the same batches yields the same schedule.
    */
  def politenessSchedule(urls: Dataset[StreamUrl]): Dataset[ScheduledUrl] = {
    import urls.sparkSession.implicits._
    urls.groupByKey(_.host)
      .flatMapGroupsWithState[HostState, ScheduledUrl](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (host: String, it: Iterator[StreamUrl], state: GroupState[HostState]) =>
          val start = if (state.exists) state.get.nextSeq else 1L
          val sorted = it.toSeq.sortBy(u => (u.priority_band, u.canonical_url))
          val out = sorted.zipWithIndex.map { case (u, i) =>
            ScheduledUrl(u.canonical_url, host, start + i,
              (start + i - 1) * u.crawl_delay_ms)
          }
          state.update(HostState(start + sorted.size))
          out.iterator
      }
  }
}
