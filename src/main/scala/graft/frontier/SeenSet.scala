package graft.frontier

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import scala.collection.mutable

/** Partitioned Bloom-filter URL-seen set (north rule; the cluster-native
  * replacement for the reference's redb RECORDS_TABLE membership probe,
  * /root/reference/src/verify.rs:405-411).
  *
  * Design for 10^10 keys: ONE driver-side bloom does not fit, so the seen
  * set is bucketed by `pmod(url_key, numBuckets)` and each bucket holds
  * its own bloom bitset. Build = one shuffle of RAW 8-byte keys
  * partitioned by bucket, then a per-partition mutable fold into the
  * bucket's filter — the shuffle never carries bitsets, and no
  * per-row serialize/deserialize happens anywhere (the naive
  * Aggregator-over-binary formulation re-encodes the whole bitset on
  * every row — O(n·bitset) memcpy).
  *
  * Probe = broadcast the (small) bucket table once; executors lazily
  * deserialize each bucket's filter ONCE per JVM and test candidates in a
  * codegen-wrapped UDF. At 10^10, buckets whose bitsets exceed the
  * broadcast budget shard further by key range (same table layout, more
  * buckets) — the layout is the Iceberg `seen_buckets` table of SURVEY §4.
  *
  * Correctness is scale-independent: the bloom is only a prefilter; every
  * positive is CONFIRMED by an exact left-anti join (the reference's
  * reference-integrity anti-join shape, src/verify.rs:230-264), so false
  * positives never drop a URL and the result equals the exact anti-join
  * at any scale / any fpp.
  */
object SeenSet {

  private[frontier] def ser(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray
  }
  private[frontier] def deser(b: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(b))

  def bucketOf(key: Column, numBuckets: Int): Column = pmod(key, lit(numBuckets.toLong))

  /** Upper bound on the serialized bytes of a [[buildBuckets]] table
    * whose filters were created with `expectedPerBucket` capacity: the
    * optimal-bits formula Spark's sketch uses (-n·ln p / ln²2), rounded
    * up to 64-bit words, plus per-filter header slack. Buckets that
    * received no keys never allocate a filter, so the true total only
    * shrinks. Lets a sizing caller pre-decide broadcast-vs-distributed
    * without running the build twice or probing its size.
    */
  def estimatedBloomBytes(expectedPerBucket: Long, numBuckets: Int,
                          fpp: Double = 0.01): Long = {
    val bits = math.ceil(-expectedPerBucket.toDouble * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
    val words = bits / 64L + 1L
    numBuckets.toLong * (words * 8L + 24L)
  }

  /** Build the per-bucket bloom table: (bucket: long, bloom: binary).
    * `seen` must carry a long column `keyCol` (xxhash64 of canonical URL).
    * One hash shuffle of raw keys; each reduce partition folds its
    * bucket(s) mutably.
    */
  def buildBuckets(seen: DataFrame, keyCol: String, numBuckets: Int,
                   expectedPerBucket: Long = 1 << 20, fpp: Double = 0.01): DataFrame = {
    val spark = seen.sparkSession
    import spark.implicits._
    seen
      .select(bucketOf(col(keyCol), numBuckets).as("bucket"),
        col(keyCol).cast("long").as("k"))
      .repartition(numBuckets, col("bucket"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val perBucket = mutable.LongMap.empty[BloomFilter]
        it.foreach { case (b, k) =>
          perBucket.getOrElseUpdate(b, BloomFilter.create(expectedPerBucket, fpp))
            .putLong(k)
        }
        perBucket.iterator.map { case (b, bf) => (b, ser(bf)) }
      }
      .toDF("bucket", "bloom")
  }

  /** Executor-side probe over the broadcast bucket table; filters are
    * deserialized once per JVM (transient lazy), not per row.
    */
  private final class BloomProbe(bc: Broadcast[Map[Long, Array[Byte]]], numBuckets: Int)
      extends Serializable {
    @transient private lazy val blooms: Map[Long, BloomFilter] =
      bc.value.map { case (b, bytes) => b -> deser(bytes) }
    def maybeSeen(key: Long): Boolean = {
      val b = math.floorMod(key, numBuckets)
      blooms.get(b.toLong).exists(_.mightContainLong(key))
    }
  }

  /** Probe: keep candidate rows whose key might NOT be in the bloom, plus
    * bloom-positives confirmed new by the exact anti-join. Equivalent to
    * `candidates LEFT ANTI JOIN seen ON key` — the bloom only shrinks the
    * anti-join's probe side.
    *
    * Path selection by bucket-table size: small tables broadcast (probe
    * stays narrow — no candidate shuffle); past `maxBroadcastBytes` the
    * table stays DISTRIBUTED and candidates cogroup with their bucket
    * ([[probeDistributed]]) — at 10^10 keys the correctly-sized bitsets
    * are ≥ 1.2 GB, which must never funnel through driver memory or a
    * whole-table broadcast.
    */
  def probeAndConfirm(candidates: DataFrame, seenKeys: DataFrame, keyCol: String,
                      buckets: DataFrame, numBuckets: Int,
                      maxBroadcastBytes: Long = 256L << 20,
                      buildBytesHint: Long = -1L): DataFrame = {
    // A caller that SIZED the bucket table (see Scheduler.runRoundImpl /
    // [[estimatedBloomBytes]]) already knows an upper bound on its
    // serialized bytes; with the hint the table is consumed exactly once
    // (collect or cogroup), so the size-probe aggregate job AND the
    // persist bridging it to the collect both disappear. Without a hint
    // the bucket table is consumed twice at construction time — once by
    // the size probe, once by the broadcast collect (or the distributed
    // cogroup) — and each consumption would otherwise re-run the whole
    // build (key shuffle + bloom fold). Persist across the two (guide
    // §5: reused AND expensive to recompute); the broadcast path
    // unpersists as soon as its collect has happened. The decision is
    // performance-only either way: both probe paths feed the same exact
    // confirm, so an off-estimate can never change rows.
    val (totalBytes, probed) =
      if (buildBytesHint >= 0L) {
        val bp =
          if (buildBytesHint <= maxBroadcastBytes)
            probeBroadcast(candidates, keyCol, buckets, numBuckets)
          else
            // the cogroup keeps the build LAZY in the result plan, so a
            // result consumed by several actions would re-run it —
            // persist like the probe-size path does
            probeDistributed(candidates, keyCol,
              buckets.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
              numBuckets)
        (buildBytesHint, bp)
      } else {
        val cached = buckets.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bytes = cached
          .agg(coalesce(sum(length(col("bloom"))), lit(0L))).head.getLong(0)
        val bp =
          if (bytes <= maxBroadcastBytes) {
            val p = probeBroadcast(candidates, keyCol, cached, numBuckets)
            cached.unpersist(false) // collect already ran; nothing lazy reads it
            p
          } else probeDistributed(candidates, keyCol, cached, numBuckets)
        (bytes, bp)
      }
    val definitelyNew = probed.where(!col("maybe_seen")).drop("maybe_seen")
    val needConfirm = probed.where(col("maybe_seen")).drop("maybe_seen")
    // SIZE-AWARE confirm join strategy (guide §3.1): the bloom bytes are
    // a capacity-derived UPPER bound on the seen-key bytes — a filter
    // stores ~9.6 bits per slot of capacity and the keys are 8 bytes, so
    // seenBytes ≤ ~6.7 × bloomBytes regardless of fill. When that bound
    // fits the broadcast budget, hint the anti-join's build side so the
    // (already bloom-shrunk) probe side never shuffles; past it the
    // planner keeps the shuffled anti-join — the only exact option at
    // 10^10 keys. Pure strategy, identical rows either way.
    val confirmSeen = seenKeys.select(col(keyCol)).distinct()
    val confirmedNew = needConfirm.join(
      if (totalBytes * 7 <= maxBroadcastBytes) broadcast(confirmSeen) else confirmSeen,
      Seq(keyCol), "left_anti")
    definitelyNew.unionByName(confirmedNew)
  }

  /** Broadcast probe (small bucket tables): candidates stay un-shuffled;
    * each executor deserializes the filters once per JVM.
    */
  private[frontier] def probeBroadcast(candidates: DataFrame, keyCol: String,
                                       buckets: DataFrame, numBuckets: Int): DataFrame = {
    val spark = candidates.sparkSession
    val bucketMap = buckets.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val probe = new BloomProbe(spark.sparkContext.broadcast(bucketMap), numBuckets)
    val maybeSeenUdf = udf((key: Long) => probe.maybeSeen(key))
    candidates.withColumn("maybe_seen", maybeSeenUdf(col(keyCol)))
  }

  /** Distributed probe (bucket tables too big to broadcast): candidates
    * cogroup with the bucket table on bucket id — one hash shuffle of the
    * candidates, zero bytes through the driver. Each group deserializes
    * its bucket's filter exactly once and streams its candidates through
    * it; a missing bucket means nothing was ever inserted there
    * (maybe_seen = false). This is the Iceberg `seen_buckets`-table layout
    * of SURVEY §4 probed bucket-local.
    */
  private[frontier] def probeDistributed(candidates: DataFrame, keyCol: String,
                                         buckets: DataFrame, numBuckets: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val schema = candidates.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val outSchema = schema.add("maybe_seen", org.apache.spark.sql.types.BooleanType,
      nullable = false)
    val candG = candidates.groupByKey((r: Row) =>
      math.floorMod(r.getLong(keyIdx), numBuckets).toLong)(Encoders.scalaLong)
    val bucketG = buckets.select(col("bucket").cast("long"), col("bloom"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .groupByKey(_._1)(Encoders.scalaLong)
    candG.cogroup(bucketG) { (_, cands, blooms) =>
      val bf = if (blooms.hasNext) Some(deser(blooms.next()._2)) else None
      bf match {
        case None => cands.map(r => Row.fromSeq(r.toSeq :+ false))
        case Some(filter) =>
          cands.map(r => Row.fromSeq(r.toSeq :+ filter.mightContainLong(r.getLong(keyIdx))))
      }
    }(Encoders.row(outSchema)).toDF()
  }

  /** Exact-only dedupe (the v0 / confirm path): candidates anti-joined
    * against seen keys.
    */
  def dedupeExact(candidates: DataFrame, seenKeys: DataFrame, keyCol: String): DataFrame =
    candidates.join(seenKeys.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
}
