package graft.frontier

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Partitioned CUCKOO-filter URL-seen set — the deletable variant of
  * [[SeenSet]] (north rule: "cuckoo-filter fallback for deletions").
  *
  * Same 10^10-scale layout as the Bloom path: the seen set is bucketed
  * by `pmod(url_key, numBuckets)`; build is one shuffle of RAW 8-byte
  * keys then a per-partition mutable fold into each bucket's filter
  * (the shuffle never carries filter blobs). Probe follows the same
  * size-aware broadcast-vs-cogroup selection, and every positive is
  * CONFIRMED by the exact anti-join, so results equal the exact
  * anti-join at any fpp.
  *
  * What Bloom cannot do: [[deleteKeys]] removes members in place — a
  * distributed cogroup of (bucket ← deletions) with the bucket table,
  * each group deserializing its filter once, deleting its keys, and
  * re-serializing. Deletions are first gated by an exact semi-join
  * against the source-of-truth seen table because cuckoo deletion of a
  * never-inserted key can strip a colliding member's fingerprint
  * (CuckooFilter class doc).
  */
object CuckooSeenSet {

  def bucketOf(key: org.apache.spark.sql.Column, numBuckets: Int) =
    pmod(key, lit(numBuckets.toLong))

  /** Build the per-bucket cuckoo table: (bucket: long, cuckoo: binary). */
  def buildBuckets(seen: DataFrame, keyCol: String, numBuckets: Int,
                   expectedPerBucket: Long = 1 << 20): DataFrame = {
    val spark = seen.sparkSession
    import spark.implicits._
    seen
      .select(bucketOf(col(keyCol), numBuckets).as("bucket"),
        col(keyCol).cast("long").as("k"))
      .repartition(numBuckets, col("bucket"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val perBucket = mutable.LongMap.empty[CuckooFilter]
        // per-partition key dedupe: the filter stores MULTISET copies
        // (deletion soundness), so each key must be inserted exactly
        // once; a key's every occurrence lands in this partition
        // (partitioned by pmod(key)), so a local set is exact
        val seenKeys = new java.util.HashSet[Long]()
        it.foreach { case (b, k) =>
          if (seenKeys.add(k)) {
            val cf = perBucket.getOrElseUpdate(b, CuckooFilter.create(expectedPerBucket))
            require(cf.insert(k), s"cuckoo bucket $b over capacity (size for expectedPerBucket)")
          }
        }
        perBucket.iterator.map { case (b, cf) => (b, cf.serialize()) }
      }
      .toDF("bucket", "cuckoo")
  }

  /** Delete keys from the bucket table (returns the updated table).
    * `deletions` rows whose key is not in `seenKeys` are ignored (exact
    * semi-join gate — see object doc); buckets with no deletions pass
    * through untouched.
    */
  def deleteKeys(buckets: DataFrame, deletions: DataFrame, keyCol: String,
                 numBuckets: Int, seenKeys: DataFrame): DataFrame = {
    val spark = buckets.sparkSession
    // distinct BEFORE the filter mutation: the filter holds exactly one
    // copy per member key, so a duplicated deletion row must not remove
    // a second copy (which could be another key's colliding fingerprint)
    val dels = deletions.select(col(keyCol).cast("long").as("k")).distinct()
      .join(seenKeys.select(col(keyCol).cast("long").as("k")).distinct(), Seq("k"),
        "left_semi")
      .select(bucketOf(col("k"), numBuckets).as("bucket"), col("k"))
    val delG = dels.as[(Long, Long)](Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .groupByKey(_._1)(Encoders.scalaLong)
    val bucketG = buckets.select(col("bucket").cast("long"), col("cuckoo"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .groupByKey(_._1)(Encoders.scalaLong)
    bucketG.cogroup(delG) { (b, blobs, dels) =>
      if (!blobs.hasNext) Iterator.empty // deletions for a bucket never built
      else {
        val blob = blobs.next()._2
        if (!dels.hasNext) Iterator.single((b, blob))
        else {
          val cf = CuckooFilter.deserialize(blob)
          dels.foreach { case (_, k) => cf.delete(k) }
          Iterator.single((b, cf.serialize()))
        }
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("bucket", "cuckoo")
  }

  private final class CuckooProbe(bc: Broadcast[Map[Long, Array[Byte]]], numBuckets: Int)
      extends Serializable {
    @transient private lazy val filters: Map[Long, CuckooFilter] =
      bc.value.map { case (b, bytes) => b -> CuckooFilter.deserialize(bytes) }
    def maybeSeen(key: Long): Boolean = {
      val b = math.floorMod(key, numBuckets)
      filters.get(b.toLong).exists(_.mightContain(key))
    }
  }

  /** Probe + exact confirm ≡ `candidates LEFT ANTI JOIN seen ON key`
    * (same contract and size-aware path selection as
    * [[SeenSet.probeAndConfirm]]).
    */
  def probeAndConfirm(candidates: DataFrame, seenKeys: DataFrame, keyCol: String,
                      buckets: DataFrame, numBuckets: Int,
                      maxBroadcastBytes: Long = 256L << 20): DataFrame = {
    // persist across the size probe + collect/cogroup pair, exactly like
    // [[SeenSet.probeAndConfirm]] — without it the whole filter build
    // (and any deleteKeys chain feeding it) runs twice
    val cached = buckets.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totalBytes = cached
      .agg(coalesce(sum(length(col("cuckoo"))), lit(0L))).head.getLong(0)
    val broadcastPath = totalBytes <= maxBroadcastBytes
    val probed =
      if (broadcastPath) {
        val p = probeBroadcast(candidates, keyCol, cached, numBuckets)
        cached.unpersist(false) // collect already ran; nothing lazy reads it
        p
      } else probeDistributed(candidates, keyCol, cached, numBuckets)
    val definitelyNew = probed.where(!col("maybe_seen")).drop("maybe_seen")
    val needConfirm = probed.where(col("maybe_seen")).drop("maybe_seen")
    // size-aware confirm strategy, as in [[SeenSet.probeAndConfirm]]: a
    // cuckoo filter stores 2 bytes per slot of capacity vs 8-byte keys,
    // so seenBytes ≤ 4 × filterBytes — broadcast the build side under
    // the budget, keep the shuffled anti-join past it (identical rows)
    val confirmSeen = seenKeys.select(col(keyCol)).distinct()
    val confirmedNew = needConfirm.join(
      if (totalBytes * 4 <= maxBroadcastBytes) broadcast(confirmSeen) else confirmSeen,
      Seq(keyCol), "left_anti")
    definitelyNew.unionByName(confirmedNew)
  }

  private[graft] def probeBroadcast(candidates: DataFrame, keyCol: String,
                                       buckets: DataFrame, numBuckets: Int): DataFrame = {
    val spark = candidates.sparkSession
    val bucketMap = buckets.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val probe = new CuckooProbe(spark.sparkContext.broadcast(bucketMap), numBuckets)
    val maybeSeenUdf = udf((key: Long) => probe.maybeSeen(key))
    candidates.withColumn("maybe_seen", maybeSeenUdf(col(keyCol)))
  }

  /** Distributed probe — same cogroup shape as [[SeenSet.probeDistributed]]. */
  private[graft] def probeDistributed(candidates: DataFrame, keyCol: String,
                                         buckets: DataFrame, numBuckets: Int): DataFrame = {
    val schema = candidates.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val outSchema = schema.add("maybe_seen", org.apache.spark.sql.types.BooleanType,
      nullable = false)
    val candG = candidates.groupByKey((r: Row) =>
      math.floorMod(r.getLong(keyIdx), numBuckets).toLong)(Encoders.scalaLong)
    val bucketG = buckets.select(col("bucket").cast("long"), col("cuckoo"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .groupByKey(_._1)(Encoders.scalaLong)
    candG.cogroup(bucketG) { (_, cands, blobs) =>
      val cf = if (blobs.hasNext) Some(CuckooFilter.deserialize(blobs.next()._2)) else None
      cf match {
        case None => cands.map(r => Row.fromSeq(r.toSeq :+ false))
        case Some(filter) =>
          cands.map(r => Row.fromSeq(r.toSeq :+ filter.mightContain(r.getLong(keyIdx))))
      }
    }(Encoders.row(outSchema)).toDF()
  }
}
