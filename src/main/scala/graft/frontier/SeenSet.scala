package graft.frontier

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Partitioned Bloom-filter URL-seen set (north rule; the cluster-native
  * replacement for the reference's redb RECORDS_TABLE membership probe,
  * /root/reference/src/verify.rs:405-411).
  *
  * Design for 10^10 keys: ONE driver-side bloom does not fit, so the seen
  * set is bucketed by `pmod(url_key, numBuckets)` and each bucket holds its
  * own bloom bitset, built with a distributed [[Aggregator]] (map-side
  * partial blooms merged per bucket — the shuffle carries bitsets, never
  * keys). Probing joins candidates to their bucket's (small) bitset.
  *
  * Correctness is scale-independent: the bloom is only a prefilter; every
  * positive is CONFIRMED by an exact left-anti join (the reference's
  * reference-integrity anti-join shape, src/verify.rs:230-264), so false
  * positives never drop a URL and the result equals the exact anti-join at
  * any scale / any fpp.
  */
object SeenSet {

  /** Distributed bloom-build aggregate: Aggregator over xxhash64 keys.
    * Partial blooms are built map-side and OR-merged — commutative,
    * associative, constant-size buffers.
    */
  final class BloomAgg(expectedPerBucket: Long, fpp: Double)
      extends Aggregator[Long, Array[Byte], Array[Byte]] {
    private def empty: BloomFilter = BloomFilter.create(expectedPerBucket, fpp)
    private def ser(bf: BloomFilter): Array[Byte] = {
      val bos = new ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray
    }
    private def deser(b: Array[Byte]): BloomFilter =
      BloomFilter.readFrom(new ByteArrayInputStream(b))
    override def zero: Array[Byte] = ser(empty)
    override def reduce(buf: Array[Byte], key: Long): Array[Byte] = {
      val bf = deser(buf); bf.putLong(key); ser(bf)
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val x = deser(a); x.mergeInPlace(deser(b)); ser(x)
    }
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def bucketOf(key: Column, numBuckets: Int): Column = pmod(key, lit(numBuckets.toLong))

  /** Build the per-bucket bloom table: (bucket: long, bloom: binary).
    * `seen` must carry a long column `keyCol` (xxhash64 of canonical URL).
    */
  def buildBuckets(seen: DataFrame, keyCol: String, numBuckets: Int,
                   expectedPerBucket: Long = 1 << 20, fpp: Double = 0.01): DataFrame = {
    val agg = udaf(new BloomAgg(expectedPerBucket, fpp))
    seen.groupBy(bucketOf(col(keyCol), numBuckets).as("bucket"))
      .agg(agg(col(keyCol)).as("bloom"))
  }

  /** Probe: keep candidate rows whose key might NOT be in the bloom, plus
    * bloom-positives confirmed new by the exact anti-join. Equivalent to
    * `candidates LEFT ANTI JOIN seen ON key` — the bloom only shrinks the
    * anti-join's probe side.
    */
  def probeAndConfirm(candidates: DataFrame, seenKeys: DataFrame, keyCol: String,
                      buckets: DataFrame, numBuckets: Int): DataFrame = {
    val mightContain = udf((bloom: Array[Byte], key: Long) =>
      bloom != null && BloomFilter.readFrom(new ByteArrayInputStream(bloom)).mightContainLong(key))
    val probed = candidates
      .withColumn("bucket", bucketOf(col(keyCol), numBuckets))
      .join(broadcast(buckets), Seq("bucket"), "left")
      .withColumn("maybe_seen", coalesce(mightContain(col("bloom"), col(keyCol)), lit(false)))
      .drop("bloom", "bucket")
    val definitelyNew = probed.where(!col("maybe_seen")).drop("maybe_seen")
    val needConfirm = probed.where(col("maybe_seen")).drop("maybe_seen")
    val confirmedNew = needConfirm.join(
      seenKeys.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    definitelyNew.unionByName(confirmedNew)
  }

  /** Exact-only dedupe (the v0 / confirm path): candidates anti-joined
    * against seen keys.
    */
  def dedupeExact(candidates: DataFrame, seenKeys: DataFrame, keyCol: String): DataFrame =
    candidates.join(seenKeys.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
}
