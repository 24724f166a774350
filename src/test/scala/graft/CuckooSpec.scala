package graft

import graft.frontier.{CuckooFilter, CuckooSeenSet}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cuckoo-filter URL-seen set: local filter semantics (no false
  * negatives, deletion, serialization) and the Spark layer's equivalence
  * to the exact anti-join before AND after deletions.
  */
class CuckooSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def keys(n: Int, seed: Long): Seq[Long] =
    (0 until n).map(i => CuckooFilter.mix(seed * 1000003L + i))

  test("no false negatives; fp rate sane at 95% load") {
    val cf = CuckooFilter.create(4000)
    val in = keys(4000, 1)
    in.foreach(k => assert(cf.insert(k)))
    assert(in.forall(cf.mightContain))
    val probes = keys(100000, 99).filterNot(in.toSet)
    val fps = probes.count(cf.mightContain)
    // expected ≈ 2·4/65536 ≈ 0.012% → ~12 of 100k; allow generous slack
    assert(fps < 100, s"false-positive rate too high: $fps / ${probes.size}")
  }

  test("delete removes a member; remaining members keep no false negatives") {
    val cf = CuckooFilter.create(2000)
    val in = keys(2000, 2)
    in.foreach(cf.insert)
    val (gone, kept) = in.splitAt(700)
    gone.foreach(k => assert(cf.delete(k)))
    // deleted keys may still collide as false positives, but members must hold
    assert(kept.forall(cf.mightContain))
    val stillThere = gone.count(cf.mightContain)
    assert(stillThere < 10, s"deleted keys still probing positive: $stillThere/700")
  }

  test("multiset inserts: copies are stored, delete removes one at a time") {
    val cf = CuckooFilter.create(100)
    assert(cf.insert(42L) && cf.insert(42L))
    assert(cf.occupied == 2)
    assert(cf.delete(42L) && cf.mightContain(42L)) // one copy remains
    assert(cf.delete(42L) && !cf.mightContain(42L))
  }

  test("delete of one key never unsees a distinct (bucket,fp)-colliding key") {
    val cf = CuckooFilter.create(100) // small → collisions easy to find
    // brute-force two DISTINCT keys sharing bucket index and fingerprint
    val seen = scala.collection.mutable.Map.empty[(Int, Short), Long]
    var pair: Option[(Long, Long)] = None
    var i = 0L
    while (pair.isEmpty && i < 1000000L) {
      val h = CuckooFilter.mix(i)
      val sig = (((h % cf.numBuckets) + cf.numBuckets) % cf.numBuckets).toInt ->
        CuckooFilter.fingerprint(h)
      seen.get(sig) match {
        case Some(k0) => pair = Some((k0, i))
        case None => seen(sig) = i
      }
      i += 1
    }
    val (k1, k2) = pair.get
    assert(cf.insert(k1) && cf.insert(k2))
    assert(cf.delete(k1))
    assert(cf.mightContain(k2), "deleting k1 must not unsee colliding k2")
  }

  test("serialize → deserialize round-trips membership") {
    val cf = CuckooFilter.create(1000)
    val in = keys(1000, 3)
    in.foreach(cf.insert)
    val back = CuckooFilter.deserialize(cf.serialize())
    assert(in.forall(back.mightContain))
    assert(back.numBuckets == cf.numBuckets)
  }

  test("Spark probeAndConfirm == exact anti-join (broadcast and cogroup paths)") {
    val seen = (0L until 5000L).filter(_ % 3 == 0).toDF("url_key")
    val cands = (2500L until 7500L).toDF("url_key")
      .withColumn("payload", concat(lit("u"), col("url_key")))
    val buckets = CuckooSeenSet.buildBuckets(seen, "url_key", 8, 1 << 12)
    val exact = cands.join(seen, Seq("url_key"), "left_anti")
      .collect().map(_.getLong(0)).sorted.toSeq
    for (maxBytes <- Seq(256L << 20, 1L)) { // broadcast path, then cogroup path
      val got = CuckooSeenSet
        .probeAndConfirm(cands, seen, "url_key", buckets, 8, maxBytes)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == exact, s"maxBroadcastBytes=$maxBytes")
    }
  }

  test("deleteKeys unsees members (exact equivalence after deletion)") {
    val seen = (0L until 3000L).toDF("url_key")
    val dels = (0L until 6000L).filter(_ % 5 == 0).toDF("url_key") // half never seen
    val cands = (0L until 6000L).toDF("url_key")
    val buckets = CuckooSeenSet.buildBuckets(seen, "url_key", 8, 1 << 12)
    val after = CuckooSeenSet.deleteKeys(buckets, dels, "url_key", 8, seen)
    // post-delete truth: seen minus deleted
    val remaining = seen.join(dels, Seq("url_key"), "left_anti")
    val exact = cands.join(remaining, Seq("url_key"), "left_anti")
      .collect().map(_.getLong(0)).sorted.toSeq
    val got = CuckooSeenSet
      .probeAndConfirm(cands, remaining, "url_key", after, 8)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == exact)
    // and the filter itself (pre-confirm) must show no false negatives on
    // the remaining members: every remaining key still probes maybe_seen
    val fn = CuckooSeenSet.probeBroadcast(remaining, "url_key", after, 8)
      .where(!col("maybe_seen")).count()
    assert(fn == 0L, "cuckoo deletion produced false negatives for members")
  }
}
