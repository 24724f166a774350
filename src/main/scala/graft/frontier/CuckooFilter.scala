package graft.frontier

import java.nio.{ByteBuffer, ByteOrder}

/** Cuckoo filter over 64-bit keys — the deletable URL-seen membership
  * sketch (north rule: "bloom/cuckoo URL-seen ... cuckoo-filter fallback
  * for deletions"). A Bloom filter cannot unsee a URL (clearing shared
  * bits corrupts other members), so frontiers that must re-admit URLs
  * (re-crawl scheduling, revisit invalidation) bucket into cuckoo
  * filters instead.
  *
  * Standard partial-key cuckoo hashing (Fan, Andersen, Kaminsky,
  * Mitzenmacher, "Cuckoo Filter: Practically Better Than Bloom",
  * CoNEXT 2014): `m` buckets (power of two) × 4 slots × 16-bit
  * fingerprints; alternate bucket `i2 = i1 XOR H(fp)` so either bucket
  * is derivable from the other plus the stored fingerprint; inserts
  * evict a random resident on collision (bounded kick chain).
  *
  * Guarantees (as in the paper):
  *  - no false negatives for present keys;
  *  - `delete` is only sound for keys actually inserted (deleting a
  *    never-inserted key may strip another key's colliding fingerprint) —
  *    callers must gate deletions on membership in the source-of-truth
  *    table, which the Spark layer ([[CuckooSeenSet]]) does by exact
  *    semi-join;
  *  - false-positive rate ≈ 2·4/2^16 per probe ≈ 0.012% at 95% load.
  *
  * Mutable, not thread-safe — one instance per partition fold, exactly
  * like the Bloom path in [[SeenSet]].
  */
final class CuckooFilter private (val numBuckets: Int, val slots: Array[Short]) {
  import CuckooFilter._

  private[this] val mask = numBuckets - 1
  // deterministic eviction choice (Date.now/Math.random are banned in
  // workflow scripts and nondeterminism would break test replay anyway)
  private[this] var evictState = 0x9e3779b97f4a7c15L

  private def bucketIndex(h: Long): Int = (h & mask).toInt
  private def altIndex(i: Int, fp: Int): Int = (i ^ bucketIndex(mix(fp.toLong))) & mask

  private def slotBase(i: Int) = i * SlotsPerBucket

  private def findInBucket(i: Int, fp: Short): Int = {
    val base = slotBase(i)
    var s = 0
    while (s < SlotsPerBucket) {
      if (slots(base + s) == fp) return base + s
      s += 1
    }
    -1
  }

  private def emptyInBucket(i: Int): Int = findInBucket(i, 0)

  /** Insert; returns false only when the filter is beyond capacity (the
    * kick chain exhausted) — the Spark layer sizes buckets so this is a
    * build-time error, not a silent drop.
    *
    * MULTISET semantics, as the paper requires for deletion support: a
    * colliding fingerprint is stored AGAIN, never deduplicated. (An
    * "idempotent" insert would make delete unsound for two DISTINCT keys
    * sharing a (bucket, fingerprint) — deleting one would unsee the
    * other, a false negative.) Consequence, also from the paper: the
    * same key must not be inserted more than 2·4 times (both buckets
    * full of its own copies would livelock the kick chain) — callers
    * deduplicate keys first ([[CuckooSeenSet.buildBuckets]] does).
    */
  def insert(key: Long): Boolean = {
    val h = mix(key)
    val fp = fingerprint(h)
    val i1 = bucketIndex(h)
    val i2 = altIndex(i1, fp)
    var slot = emptyInBucket(i1)
    if (slot >= 0) { slots(slot) = fp; return true }
    slot = emptyInBucket(i2)
    if (slot >= 0) { slots(slot) = fp; return true }
    // evict: bounded random-walk kick chain
    var i = if (nextBit()) i1 else i2
    var f = fp
    var kicks = 0
    while (kicks < MaxKicks) {
      val victim = slotBase(i) + nextSlot()
      val old = slots(victim)
      slots(victim) = f
      f = old
      i = altIndex(i, f)
      val empty = emptyInBucket(i)
      if (empty >= 0) { slots(empty) = f; return true }
      kicks += 1
    }
    false
  }

  def mightContain(key: Long): Boolean = {
    val h = mix(key)
    val fp = fingerprint(h)
    val i1 = bucketIndex(h)
    findInBucket(i1, fp) >= 0 || findInBucket(altIndex(i1, fp), fp) >= 0
  }

  /** Remove one copy of the key's fingerprint; returns whether one was
    * found. Only call for keys known inserted (see class doc).
    */
  def delete(key: Long): Boolean = {
    val h = mix(key)
    val fp = fingerprint(h)
    val i1 = bucketIndex(h)
    var slot = findInBucket(i1, fp)
    if (slot < 0) slot = findInBucket(altIndex(i1, fp), fp)
    if (slot < 0) false
    else { slots(slot) = 0; true }
  }

  def occupied: Int = slots.count(_ != 0)

  private def nextBit(): Boolean = { evictState = mix(evictState); (evictState & 1L) == 1L }
  private def nextSlot(): Int = { evictState = mix(evictState); (evictState & 3L).toInt }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + slots.length * 2).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic)
    bb.putInt(numBuckets)
    slots.foreach(bb.putShort)
    bb.array()
  }
}

object CuckooFilter {
  private val Magic = 0x43554b46 // "CUKF"
  val SlotsPerBucket = 4
  private val MaxKicks = 500

  /** splitmix64 finalizer (public domain, Steele et al.) — full-avalanche
    * 64-bit mix used for bucket index, fingerprint, and the alt-index
    * hash of the fingerprint.
    */
  private[graft] def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** 16-bit nonzero fingerprint from the hash's top bits (disjoint from
    * the low bits used for the bucket index).
    */
  private[graft] def fingerprint(h: Long): Short = {
    val fp = ((h >>> 48) & 0xffffL).toInt
    (if (fp == 0) 1 else fp).toShort
  }

  /** Capacity-sized empty filter: buckets = next power of two holding
    * `expected` keys at ≤95% load (the paper's practical limit for
    * 4-slot buckets).
    */
  def create(expected: Long): CuckooFilter = {
    val needed = math.max(1L, math.ceil(expected / (SlotsPerBucket * 0.95)).toLong)
    val m = java.lang.Long.highestOneBit(math.max(1L, needed * 2 - 1))
    require(m * SlotsPerBucket <= Int.MaxValue / 2, s"cuckoo filter too large: $expected")
    new CuckooFilter(m.toInt, new Array[Short](m.toInt * SlotsPerBucket))
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt() == Magic, "not a cuckoo filter blob")
    val m = bb.getInt()
    val slots = new Array[Short](m * SlotsPerBucket)
    var i = 0
    while (i < slots.length) { slots(i) = bb.getShort(); i += 1 }
    new CuckooFilter(m, slots)
  }
}
