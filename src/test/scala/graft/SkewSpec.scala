package graft

import graft.frontier.Politeness
import graft.pipeline.{Ann, Dedup}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew-safety equivalence proofs: every bounded-memory formulation must
  * produce EXACTLY the result of its naive single-reducer twin.
  */
class SkewSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docs(nDup: Int) = {
    val normal = (0 until 60).map(i =>
      (i.toLong, s"alpha beta gamma delta epsilon token$i zeta eta theta iota"))
    val dups = (0 until nDup).map(i => (1000L + i, "tiny dup doc graft spark"))
    (normal ++ dups).toDF("doc_id", "text")
  }

  test("minhashLsh: forced join path (cap=1) == grouped path (cap=inf)") {
    val d = docs(40)
    def pairs(cap: Int) =
      Dedup.minhashLsh(d, "doc_id", "text", 800, maxGroupedBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val joined = pairs(1)        // every band > cap → sort-merge join path
    val grouped = pairs(1 << 20) // every band ≤ cap → collect_list path
    assert(joined.nonEmpty && joined == grouped)
    // the 40 identical docs must appear as (40*39)/2 in-band pairs
    assert(joined.count { case (a, b, j) => a >= 1000 && b >= 1000 && j == 1000 } == 40 * 39 / 2)
  }

  test("minhashClusters: linear output on a degenerate band, keeper = min id") {
    val out = Dedup.minhashClusters(docs(40), "doc_id", "text", 800)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val dupRows = out.filter(_._1 >= 1000L)
    assert(dupRows.length == 39) // n-1, not n(n-1)/2
    assert(dupRows.forall { case (_, keeper, j) => keeper == 1000L && j == 1000L })
  }

  test("capPerHost (salted two-phase) == single-window top-cap, hot host included") {
    val rows = (0 until 3000).map { i =>
      val host = if (i % 2 == 0) "hot.example.test" else s"h${i % 7}.example.test"
      (s"u/$i", i % 4, host)
    }.toDF("canonical_url", "priority_band", "host")
    val salted = Politeness.capPerHost(rows, 20, nSalt = 8)
      .select("host", "priority_band", "canonical_url")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val w = Window.partitionBy("host").orderBy(col("priority_band").asc, col("canonical_url").asc)
    val plain = rows.withColumn("rn", row_number().over(w)).where(col("rn") <= 20)
      .select("host", "priority_band", "canonical_url")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
    assert(salted.count(_._1 == "hot.example.test") == 20)
  }

  test("runRound caps a degenerate host BY DEFAULT; opt-out keeps all rows") {
    import graft.frontier.Scheduler
    // 50% of the frontier on one hot host
    val frontier = (0 until 3000).map { i =>
      val host = if (i % 2 == 0) "hot" else s"h${i % 7}"
      (f"https://$host.example.test/p/$i%04d", i % 4)
    }.toDF("url", "priority_band")
    val robots = Seq.empty[(String, Long, Seq[String])]
      .toDF("host", "crawl_delay_ms", "disallow_prefixes")
    val seen = Scheduler.loadSeen(spark, "/tmp/graft-skewspec-none")
    // perHostBudget=5 → default cap = 5 × DefaultMaxBatchesPerHost = 500
    val out = Scheduler.runRound(frontier, seen, robots, perHostBudget = 5)
    val byHost = out.groupBy("host").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byHost("hot.example.test") == 500L,
      s"hot host not capped: ${byHost("hot.example.test")}")
    assert(byHost.filter(_._1 != "hot.example.test").values.sum == 1500L,
      "cold hosts must be untouched by the cap")
    // capped set = the URLs the politeness order would fetch first
    val hotUrls = out.where(col("host") === "hot.example.test")
      .select("canonical_url").collect().map(_.getString(0)).toSet
    // priority_band asc then canonical_url asc: recompute exactly
    val want = (0 until 3000).filter(_ % 2 == 0)
      .map(i => (i % 4, f"https://hot.example.test/p/$i%04d"))
      .sorted.take(500).map(_._2).toSet
    assert(hotUrls == want)
    // explicit opt-out (0) keeps every row
    val un = Scheduler.runRound(frontier, seen, robots, perHostBudget = 5,
      maxPerHostPerRound = 0)
    assert(un.count() == 3000L)
  }

  test("multi-band ANN recall: sign-preserving perturbation collides on all bands") {
    val base = (0 until 50).map { i =>
      val rng = new graft.synth.Synth.Rng(77L + i)
      (i.toLong, Array.fill(64)((rng.nextDouble() * 2 - 1).toFloat))
    }
    val pert = base.map { case (id, e) =>
      (id + 1000L, e.zipWithIndex.map { case (x, d) => if (d >= 60) -x * 0.5f else x * 0.5f })
    }
    val df = (base ++ pert).toDF("vec_id", "embedding")
    val pairs = Ann.lshNearDupPairs(df, 500, bands = 3, bitsPerBand = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every (v, v+1000) pair shares signs on dims 1..48 → must be recalled
    (0 until 50).foreach { i =>
      assert(pairs.contains((i.toLong, i + 1000L)), s"missing pair $i")
    }
  }

  test("distributed (cogrouped) bloom probe == exact anti-join == broadcast probe") {
    import graft.frontier.SeenSet
    val candidates = (0L until 500L).map(k => (k, s"c$k")).toDF("url_key", "tag")
    val seen = (0L until 500L by 3L).toDF("url_key")
    val buckets = SeenSet.buildBuckets(seen, "url_key", 8, 1 << 12)
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("url_key").collect().map(_.getLong(0)).sorted.toSeq
    val exact = keys(SeenSet.dedupeExact(candidates, seen, "url_key"))
    // force the distributed path (threshold 0) and the broadcast path
    val dist = keys(SeenSet.probeAndConfirm(candidates, seen, "url_key", buckets, 8,
      maxBroadcastBytes = 0L))
    val bcast = keys(SeenSet.probeAndConfirm(candidates, seen, "url_key", buckets, 8))
    assert(dist == exact && bcast == exact)
    assert(exact.size == 500 - 167)
  }

  test("HTTP zstd content-encoding decodes through the codec pipeline") {
    val body = "zstd body payload éü".getBytes("UTF-8")
    val compressed = com.github.luben.zstd.Zstd.compress(body, 3)
    val payload = "HTTP/1.1 200 OK\r\nContent-Encoding: zstd\r\n\r\n".getBytes("ISO-8859-1") ++
      compressed
    val p = graft.ops.HttpOps.parseResponse(payload)
    assert(p.ok && p.status == 200 && p.body.sameElements(body))
    // reference name aliases (compress.rs:84-98)
    assert(graft.ops.HttpOps.decompress("zstandard", compressed).exists(_.sameElements(body)))
    assert(graft.ops.HttpOps.decompress("zst", compressed).exists(_.sameElements(body)))
    // brotli: in the reference's table, no decoder in this container
    assert(graft.ops.HttpOps.decompress("br", body).isLeft)
  }
}
