package graft.tools

import graft.pipeline.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Q22Probe {
  private def time[A](label: String, f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .repartition(32).select(col("doc_id"), col("text"))
    val aug = d.unionByName(d.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" graftdup")).as("text")))
    time("aug-count", aug.count())
    val sig = aug.select(
      col("doc_id").as("id"),
      array_distinct(TextOps.words(col("text"))).as("wset"),
      Dedup.minhashSig(col("text"), 4).as("sig"))
      .withColumn("band", concat(col("sig.mh0"), col("sig.mh1")))
      .where(col("sig.mh0").isNotNull)
    time("sig-count", sig.count())
    time("sig-cache-count", { sig.cache(); sig.count() })
    val a = sig.select(col("band"), col("id").as("id_a"), col("wset").as("w_a"))
    val b = sig.select(col("band"), col("id").as("id_b"), col("wset").as("w_b"))
    val joined = a.join(b, Seq("band")).where(col("id_a") < col("id_b"))
    time("join-count", joined.count())
    val inter = size(array_intersect(col("w_a"), col("w_b")))
    val union = size(array_distinct(concat(col("w_a"), col("w_b"))))
    time("jaccard-count", joined.select(col("id_a"), col("id_b"),
      floor(lit(1000.0) * inter / union).cast("long").as("j"))
      .where(col("j") >= 800).distinct().count())
    sig.unpersist()
    // new-op internals
    val sig2 = aug.select(
      col("doc_id").as("id"),
      array_distinct(TextOps.words(col("text"))).as("wset"),
      Dedup.minhashSig(col("text"), 2).as("sig"))
      .withColumn("band", concat(col("sig.mh0"), col("sig.mh1")))
      .where(col("sig.mh0").isNotNull)
    time("sig2-count", sig2.count())
    val buckets = sig2.groupBy(col("band"))
      .agg(collect_list(struct(col("id"), col("wset"))).as("members"))
      .where(size(col("members")) > 1)
    time("buckets-count", buckets.count())
    val exploded = buckets
      .select(col("members"), explode(col("members")).as("a"))
      .select(col("a"), explode(col("members")).as("b"))
      .where(col("a.id") < col("b.id"))
    time("exploded-count", exploded.count())
    time("full-op", Dedup.minhashLsh(aug, "doc_id", "text", 800).count())
    time("full-op2", Dedup.minhashLsh(aug, "doc_id", "text", 800).count())
    spark.stop()
  }
}
