package graft.tools

import graft.core.{Digests, Field}
import graft.core.FieldOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-split q61: fixture gen+writeSingleFile vs split-decode+agg,
  * repeated N passes in one JVM to find what degrades on repeat.
  * Args: sfDir [passes].
  */
object Q61Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    for (pass <- 1 to passes) {
      val tmp = java.nio.file.Files.createTempDirectory("graft-q61probe").toString
      var t0 = System.nanoTime()
      val recs = spark.read.parquet(s"$sfDir/orders.parquet").select(col("o_orderkey"))
        .repartition(spark.sparkContext.defaultParallelism).as[Long].map { k =>
          val len = 1600 + (k % 7L).toInt * 137
          val bytes = new Array[Byte](len)
          val rng = new graft.synth.Synth.Rng(k * 0x9e3779b9L + 7L)
          var j = 0
          while (j < len) { bytes(j) = rng.nextLong().toByte; j += 1 }
          graft.core.WarcRecord(0L, "big.warc.gz", "WARC/1.1", Seq(
            Field("WARC-Record-ID", s"<urn:split:$k>"),
            Field("WARC-Type", "resource"),
            Field("WARC-Block-Digest", Digests.formatDigest("sha1",
              Digests.compute("sha1", bytes).get)),
            Field("Content-Length", len.toString)), bytes)
        }
      val file = s"$tmp/big.warc.gz"
      graft.sources.WarcSource.writeSingleFile(recs, file, gzip = true)
      val tWrite = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      val ds = graft.sources.WarcSplit.readSplit(spark, file, splitBytes = 2L << 20).toDF()
      val recId = regexp_extract(
        FieldOps.fieldGet(col("fields"), "WARC-Record-ID"), "<urn:split:([0-9]+)>", 1)
        .cast("long")
      val digestOk = udf { (declared: String, bytes: Array[Byte]) =>
        Digests.computeText("sha1", bytes).contains(declared)
      }
      val base = ds.select(recId.as("rec_id"),
        (length(col("bytes")) === (lit(1600) + pmod(recId, lit(7)) * 137)).as("len_ok"),
        digestOk(FieldOps.fieldGet(col("fields"), "WARC-Block-Digest"),
          col("bytes")).as("digest_ok"),
        col("position"), spark_partition_id().as("pid"))
        .persist()
      val flags = base.agg(
        (countDistinct(col("position")) === count(lit(1))).as("pos_ok"),
        (max(col("pid")) > min(col("pid"))).as("split_ok")).head()
      val n = base.count()
      val tRead = (System.nanoTime() - t0) / 1e9
      base.unpersist()
      // delete the fixture eagerly (what the bench version should do)
      new java.io.File(file).delete()
      new java.io.File(tmp).delete()
      println(f"Q61PROBE pass=$pass write=$tWrite%.2f read=$tRead%.2f rows=$n ok=${flags.getBoolean(0) && flags.getBoolean(1)}")
    }
    spark.stop()
  }
}
