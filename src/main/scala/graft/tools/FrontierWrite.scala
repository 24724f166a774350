package graft.tools

import graft.synth.Synth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Write the synthetic frontier seed as a fixed-layout parquet table —
  * the Iceberg-frontier stand-in every bench cores-level scans (one
  * write, identical files for every reader). Args: path n nHosts.
  */
object FrontierWrite {
  def main(args: Array[String]): Unit = {
    val Array(path, n, nHosts) = args.take(3)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // host is materialized in the stored frontier (the north-rule table
    // is laid out on (priority_band, host_hash) — host is a real column),
    // so rounds never re-derive it and the hot-host count pass reads one
    // pruned column
    val seed = Synth.frontierSeed(spark, n.toInt, nHosts.toInt).toDF()
      .select(col("url"), col("priority_band"))
      .withColumn("host", graft.frontier.Canonical.hostOf(col("url")))
    if (args.length > 3 && args(3) == "bucketed")
      // CLUSTERED BY host, one file per bucket (repartition key hashing
      // == bucket hashing) — the layout the exchange-free round scans
      seed.repartition(64, col("host"))
        .write.mode("overwrite").bucketBy(64, "host")
        .option("path", path).saveAsTable("graft_frontier_write")
    else
      seed.repartition(64).write.mode("overwrite").parquet(path)
    spark.stop()
  }
}
