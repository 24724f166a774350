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
    Synth.frontierSeed(spark, n.toInt, nHosts.toInt).toDF()
      .select(col("url"), col("priority_band"))
      .withColumn("host", graft.frontier.Canonical.hostOf(col("url")))
      .repartition(64)
      .write.mode("overwrite").parquet(path)
    spark.stop()
  }
}
