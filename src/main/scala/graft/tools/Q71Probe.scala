package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cold-session phase breakdown of q71 (fleet split): fixture stat,
  * split planning, gzip-file decode, dict-zstd-file decode, full gate.
  */
object Q71Probe {
  private def time[A](label: String, f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"Q71 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val fleet = time("fixture", graft.SparkEntry.fleetGateFixture(s, dir))
    time("raw-count", graft.sources.WarcSplit.readSplitDir(s, fleet,
      splitBytes = 1L << 20).toDF().agg(count(lit(1))).head())
    time("full-q71-pass1", graft.SparkEntry.queries("q71_warc_split_fleet")(s, dir).count())
    time("full-q71-pass2", graft.SparkEntry.queries("q71_warc_split_fleet")(s, dir).count())
    time("raw-count2", graft.sources.WarcSplit.readSplitDir(s, fleet,
      splitBytes = 1L << 20).toDF().agg(count(lit(1))).head())
    s.stop()
  }
}
