package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: dumps `explain("formatted")` for headline queries so
  * scan pruning / pushdown / broadcast / codegen spans can be reviewed
  * (written to PLANS.md by tools, or stdout here).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSet else Set(
      "q01_list_project", "q05_agg_sum", "q06_join_broadcast",
      "q07_antijoin_refs", "q11_topk_per_key", "q26_politeness_schedule",
      "q28_host_stats_salted", "q41_seen_bloom_dedupe",
      "q52_seen_cuckoo_dedupe", "q55_ann_ivf", "q56_robots_raw")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // a misspelled requested name must be reported, not silently skipped
    val unknown = names -- SparkEntry.queries.keySet
    if (unknown.nonEmpty)
      System.err.println(s"[plans] unknown query names: ${unknown.mkString(", ")}")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names(name)) {
        println(s"\n===== $name =====")
        fn(spark, dir).explain("formatted")
      }
    }
    println("\n===== entry (frontier round) =====")
    SparkEntry.entry(spark).explain("formatted")
    spark.stop()
  }
}
