package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner for the flagship entry (mirrors the driver's
  * rows>0 check on sf0.001).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // cached: count() + show() would otherwise each run the full
    // frontier round
    val df = SparkEntry.entry(spark).persist()
    println("ENTRY_ROWS=" + df.count())
    df.show(5, truncate = false)
    spark.stop()
  }
}
