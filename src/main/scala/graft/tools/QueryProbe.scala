package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries: args = sfDir query [query...].
  * Two passes each (warm JIT/codegen), prints both.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.tail) {
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
        println(f"QPROBE $q pass=$pass ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
