package graft.tools

import graft.ops.VerifyOp
import org.apache.spark.sql.SparkSession

/** Times the bench's records-verified/sec headline in isolation: the
  * dirty-records fixture persisted (exactly as Bench's warmup does),
  * then repeated timed `VerifyOp.problems(...).count()` passes.
  */
object VerifyHeadProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirty = graft.SparkEntry.dirtyRecordsFor(spark, dir).persist()
    val n = spark.read.parquet(s"$dir/orders.parquet").count()
    VerifyOp.problems(dirty).count() // warm + materialize cache
    for (pass <- 1 to 5) {
      val t0 = System.nanoTime()
      VerifyOp.problems(dirty).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"VHEAD pass=$pass $sec%.3f s -> ${n / sec}%.0f records/s")
    }
    spark.stop()
  }
}
