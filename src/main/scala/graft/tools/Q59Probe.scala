package graft.tools

import graft.ops.ExtractOp
import graft.synth.Synth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown of q59 (crawl→images bridge): which part of the
  * pipeline actually costs the wall time.
  */
object Q59Probe {
  private def time[A](label: String, f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"Q59 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
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

    def build = {
      val isImg = pmod(col("o_orderkey"), lit(3)) === 0
      val pngs: Array[Array[Byte]] =
        Array.tabulate(120)(j => Synth.makeImage(7L, j.toLong).bytes)
      val pngUdf = udf((i: Long) => pngs((i % 120).toInt))
      s.read.parquet(s"$dir/orders.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(
        col("o_orderkey").as("position"),
        lit("img.warc").as("file"), lit("WARC/1.1").as("version"),
        array(
          struct(lit("WARC-Record-ID").as("name"),
            concat(lit("<urn:img:"), col("o_orderkey").cast("string"), lit(">")).as("value")),
          struct(lit("WARC-Type").as("name"), lit("resource").as("value")),
          struct(lit("Content-Type").as("name"),
            when(isImg, lit("image/png")).otherwise(lit("text/plain")).as("value")),
          struct(lit("WARC-Target-URI").as("name"),
            concat(lit("https://img.test/i/"), col("o_orderkey").cast("string")).as("value"))
        ).as("fields"),
        when(isImg, pngUdf(col("o_orderkey")))
          .otherwise(col("o_orderpriority").cast("binary")).as("bytes"))
    }
    for (pass <- 1 to 2) {
      time(s"$pass.recs-count", build.agg(count(lit(1))).head())
      time(s"$pass.recs-noop", build.write.format("noop").mode("overwrite").save())
      time(s"$pass.extract-noop", ExtractOp.extract(build).write.format("noop").mode("overwrite").save())
      val full = graft.pipeline.Multimodal.imagesFromExtracted(ExtractOp.extract(build))
        .select(col("image_id"), col("fmt"),
          (col("w") > 0 && col("h") > 0).as("dims_ok"), col("caption"))
      time(s"$pass.full-count", full.count())
    }
    s.stop()
  }
}
