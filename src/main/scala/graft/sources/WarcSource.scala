package graft.sources

import graft.core.WarcRecord
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC file source/sink (SURVEY.md §2.1 S1/S2/S5): real `.warc` /
  * `.warc.gz` files ⇄ `Dataset[WarcRecord]`.
  *
  * Read path: `spark.read.format("binaryFile")` (one row per file — WARC
  * gzip members don't line up with codec-split boundaries, and the
  * reference's own model is per-file sequential decode) → `flatMap` the
  * byte codec per file on executors. Parallelism is per-file, exactly like
  * a 1000-node crawl archive layout (many ~1 GB WARCs); a single giant
  * file would need the DataSourceV2 record-boundary splitter sketched in
  * SURVEY §2.1, which the record-at-time gzip members make possible.
  *
  * Write path: records grouped per task → one `.warc` or `.warc.gz`
  * segment per partition via the byte encoder; `file` column names the
  * logical segment.
  */
object WarcSource {

  /** Read WARC files (auto-detecting plain vs record-at-time gzip via the
    * magic bytes) into records with exact uncompressed byte offsets.
    */
  def read(spark: SparkSession, pathGlob: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        WarcBytes.detectFormat(bytes) match {
          case "warc" => WarcBytes.decodeRecords(bytes, path)
          case "gzip" => WarcBytes.decodeGzip(bytes, path)
          case "zstd" => WarcBytes.decodeZstd(bytes, path)
          case other  => throw new IllegalArgumentException(s"$path: unsupported format $other")
        }
      }
  }

  /** Write records as one WARC file per partition under `dir`
    * (part-<partition>.warc[.gz]). Records are written in within-partition
    * order; use `repartitionByRange(...).sortWithinPartitions(...)`
    * upstream for a deterministic layout.
    */
  def write(records: Dataset[WarcRecord], dir: String, gzip: Boolean = false): Unit = {
    val ext = if (gzip) ".warc.gz" else ".warc"
    records.rdd.mapPartitionsWithIndex { (pid, it) =>
      val recs = it.toSeq
      if (recs.isEmpty) Iterator.empty
      else {
        val bytes =
          if (gzip) WarcBytes.encodeGzip(recs) else WarcBytes.encodeRecords(recs)
        val path = java.nio.file.Paths.get(dir, f"part-$pid%05d$ext")
        java.nio.file.Files.createDirectories(path.getParent)
        java.nio.file.Files.write(path, bytes)
        Iterator.single(path.toString)
      }
    }.collect()
    ()
  }
}
