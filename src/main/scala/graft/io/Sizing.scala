package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Output-file sizing — the small-files control every 100 TB pipeline
  * needs at its sinks: a shuffle-heavy job ending in hundreds of
  * near-empty partitions writes hundreds of near-empty parquet files,
  * and a downstream scan then pays one task + one footer read + one
  * object-store request per file; conversely one giant file serializes
  * the next scan. [[writeSized]] targets a bytes-per-file budget
  * instead of inheriting the upstream partition count.
  *
  * The estimate is measured, not guessed: a bounded row sample is
  * written as REAL parquet (same codec, same encodings) and its on-disk
  * bytes/row — compression included — sizes the repartition. Two extra
  * bounded costs (one count, one sample write); the full data is
  * written exactly once. The sample is an ESTIMATE (first-rows bias,
  * per-column compression variance) — the spec pins a 2× band, not
  * equality; callers needing exact bounds should post-compact.
  *
  * `maxRecordsPerFile` is the complementary built-in (a hard row cap
  * per file, no size model) — [[writeSized]] exists because a BYTE
  * budget is what object stores and scan planners actually care about.
  */
object Sizing {

  /** What a sized write did: the measured estimate and the layout it
    * chose, for audit logs and the spec.
    */
  final case class SizedWriteReport(rows: Long, sampledRows: Long,
                                    estBytesPerRow: Double, files: Int,
                                    writtenBytes: Long, writtenFiles: Int)

  /** Write `df` as parquet at `path` (overwrite), sized so each output
    * file lands near `targetBytes` (default 128 MiB — the classic HDFS
    * block / object-store sweet spot). `maxFiles` caps the repartition
    * width (a pathological estimate must not fan a small table into
    * thousands of shuffle partitions).
    */
  def writeSized(df: DataFrame, path: String,
                 targetBytes: Long = 128L * 1024 * 1024,
                 sampleRows: Int = 10000,
                 maxFiles: Int = 100000): SizedWriteReport = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    require(sampleRows > 0, s"sampleRows must be positive, got $sampleRows")
    val spark = df.sparkSession
    val fs = graft.streaming.CompactionSwap.fsFor(path,
      spark.sparkContext.hadoopConfiguration)

    val n = df.count()
    if (n == 0) {
      // still produce a readable (empty) dataset: schema-bearing write
      df.coalesce(1).write.mode("overwrite").parquet(path)
      return SizedWriteReport(0L, 0L, 0.0, 1, dirBytes(fs, path),
        dirFiles(fs, path))
    }

    val samplePath = path + ".sizing-sample"
    fs.delete(new Path(samplePath), true)
    val sampled = math.min(n, sampleRows.toLong)
    df.limit(sampleRows).coalesce(1)
      .write.mode("overwrite").parquet(samplePath)
    val bytesPerRow =
      try math.max(1.0, dirBytes(fs, samplePath).toDouble / sampled)
      finally fs.delete(new Path(samplePath), true): Unit

    val files = math.max(1L, math.min(maxFiles.toLong,
      math.ceil(n * bytesPerRow / targetBytes).toLong)).toInt
    df.repartition(files).write.mode("overwrite").parquet(path)
    SizedWriteReport(n, sampled, bytesPerRow, files,
      dirBytes(fs, path), dirFiles(fs, path))
  }

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem, dir: String) =
    Option(fs.listStatus(new Path(dir))).getOrElse(Array.empty)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))

  private def dirBytes(fs: org.apache.hadoop.fs.FileSystem, dir: String): Long =
    dataFiles(fs, dir).map(_.getLen).sum

  private def dirFiles(fs: org.apache.hadoop.fs.FileSystem, dir: String): Int =
    dataFiles(fs, dir).length
}
