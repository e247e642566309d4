package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output management for large-scale pipeline sinks (SURVEY §2.7
  * extension): Hive-partitioned parquet with BOUNDED, CLUSTERED files.
  *
  * Why this is an operator and not just `.write.partitionBy(...)`: a
  * naive partitioned write emits one file per (task × partition-value) —
  * a 1000-task job writing 100 partition values scatters up to 100k tiny
  * files, and downstream scans pay per-file open cost forever. The fix
  * has two halves:
  *
  *   - `repartitionByRange(partitionCols ++ clusterCols)` routes each
  *     partition value's rows to a contiguous task range, so each output
  *     directory receives files from few tasks, each covering a sorted
  *     key range (min/max parquet stats then prune within files too);
  *   - `maxRecordsPerFile` caps file size from above, so one huge
  *     partition value still splits into bounded files.
  *
  * Compaction ([[compact]]) is the same mechanism applied to an existing
  * directory: read, re-range, rewrite.
  */
object Output {

  /** Write `df` as Hive-partitioned parquet under `path`.
    *
    * @param partitionCols directory-level partition columns (pruning)
    * @param clusterCols   within-file sort columns (parquet min/max
    *                      stats pruning); may be empty
    * @param maxRowsPerFile upper bound on rows per output file
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], clusterCols: Seq[String],
      maxRowsPerFile: Long): Unit = {
    val rangeCols: Seq[Column] = (partitionCols ++ clusterCols).map(col)
    val sorted = df
      .repartitionByRange(rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
    sorted.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRowsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Rewrite an existing partitioned directory with the same layout but
    * bounded, range-clustered files (small-file compaction).
    */
  def compact(df: DataFrame, destPath: String, partitionCols: Seq[String],
      clusterCols: Seq[String], maxRowsPerFile: Long): Unit =
    writePartitioned(df, destPath, partitionCols, clusterCols,
      maxRowsPerFile)
}
