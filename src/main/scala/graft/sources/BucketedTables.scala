package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers (SURVEY §0 "Partitioning & shuffle" stance):
  * pre-shuffling fact tables into N buckets on their join key turns every
  * later equi-join/aggregation on that key into a ZERO-SHUFFLE operation —
  * at 100 TB the one-time bucketed write amortizes across every
  * downstream join of the table pair.
  *
  * Uses the catalog writer path (`bucketBy` is only honored by
  * `saveAsTable`); readers get the bucket metadata through the catalog,
  * and Catalyst plans `SortMergeJoin` with NO Exchange when both sides
  * share the bucketing (see BucketedTablesSpec for the plan proof).
  */
object BucketedTables {

  /** Write `df` as a bucketed+sorted catalog table (overwrites). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", bucketPath(df.sparkSession, table))
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planned without
    * any shuffle exchange.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  private def bucketPath(spark: SparkSession, table: String): String =
    spark.conf.get("spark.sql.warehouse.dir") + s"/graft_bucketed/$table"
}
