package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's query battery. Each entry has a
  * matching DuckDB oracle SQL in [[oracleSql]] unless the op is not
  * SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] =
    Seq(ops.Relational, ops.Sizing, ops.TextAnalysis, ops.Dedup,
      ops.Similarity, ops.Multimodal, ops.Temporal, ops.Typed, ops.Stats,
      ops.StreamSweep)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.queries("q5_multiway_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.map(_.oracleSql).reduce(_ ++ _)
}

/** A group of related operators exposing driver-checkable queries. */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
