package graft.sizing

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic events→querylog adapter.
  *
  * The driver's testdata has no native query-log table, so the sizing
  * operators are exercised over a synthetic log derived from `events` by
  * pure arithmetic. Every derivation below is exactly mirrored in DuckDB
  * SQL ([[sqlCte]]) so the driver's oracle can verify the whole sizing
  * surface:
  *
  *   - integer columns use exact BIGINT arithmetic (%, *, integer div);
  *   - byte counts are multiples of 1 GiB (2^30) so GB conversions are
  *     exact binary doubles;
  *   - the only true double ops (ratio divisions, floor(value*1000)) are
  *     single IEEE-754 operations evaluated in the same shape on both
  *     engines, hence bit-identical.
  *
  * Timestamps: events.ts is parquet TIMESTAMP(NANOS); Spark surfaces raw
  * nanos as a long (Tables.load sets nanosAsLong), DuckDB truncates to µs.
  * Both sides therefore work in µs since epoch: Spark `ts div 1000`,
  * DuckDB `epoch_us(ts)`.
  */
object QuerylogAdapter {

  val GiB = 1073741824L // 2^30
  val CacheUnitBytes: Long = 16L * GiB // data read per unit, 16 GiB

  /** Spark-side derivation: canonical querylog columns + raw byte counts +
    * admitted/end instants (µs).
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events").select(
      col("event_id").as("query_id"),
      col("event_type").as("pool"),
      expr("ts div 1000").as("start_us"),
      (col("user_id") % 1000).as("admission_wait"),
      (floor(col("value") * 1000) + 1).as("duration_millis"),
      (col("user_id") % 7 + 1).cast("int").as("num_backends"),
      (col("event_id") % 3000 * CacheUnitBytes).as("hdfs_bytes"),
      ((col("event_id") % 500 + 1) * GiB).as("mem_bytes"),
      (col("event_id") % 100 * GiB).as("spill_bytes"),
      ((floor(col("value") * 1000) + 1) * (col("user_id") % 5 + 1))
        .as("cpu_time_ms"))

  /** GB/sec unit conversions (P1, py:203–206) + event instants. */
  def withUnits(qlog: DataFrame): DataFrame =
    qlog
      .withColumn("reqd_cache_gb", col("hdfs_bytes") / GiB.toDouble)
      .withColumn("reqd_agg_mem", col("mem_bytes") / GiB.toDouble)
      .withColumn("memory_spilled_gb", col("spill_bytes") / GiB.toDouble)
      .withColumn("cpu_time_sec", col("cpu_time_ms") / 1000.0)
      .withColumn("admitted_us",
        col("start_us") + col("admission_wait") * 1000)
      .withColumn("end_us",
        col("start_us") + col("admission_wait") * 1000
          + col("duration_millis") * 1000)

  /** Full derived sizing table over events: adapter → units → formulas →
    * integer sweep deltas.
    */
  def derived(spark: SparkSession, sfDir: String,
      cfg: SizingConfig = SizingConfig()): DataFrame = {
    val d = Formulas.derive(withUnits(fromEvents(spark, sfDir)), cfg)
    d.withColumn("cache_b_per_backend",
        expr("hdfs_bytes div num_backends"))
      .withColumn("mem_b_per_backend", expr("mem_bytes div num_backends"))
      .withColumn("spill_b_per_backend",
        expr("spill_bytes div num_backends"))
      .withColumn("cpu_mv_per_backend",
        expr("(min_parallelism * 1000) div num_backends"))
  }

  /** DuckDB mirror of [[derived]] as a WITH-clause prefix defining view
    * `sized`. Column-for-column identical to the Spark derivation.
    */
  def sqlCte(cfg: SizingConfig = SizingConfig(),
      where: String = ""): String = {
    val cacheAdj = cfg.cacheAdjustmentPct / 100.0
    val memAdj = cfg.memAdjustmentPct / 100.0
    val cpuAdj = cfg.cpuAdjustmentPct / 100.0
    s"""WITH qlog AS (
       |  SELECT
       |    event_id AS query_id,
       |    event_type AS pool,
       |    epoch_us(ts) AS start_us,
       |    user_id % 1000 AS admission_wait,
       |    CAST(FLOOR(value * 1000) AS BIGINT) + 1 AS duration_millis,
       |    CAST(user_id % 7 + 1 AS INTEGER) AS num_backends,
       |    event_id % 3000 * ${CacheUnitBytes} AS hdfs_bytes,
       |    (event_id % 500 + 1) * ${GiB} AS mem_bytes,
       |    event_id % 100 * ${GiB} AS spill_bytes,
       |    (CAST(FLOOR(value * 1000) AS BIGINT) + 1) * (user_id % 5 + 1) AS cpu_time_ms
       |  FROM events $where
       |), units AS (
       |  SELECT *,
       |    hdfs_bytes / ${GiB}.0 AS reqd_cache_gb,
       |    mem_bytes / ${GiB}.0 AS reqd_agg_mem,
       |    spill_bytes / ${GiB}.0 AS memory_spilled_gb,
       |    cpu_time_ms / 1000.0 AS cpu_time_sec,
       |    duration_millis / 1000.0 AS duration_sec,
       |    start_us + admission_wait * 1000 AS admitted_us,
       |    start_us + admission_wait * 1000 + duration_millis * 1000 AS end_us
       |  FROM qlog
       |), par AS (
       |  SELECT *,
       |    CAST(CEIL(cpu_time_sec / duration_sec) AS BIGINT) AS min_parallelism
       |  FROM units
       |), ratios AS (
       |  SELECT *,
       |    reqd_cache_gb * ${cacheAdj} / ${cfg.cacheGbPerNode} AS ratio_data,
       |    reqd_agg_mem * ${memAdj} / ${cfg.queryMemPerNode} AS ratio_mem,
       |    min_parallelism * ${cpuAdj} / ${cfg.parallelFactor} AS ratio_cpu,
       |    memory_spilled_gb / ${cfg.scratchGbPerNode} AS ratio_spill
       |  FROM par
       |), sized AS (
       |  SELECT *,
       |    min_parallelism / num_backends AS avg_vcores_per_node,
       |    reqd_agg_mem / num_backends AS avg_mem_per_node,
       |    reqd_cache_gb / num_backends AS avg_cache_per_node,
       |    memory_spilled_gb / num_backends AS avg_spill_per_node,
       |    (reqd_cache_gb / num_backends) / duration_sec AS avg_data_rate_per_node,
       |    CAST(CEIL(ratio_data) AS BIGINT) AS min_executor_pod_data,
       |    CAST(CEIL(ratio_mem) AS BIGINT) AS min_executor_pod_mem,
       |    CAST(CEIL(ratio_cpu) AS BIGINT) AS min_executor_pod_cpu,
       |    CAST(CEIL(ratio_spill) AS BIGINT) AS min_executor_pod_spill,
       |    CAST(CEIL(GREATEST(ratio_data, ratio_mem, ratio_cpu, ratio_spill)) AS BIGINT) AS min_executor_pod,
       |    hdfs_bytes // num_backends AS cache_b_per_backend,
       |    mem_bytes // num_backends AS mem_b_per_backend,
       |    spill_bytes // num_backends AS spill_b_per_backend,
       |    (min_parallelism * 1000) // num_backends AS cpu_mv_per_backend
       |  FROM ratios
       |)""".stripMargin
  }
}
