package graft.sizing

import org.apache.spark.sql.types._

/** Canonical schemas for the sizing pipeline (SURVEY §1).
  *
  * The reference consumes two input shapes — CSV mode (py:172–187) and
  * API mode with a nested `attributes` map (py:189–208) — and emits a
  * 24-column output row (py:120). The engine's canonical input is the
  * CSV-mode shape with real types (timestamps, longs, doubles) instead of
  * the reference's strings-everywhere.
  */
object Model {

  /** CSV-mode input (py:172–187): one row per executed query. */
  val querylogSchema: StructType = StructType(Seq(
    StructField("query_id", StringType, nullable = false),
    StructField("pool", StringType, nullable = true),
    StructField("start_time", TimestampType, nullable = false),
    StructField("end_time", TimestampType, nullable = true),
    StructField("duration_millis", LongType, nullable = false),
    StructField("reqd_cache_gb", DoubleType, nullable = true), // hdfs_bytes_read / 1024³
    StructField("reqd_agg_mem", DoubleType, nullable = true), // memory_aggregate_peak GB
    StructField("memory_spilled_gb", DoubleType, nullable = true),
    StructField("cpu_time_sec", DoubleType, nullable = true),
    StructField("query_type", StringType, nullable = true),
    StructField("admission_wait", LongType, nullable = false), // ms
    StructField("num_backends", IntegerType, nullable = false)
  ))

  /** API-mode input (py:189–208): bytes/ms raw units + nested attributes. */
  val apiQuerySchema: StructType = StructType(Seq(
    StructField("queryId", StringType, nullable = false),
    StructField("startTime", StringType, nullable = false),
    StructField("endTime", StringType, nullable = true),
    StructField("durationMillis", LongType, nullable = false),
    StructField("queryState", StringType, nullable = true),
    StructField("user", StringType, nullable = true),
    StructField("queryType", StringType, nullable = true),
    StructField("attributes", MapType(StringType, StringType), nullable = true)
  ))

  /** The 24 output columns, in the reference's order (py:120). */
  val outputFields: Seq[String] = Seq(
    "query_id", "pool", "start_time", "end_time", "duration_millis",
    "duration_sec", "query_sla_sec", "reqd_cache_gb", "reqd_agg_mem",
    "memory_spilled_gb", "cpu_time_sec", "min_parallelism", "query_type",
    "admission_wait", "num_backends", "avg_vcores_per_node",
    "avg_mem_per_node", "avg_cache_per_node", "avg_spill_per_node",
    "avg_data_rate_per_node", "min_executor_pod_data",
    "min_executor_pod_mem", "min_executor_pod_cpu", "min_executor_pod_spill")
}
