package graft.ops

import graft.QueryModule
import graft.sizing._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-facing battery for the sizing engine core (SURVEY §2.2–2.6):
  * derivation formulas + bucketing (q17), the size matrix (q18), the
  * global workload aggregates (q19), and the sweep-line concurrency
  * operator (q20) — all over the deterministic events→querylog adapter so
  * DuckDB can oracle-check the full surface.
  *
  * q20 exercises the scalable two-pass prefix scan ([[graft.plans.PrefixSum]]):
  * the oracle's single global window proves the distributed scan equals
  * the sequential semantics.
  */
object Sizing extends QueryModule {

  private val cfg = SizingConfig() // reference defaults (sizing.conf)
  private val keptLimit = 40 // prune threshold used by q18–q20 (F4 routing)

  private def derived(s: SparkSession, dir: String): DataFrame =
    QuerylogAdapter.derived(s, dir, cfg)

  private def kept(s: SparkSession, dir: String): DataFrame =
    derived(s, dir).filter(col("min_executor_pod") <= keptLimit)

  // --- q17: per-query sizing derivation + t-shirt bucketing --------------
  private def q17(s: SparkSession, dir: String): DataFrame =
    derived(s, dir).select(
      col("query_id"), col("pool"), col("duration_sec"),
      col("min_parallelism"), col("avg_cache_per_node"),
      col("avg_data_rate_per_node"),
      col("min_executor_pod_data"), col("min_executor_pod_mem"),
      col("min_executor_pod_cpu"), col("min_executor_pod_spill"),
      col("min_executor_pod"),
      Bucketing.tsize(col("min_executor_pod")).as("recommended_tsize"))

  private def q17Sql = s"""${QuerylogAdapter.sqlCte(cfg)}
    |SELECT query_id, pool, duration_sec, min_parallelism,
    |       avg_cache_per_node, avg_data_rate_per_node,
    |       min_executor_pod_data, min_executor_pod_mem,
    |       min_executor_pod_cpu, min_executor_pod_spill, min_executor_pod,
    |       ${Bucketing.tsizeSql("min_executor_pod")} AS recommended_tsize
    |FROM sized""".stripMargin

  // --- q18: the (tsize × dimension) count matrix (A5) --------------------
  private def q18(s: SparkSession, dir: String): DataFrame =
    Aggregates.sizeMatrix(kept(s, dir))

  private def q18Sql = s"""${QuerylogAdapter.sqlCte(cfg)}
    |, kept AS (SELECT * FROM sized WHERE min_executor_pod <= $keptLimit)
    |, unpiv AS (
    |  SELECT 'count' AS dimension, ${Bucketing.tsizeSql("min_executor_pod")} AS tsize FROM kept
    |  UNION ALL
    |  SELECT 'cache', ${Bucketing.tsizeSql("min_executor_pod_data")} FROM kept
    |  UNION ALL
    |  SELECT 'mem', ${Bucketing.tsizeSql("min_executor_pod_mem")} FROM kept
    |  UNION ALL
    |  SELECT 'cpu', ${Bucketing.tsizeSql("min_executor_pod_cpu")} FROM kept
    |  UNION ALL
    |  SELECT 'spill', ${Bucketing.tsizeSql("min_executor_pod_spill")} FROM kept
    |)
    |SELECT tsize,
    |  COUNT(*) FILTER (WHERE dimension = 'count') AS "count",
    |  COUNT(*) FILTER (WHERE dimension = 'cache') AS cache,
    |  COUNT(*) FILTER (WHERE dimension = 'mem') AS mem,
    |  COUNT(*) FILTER (WHERE dimension = 'cpu') AS cpu,
    |  COUNT(*) FILTER (WHERE dimension = 'spill') AS spill
    |FROM unpiv GROUP BY tsize""".stripMargin

  // --- q19: global workload aggregates (A1–A4, A6) -----------------------
  private def q19(s: SparkSession, dir: String): DataFrame =
    Aggregates.global(kept(s, dir))

  private def q19Sql = s"""${QuerylogAdapter.sqlCte(cfg)}
    |, kept AS (SELECT * FROM sized WHERE min_executor_pod <= $keptLimit)
    |SELECT
    |  COUNT(*) AS total_queries,
    |  COUNT(DISTINCT pool) AS n_pools,
    |  STRING_AGG(DISTINCT pool, ',' ORDER BY pool) AS pools,
    |  MAX(num_backends) AS max_backends,
    |  MAX(min_parallelism / num_backends) AS max_vcores,
    |  MAX(reqd_agg_mem / num_backends) AS max_mem,
    |  MAX(reqd_cache_gb / num_backends) AS max_data,
    |  MAX((reqd_cache_gb / num_backends) / duration_sec) AS max_data_rate,
    |  MAX(memory_spilled_gb / num_backends) AS max_spill,
    |  (SELECT query_id FROM kept
    |   ORDER BY min_executor_pod DESC, query_id DESC LIMIT 1) AS max_pods_query_id,
    |  MAX(min_executor_pod) AS min_executor_pod_workload,
    |  CAST(SUM(CAST((duration_millis - admission_wait) / 1000.0 AS DECIMAL(38,6))) AS DOUBLE) AS total_query_time_sec,
    |  CAST(SUM(CAST(reqd_agg_mem * duration_sec AS DECIMAL(38,6))) AS DOUBLE) AS util_mem_gb_sec,
    |  CAST(SUM(CAST(cpu_time_sec AS DECIMAL(38,6))) AS DOUBLE) AS util_cpu_sec,
    |  CAST(SUM(CAST(reqd_cache_gb * duration_sec AS DECIMAL(38,6))) AS DOUBLE) AS util_cache_gb_sec,
    |  CAST(SUM(CAST(memory_spilled_gb * duration_sec AS DECIMAL(38,6))) AS DOUBLE) AS util_spill_gb_sec
    |FROM kept""".stripMargin

  // --- q20: sweep-line concurrency maxima (E1–E6) ------------------------
  private def q20(s: SparkSession, dir: String): DataFrame =
    Concurrency.maxima(Concurrency.sweep(kept(s, dir)))

  private def q20Sql = s"""${QuerylogAdapter.sqlCte(cfg)}
    |, kept AS (SELECT * FROM sized WHERE min_executor_pod <= $keptLimit)
    |, ev AS (
    |  SELECT query_id, admitted_us AS ts_us, 1 AS kind,
    |         CAST(1 AS BIGINT) AS d_count, min_executor_pod AS d_pods,
    |         cache_b_per_backend AS d_cache_b, mem_b_per_backend AS d_mem_b,
    |         cpu_mv_per_backend AS d_cpu_mv, spill_b_per_backend AS d_spill_b
    |  FROM kept
    |  UNION ALL
    |  SELECT query_id, end_us, 0, CAST(-1 AS BIGINT), -min_executor_pod,
    |         -cache_b_per_backend, -mem_b_per_backend,
    |         -cpu_mv_per_backend, -spill_b_per_backend
    |  FROM kept
    |), scanned AS (
    |  SELECT *,
    |    SUM(d_count) OVER w AS run_count,
    |    SUM(d_pods) OVER w AS run_pods,
    |    SUM(d_cache_b) OVER w AS run_cache_b,
    |    SUM(d_mem_b) OVER w AS run_mem_b,
    |    SUM(d_cpu_mv) OVER w AS run_cpu_mv,
    |    SUM(d_spill_b) OVER w AS run_spill_b
    |  FROM ev
    |  WINDOW w AS (ORDER BY ts_us, kind, query_id
    |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    |)
    |SELECT
    |  CAST(MAX(run_count) AS BIGINT) AS max_concurrent_queries,
    |  CAST(MAX(run_pods) AS BIGINT) AS max_concurrent_pods,
    |  CAST(MAX(run_cache_b) AS BIGINT) AS max_concurrent_cache_b,
    |  CAST(MAX(run_mem_b) AS BIGINT) AS max_concurrent_mem_b,
    |  CAST(MAX(run_cpu_mv) AS BIGINT) AS max_concurrent_cpu_mv,
    |  CAST(MAX(run_spill_b) AS BIGINT) AS max_concurrent_spill_b,
    |  (SELECT ts_us FROM scanned WHERE d_count > 0
    |   ORDER BY run_pods DESC, ts_us DESC LIMIT 1) AS max_pods_at_us
    |FROM scanned WHERE d_count > 0""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_sizing_derive" -> q17 _,
    "q18_sizing_matrix" -> q18 _,
    "q19_sizing_agg" -> q19 _,
    "q20_sweepline" -> q20 _)

  val oracleSql: Map[String, String] = Map(
    "q17_sizing_derive" -> q17Sql,
    "q18_sizing_matrix" -> q18Sql,
    "q19_sizing_agg" -> q19Sql,
    "q20_sweepline" -> q20Sql)
}
