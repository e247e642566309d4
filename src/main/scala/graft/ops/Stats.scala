package graft.ops

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical / ordered-aggregation operators (SURVEY §2.8 scalar-agg
  * complement): decimal-exact second moments (variance, stddev,
  * correlation), deterministic ordered string aggregation, and ntile
  * quantile bucketing.
  *
  * Why not the builtin `var_samp`/`stddev`/`corr` aggregates: they stream
  * IEEE-754 doubles through Welford-style merges, so the result depends on
  * partition boundaries and merge order — re-running the same query on a
  * repartitioned 100 TB table would produce a different low-order digit,
  * and the DuckDB oracle (different merge tree) would hash-mismatch.
  * Instead the moment SUMS are computed in exact DECIMAL (partial+final
  * hash aggregate, map-side combine, one shuffle of tiny per-group sums)
  * and the closed-form moment is one deterministic double expression over
  * those exact sums — identical shape in both engines, bit-for-bit stable
  * under ANY partitioning. This is the textbook "algebraic aggregate"
  * decomposition and it scales exactly like SUM/COUNT.
  */
object Stats extends QueryModule {

  // --- q67: exact moments (variance / stddev / correlation) --------------
  // Per l_returnflag over lineitem: sample variance + stddev of quantity,
  // and Pearson correlation between quantity and extendedprice, all
  // derived from exact sums {n, Σx, Σx², Σy, Σy², Σxy}.
  //
  // Accumulation types are picked per-sum from the value bounds so the hot
  // hash-aggregate adds LONGs wherever a long fits — a codegen'd 64-bit add
  // beats a Decimal128 add with 38-digit overflow checks per row:
  //   quantity x ∈ [1, 51], price y < 1.1e5, both with ≤2 fractional digits.
  //   Σx, Σy   → scaled ×100  longs: per-row ≤ 1.1e7;  6e9 rows → 6.6e16 ≪ 2^63.
  //   Σxy      → scaled ×10⁴  long:  per-row ≤ 5.6e10; 6e7 rows (sf10) →
  //              3.4e18 < 9.2e18. (Beyond ~1e8 rows Σxy needs decimal again —
  //              bound documented, battery max is sf0.1.)
  //   Σx²      → scaled ×10⁴  long:  per-row ≤ 2.7e7;  6e9 rows → 1.6e17 OK.
  //   Σy²      → per-row ≤ 1.21e10 ⇒ ×10⁴ scale overflows long at 600k rows
  //              (7.3e19 > 2^63) — stays exact DECIMAL(38,6).
  // The ×100 scaling goes through DECIMAL(12,2): a double→decimal(12,2) cast
  // rounds identically in Spark and DuckDB (the stored doubles are within
  // 1e-13 of a 2-digit value, never at a .005 boundary), after which ×100 /
  // ×10⁴ and the long cast are exact integer arithmetic in both engines.
  // Downstream moments are DOUBLE expressions of identical shape on both
  // sides, so results stay bit-for-bit stable under any partitioning.
  private def q67(s: SparkSession, dir: String): DataFrame = {
    val x2 = col("l_quantity").cast("decimal(12,2)")
    val y2 = col("l_extendedprice").cast("decimal(12,2)")
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum((x2 * 100).cast("long")).as("sx100"),
        sum((x2 * x2 * 10000).cast("long")).as("sxx1e4"),
        sum((y2 * 100).cast("long")).as("sy100"),
        sum((y2 * y2).cast("decimal(38,6)")).as("syy"),
        sum((x2 * y2 * 10000).cast("long")).as("sxy1e4"))
      .select(
        col("l_returnflag"),
        col("n"),
        // all downstream arithmetic in DOUBLE over the exact sums, in the
        // same expression shape as the oracle (IEEE-754 is deterministic
        // given identical inputs and operation order)
        expr("""round((CAST(sxx1e4 AS DOUBLE) / 10000.0 - (CAST(sx100 AS DOUBLE) / 100.0) * (CAST(sx100 AS DOUBLE) / 100.0) / CAST(n AS DOUBLE))
             | / (CAST(n AS DOUBLE) - 1.0), 4)""".stripMargin).as("var_qty"),
        expr("""round(sqrt((CAST(sxx1e4 AS DOUBLE) / 10000.0 - (CAST(sx100 AS DOUBLE) / 100.0) * (CAST(sx100 AS DOUBLE) / 100.0) / CAST(n AS DOUBLE))
             | / (CAST(n AS DOUBLE) - 1.0)), 4)""".stripMargin)
          .as("stddev_qty"),
        expr("""round((CAST(n AS DOUBLE) * (CAST(sxy1e4 AS DOUBLE) / 10000.0) - (CAST(sx100 AS DOUBLE) / 100.0) * (CAST(sy100 AS DOUBLE) / 100.0))
             | / (sqrt(CAST(n AS DOUBLE) * (CAST(sxx1e4 AS DOUBLE) / 10000.0) - (CAST(sx100 AS DOUBLE) / 100.0) * (CAST(sx100 AS DOUBLE) / 100.0))
             |    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - (CAST(sy100 AS DOUBLE) / 100.0) * (CAST(sy100 AS DOUBLE) / 100.0))), 6)"""
          .stripMargin).as("corr_qty_price"))
  }

  private val q67Sql =
    """WITH m AS (
      |  SELECT l_returnflag,
      |    COUNT(*) AS n,
      |    SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS sx100,
      |    SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * 10000 AS BIGINT)) AS sxx1e4,
      |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS sy100,
      |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(38,6))) AS syy,
      |    SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) * 10000 AS BIGINT)) AS sxy1e4
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, n,
      |  round((CAST(sxx1e4 AS DOUBLE) / 10000.0 - (CAST(sx100 AS DOUBLE) / 100.0) * (CAST(sx100 AS DOUBLE) / 100.0) / CAST(n AS DOUBLE))
      |    / (CAST(n AS DOUBLE) - 1.0), 4) AS var_qty,
      |  round(sqrt((CAST(sxx1e4 AS DOUBLE) / 10000.0 - (CAST(sx100 AS DOUBLE) / 100.0) * (CAST(sx100 AS DOUBLE) / 100.0) / CAST(n AS DOUBLE))
      |    / (CAST(n AS DOUBLE) - 1.0)), 4) AS stddev_qty,
      |  round((CAST(n AS DOUBLE) * (CAST(sxy1e4 AS DOUBLE) / 10000.0) - (CAST(sx100 AS DOUBLE) / 100.0) * (CAST(sy100 AS DOUBLE) / 100.0))
      |    / (sqrt(CAST(n AS DOUBLE) * (CAST(sxx1e4 AS DOUBLE) / 10000.0) - (CAST(sx100 AS DOUBLE) / 100.0) * (CAST(sx100 AS DOUBLE) / 100.0))
      |       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - (CAST(sy100 AS DOUBLE) / 100.0) * (CAST(sy100 AS DOUBLE) / 100.0))), 6)
      |    AS corr_qty_price
      |FROM m""".stripMargin

  // --- q68: ordered string aggregation ------------------------------------
  // Per order priority: the distinct order statuses as one sorted
  // comma-joined string. collect_set's accumulation order is
  // partition-dependent, so the SORT is what makes the aggregate
  // deterministic — same contract as LISTAGG ... WITHIN GROUP (ORDER BY).
  private def q68(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"),
        countDistinct(col("o_custkey")).as("n_custs"),
        count(lit(1)).as("n_orders"))

  private val q68Sql =
    """SELECT o_orderpriority,
      |  array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',')
      |    AS statuses,
      |  COUNT(DISTINCT o_custkey) AS n_custs,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  // --- q71: ntile quantile bucketing --------------------------------------
  // Quartiles of order value within each priority class. ntile is only
  // well-defined under a TOTAL order, so the unique o_orderkey tiebreak is
  // part of the operator contract (same rule as every other window in this
  // battery). Scale: one shuffle on the partition key; each partition
  // sorts locally — no global sort.
  private def q71(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.load(s, dir, "orders")
      .withColumn("tile", ntile(4).over(w))
      .groupBy(col("o_orderpriority"), col("tile"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
  }

  private val q71Sql =
    """WITH t AS (
      |  SELECT o_orderpriority, o_totalprice,
      |    ntile(4) OVER (PARTITION BY o_orderpriority
      |                   ORDER BY o_totalprice ASC, o_orderkey ASC) AS tile
      |  FROM orders
      |)
      |SELECT o_orderpriority, CAST(tile AS INT) AS tile, COUNT(*) AS n_orders,
      |  round(MIN(o_totalprice), 2) AS lo,
      |  round(MAX(o_totalprice), 2) AS hi
      |FROM t GROUP BY o_orderpriority, tile""".stripMargin

  // --- q76: approximate percentiles (KLL-style sketch) vs exact ----------
  // The percentile counterpart of q38's HLL entry: percentile_approx is a
  // mergeable quantile sketch (one pass, bounded memory — the 100 TB path
  // where q46's exact rank-based percentiles need a per-group sort),
  // engine-specific, so no oracle — the driver records a rows-only check
  // and the in-row `within_1pct` bits carry the real assertion against
  // the exact percentile computed in the same aggregate.
  private def q76(s: SparkSession, dir: String): DataFrame =
    graft.ParityGate(
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("p50_approx"),
          expr("percentile_approx(l_extendedprice, 0.9, 10000)").as("p90_approx"),
          expr("percentile(l_extendedprice, 0.5)").as("p50_exact"),
          expr("percentile(l_extendedprice, 0.9)").as("p90_exact"))
        .select(
          col("l_returnflag"),
          col("p50_approx"), col("p50_exact"),
          (abs(col("p50_approx") - col("p50_exact")) / col("p50_exact") < 0.01)
            .as("p50_within_1pct"),
          col("p90_approx"), col("p90_exact"),
          (abs(col("p90_approx") - col("p90_exact")) / col("p90_exact") < 0.01)
            .as("p90_within_1pct")),
      // guardNonEmpty = false: the guard would re-run the whole
      // sketch+exact aggregate for a 3-row count; an empty grouped agg
      // means an empty lineitem, visible in the driver's rows-only check.
      "q76_approx_percentile", guardNonEmpty = false,
      "p50_within_1pct", "p90_within_1pct")

  // --- q109: rank-based winsorization --------------------------------------
  // Outlier clipping at the 5th/95th percentile before aggregate stats —
  // the robust-statistics pass a metrics pipeline runs ahead of means.
  // Deliberately RANK-based (percentile_disc semantics: the boundary is
  // an ACTUAL data value at a pinned integer rank), not interpolated:
  // an interpolated boundary is a derived double whose last-ulp could
  // classify a borderline row differently across engines, whereas rank
  // arithmetic is integers and the clip boundaries are values both
  // engines read identically from parquet. Ranks are total-ordered via
  // the unique (orderkey, linenumber) tiebreak, the battery's standard
  // window contract.
  //
  // Scale shape: one shuffle on the group key; rn/n and the boundary
  // broadcast are two window passes over the SAME partitioning (no
  // second shuffle); the final aggregate is per-group. At 100 TB a
  // per-group sort is the honest cost of exact percentiles (q76 is the
  // sketch path when approximation is acceptable).
  private def q109(s: SparkSession, dir: String): DataFrame = {
    val byVal = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").asc, col("l_orderkey").asc,
        col("l_linenumber").asc)
    val whole = Window.partitionBy("l_returnflag")
    val ranked = Tables.load(s, dir, "lineitem")
      .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
      .withColumn("rn", row_number().over(byVal))
      .withColumn("n", count(lit(1)).over(whole))
      // first/last KEPT rank: clip the bottom and top floor(5% · n) rows
      .withColumn("klo", expr("(n * 5) div 100 + 1"))
      .withColumn("khi", expr("n - (n * 5) div 100"))
    val bounded = ranked
      .withColumn("lo_val",
        max(when(col("rn") === col("klo"), col("l_extendedprice"))).over(whole))
      .withColumn("hi_val",
        max(when(col("rn") === col("khi"), col("l_extendedprice"))).over(whole))
      .withColumn("wins",
        least(greatest(col("l_extendedprice"), col("lo_val")), col("hi_val")))
    bounded.groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        max(col("lo_val")).as("lo_val"),
        max(col("hi_val")).as("hi_val"),
        sum(expr("CAST(rn < klo AS BIGINT)")).as("n_clipped_low"),
        sum(expr("CAST(rn > khi AS BIGINT)")).as("n_clipped_high"),
        round(sum(col("wins").cast("decimal(18,2)")), 2).cast("double")
          .as("sum_winsorized"))
  }

  private val q109Sql =
    """WITH ranked AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem
      |), k AS (
      |  SELECT *, (n * 5) // 100 + 1 AS klo, n - (n * 5) // 100 AS khi
      |  FROM ranked
      |), b AS (
      |  SELECT *,
      |    MAX(CASE WHEN rn = klo THEN l_extendedprice END)
      |      OVER (PARTITION BY l_returnflag) AS lo_val,
      |    MAX(CASE WHEN rn = khi THEN l_extendedprice END)
      |      OVER (PARTITION BY l_returnflag) AS hi_val
      |  FROM k
      |)
      |SELECT l_returnflag, COUNT(*) AS n_rows,
      |  MAX(lo_val) AS lo_val, MAX(hi_val) AS hi_val,
      |  CAST(SUM(CAST(rn < klo AS BIGINT)) AS BIGINT) AS n_clipped_low,
      |  CAST(SUM(CAST(rn > khi AS BIGINT)) AS BIGINT) AS n_clipped_high,
      |  CAST(ROUND(SUM(CAST(least(greatest(l_extendedprice, lo_val), hi_val)
      |    AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_winsorized
      |FROM b GROUP BY l_returnflag""".stripMargin

  // --- q114: equi-width histogram + cumulative distribution ----------------
  // The profiling primitive: fixed-width value buckets per group with
  // count, cumulative count, and per-mille share — histogram + CDF in one
  // pass. Bucketing is floor(v / width) (one correctly-rounded IEEE
  // division + floor — identical across engines); the CDF is an integer
  // running sum over bucket order; the share is integer per-mille
  // floor-division. One shuffle (group key), bucket-count aggregate, then
  // a window over the BUCKETS (group-cardinality rows, not data rows).
  private val q114Width = 5000

  private def q114(s: SparkSession, dir: String): DataFrame = {
    val buckets = Tables.load(s, dir, "lineitem")
      .withColumn("bucket",
        expr(s"CAST(floor(l_extendedprice / $q114Width.0) AS BIGINT)"))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("l_returnflag")
    buckets
      .withColumn("cum_n",
        sum(col("n")).over(w.orderBy(col("bucket").asc)))
      .withColumn("total", sum(col("n")).over(w))
      .select(col("l_returnflag"), col("bucket"), col("n"), col("cum_n"),
        expr("(n * 1000) div total").as("per_mille"))
  }

  private val q114Sql =
    s"""WITH b AS (
       |  SELECT l_returnflag,
       |    CAST(FLOOR(l_extendedprice / $q114Width.0) AS BIGINT) AS bucket,
       |    COUNT(*) AS n
       |  FROM lineitem GROUP BY 1, 2
       |)
       |SELECT l_returnflag, bucket, n,
       |  CAST(SUM(n) OVER (PARTITION BY l_returnflag ORDER BY bucket ASC)
       |    AS BIGINT) AS cum_n,
       |  CAST((n * 1000) // SUM(n) OVER (PARTITION BY l_returnflag)
       |    AS BIGINT) AS per_mille
       |FROM b""".stripMargin

  // --- q115: MAD-based robust outlier detection ----------------------------
  // The other half of the robust-stats toolkit next to q109's
  // winsorization: flag rows whose modified z-score
  // |0.6745·(x − median) / MAD| exceeds 3.5 (Iglewicz–Hoaglin cutoff).
  // Median and MAD are RANK-based actual data values (q109's
  // percentile_disc argument: interpolated boundaries are ulp-fragile
  // across engines), values are exact integer centi-units
  // (floor(value·100)), and the cutoff test is pure integer arithmetic —
  // dev·6745 > mad·35000 — so classification is bit-stable everywhere.
  // Runs on events.value (heavy-tailed; lineitem/orders prices are
  // near-uniform, where max modified z ≈ 1.35 and NOTHING ever flags —
  // a threshold op needs data with a tail to be a meaningful entry).
  //
  // Scale shape: one shuffle on the group key; the value rank, the
  // deviation rank, and the per-group broadcast of median/MAD are three
  // window passes over the SAME partitioning (in-partition re-sorts, no
  // extra exchange); the verdict aggregate is per-group. Exact medians
  // cost the per-group sort — q76's sketch is the approximation path.
  private def q115(s: SparkSession, dir: String): DataFrame = {
    val whole = Window.partitionBy("event_type")
    val byVal = whole.orderBy(col("v100").asc, col("event_id").asc)
    val ranked = Tables.load(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("v100"))
      .withColumn("rn", row_number().over(byVal))
      .withColumn("n", count(lit(1)).over(whole))
      // lower median: the actual value at rank ceil(n/2)
      .withColumn("med",
        max(when(col("rn") === expr("(n + 1) div 2"), col("v100")))
          .over(whole))
      .withColumn("dev", abs(col("v100") - col("med")))
    val byDev = whole.orderBy(col("dev").asc, col("event_id").asc)
    ranked
      .withColumn("rn2", row_number().over(byDev))
      .withColumn("mad",
        max(when(col("rn2") === expr("(n + 1) div 2"), col("dev")))
          .over(whole))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_rows"),
        max(col("med")).as("median_v100"),
        max(col("mad")).as("mad_v100"),
        sum(expr("CAST(dev * 6745 > mad * 35000 AS BIGINT)"))
          .as("n_outliers"),
        max(when(expr("dev * 6745 > mad * 35000"), col("v100")))
          .as("max_outlier_v100"))
  }

  private val q115Sql =
    """WITH base AS (
      |  SELECT event_type, event_id,
      |    CAST(FLOOR(value * 100) AS BIGINT) AS v100
      |  FROM events
      |), r1 AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY v100 ASC, event_id ASC) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM base
      |), r2 AS (
      |  SELECT *, MAX(CASE WHEN rn = (n + 1) // 2 THEN v100 END)
      |    OVER (PARTITION BY event_type) AS med
      |  FROM r1
      |), r3 AS (
      |  SELECT *, ABS(v100 - med) AS dev FROM r2
      |), r4 AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      |    ORDER BY dev ASC, event_id ASC) AS rn2
      |  FROM r3
      |), r5 AS (
      |  SELECT *, MAX(CASE WHEN rn2 = (n + 1) // 2 THEN dev END)
      |    OVER (PARTITION BY event_type) AS mad
      |  FROM r4
      |)
      |SELECT event_type, COUNT(*) AS n_rows,
      |  MAX(med) AS median_v100, MAX(mad) AS mad_v100,
      |  CAST(SUM(CAST(dev * 6745 > mad * 35000 AS BIGINT)) AS BIGINT)
      |    AS n_outliers,
      |  MAX(CASE WHEN dev * 6745 > mad * 35000 THEN v100 END)
      |    AS max_outlier_v100
      |FROM r5 GROUP BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q109_winsorize" -> q109 _,
    "q115_mad_outliers" -> q115 _,
    "q114_histogram" -> q114 _,
    "q67_exact_moments" -> q67 _,
    "q68_string_agg" -> q68 _,
    "q71_ntile" -> q71 _,
    "q76_approx_percentile" -> q76 _)

  // q76 has no oracle by design: the quantile sketch is engine-specific;
  // its within_1pct bits assert accuracy against the exact percentiles.
  val oracleSql: Map[String, String] = Map(
    "q109_winsorize" -> q109Sql,
    "q115_mad_outliers" -> q115Sql,
    "q114_histogram" -> q114Sql,
    "q67_exact_moments" -> q67Sql,
    "q68_string_agg" -> q68Sql,
    "q71_ntile" -> q71Sql)
}
