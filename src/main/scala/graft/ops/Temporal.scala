package graft.ops

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join/windowing operators over the `events` stream (SURVEY
  * §2.8 joins row — the as-of / range-join shapes Spark has no native
  * operator for, composed scale-first from builtins):
  *
  *  - q34 as-of join: union-tag + partitioned `last(_, ignoreNulls)`
  *    running window — one shuffle on the join key, no point-lookup loop,
  *    no theta-join blowup. The standard Spark as-of pattern.
  *  - q35 range join: time-bucketed equi-join. A naive `a.ts BETWEEN
  *    b.ts AND b.ts + w` theta join degenerates to a per-key cross
  *    product; bucketing by the window width turns it into an equi-join
  *    on (key, bucket) with ≤ 2 candidate buckets per probe row — the
  *    classic distributed range-join rewrite.
  *  - q36 sessionization: gap > 300s starts a new session — lag +
  *    running sum of session-start flags per user, then a tiny histogram.
  *
  * Timestamps: events.ts is parquet TIMESTAMP(NANOS); Spark reads raw
  * nanos as long (`ts div 1000` → µs), DuckDB truncates to µs
  * (`epoch_us`) — both sides compute on identical integers.
  */
object Temporal extends QueryModule {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        col("user_id"), col("event_type"), col("value"))

  // --- q34: as-of join -----------------------------------------------------
  // Left stream = even event_ids, right stream = odd. For each left event,
  // the value of the latest right event of the same user at-or-before its
  // instant. Tiebreaks: right-before-left at equal instants (side 0 < 1),
  // later right event_id wins among simultaneous rights.
  private def q34(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val left = ev.filter(col("event_id") % 2 === 0)
      .select(col("user_id"), col("ts_us"), lit(1).as("side"),
        col("event_id"), lit(null).cast("double").as("r_val"),
        lit(null).cast("bigint").as("r_event_id"))
    val right = ev.filter(col("event_id") % 2 === 1)
      .select(col("user_id"), col("ts_us"), lit(0).as("side"),
        col("event_id"), col("value").as("r_val"),
        col("event_id").as("r_event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.unionByName(right)
      .withColumn("asof_val", last(col("r_val"), ignoreNulls = true).over(w))
      .withColumn("asof_event",
        last(col("r_event_id"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_left"),
        count(col("asof_event")).as("n_matched"),
        sum(col("asof_val").cast("decimal(18,2)")).cast("double")
          .as("sum_asof_val"),
        max(col("asof_event")).as("last_matched_event"))
  }

  private val q34Sql =
    """WITH ev AS (
      |  SELECT event_id, epoch_us(ts) AS ts_us, user_id, value FROM events
      |), tagged AS (
      |  SELECT user_id, ts_us, 1 AS side, event_id,
      |         CAST(NULL AS DOUBLE) AS r_val,
      |         CAST(NULL AS BIGINT) AS r_event_id
      |  FROM ev WHERE event_id % 2 = 0
      |  UNION ALL
      |  SELECT user_id, ts_us, 0, event_id, value, event_id
      |  FROM ev WHERE event_id % 2 = 1
      |), joined AS (
      |  SELECT *,
      |    LAST_VALUE(r_val IGNORE NULLS) OVER w AS asof_val,
      |    LAST_VALUE(r_event_id IGNORE NULLS) OVER w AS asof_event
      |  FROM tagged
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, side, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |)
      |SELECT user_id, COUNT(*) AS n_left,
      |  COUNT(asof_event) AS n_matched,
      |  CAST(SUM(CAST(asof_val AS DECIMAL(18,2))) AS DOUBLE) AS sum_asof_val,
      |  MAX(asof_event) AS last_matched_event
      |FROM joined WHERE side = 1 GROUP BY user_id""".stripMargin

  // --- q35: bucketed range join -------------------------------------------
  // Pairs (a, b) of same-user events with b within (0, 60s] after a (ties
  // on the instant ordered by event_id). Buckets of the window width make
  // b's bucket ∈ {a.bucket, a.bucket + 1}: explode the probe side to two
  // bucket keys → pure equi-join, even key distribution, no theta join.
  private val WindowUs = 60000000L // 60s

  private def q35(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val a = ev.select(col("user_id"), col("ts_us").as("a_ts"),
        col("event_id").as("a_id"),
        explode(expr(s"array(ts_us div ${WindowUs}L," +
          s" ts_us div ${WindowUs}L + 1)")).as("bucket"))
    val b = ev.select(col("user_id"), col("ts_us").as("b_ts"),
      col("event_id").as("b_id"),
      expr(s"ts_us div ${WindowUs}L").as("bucket"))
    a.join(b, Seq("user_id", "bucket"))
      .filter(
        (col("b_ts") > col("a_ts") && col("b_ts") <= col("a_ts") + WindowUs)
          || (col("b_ts") === col("a_ts") && col("b_id") > col("a_id")))
      // no dedup needed: b's bucket equals exactly one of a's two keys,
      // so each qualifying (a, b) pair joins exactly once
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"))
  }

  private val q35Sql =
    s"""WITH ev AS (
       |  SELECT event_id, epoch_us(ts) AS ts_us, user_id FROM events
       |)
       |SELECT a.user_id, COUNT(*) AS n_pairs
       |FROM ev a JOIN ev b ON a.user_id = b.user_id
       |  AND ((b.ts_us > a.ts_us AND b.ts_us <= a.ts_us + $WindowUs)
       |       OR (b.ts_us = a.ts_us AND b.event_id > a.event_id))
       |GROUP BY a.user_id""".stripMargin

  // --- q36: sessionization --------------------------------------------------
  private val GapUs = 300000000L // 5 min

  private def q36(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
    val sessions = events(s, dir)
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts_us") - col("prev_ts") > GapUs, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(
        sum(col("new_session")).as("n_sessions"),
        count(lit(1)).as("n_events"))
    sessions
      .groupBy(col("n_sessions"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("n_events")).as("n_events"),
        expr("round(CAST(sum(n_events) AS DOUBLE) / sum(n_sessions), 4)")
          .as("avg_events_per_session"))
  }

  private val q36Sql =
    s"""WITH ev AS (
       |  SELECT event_id, epoch_us(ts) AS ts_us, user_id FROM events
       |), flagged AS (
       |  SELECT user_id,
       |    CASE WHEN LAG(ts_us, 1) OVER w IS NULL
       |           OR ts_us - LAG(ts_us, 1) OVER w > $GapUs
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
       |), per_user AS (
       |  SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       |         COUNT(*) AS n_events
       |  FROM flagged GROUP BY user_id
       |)
       |SELECT n_sessions, COUNT(*) AS n_users,
       |  CAST(SUM(n_events) AS BIGINT) AS n_events,
       |  round(CAST(SUM(n_events) AS DOUBLE) / SUM(n_sessions), 4)
       |    AS avg_events_per_session
       |FROM per_user GROUP BY n_sessions""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_asof_join" -> q34 _,
    "q35_range_join" -> q35 _,
    "q36_sessionize" -> q36 _)

  val oracleSql: Map[String, String] = Map(
    "q34_asof_join" -> q34Sql,
    "q35_range_join" -> q35Sql,
    "q36_sessionize" -> q36Sql)
}
