package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The typed Dataset[T] surface (SURVEY §1 "Dataset[T] with case-class
  * Encoders where type safety helps"): a battery query driven through
  * case classes, lambda filters, `groupByKey`, and a custom typed
  * [[Aggregator]] with an exact-decimal buffer.
  *
  * Honest trade-off, documented: lambda filters/extractors are opaque to
  * Catalyst (no pushdown, no codegen through the lambda), which is why
  * the rest of the battery prefers Column expressions. The typed API
  * earns its keep where compile-time row shape matters more than the
  * optimizer (library boundaries, complex per-record business logic) —
  * this query proves the engine supports it with full oracle parity, and
  * the Aggregator's partial-merge contract keeps it map-side combining
  * at scale (unlike mapGroups, which would buffer whole groups).
  */
object Typed extends graft.QueryModule {

  final case class LineItemLite(orderkey: Long, flag: String, qty: Double,
      price: Double)

  /** Exact typed sum: java.math.BigDecimal buffer (DecimalType system
    * default 38,18 — associative, partition-order independent), rounded
    * to 2dp on finish, mirroring the untyped dsum(...) pattern.
    */
  private object SumQty
      extends Aggregator[LineItemLite, java.math.BigDecimal, Double] {
    override def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
    override def reduce(b: java.math.BigDecimal, a: LineItemLite)
        : java.math.BigDecimal =
      // valueOf (shortest-string repr), NOT new BigDecimal(double): the
      // latter takes the exact binary expansion (10.1 -> 10.0999...),
      // which diverges from Spark's cast(double as decimal) and the
      // oracle's CAST on any non-integral value
      b.add(java.math.BigDecimal.valueOf(a.qty))
    override def merge(x: java.math.BigDecimal, y: java.math.BigDecimal)
        : java.math.BigDecimal = x.add(y)
    override def finish(b: java.math.BigDecimal): Double =
      b.setScale(2, java.math.RoundingMode.HALF_UP).doubleValue
    override def bufferEncoder: Encoder[java.math.BigDecimal] =
      Encoders.DECIMAL
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def q62(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("orderkey"),
        col("l_returnflag").as("flag"),
        col("l_quantity").as("qty"),
        col("l_extendedprice").as("price"))
      .as[LineItemLite]
    ds.filter(li => li.qty >= 10.0 && li.price > 1000.0)
      .groupByKey(_.flag)
      .agg(SumQty.toColumn.name("sum_qty"),
        count(lit(1)).as[Long].name("n_items"))
      .toDF("flag", "sum_qty", "n_items")
  }

  val q62Sql: String =
    """SELECT l_returnflag AS flag,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,18))), 2) AS DOUBLE)
      |    AS sum_qty,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_quantity >= 10.0 AND l_extendedprice > 1000.0
      |GROUP BY l_returnflag""".stripMargin

  // --- q145: typed ordered fold — integer EWMA + anomaly count -------------
  // Per user over the (ts, event_id)-ordered event sequence: the
  // exponentially-weighted moving average of `value` as an INTEGER
  // recurrence s' = (7·s + 3·v) div 10 (α = 0.3 in tenths — floor
  // division, so the fold is exact int64 and bit-identical on any
  // engine), plus the count of readings deviating > 50.00 from the
  // running EWMA (the classic streaming anomaly gate). A linear
  // recurrence with integer floor-div is NOT expressible as a window
  // aggregate (non-associative), so this is the honest use case for the
  // typed sorted-fold: `groupByKey(user).flatMapGroups` sorts each
  // user's slice and folds once — per-group state is O(1), the shuffle
  // is the user key, and the group sort is the same cost a window
  // partition would pay. The oracle replays the identical recurrence as
  // a recursive CTE (depth = max per-user sequence length).
  final case class Reading(user_id: Long, ts_us: Long, event_id: Long,
      v100: Long)
  final case class EwmaRow(user_id: Long, n_events: Long, ewma_last: Long,
      n_anomalies: Long)

  private val AnomCents = 5000L

  def q145(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("v100"))
      .as[Reading]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        val xs = it.toArray.sortBy(r => (r.ts_us, r.event_id))
        if (xs.isEmpty) Iterator.empty
        else {
          var s0 = xs.head.v100
          var anom = 0L
          xs.iterator.drop(1).foreach { r =>
            if (math.abs(r.v100 - s0) > AnomCents) anom += 1
            s0 = Math.floorDiv(7L * s0 + 3L * r.v100, 10L)
          }
          Iterator.single(EwmaRow(uid, xs.length.toLong, s0, anom))
        }
      }
      .toDF()
  }

  val q145Sql: String =
    s"""WITH RECURSIVE ev AS (
      |  SELECT user_id,
      |    CAST(floor(value * 100) AS BIGINT) AS v,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events
      |), f AS (
      |  SELECT user_id, rn, v AS s, CAST(0 AS BIGINT) AS anom
      |  FROM ev WHERE rn = 1
      |  UNION ALL
      |  SELECT e.user_id, e.rn, (7 * f.s + 3 * e.v) // 10,
      |    f.anom + CASE WHEN abs(e.v - f.s) > $AnomCents
      |                  THEN 1 ELSE 0 END
      |  FROM f JOIN ev e ON e.user_id = f.user_id AND e.rn = f.rn + 1
      |), lastrn AS (
      |  SELECT user_id, MAX(rn) AS n FROM ev GROUP BY user_id
      |)
      |SELECT f.user_id, lastrn.n AS n_events, f.s AS ewma_last,
      |  f.anom AS n_anomalies
      |FROM f JOIN lastrn
      |  ON f.user_id = lastrn.user_id AND f.rn = lastrn.n""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q62_typed_dataset" -> q62 _,
      "q145_typed_ewma" -> q145 _)

  val oracleSql: Map[String, String] =
    Map("q62_typed_dataset" -> q62Sql,
      "q145_typed_ewma" -> q145Sql)
}
