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

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q62_typed_dataset" -> q62 _)

  val oracleSql: Map[String, String] =
    Map("q62_typed_dataset" -> q62Sql)
}
