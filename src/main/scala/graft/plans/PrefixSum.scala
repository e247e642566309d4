package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running (prefix) sums over a global ordering.
  *
  * A naive `Window.orderBy(ts)` with no partitionBy collapses the whole
  * dataset into ONE task — correct at 60k rows, dead at 100 TB. This is the
  * classic two-pass parallel scan instead (SURVEY §2.6 scale note):
  *
  *   1. `repartitionByRange` on the order key: partition i holds keys ≤
  *      partition i+1's, so partition id IS the coarse order.
  *   2. Per-partition running sums via a window PARTITIONED by partition id
  *      (parallel, no global sort bottleneck).
  *   3. Per-partition totals (numPartitions rows — tiny) are collected,
  *      turned into exclusive carry-in offsets on the driver, and joined
  *      back via broadcast.
  *
  * Every pass is builtin ops — no custom Catalyst work needed; AQE still
  * gets to size the range shuffle.
  *
  * The order defined by `orderCols` MUST be total (include a unique
  * tiebreak column) or running values at ties are nondeterministic.
  */
object PrefixSum {

  /** Adds a running-sum column `dst` for each `(src, dst)` in `sumCols`,
    * over the global `orderCols` ordering. Sums are computed on the source
    * column's own type (use integer/decimal deltas for exact,
    * associativity-safe accumulation; see caller notes).
    */
  def scan(df: DataFrame, orderCols: Seq[Column],
      sumCols: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    val parted = df
      .repartitionByRange(nParts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())

    val w = Window.partitionBy("__pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sumCols.foldLeft(parted) { case (d, (src, dst)) =>
      d.withColumn(dst, sum(col(src)).over(w))
    }

    // Pass 2: per-partition totals → exclusive prefix (carry-ins). The
    // collect is numPartitions rows — O(parallelism), not O(data).
    val totals = parted.groupBy("__pid")
      .agg(sumCols.map { case (src, _) => sum(col(src)).as(src) }.head,
        sumCols.tail.map { case (src, _) => sum(col(src)).as(src) }: _*)
      .collect()
      .sortBy(_.getAs[Int]("__pid"))

    val srcs = sumCols.map(_._1)
    var running: Map[String, BigDecimal] = srcs.map(_ -> BigDecimal(0)).toMap
    val carryRows = totals.map { r =>
      val row = Row.fromSeq(r.getAs[Int]("__pid") +: srcs.map(s => running(s)))
      running = srcs.map { s =>
        val v = r.get(r.fieldIndex(s)) match {
          case null => BigDecimal(0)
          case l: java.lang.Long => BigDecimal(l)
          case d: java.lang.Double => BigDecimal(d)
          case b: java.math.BigDecimal => BigDecimal(b)
          case i: java.lang.Integer => BigDecimal(i.toLong)
        }
        s -> (running(s) + v)
      }.toMap
      row
    }

    import org.apache.spark.sql.types._
    val carrySchema = StructType(
      StructField("__pid", IntegerType) +:
        srcs.map(s => StructField(s"__carry_$s", DecimalType(38, 10))))
    val carries = spark.createDataFrame(
      spark.sparkContext.parallelize(carryRows.toSeq, 1), carrySchema)

    val joined = local.join(broadcast(carries), Seq("__pid"), "left")
    sumCols.foldLeft(joined) { case (d, (src, dst)) =>
      // Carry-in is exact decimal; cast back to the running column's type
      // so integer-delta scans stay integral end-to-end.
      d.withColumn(dst,
        (col(dst) + coalesce(col(s"__carry_$src"), lit(0)))
          .cast(d.schema(dst).dataType))
    }.drop("__pid" +: srcs.map(s => s"__carry_$s"): _*)
  }
}
