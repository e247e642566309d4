package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-17 batch 5: q252 (seasonal-naive forecast + MASE) and q253
  * (A-priori frequent triples).
  */
class ForecastBasketSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  // --- q252 ---------------------------------------------------------------

  test("q252: MASE identity and a uniform evaluation window per series") {
    val rows = q("q252_seasonal_mase").collect()
    assert(rows.nonEmpty)
    val evals = rows.map(_.getLong(1)).distinct
    assert(evals.length === 1 && evals.head >= 1L,
      s"gap-filled calendar must give every series the same window: " +
        s"${evals.mkString(",")}")
    rows.foreach { r =>
      val sa = r.getLong(2); val sn = r.getLong(3)
      if (sn > 0L) assert(r.getLong(4) === 1000L * sa / sn)
      else assert(r.isNullAt(4))
    }
  }

  test("q252: a perfectly 7-periodic series forecasts itself (MASE=0)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mase-spec").toString
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
      def ts(d: Int) =
        new java.sql.Timestamp(t0.getTime + d * 86400000L)
      // 21 days, value cycles with period 7 and real day-to-day moves
      val rows = (0 until 21).map { d =>
        (d.toLong, ts(d), 1L, "click", (10 + (d % 7) * 5).toDouble)
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
      val r = graft.SparkEntry.queries("q252_seasonal_mase")(spark, dir)
        .collect()
      assert(r.length === 1)
      assert(r.head.getLong(1) === 14L) // 21 days - 7 lag
      assert(r.head.getLong(2) === 0L, "seasonal error on periodic data")
      assert(r.head.getLong(3) > 0L)
      assert(r.head.getLong(4) === 0L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
    }
  }

  // --- q253 ---------------------------------------------------------------

  test("q253: triples are canonical, supported, and downward-closed") {
    val rows = q("q253_apriori_triples").collect()
    assert(rows.nonEmpty, "no frequent triple at this minsup — " +
      "recalibrate the category grain")
    val nOrders = rows.head.getLong(4)
    val minsup = math.max(2L, nOrders / 100)
    // recompute pair supports independently for the closure check
    val b = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("oid"),
        expr("l_partkey % 12").as("cat")).distinct()
    val pairSup = b.as("x").join(b.as("y"),
        col("x.oid") === col("y.oid") && col("x.cat") < col("y.cat"))
      .groupBy(col("x.cat").as("a"), col("y.cat").as("b")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    rows.foreach { r =>
      val (a, b2, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a < b2 && b2 < c, "triple not canonical")
      assert(r.getLong(3) >= minsup)
      assert(r.getLong(5) === 1000L * r.getLong(3) / nOrders)
      Seq((a, b2), (a, c), (b2, c)).foreach { p =>
        assert(pairSup.getOrElse(p, 0L) >= minsup,
          s"downward closure violated: pair $p under triple ($a,$b2,$c)")
      }
    }
  }

  test("q253: hand-built baskets produce exactly the planted triple") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-apriori-spec").toString
    try {
      // 10 orders: {1,2,3} x6, {1,2} x2, {4,5} x2 -> minsup = 2;
      // the only frequent triple is (1,2,3) with support 6.
      val rows =
        (1 to 6).flatMap(o => Seq((o.toLong, 1L), (o.toLong, 2L),
          (o.toLong, 3L))) ++
        (7 to 8).flatMap(o => Seq((o.toLong, 1L), (o.toLong, 2L))) ++
        (9 to 10).flatMap(o => Seq((o.toLong, 4L), (o.toLong, 5L)))
      rows.toDF("l_orderkey", "l_partkey")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/lineitem.parquet")
      val got = graft.SparkEntry
        .queries("q253_apriori_triples")(spark, dir).collect()
      assert(got.length === 1, got.mkString(";"))
      val r = got.head
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 2L, 3L)))
      assert(r.getLong(3) === 6L && r.getLong(4) === 10L)
      assert(r.getLong(5) === 600L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
    }
  }
}
