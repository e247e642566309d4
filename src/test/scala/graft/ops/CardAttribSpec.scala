package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-17 batch 3: q248 (join-cardinality estimation audit) and q249
  * (multi-touch attribution).
  */
class CardAttribSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  // --- q248 ---------------------------------------------------------------

  test("q248: key joins estimate exactly; the skewed join's error " +
      "shrinks under end-biasing") {
    val rows = q("q248_join_card_est").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getLong(8) === math.abs(r.getLong(6) - r.getLong(5)))
      assert(r.getLong(9) === math.abs(r.getLong(7) - r.getLong(5)))
      assert(r.getLong(6) >= 0L && r.getLong(7) >= 0L)
    }
    val keyJoins = rows.filter(_.getString(0) != "events*events")
    keyJoins.foreach { r =>
      assert(r.getLong(8) === 0L,
        s"${r.getString(0)}: uniform key join should estimate exactly")
    }
    val ev = rows.find(_.getString(0) == "events*events").get
    assert(ev.getLong(8) > 0L,
      "the skewed self-join must expose a System R error")
    assert(ev.getLong(9) < ev.getLong(8),
      "end-biased histogram must beat the uniform formula on skew")
    // Cauchy–Schwarz: Σc² ≥ n²/ndv, so System R under-estimates here
    assert(ev.getLong(6) <= ev.getLong(5))
  }

  // --- q249 ---------------------------------------------------------------

  test("q249: every model conserves exactly 1000 milli per conversion") {
    val rows = q("q249_attribution").collect()
    val byModel = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(3)).sum).toMap
    assert(byModel.keySet === Set("first_touch", "last_touch", "linear"))
    val nConv = graft.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    byModel.foreach { case (m, tot) =>
      assert(tot === 1000L * nConv, s"$m leaks credit: $tot")
    }
    // direct (touchless) conversions are model-independent
    val direct = rows.filter(_.getString(1) == "direct")
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(direct.values.toSet.size <= 1,
      s"direct credit differs across models: $direct")
  }

  test("q249: hand-computed path credits (crafted fixture)") {
    import spark.implicits._
    // user 1: view, click, PURCHASE, signup, PURCHASE, click
    //   conv 1 path = [view, click]  conv 2 path = [signup]
    //   trailing click converts nothing.
    // user 2: PURCHASE with no touches -> direct in every model.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-attr-spec").toString
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
      Seq(
        (0L, ts(1), 1L, "view"), (1L, ts(2), 1L, "click"),
        (2L, ts(3), 1L, "purchase"), (3L, ts(4), 1L, "signup"),
        (4L, ts(5), 1L, "purchase"), (5L, ts(6), 1L, "click"),
        (6L, ts(7), 2L, "purchase"))
        .toDF("event_id", "ts", "user_id", "event_type")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
      val got = graft.SparkEntry.queries("q249_attribution")(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(got(("first_touch", "view")) === ((1L, 1000L)))
      assert(got(("first_touch", "signup")) === ((1L, 1000L)))
      assert(got(("first_touch", "direct")) === ((1L, 1000L)))
      assert(!got.contains(("first_touch", "click")))
      assert(got(("last_touch", "click")) === ((1L, 1000L)))
      assert(got(("last_touch", "signup")) === ((1L, 1000L)))
      assert(got(("linear", "view")) === ((1L, 500L)))
      assert(got(("linear", "click")) === ((1L, 500L)))
      assert(got(("linear", "signup")) === ((1L, 1000L)))
      assert(got(("linear", "direct")) === ((1L, 1000L)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
    }
  }
}
