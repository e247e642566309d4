package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** Pins the round-16 q207 output-type contract: inertia is BIGINT on
  * the hashed path (never DECIMAL — the r15 bisection proved the driver
  * compare path canonicalizes DECIMAL differently across DuckDB
  * versions while the identical BIGINT-typed sum is green), and the
  * measured magnitude leaves decades of headroom below 2^63 so the
  * BIGINT claim is an audited bound, not a hope. Replaces the r15
  * KmeansProbeSpec (the q207a–g probes were deleted once the
  * divergence was pinned, as their comment promised).
  */
class KmeansInertiaSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("q207 inertia column is BIGINT (LongType), not DECIMAL") {
    val df = q("q207_kmeans_train")
    val f = df.schema("inertia")
    assert(f.dataType ===
      org.apache.spark.sql.types.LongType,
      s"hashed DECIMAL rides the broken driver compare path: $f")
  }

  test("q207 inertia magnitude leaves >= 4 decades below 2^63") {
    // Per-point distance is bounded by 64·(1.1e6)² ≈ 7.7e13; the pin
    // is on the MEASURED total so the headroom claim tracks data, not
    // the worst case. sf0.001→sf0.1 grows inertia ~linearly in rows
    // (distances are scale-free), so 4 decades of headroom at this SF
    // means BIGINT holds through ~sf1000 per cluster.
    val worst = q("q207_kmeans_train").collect()
      .map(_.getLong(2)).max
    assert(worst > 0L)
    assert(worst < Long.MaxValue / 10000L,
      s"inertia $worst within 4 decades of 2^63 — move to hi/lo limbs")
  }

  test("inertia overflow guard fires in-plan (round 17: enforced, " +
      "not just audited)") {
    import spark.implicits._
    // Two same-cluster distances of 5e18 each: every per-point value
    // fits BIGINT, but the sum (1e19) exceeds 2^63−1 ≈ 9.2e18. Under
    // this repo's sessions (Spark 4 ANSI default ON) the sum itself
    // raises ARITHMETIC_OVERFLOW — already loud; the guard exists for
    // library users running spark.sql.ansi.enabled=false, where
    // sum(long) wraps SILENTLY and the wrapped value would ride the
    // hashed path. Exercise exactly that session mode here.
    val e = intercept[Exception] {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      try Similarity.kmStats(
        Seq((0L, 5000000000000000000L), (0L, 5000000000000000000L))
          .toDF("cid", "dist")).collect()
      finally spark.conf.unset("spark.sql.ansi.enabled")
    }
    assert(e.getMessage.contains("overflow BIGINT"), e.getMessage)
    // and the guard is pass-through on in-bound data
    val ok = Similarity.kmStats(
      Seq((0L, 7L), (0L, 5L), (1L, 3L)).toDF("cid", "dist"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(ok === Map(0L -> ((2L, 12L)), 1L -> ((1L, 3L))))
  }

  test("q76 exact side is a data value at the explicit rank") {
    val rows = q("q76_approx_percentile").collect()
    val prices = graft.Tables.load(spark, sf, "lineitem")
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    rows.foreach { case Row(flag: String, p50: Double, p90: Double,
        b50: Boolean, b90: Boolean) =>
      val vs = prices(flag)
      val k50 = (vs.length - 1) / 2      // rank-1 index of 1 + (n-1)//2
      val k90 = (9 * (vs.length - 1)) / 10
      assert(p50 === vs(k50), s"$flag p50")
      assert(p90 === vs(k90), s"$flag p90")
      assert(b50 && b90, s"$flag parity bits")
    }
  }
}
