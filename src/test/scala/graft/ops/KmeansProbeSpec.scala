package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** Pins the q207a–g diagnostic-probe decomposition of the k-means
  * training pipeline (round 15): the probes must agree with the q207
  * entry they decompose — seed rows are the k lowest-vec_id vectors,
  * stage outputs compose (assignment counts sum to n, c3 dims 1–4 equal
  * q207's c0..c3, stats equal q207's n_vecs/inertia) — so a red DRIVER
  * row on a probe can only mean oracle-environment divergence at that
  * stage, never a Spark-side composition bug.
  */
class KmeansProbeSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("q207b seeds are the quantized k lowest-vec_id vectors") {
    val seeds = q("q207b_km_seeds").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val expected = graft.Tables.load(spark, sf, "embeddings")
      .orderBy("vec_id").limit(4)
      .collect().zipWithIndex.flatMap { case (r, cid) =>
        r.getSeq[Float](r.fieldIndex("embedding")).zipWithIndex.map {
          case (x, i) =>
            ((cid.toLong, (i + 1).toLong),
              math.floor(x.toDouble * 1e6).toLong)
        }
      }.toMap
    assert(seeds === expected)
  }

  test("q207 output = q207g centroids (dims 1-4) + q207f stats") {
    val full = q("q207_kmeans_train").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDecimal(2).toBigInteger,
          Seq(r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val cent3 = q("q207g_km_cent3").collect()
      .filter(_.getLong(1) <= 4)
      .groupBy(_.getLong(0))
      .map { case (cid, rows) =>
        cid -> rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      }
    val stats = q("q207f_km_stats").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDecimal(2).toBigInteger)).toMap
    assert(full.keySet === cent3.keySet)
    assert(full.keySet === stats.keySet)
    full.foreach { case (cid, (n, inertia, dims)) =>
      assert(cent3(cid) === dims, s"cid=$cid centroid dims")
      assert(stats(cid) === ((n, inertia)), s"cid=$cid stats")
    }
  }

  test("q207c round-1 assignment counts sum to the corpus size") {
    val n = graft.Tables.load(spark, sf, "embeddings").count()
    val byCid = q("q207c_km_assign1").collect()
    assert(byCid.map(_.getLong(1)).sum === n)
    // min dist ≤ max dist per cluster; distances non-negative
    byCid.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(3) <= r.getLong(4))
    }
  }

  test("q207a quantization checksums: 64 dims, n = corpus size") {
    val rows = q("q207a_km_pts").collect()
    assert(rows.length === 64)
    val n = graft.Tables.load(spark, sf, "embeddings").count()
    assert(rows.forall(_.getLong(1) == n))
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(5), "mn <= mx")
    }
  }

  test("q207d/e/g: one (cid, j, v) row per cluster-dimension") {
    Seq("q207d_km_cent1", "q207e_km_cent2", "q207g_km_cent3").foreach {
      name =>
        val rows = q(name).collect()
        assert(rows.length === 4 * 64, name)
        assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct
          .length === 4 * 64, name)
    }
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
