package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins [[Similarity.clusterPurity]] (q234) — external purity of the
  * q207 Lloyd clustering — on a hand-built two-region fixture
  * (arithmetic + the count-desc/label-asc majority tie rule) and on
  * contract properties over the real corpus.
  */
class ClusterPuritySpec extends SparkTestBase {

  import spark.implicits._

  test("hand fixture: purity arithmetic and majority tie -> min label") {
    // Region A near (0,0): ids 1/3/5/7, labels 7/8/8/7 — a 2-2 tie,
    // majority must break to label 7. Region B near (100,100):
    // ids 2/4/6, labels 9/9/7 — majority 9, purity 666.
    // Seeds are the two lowest ids (1 in A, 2 in B), so one Lloyd
    // round keeps each region whole.
    val pts = Seq(
      (1L, Seq(0f, 0f), 7), (3L, Seq(1f, 0f), 8),
      (5L, Seq(0f, 1f), 8), (7L, Seq(1f, 1f), 7),
      (2L, Seq(100f, 100f), 9), (4L, Seq(101f, 100f), 9),
      (6L, Seq(100f, 101f), 7)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.clusterPurity(pts, k = 2, rounds = 1)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === Map(
      0L -> ((4L, 7L, 2L, 500L)),
      1L -> ((3L, 9L, 2L, 666L))))
  }

  test("real corpus: cluster sizes match q207, purity bounded, " +
      "majorities are real labels") {
    val dir = "/root/testdata/sf0.001"
    val purity = graft.SparkEntry.queries("q234_cluster_purity")(
      spark, dir).collect()
    assert(purity.nonEmpty)
    val km = graft.SparkEntry.queries("q207_kmeans_train")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val labels = graft.Tables.load(spark, dir, "embeddings")
      .select(col("label").cast("long")).collect()
      .map(_.getLong(0)).toSet
    purity.foreach { r =>
      val (cluster, nVecs, major, nMajor, pm) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))
      assert(km(cluster) === nVecs,
        s"cluster $cluster size disagrees with q207")
      assert(labels.contains(major))
      assert(nMajor >= 1L && nMajor <= nVecs)
      assert(pm === 1000L * nMajor / nVecs)
    }
    // every point is accounted for exactly once
    assert(purity.map(_.getLong(1)).sum ===
      graft.Tables.load(spark, dir, "embeddings").count())
  }
}
