package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins [[Similarity.kCenterSelect]] (q231) — greedy Gonzalez
  * farthest-point k-center — on a sequential replay over the real
  * corpus, the 2-approximation property against a brute-forced optimum
  * (radius² ≤ 4·opt² in the squared-distance space the operator
  * reports), monotone non-increasing sel_dist, and determinism.
  */
class KCenterSpec extends SparkTestBase {

  import spark.implicits._

  /** Sequential twin over quantized integer vectors. */
  private def reference(pts: Seq[(Long, Array[Long])], k: Int)
      : Seq[(Long, Long, Long, Long)] = {
    def d(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val sorted = pts.sortBy(_._1)
    var selId = sorted.head._1
    var selQe = sorted.head._2
    var selDist = 0L
    var md = sorted.map { case (id, qe) => (id, qe, d(qe, selQe)) }
    (1 to k).map { i =>
      val far = md.minBy { case (id, _, m) => (-m, id) }
      val row = (i.toLong, selId, selDist, far._3)
      if (i < k) {
        selDist = far._3; selId = far._1; selQe = far._2
        md = md.map { case (id, qe, m) =>
          (id, qe, math.min(m, d(qe, selQe)))
        }
      }
      row
    }
  }

  private def quantize(v: Seq[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1000000d).toLong).toArray

  test("real corpus: selection chain matches the sequential twin, " +
      "sel_dist non-increasing, deterministic") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001",
        "embeddings")
      .select(col("vec_id"), col("embedding"))
    val pts = emb.collect()
      .map(r => (r.getLong(0), quantize(r.getSeq[Float](1))))
      .toSeq
    val got = Similarity.kCenterSelect(emb, k = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === reference(pts, 6))
    val dists = got.map(_._3).drop(1) // seed's 0 excluded
    assert(dists === dists.sorted.reverse, s"sel_dist not monotone: $got")
    val again = Similarity.kCenterSelect(emb, k = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === again, "nondeterministic selection")
  }

  test("2-approximation on a crafted 1-D fixture (radius^2 <= 4*opt^2)") {
    // three well-separated pairs on a line; optimal 3-center radius = 1
    // unit (squared 1e12 in micro-units)
    val xs = Seq(1L -> 0f, 2L -> 1f, 3L -> 10f, 4L -> 11f,
      5L -> 20f, 6L -> 21f)
    val df = xs.map { case (id, x) => (id, Seq(x, 0f)) }
      .toDF("vec_id", "embedding")
    val k = 3
    val got = Similarity.kCenterSelect(df, k = k)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    val greedyRadius = got.last._2
    // brute-force optimum over all C(6,3) center subsets
    val q = xs.map { case (id, x) => id -> quantize(Seq(x, 0f)) }.toMap
    def d(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (p, r) => (p - r) * (p - r) }.sum
    val opt = xs.map(_._1).combinations(k).map { centers =>
      xs.map(_._1).map(p => centers.map(c => d(q(p), q(c))).min).max
    }.min
    assert(opt === 1000000000000L, s"fixture optimum drifted: $opt")
    assert(greedyRadius <= 4 * opt,
      s"greedy radius $greedyRadius exceeds 4*opt = ${4 * opt}")
    // on this fixture greedy actually achieves the optimum
    assert(greedyRadius === opt)
  }

  test("k=1 returns just the seed with its coverage radius") {
    val df = Seq((5L, Seq(1f, 1f)), (9L, Seq(4f, 5f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.kCenterSelect(df, k = 1).collect()
    assert(rows.length === 1)
    assert(rows(0).getLong(1) === 5L)
    assert(rows(0).getLong(2) === 0L)
    // d((1,1),(4,5)) = 9 + 16 = 25 units^2 -> 25e12 micro^2
    assert(rows(0).getLong(3) === 25000000000000L)
  }
}
