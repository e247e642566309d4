package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Round-15 additions: scale-adaptive SRP LSH width (the fix for the
  * sf10 quadratic-pair defect measured in round 12) and its contract
  * with the oracle twin.
  */
class SrpWidthAndSelectionSpec extends SparkTestBase {

  test("adaptiveNPlanes: exact integer search, boundary-stable") {
    // values cross-checked against the DuckDB nw CTE (same shift-compare
    // over range(8,25)) — any drift here is an oracle-parity break
    val expect = Seq(
      0L -> 8, 1L -> 8, 4096L -> 8, // 2^8·16 = 4096: floor boundary
      4097L -> 9, // one past the boundary grows exactly one plane
      16384L -> 10, 16385L -> 11, 70000L -> 13,
      200000L -> 14, // the sf10 embeddings corpus lands here
      1000000000000L -> 24) // cap: 2^24 buckets, load grows past 16
    expect.foreach { case (n, w) =>
      assert(Similarity.adaptiveNPlanes(n) == w,
        s"adaptiveNPlanes($n) != $w")
    }
    // monotone non-decreasing in n (sanity over a spread of magnitudes)
    val widths = (0 to 40).map(i => Similarity.adaptiveNPlanes(1L << (i / 2)))
    assert(widths == widths.sorted)
  }

  test("embeddingNearDupPairs: adaptive default == explicit floor width " +
      "at fixture scale") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // 500 rows < 2^8·64, so the adaptive default must resolve to the
    // 8-plane floor — bit-identical pairs to the historic pinned-8 path
    val adaptive = Similarity.embeddingNearDupPairs(e)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val pinned = Similarity.embeddingNearDupPairs(e, nPlanes = 8)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(adaptive == pinned && adaptive.nonEmpty)
  }

  test("valueAtRank == sort-based reference on a ties-heavy grid") {
    import spark.implicits._
    // 9 distinct values over 300 rows per group: every bucket boundary
    // lands ON a tie run, the case where bucket-local rank + preceding
    // count must still reproduce the global rank exactly
    val rows = (0 until 900).map { i =>
      (i.toLong, "g" + (i % 3), ((i * 31 + 7) % 9).toDouble)
    }
    val df = rows.toDF("id", "grp", "v")
    val targets = Seq(("g0", 1L), ("g0", 15L), ("g0", 300L), ("g1", 150L),
      ("g2", 7L), ("g2", 299L)).toDF("grp", "k")
    val got = Stats.valueAtRank(df, "grp", "v", Seq(col("id").asc), targets)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    val want = Seq(("g0", 1L), ("g0", 15L), ("g0", 300L), ("g1", 150L),
      ("g2", 7L), ("g2", 299L)).map { case (g, k) =>
      val sorted = rows.filter(_._2 == g).sortBy(t => (t._3, t._1))
      (g, k) -> sorted((k - 1).toInt)._3
    }.toMap
    assert(got == want, s"diverged: ${(want.toSet diff got.toSet).take(3)}")
  }

  test("foreignCountAbove == naive BNLJ theta join, ties/negatives/zeros") {
    import spark.implicits._
    // values from a small integer grid so v_b == 2·v_a ties are COMMON
    // (the strictness edge), with negatives (2v < v) and zeros; 4 groups
    val rows = (0 until 160).map { i =>
      (i.toLong, i % 4, ((i * 7919 + 13) % 21 - 6).toDouble / 2.0)
    }
    val df = rows.toDF("k", "g", "v")
    val got = Relational.foreignCountAbove(df, "k", "g", "v", col("v") * 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // naive reference: the O(n²) pair loop the operator replaces
    val want = rows.map { case (k, g, v) =>
      k -> rows.count { case (_, g2, v2) => g2 != g && v2 > v * 2 }.toLong
    }.toMap
    assert(got.size == rows.size, "one output row per input row")
    val bad = want.collect { case (k, n) if got(k) != n => (k, n, got(k)) }
    assert(bad.isEmpty, s"diverged at ${bad.take(5)}")
  }

  test("wider signature is a refinement: every wide-width pair is a " +
      "floor-width pair") {
    // growing the width only SPLITS buckets (bit w+1 partitions each
    // 2^w bucket), so the candidate set shrinks monotonically — the
    // invariant that makes adaptive width safe to widen under growth
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def pairs(w: Int) = Similarity.embeddingNearDupPairs(e, nPlanes = w)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val w8 = pairs(8)
    val w12 = pairs(12)
    assert(w12.subsetOf(w8), s"${(w12 -- w8).take(5)} appear only at w12")
  }
}
