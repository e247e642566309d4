package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins [[TextAnalysis.ppsSample]] (q229) — systematic PPS sampling —
  * on a sequential replay, the Σ n_picks = k telescoping invariant,
  * heavy-item multiplicity, and the weight contract.
  */
class PpsSampleSpec extends SparkTestBase {

  import spark.implicits._

  /** Sequential twin: midpoint grid over the cumulative axis. */
  private def reference(ws: Seq[(Long, Long)], k: Int)
      : Map[Long, Long] = {
    val sorted = ws.filter(_._2 > 0).sortBy(_._1)
    val wt = sorted.map(_._2).sum
    def f(x: Long): Long =
      math.min(k.toLong, (2L * k * x + wt - 1) / (2L * wt))
    var cw = 0L
    sorted.flatMap { case (id, w) =>
      cw += w
      val m = f(cw) - f(cw - w)
      if (m >= 1) Some(id -> m) else None
    }.toMap
  }

  private def run(ws: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    TextAnalysis.ppsSample(ws.toDF("doc_id", "w"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("fixture: picks match the sequential midpoint replay") {
    val ws = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 4L), (5L, 0L))
    for (k <- Seq(1, 2, 4, 8)) {
      val got = run(ws, k)
      assert(got === reference(ws, k), s"k=$k")
      assert(got.values.sum === k.toLong, s"sum of picks != k at k=$k")
    }
  }

  test("heavy item gets multiplicity > 1") {
    // one item holds 60% of the mass; at k=5 it must cover >= 3 points
    val ws = Seq((1L, 60L), (2L, 10L), (3L, 10L), (4L, 10L), (5L, 10L))
    val got = run(ws, 5)
    assert(got(1L) === 3L, s"heavy item picks: $got")
    assert(got.values.sum === 5L)
  }

  test("real corpus: sum of picks = k, deterministic across runs") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
        "documents")
      .select(col("doc_id"),
        expr("CAST(size(regexp_extract_all(text, '[a-z]+', 0)) AS BIGINT)")
          .as("w"))
    val a = TextAnalysis.ppsSample(docs, 17)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val b = TextAnalysis.ppsSample(docs, 17)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(a === b, "nondeterministic sample")
    assert(a.values.sum === 17L)
    // and the distributed prefix scan agrees with the sequential twin
    val ws = docs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a === reference(ws, 17))
  }

  test("2k*W BIGINT overflow fails loud (guard is a filter, not a " +
      "prunable projection)") {
    // k = 1e8 puts the threshold at Long.MaxValue/2e8 ~ 4.6e10; one row
    // of weight 5e10 crosses it. Before round 17 this guard sat in an
    // unconsumed projected column and Catalyst pruned it away silently.
    val e = intercept[Exception] {
      TextAnalysis.ppsSample(
        Seq((1L, 50000000000L)).toDF("doc_id", "w"), 100000000)
        .collect()
    }
    assert(e.getMessage.contains("overflows BIGINT"), e.getMessage)
  }

  test("negative weight fails loud") {
    intercept[Exception] {
      TextAnalysis.ppsSample(
        Seq((1L, 5L), (2L, -1L)).toDF("doc_id", "w"), 2).collect()
    }
  }
}
