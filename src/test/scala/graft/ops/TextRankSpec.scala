package graft.ops

import graft.SparkTestBase

/** Pins [[TextAnalysis.textRankKeywords]] (q238) — integer PageRank
  * over the adjacent-token co-occurrence graph — on a hand-unrolled
  * one-round fixture, the self-loop exclusion, and real-corpus
  * contract properties.
  */
class TextRankSpec extends SparkTestBase {

  import spark.implicits._

  test("hand fixture: one round of the integer recurrence, unrolled") {
    // Graph from ["a b a b", "a c"]: a-b weight 3, a-c weight 1
    // (each direction). n=3, r0 = 333333333333 each,
    // base = (r0·15)//100 = 49999999999, out_w: a=4, b=3, c=1.
    //   in(a) = 333333333333 (from b) + 333333333333 (from c)
    //   in(b) = (r0 div 4)·3 + ((r0 mod 4)·3) div 4 = 249999999999
    //   in(c) = (r0 div 4)·1 = 83333333333
    //   r1 = base + (in·85) div 100
    val docs = Seq("a b a b", "a c").toDF("text")
    val got = TextAnalysis.textRankKeywords(docs, iters = 1, k = 3)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1, "a", 616666666665L),
      (2, "b", 262499999998L),
      (3, "c", 120833333332L)))
  }

  test("self-loops excluded; symmetric pair ties break to word asc") {
    // "a a b": the (a, a) repetition is dropped, so the graph is the
    // single symmetric edge a-b — both words end every round with
    // identical rank and the tie breaks lexicographically.
    val docs = Seq("a a b").toDF("text")
    val got = TextAnalysis.textRankKeywords(docs, iters = 3, k = 5)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.length === 2)
    assert(got(0)._2 === "a" && got(1)._2 === "b")
    assert(got(0)._3 === got(1)._3)
  }

  test("real corpus: k rows, contiguous ranks, monotone, deterministic") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q238_textrank")(spark, dir)
      .collect().sortBy(_.getInt(0))
    assert(rows.length === 30)
    assert(rows.map(_.getInt(0)).toSeq === (1 to 30))
    val ranks = rows.map(_.getLong(2))
    assert(ranks.zip(ranks.tail).forall { case (x, y) => x >= y })
    assert(ranks.forall(_ > 0L))
    val rows2 = graft.SparkEntry.queries("q238_textrank")(spark, dir)
      .collect().sortBy(_.getInt(0))
    assert(rows.map(_.toSeq).toSeq === rows2.map(_.toSeq).toSeq)
  }
}
