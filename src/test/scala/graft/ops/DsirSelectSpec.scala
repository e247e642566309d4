package graft.ops

import graft.SparkTestBase

/** Pins [[TextAnalysis.dsirSelect]] (q237) — importance log-ratio data
  * selection — on a fully hand-computed two-source fixture and on
  * contract properties over the real corpus.
  */
class DsirSelectSpec extends SparkTestBase {

  import spark.implicits._

  test("hand fixture: millinat deltas, means, and ranking replay") {
    // Corpus counts: aa:3 bb:2 cc:4 dd:1, tot_all=10, V=4.
    // Target (doc 1): aa:2 bb:1, tot_tgt=3, smoothing denom 3+4=7.
    //   lq_tgt: aa=floor(ln(3/7)e3)=-848  bb=floor(ln(2/7)e3)=-1253
    //           cc=dd=floor(ln(1/7)e3)=-1946
    //   lq_src: aa=-1204 bb=-1610 cc=-917 dd=-2303
    //   delta:  aa=356 bb=357 cc=-1029 dd=357
    // doc1: 2*356+357=1069 /3 -> mean 356333
    // doc2: 3*(-1029)=-3087 /3 -> -1029000
    // doc3: 356+357=713 /2 -> 356500
    // doc4: -1029+357=-672 /2 -> -336000 (floor of exact -336000)
    val docs = Seq(
      (1L, "aa aa bb", "tgt"),
      (2L, "cc cc cc", "oth"),
      (3L, "aa bb", "oth"),
      (4L, "cc dd", "oth")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.dsirSelect(docs, targetVal = "tgt", k = 3)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1, 3L, 2L, 713L, 356500L),
      (2, 1L, 3L, 1069L, 356333L),
      (3, 4L, 2L, -672L, -336000L)))
  }

  test("real corpus: k rows, contiguous ranks, monotone means, " +
      "deterministic") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q237_dsir_select")(spark, dir)
      .collect().sortBy(_.getInt(0))
    assert(rows.length === 100)
    assert(rows.map(_.getInt(0)).toSeq === (1 to 100))
    val means = rows.map(_.getLong(5))
    assert(means.zip(means.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val (nToks, sumLr, mean) =
        (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nToks > 0)
      // the floor-division identity the operator claims
      val num = BigInt(sumLr) * 1000
      val expect = (num - (((num % nToks) + nToks) % nToks)) / nToks
      assert(mean === expect.toLong)
    }
    val rows2 = graft.SparkEntry.queries("q237_dsir_select")(spark, dir)
      .collect().sortBy(_.getInt(0))
    assert(rows.map(_.toSeq).toSeq === rows2.map(_.toSeq).toSeq)
  }
}
