package graft.ops

import graft.SparkTestBase

/** Round-11 operator pins: the interpolated bigram LM (q123) against a
  * direct in-memory replay — third implementation of the contract, no
  * Spark expressions reused.
  */
class Round11OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q123 bigram-LM millinat sums match a direct in-memory replay") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String) = "[a-z]+".r.findAllIn(t.toLowerCase).toVector
    val byDoc = docs.map(d => (d._1, d._2, toks(d._3)))
    val uni = byDoc.flatMap(_._3).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val total = byDoc.map(_._3.size.toLong).sum
    val bigs = byDoc.map { case (id, _, t) => id -> t.zip(t.drop(1)) }
    val c12 = bigs.flatMap(_._2).groupBy(identity)
      .map { case (b, xs) => b -> xs.size.toLong }
    val ctx = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    def term(b: (String, String)): Long = {
      val n = 7L * c12(b) * total + 3L * ctx(b._1) * uni(b._2)
      val d = 10L * ctx(b._1) * total
      math.floor(math.log(n.toDouble / d.toDouble) * 1000).toLong
    }
    val perDoc = bigs.map { case (id, bs) =>
      id -> (bs.size.toLong, bs.map(term).sum)
    }.toMap
    val expect = byDoc.groupBy(_._2).map { case (src, ds) =>
      val lls = ds.filter(d => perDoc(d._1)._1 > 0).map(d => perDoc(d._1)._2)
      src -> (ds.length.toLong,
        ds.map(d => perDoc(d._1)._1).sum,
        ds.map(d => perDoc(d._1)._2).sum,
        if (lls.isEmpty) 0L else lls.min,
        if (lls.isEmpty) 0L else lls.max)
    }
    val got = graft.SparkEntry.queries("q123_bigram_lm")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (src, e) => assert(got(src) == e, s"source $src") }
    // the metric is non-degenerate: some mass scored
    assert(expect.values.map(_._2).sum > 0)
  }
}
