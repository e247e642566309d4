package graft.ops

import graft.SparkTestBase

/** Round-14 additions: benchmark contamination (q193) and the
  * leakage-free cluster-level split (q194). Both are checked against
  * direct in-memory replays / invariants here; the DuckDB oracle is the
  * cross-engine gate.
  */
class Round14OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q193 contamination matches a direct in-memory replay") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def grams(text: String): Set[String] = {
      val toks = "[a-z]+".r.findAllIn(text).toArray
      val n = math.max(toks.length - 7, 1)
      (1 to n).map(i => toks.slice(i - 1, i + 7).mkString(" ")).toSet
    }
    def h60(sx: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sx.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val bench = docs.sortBy { case (id, _) => (h60(id.toString), id) }.take(50)
    val benchIds = bench.map(_._1).toSet
    val corpus = docs.filterNot(d => benchIds.contains(d._1))
      .flatMap(d => grams(d._2)).toSet
    val expect = bench.map { case (id, text) =>
      val g = grams(text)
      val hit = g.count(corpus.contains)
      id -> (g.size.toLong, hit.toLong, 1000L * hit / math.max(g.size, 1))
    }.toMap
    val got = graft.SparkEntry.queries("q193_contamination")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, e) => assert(got(id) == e, s"doc $id") }
    // the check discriminates: the fixture has both clean and hit docs
    assert(expect.values.exists(_._2 > 0L), "no contamination found")
    assert(expect.values.exists(_._2 == 0L), "everything contaminated")
  }

  test("q194 split: partition of the corpus, zero leaked pairs, 3 splits") {
    val rows = graft.SparkEntry.queries("q194_split_leakage")(spark, sf)
      .collect()
    val splits = rows.map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")), splits.toString)
    assert(splits.contains("train"))
    // the splits partition the documents table exactly
    val total = rows.map(_.getLong(1)).sum
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(total == nDocs, s"split sizes $total != $nDocs docs")
    // the audited guarantee: no near-dup pair straddles splits
    rows.foreach(r => assert(r.getLong(4) == 0L,
      s"leaked pairs in split ${r.getString(0)}"))
    // cluster counts never exceed doc counts
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(1)))
  }
}
