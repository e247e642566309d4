package graft.ops

import graft.SparkTestBase

/** Pins [[TextAnalysis.temperatureApportion]] (q233) — √-temperature
  * largest-remainder apportionment — on a hand-computed fixture, the
  * Σ target = budget telescoping invariant, the Hamilton quota
  * property, and the zero-weight guard.
  */
class TempApportionSpec extends SparkTestBase {

  import spark.implicits._

  private def docsOf(masses: Map[String, Int]) = {
    // one doc per source whose token count equals the desired mass
    masses.toSeq.zipWithIndex.map { case ((src, m), i) =>
      (i.toLong, Seq.fill(m)("tok").mkString(" "), src)
    }.toDF("doc_id", "text", "source")
  }

  test("hand-computed fixture: masses 100/25/4, budget 10") {
    // w = floor(sqrt(mass)) = 10/5/2, W = 17; B·w = 100/50/20;
    // base = 5/2/1 (rem 15/16/3), Σ base = 8, leftover 2 goes to the
    // two largest remainders: b (16) then a (15).
    val out = TextAnalysis.temperatureApportion(
        docsOf(Map("a" -> 100, "b" -> 25, "c" -> 4)), budget = 10L)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))))
      .toMap
    assert(out === Map(
      "a" -> ((100L, 10L, 5L, 1L, 6L)),
      "b" -> ((25L, 5L, 2L, 1L, 3L)),
      "c" -> ((4L, 2L, 1L, 0L, 1L))))
  }

  test("real corpus: sum of targets = budget, quota property holds, " +
      "deterministic") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val rows = TextAnalysis.temperatureApportion(docs, budget = 1000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(5)))
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum === 1000L, "targets must telescope to B")
    // Hamilton quota: floor(B·w/W) <= target <= ceil(B·w/W)
    val wTot = rows.map(_._2).sum
    rows.foreach { case (src, w, target) =>
      val lo = (1000L * w) / wTot
      val hi = lo + (if ((1000L * w) % wTot == 0) 0 else 1)
      assert(target >= lo && target <= hi,
        s"$src target $target outside quota [$lo, $hi]")
    }
    val again = TextAnalysis.temperatureApportion(docs, budget = 1000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(5)))
    assert(again.sortBy(_._1).toSeq === rows.sortBy(_._1).toSeq,
      "nondeterministic apportionment")
  }

  test("zero total weight fails loud") {
    val e = intercept[Exception] {
      TextAnalysis.temperatureApportion(
        Seq((1L, "", "a"), (2L, "123", "b"))
          .toDF("doc_id", "text", "source"), budget = 5L)
        .collect()
    }
    assert(e.getMessage.contains("zero total weight"), e.getMessage)
  }
}
