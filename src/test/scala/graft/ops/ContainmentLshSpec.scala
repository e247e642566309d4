package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins [[Dedup.containmentLshJoin]] (q217) — the LSH-Ensemble
  * approximate scale path for the exact containment join — against its
  * exact twin, plus the new probe-side restriction of
  * [[Dedup.containmentJoin]] it measures recall with.
  */
class ContainmentLshSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def shingled = Dedup.shingledDocs(spark, sf)

  test("probeIdFilter == unfiltered exact join filtered afterwards") {
    val full = Dedup.containmentJoin(shingled)
      .filter(col("a") % 2 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val restricted = Dedup.containmentJoin(shingled,
        probeIdFilter = Some(id => id % 2 === 0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(restricted === full)
    assert(full.nonEmpty, "fixture must exercise the restriction")
  }

  test("LSH-found pairs are a subset of exact pairs, values identical") {
    val exact = Dedup.containmentJoin(shingled)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val found = Dedup.containmentLshJoin(shingled, shingled)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    found.foreach { case (pair, cm) =>
      assert(exact.contains(pair), s"false positive $pair")
      assert(exact(pair) === cm, s"cont_milli mismatch at $pair")
    }
  }

  test("in-contract recall >= 95% on the full fixture") {
    val lens = shingled.select(col("doc_id"),
        size(col("tk")).cast("bigint").as("len"))
      .filter(col("len") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def u(lb: Long): Long = {
      var p = 1L
      while (p * 2 - 1 < lb) p *= 2
      p * 2 - 1
    }
    def inContract(la: Long, lb: Long): Boolean =
      1000L * 900L * la >= 120L * (1000L * la + 1000L * u(lb) - 900L * la)
    val exactIc = Dedup.containmentJoin(shingled)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => inContract(lens(a), lens(b)) }.toSet
    val found = Dedup.containmentLshJoin(shingled, shingled)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactIc.nonEmpty, "fixture must have in-contract pairs")
    assert(1000L * found.count(exactIc) >= 950L * exactIc.size,
      s"recall ${found.count(exactIc)}/${exactIc.size}")
  }

  test("out-of-contract container lengths are never probed") {
    import spark.implicits._
    // query of 8 distinct tokens fully inside a 128-token container:
    // containment = 1.0 but u_p(128) = 255 ⇒ j_p = 7200/(800+255000-7200)
    // ≈ 0.029 < 0.12 — out of contract, the ensemble must NOT emit it
    // (the exact join of course would)
    val qTokens = (0 until 8).map(i => s"tok$i")
    val cTokens = (0 until 128).map(i => s"tok$i")
    val docs = Seq((1L, qTokens), (2L, cTokens))
      .toDF("doc_id", "tk")
    val found = Dedup.containmentLshJoin(
      docs.filter(col("doc_id") === 1L), docs)
      .collect()
    assert(found.forall(r => r.getLong(1) != 2L),
      "out-of-contract pair must be skipped by design")
    val exact = Dedup.containmentJoin(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.contains((1L, 2L)), "exact twin still finds it")
  }

  test("in-contract synthetic containment is found") {
    import spark.implicits._
    // 32 distinct tokens inside a 48-token container: u_p(48) = 63,
    // j_p = 0.9·32/(3.2+63) ≈ 0.435 ⇒ r=1 regime, detection certain
    // unless all 24 single-row bands miss — vanishingly unlikely and
    // DETERMINISTIC for this fixture (no RNG in the hash family)
    val qTokens = (0 until 32).map(i => s"alpha$i")
    val cTokens = (0 until 48).map(i => s"alpha$i")
    val docs = Seq((10L, qTokens), (20L, cTokens))
      .toDF("doc_id", "tk")
    val found = Dedup.containmentLshJoin(
        docs.filter(col("doc_id") === 10L), docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(found.toSeq === Seq((10L, 20L, 1000L)))
  }
}
