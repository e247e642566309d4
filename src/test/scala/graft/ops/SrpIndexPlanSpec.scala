package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Round-15 pins: the multi-probe SRP contract and the index-
  * maintenance probes' plan shapes. These make the new scale claims
  * load-bearing — a refactor that turns the probe-side explode into a
  * candidate-side one, or the band probe into a corpus re-scan, fails
  * here rather than at 100 TB.
  */
class SrpIndexPlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("srpMultiProbeTopK(hamming=0) == srpBucketTopK at the same width") {
    // hamming 0 probes exactly the query's own bucket — it must
    // reproduce the single-probe operator row-for-row (same scoring,
    // same tie order); pass an explicit width so both paths share it
    val e = graft.Tables.load(spark, sf, "embeddings")
    val single = Similarity.srpBucketTopK(
      e.filter(col("vec_id") >= 5)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"),
          Similarity.srpSignature("embedding", 8).as("sig")),
      e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          Similarity.srpSignature("embedding", 8).as("sig")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val multi = Similarity.srpMultiProbeTopK(
      e.filter(col("vec_id") >= 5)
        .select(col("vec_id").as("cid"), col("embedding").as("cv")),
      e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")),
      nPlanes = 8, hamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    assert(multi == single && single.nonEmpty,
      s"hamming-0 multi-probe drifted: ${(multi diff single).take(3)} / " +
        s"${(single diff multi).take(3)}")
  }

  test("srpMultiProbeTopK: wider hamming only improves per-query recall") {
    val e = graft.Tables.load(spark, sf, "embeddings")
    val cands = e.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val qs = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = Similarity.bruteForceTopK(cands, qs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(h: Int): Int =
      Similarity.srpMultiProbeTopK(cands, qs, nPlanes = 8, hamming = h)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .count(exact.contains)
    val Seq(h0, h1, h2) = Seq(0, 1, 2).map(hits)
    assert(h0 <= h1 && h1 <= h2,
      s"recall not monotone in hamming: $h0, $h1, $h2")
    assert(h2 > 0, "hamming-2 found nothing — fixture degenerate?")
  }

  test("srpMultiProbeTopK: probes explode on the broadcast query side " +
      "only") {
    val e = graft.Tables.load(spark, sf, "embeddings")
    val df = Similarity.srpMultiProbeTopK(
      e.filter(col("vec_id") >= 5)
        .select(col("vec_id").as("cid"), col("embedding").as("cv")),
      e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")))
    val p = df.queryExecution.executedPlan.toString
    // the bucket join must consume the probe side via broadcast — the
    // candidate side carries one signature row per vector and never
    // explodes
    assert(p.contains("BroadcastExchange"), s"expected broadcast probes:\n$p")
    val generateIdx = p.indexOf("Generate explode")
    assert(generateIdx >= 0, s"expected probe-side explode:\n$p")
    // exactly ONE explode in the plan (queries), none over candidates
    assert(p.indexOf("Generate explode", generateIdx + 1) == -1,
      s"expected a single explode (query side only):\n$p")
  }

  test("q200 probe plan: band-key equi-join against the persisted index," +
      " no shuffle of the corpus text") {
    // run the maintenance cycle once, then pin the probe's shape: the
    // candidate join keys on (band, bkey) — corpus text/shingles never
    // appear past the build writes
    val df = graft.SparkEntry.queries("q200_lsh_index_update")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("bkey"), s"expected band-key join:\n$p")
    // the probe reads the persisted index parquet, not the documents
    // table: 'documents' appears only via the batch's OWN signature scan
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans >= 2, s"expected index parquet scans in probe plan:\n$p")
  }

  test("q60 plan: no quadratic pair join — the only nested loop is the" +
      " broadcast 1-row total attach") {
    val p = graft.SparkEntry.queries("q60_theta_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"no cross product:\n$p")
    // crossJoin(broadcast(1-row total)) is the sole BNLJ; a second one
    // means the O(n²) supplier-pair join crept back
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"expected <= 1 BNLJ (1-row total attach), got" +
      s" $bnlj:\n$p")
    // both running counts come from bucket-partitioned windows
    assert("Window".r.findAllIn(p).size >= 2, s"expected scan windows:\n$p")
  }
}
