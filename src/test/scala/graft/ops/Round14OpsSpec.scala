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

  test("q195 incremental dedup: index probe == direct batch-vs-corpus") {
    // the persisted-index probe must equal what a direct (no
    // persistence) LSH band join over the same split computes
    val rows = graft.SparkEntry.queries("q195_incremental_dedup")(spark, sf)
      .collect()
    val nBatch = graft.Tables.load(spark, sf, "documents")
      .filter("doc_id % 10 = 0").count()
    assert(rows.length == nBatch, "one verdict per new doc")
    // self-consistency: a best match implies candidates; est in [0,1000]
    rows.foreach { r =>
      val nCand = r.getLong(1)
      if (nCand == 0) assert(r.isNullAt(2) && r.isNullAt(3))
      else {
        val est = r.getLong(3)
        assert(est >= 0 && est <= 1000, s"est $est")
        assert(r.getLong(2) % 10 != 0, "best match must be a corpus doc")
        assert(r.getBoolean(4) == (est >= 500))
      }
    }
    // discrimination: the fixture produces both dups and clean docs
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)))
  }

  test("q196 snapshot diff classes partition the key universe") {
    val rows = graft.SparkEntry.queries("q196_snapshot_diff")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = graft.Tables.load(spark, sf, "orders")
    def n(pred: String) = o.filter(pred).count()
    assert(rows("insert") == n("o_orderkey % 7 = 0 AND o_orderkey % 3 != 0"))
    assert(rows("delete") == n("o_orderkey % 7 != 0 AND o_orderkey % 3 = 0"))
    assert(rows("update") ==
      n("o_orderkey % 7 != 0 AND o_orderkey % 3 != 0 AND o_orderkey % 5 = 0"))
    assert(rows.values.sum == n("o_orderkey % 7 != 0 OR o_orderkey % 3 != 0"))
  }

  test("q197 water level: feasible, maximal, quotas preserved for small") {
    val rows = graft.SparkEntry.queries("q197_mixture_cap")(spark, sf)
      .collect()
    val budget = rows.head.getLong(4)
    val cap = rows.head.getLong(3)
    assert(rows.forall(r => r.getLong(3) == cap), "one level for all")
    val quotas = rows.map(_.getLong(2))
    // feasible: Σ quota ≤ B; maximal: cap+1 would overshoot
    assert(quotas.sum <= budget)
    val overshoot = rows.map(r => math.min(r.getLong(1), cap + 1)).sum
    assert(overshoot > budget, "cap is not maximal")
    // unsaturated sources keep everything; saturated ones get exactly cap
    rows.foreach { r =>
      if (r.getBoolean(5)) assert(r.getLong(2) == cap)
      else assert(r.getLong(2) == r.getLong(1))
    }
    assert(rows.exists(_.getBoolean(5)), "nothing saturated — degenerate")
  }

  test("cloneCollapsedNearDupEdges: components == naive pair graph") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // clone-heavy fixture: group A = 4 clones, group B = 3 clones of a
    // near-dup of A (cos ≈ 0.9995), C orthogonal-ish, D unique near C.
    // Vectors are FULL 64-dim (the fixed plane width): shorter arrays
    // signature to NULL→0 — one degenerate bucket that would bypass the
    // LSH path this test exists to compare (and the operator now fails
    // loud on them)
    def v64(head: Float*): Seq[Float] =
      head.toSeq ++ Seq.fill(64 - head.length)(0.0f)
    val vA = v64(1.0f)
    val vB = v64(0.999f, 0.04f)
    val vC = v64(0.0f, 1.0f)
    val vD = v64(0.01f, 0.9999f)
    val rows = Seq(
      (1L, "x", vA), (2L, "x", vA), (3L, "x", vA), (4L, "x", vA),
      (10L, "y", vB), (11L, "y", vB), (12L, "y", vB),
      (20L, "z", vC), (30L, "z", vD))
    val df = rows.toDF("vec_id", "label", "embedding")
    def comps(edges: org.apache.spark.sql.DataFrame) =
      Graph.connectedComponents(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = comps(Similarity.embeddingNearDupPairs(df)
      .select(col("v1").as("a"), col("v2").as("b")))
    val collapsed = comps(Similarity.cloneCollapsedNearDupEdges(df))
    assert(collapsed == naive, s"collapsed $collapsed != naive $naive")
    // the fixture discriminates: A∪B one component, C/D behavior equal
    // in both paths, and clone groups collapse to k−1 star edges
    assert(naive.nonEmpty)
    // stars run member→rep with rep = min id, so a > b distinguishes
    // them from rep-level near-dup pairs (emitted v1 < v2)
    val stars = Similarity.cloneCollapsedNearDupEdges(df)
      .filter(col("a") > col("b")).count()
    assert(stars == (4 - 1) + (3 - 1), s"star edges $stars")
  }

  test("cloneCollapsedNearDupEdges: zero-norm embedding fails loud") {
    import spark.implicits._
    // a zero vector's cosine is a divide-by-zero: the naive path throws
    // only when the zero rep shares a bucket, star edges would silently
    // connect its clones — the operator asserts the precondition
    // deterministically instead (scaladoc contract)
    val zero = Seq.fill(64)(0.0f)
    val one = 1.0f +: Seq.fill(63)(0.0f)
    val df = Seq((1L, "a", one), (2L, "b", zero), (3L, "b", zero))
      .toDF("vec_id", "label", "embedding")
    val e = intercept[Exception] {
      Similarity.cloneCollapsedNearDupEdges(df).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("zero-norm")),
      s"expected the zero-norm assert, got: ${messages(e).mkString(" | ")}")
  }
}
