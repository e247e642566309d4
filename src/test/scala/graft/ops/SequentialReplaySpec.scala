package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Round-16 pins: notInAntiJoin's three-valued NOT IN semantics (the
  * truth table Catalyst's null-aware anti join encodes in its broadcast
  * build) and its plan shape (no whole-relation broadcast, no NAAJ/BNLJ
  * node — the property that lets it survive 100 TB).
  */
class SequentialReplaySpec extends SparkTestBase {

  import spark.implicits._

  private def notIn(outer: Seq[Option[Int]], sub: Seq[Option[Int]]) =
    Relational.notInAntiJoin(
      outer.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k"),
      "k",
      sub.toDF("sk"), "sk")
      .select("id").collect().map(_.getLong(0)).toSet

  test("notInAntiJoin: empty subquery keeps every outer row, " +
      "null-key rows included") {
    // x NOT IN () is TRUE for every x — the empty IN-list is FALSE,
    // negation TRUE, no UNKNOWN anywhere
    assert(notIn(Seq(Some(1), None, Some(3)), Seq.empty) == Set(0L, 1L, 2L))
  }

  test("notInAntiJoin: one null in the subquery empties the result") {
    // x NOT IN S with NULL ∈ S: x ∈ S gives FALSE, x ∉ S gives UNKNOWN
    // (x <> NULL is UNKNOWN) — either way the WHERE drops the row
    assert(notIn(Seq(Some(1), Some(99), None), Seq(Some(1), None)).isEmpty)
  }

  test("notInAntiJoin: null-free subquery = plain anti join minus " +
      "null-key outer rows") {
    assert(notIn(
      Seq(Some(1), Some(2), None, Some(4)),
      Seq(Some(2), Some(5), Some(2))) == Set(0L, 3L))
  }

  test("notInAntiJoin matches the SQL NOT IN on the fixture, and can " +
      "plan without any relation-sized broadcast") {
    val sf = "/root/testdata/sf0.001"
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val gotSql = key(graft.SparkEntry.queries("q61_not_in")(spark, sf))
    val gotOp = key(graft.SparkEntry.queries("q203_not_in_scale")(spark, sf))
    assert(gotOp == gotSql && gotOp.nonEmpty,
      "decomposed NOT IN diverged from the Catalyst NAAJ result")
    // The scale pin: disable elective broadcasts and compare the plans
    // each path is ABLE to produce. A NAAJ renders as
    // "BroadcastHashJoin ... LeftAnti, BuildRight, true" — the trailing
    // flag is isNullAwareAntiJoin, and the broadcast is mandatory (NAAJ
    // has no shuffled implementation), so q61 keeps it even at
    // threshold -1: that whole-relation build is exactly what dies at
    // 100 TB. q203 must instead plan its anti join as a shuffled SMJ,
    // with its only remaining broadcast the hinted 1-row bits aggregate.
    val naaj = "LeftAnti, BuildRight, true"
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val naajPlan = graft.SparkEntry.queries("q61_not_in")(spark, sf)
        .queryExecution.executedPlan.toString
      val opPlan = graft.SparkEntry.queries("q203_not_in_scale")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(naajPlan.contains(naaj),
        s"q61 no longer plans as a mandatory-broadcast NAAJ:\n$naajPlan")
      // the one BNLJ allowed in q203 is the 1-row bits anchor (its join
      // line references the __nin_n/__nin_nn aggregate columns) — any
      // other nested-loop or a NAAJ means the decomposition regressed
      val strayBnlj = opPlan.linesIterator
        .filter(_.contains("BroadcastNestedLoopJoin"))
        .filterNot(_.contains("__nin_n"))
      assert(!opPlan.contains(naaj) && strayBnlj.isEmpty &&
        opPlan.contains("SortMergeJoin") && opPlan.contains("LeftAnti"),
        s"q203's anti join is not a broadcast-free shuffled plan:\n$opPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // ---- bpeTrainMerges (q204) ----------------------------------------------

  /** The greedy trainer the operator replaces: plain in-memory loops,
    * overlapping pair counts, greedy LTR merge application.
    */
  private def referenceBpe(texts: Seq[String], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var vocab = texts
      .flatMap("[a-z0-9]+".r.findAllIn(_).toSeq.map(_.toLowerCase))
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toVector, ws.size.toLong)
      }.toVector
    (1 to rounds).flatMap { round =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((toks, f) <- vocab; i <- 0 until toks.size - 1)
        counts((toks(i), toks(i + 1))) =
          counts.getOrElse((toks(i), toks(i + 1)), 0L) + f
      if (counts.isEmpty) Nil
      else {
        val ((lt, rt), f) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        vocab = vocab.map { case (toks, fr) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < toks.size) {
            if (i < toks.size - 1 && toks(i) == lt && toks(i + 1) == rt) {
              out += lt + rt; i += 2 // greedy LTR, non-overlapping
            } else { out += toks(i); i += 1 }
          }
          (out.result(), fr)
        }
        Seq((round, lt, rt, f))
      }
    }
  }

  test("bpeTrainMerges replays the greedy loop trainer exactly, " +
      "including self-adjacent runs and tie-breaks") {
    // 'aaaa' runs exercise overlapping counts + non-overlapping merges;
    // equal-frequency pairs exercise the (lt, rt) tie-break
    val texts = Seq(
      "the theme thesis then", "aaaa aaaa baaab", "band bandana ban",
      "zq zq zq xy xy xy", "mississippi missive")
    val got = TextAnalysis
      .bpeTrainMerges(texts.toDF("text"), rounds = 8)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq.sortBy(_._1)
    val want = referenceBpe(texts, 8)
    assert(got == want, s"trainer diverged:\n got $got\nwant $want")
  }

  test("bpeTrainMerges: winning pair frequency is non-increasing " +
      "across rounds, merged = lt || rt") {
    // merging (x,y) only removes (x,y) adjacencies and creates pairs
    // whose counts are bounded by the pairs they subsume — so the max
    // can never rise. A violation means the merge application and the
    // pair counting disagree about adjacency.
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val rows = TextAnalysis.bpeTrainMerges(docs).collect()
      .sortBy(_.getInt(0))
    assert(rows.length == 10, s"expected 10 rounds, got ${rows.length}")
    assert(rows.forall(r => r.getString(3) == r.getString(1) + r.getString(2)))
    val freqs = rows.map(_.getLong(4))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b },
      s"max pair frequency rose between rounds: ${freqs.mkString(",")}")
  }

  // ---- ivfPqTopK (q205) ---------------------------------------------------

  test("ivfPqTopK with an exhaustive shortlist equals ivfTopK " +
      "row-for-row (re-rank correctness)") {
    // with shortlist >= every candidate in the probed cells, the exact
    // re-rank sees exactly what ivfTopKFrom scores — ADC may order the
    // shortlist however float summation falls, the RESULT must not move
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cands = e.filter(col("vec_id") >= 5)
    val qs = e.filter(col("vec_id") < 5)
    val anchors = e.filter(col("vec_id") >= 5 && col("vec_id") < 21)
      .select(col("vec_id").as("cell"), col("embedding").as("av"))
    val seed = e.filter(col("vec_id") >= 21 && col("vec_id") < 53)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val exact = rows(Similarity.ivfTopK(cands, qs, anchors))
    val pq = rows(Similarity.ivfPqTopK(cands, qs, anchors, seed,
      shortlist = 1000000))
    assert(pq == exact && exact.nonEmpty,
      s"re-rank diverged: ${(pq diff exact).take(3)} / " +
        s"${(exact diff pq).take(3)}")
  }

  test("pqEncode: codes are length-m arrays of in-range codeword ids, " +
      "one row per candidate") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val anchors = e.filter(col("vec_id") >= 5 && col("vec_id") < 21)
      .select(col("vec_id").as("cell"), col("embedding").as("av"))
    val seed = e.filter(col("vec_id") >= 21 && col("vec_id") < 53)
    val cells = Similarity.assignCells(e.filter(col("vec_id") >= 5), anchors)
    val cbs = Similarity.pqCodebooks(seed)
    val k = cbs.agg(org.apache.spark.sql.functions.max("code")).head.getInt(0)
    val enc = Similarity.pqEncode(cells, cbs)
    val n = e.filter(col("vec_id") >= 5).count()
    assert(enc.count() == n, "one encoded row per candidate")
    val bad = enc.where(org.apache.spark.sql.functions.expr(
      s"size(codes) != 8 OR exists(codes, c -> c < 0 OR c > $k)")).count()
    assert(bad == 0, s"$bad malformed code arrays")
  }

  test("q205's recall gate holds on the smallest fixture") {
    // r14 hard-oracle shape: one row per exact-q29 top-k member
    // (5 queries × k=10) carrying the per-query recall bit
    val rows = graft.SparkEntry.queries("q205_ann_ivfpq")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 50 && rows.forall(_.getAs[Boolean]("recall_ok")),
      s"gate rows: ${rows.mkString(";")}")
  }

  // ---- prefixFilteredJaccardJoin (q206) -----------------------------------

  private def bruteJaccardPairs(tMilli: Int) = {
    // the O(n²) twin the operator must reproduce exactly
    val toks = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), org.apache.spark.sql.functions
        .array_distinct(org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(col("text")), " ")).as("tk"))
    val a = toks.select(col("doc_id").as("d1"), col("tk").as("t1"))
    val b = toks.select(col("doc_id").as("d2"), col("tk").as("t2"))
    a.crossJoin(b).filter(col("d1") < col("d2"))
      .withColumn("ov", org.apache.spark.sql.functions
        .size(org.apache.spark.sql.functions.array_intersect(
          col("t1"), col("t2"))))
      .filter(org.apache.spark.sql.functions.lit(1000L) * col("ov") >=
        org.apache.spark.sql.functions.lit(tMilli.toLong) *
          (org.apache.spark.sql.functions.size(col("t1")) +
            org.apache.spark.sql.functions.size(col("t2")) - col("ov")))
      .select(col("d1"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def prefixJoinPairs(tMilli: Int) =
    Dedup.prefixFilteredJaccardJoin(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select(col("doc_id"), org.apache.spark.sql.functions
          .array_distinct(org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.lower(col("text")), " "))
          .as("tk")),
      tMilli = tMilli)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("prefixFilteredJaccardJoin equals the brute-force all-pairs set " +
      "at t=0.9 AND the denser t=0.6 regime") {
    // exactness is the operator's whole claim vs LSH: the prefix filter
    // must lose NO pair (completeness theorem) and admit no extra
    // (verification step); the low threshold stresses long prefixes
    for (t <- Seq(900, 600)) {
      val brute = bruteJaccardPairs(t)
      val pref = prefixJoinPairs(t)
      assert(pref == brute && brute.nonEmpty,
        s"t=$t diverged: missing=${(brute diff pref).take(3)} " +
          s"extra=${(pref diff brute).take(3)}")
    }
  }

  test("prefixFilteredJaccardJoin plan has no cross join and no " +
      "broadcast nested loop") {
    val plan = Dedup.prefixFilteredJaccardJoin(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select(col("doc_id"), org.apache.spark.sql.functions
          .array_distinct(org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.lower(col("text")), " "))
          .as("tk")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"quadratic join shape in plan:\n$plan")
  }

  test("trained merges feed bpeEncode: encoding uses every learned rule") {
    // the compose story: train on a corpus, encode with the result —
    // rank order preserved (round order IS merge priority)
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val merges = TextAnalysis.bpeTrainMerges(docs).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = TextAnalysis.bpeEncode(docs, merges)
      .select(org.apache.spark.sql.functions.explode(col("bpe")).as("e"))
      .select(org.apache.spark.sql.functions
        .explode(org.apache.spark.sql.functions.split(col("e"), " "))
        .as("sym"))
      .groupBy("sym").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val learned = merges.map { case (a, b) => a + b }
    val used = learned.filter(enc.contains)
    assert(used.nonEmpty && enc.contains(learned.head),
      s"no learned symbol survives in the encoding: $learned")
  }

  // ---- containmentJoin (q208) ---------------------------------------------

  private def wordToks(dir: String) =
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), org.apache.spark.sql.functions
        .array_distinct(org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(col("text")), " ")).as("tk"))

  test("containmentJoin equals the brute-force ordered-pair set at " +
      "t=0.9 AND t=0.6 (word tokens — the dense regime)") {
    import org.apache.spark.sql.functions._
    for (t <- Seq(900, 600)) {
      val toks = wordToks("/root/testdata/sf0.001")
      val a = toks.select(col("doc_id").as("a"), col("tk").as("ta"))
      val b = toks.select(col("doc_id").as("b"), col("tk").as("tb"))
      val brute = a.crossJoin(b).filter(col("a") =!= col("b"))
        .withColumn("ov", size(array_intersect(col("ta"), col("tb"))))
        .filter(lit(1000L) * col("ov") >=
          lit(t.toLong) * size(col("ta")))
        .select("a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Dedup.containmentJoin(toks, tMilli = t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute && brute.nonEmpty,
        s"t=$t diverged: missing=${(brute diff got).take(3)} " +
          s"extra=${(got diff brute).take(3)}")
    }
  }

  test("containmentJoin is asymmetric: a quote inside an article pairs " +
      "one way only, and Jaccard misses it entirely") {
    import spark.implicits._
    val quote = (1 to 30).map(i => s"q$i")
    val article = (1 to 470).map(i => s"w$i") ++ quote
    val df = Seq(
      (1L, quote), (2L, article),
      (3L, (1 to 40).map(i => s"z$i"))).toDF("doc_id", "tk")
    val got = Dedup.containmentJoin(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1000L)),
      s"containment pairs: $got") // (2,1) absent: 30/500 < 0.9
    val jac = Dedup.prefixFilteredJaccardJoin(df)
      .collect()
    assert(jac.isEmpty, // Jaccard(quote, article) = 30/500 = 0.06
      s"jaccard should miss the quote: ${jac.toSeq}")
  }

  test("containmentJoin plan has no cross join and no broadcast " +
      "nested loop") {
    val plan = Dedup.containmentJoin(wordToks("/root/testdata/sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"quadratic join shape in plan:\n$plan")
  }

  // ---- goldenRecords (q212) -----------------------------------------------

  test("goldenRecords merges match clusters under mode/min survivorship " +
      "rules; ties break value-ASC; singletons pass through") {
    import spark.implicits._
    val rows = Seq(
      ("a1", "X", 10.0), ("a2", "Y", 8.0), ("a3", "X", 12.0),
      ("b1", "Z", 5.0),
      ("c1", "P", 3.0), ("c2", "Q", 2.0)).toDF("id", "brand", "price")
    val pairs = Seq(("a1", "a2"), ("a2", "a3"), ("c1", "c2")).toDF("a", "b")
    val got = Dedup.goldenRecords(rows, pairs, "id",
      modeFields = Seq("brand"), minFields = Seq("price"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .toSet
    assert(got == Set(
      ("a1", 3L, 8.0, "X"), // mode X (2 of 3); min price from a2
      ("b1", 1L, 5.0, "Z"), // unmatched row = singleton cluster
      ("c1", 2L, 2.0, "P")), // 1-1 brand tie -> value ASC
      s"got $got")
  }

  test("goldenRecords: NULL never wins a mode vote, even on higher " +
      "count; an all-NULL cluster merges to NULL") {
    import spark.implicits._
    val rows = Seq(
      ("d1", null, 1.0), ("d2", null, 2.0), ("d3", "X", 3.0),
      ("e1", null, 4.0)).toDF("id", "brand", "price")
    val pairs = Seq(("d1", "d2"), ("d2", "d3")).toDF("a", "b")
    val got = Dedup.goldenRecords(rows, pairs, "id",
      modeFields = Seq("brand"), minFields = Seq("price"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2),
          Option(r.getString(3)))).toSet
    assert(got == Set(
      ("d1", 3L, 1.0, Some("X")), // 2 NULLs lose to 1 known value
      ("e1", 1L, 4.0, None)), // nothing known -> NULL golden value
      s"got $got")
  }

  test("goldenRecords: maxClusterSize dissolves over-cap components " +
      "into capped singletons; under-cap clusters merge normally; " +
      "guard off keeps the legacy schema") {
    import spark.implicits._
    val rows = Seq(
      // 4-member transitive chain f1~f2~f3~f4 — the over-merge blob
      ("f1", "A", 4.0), ("f2", "B", 3.0), ("f3", "C", 2.0),
      ("f4", "D", 1.0),
      // legitimate 2-member cluster
      ("g1", "X", 9.0), ("g2", "X", 7.0),
      ("h1", "Z", 5.0)).toDF("id", "brand", "price")
    val pairs = Seq(("f1", "f2"), ("f2", "f3"), ("f3", "f4"),
      ("g1", "g2")).toDF("a", "b")
    val got = Dedup.goldenRecords(rows, pairs, "id",
      modeFields = Seq("brand"), minFields = Seq("price"),
      maxClusterSize = 3L)
    assert(got.columns.toSeq ==
      Seq("cluster", "n_members", "min_price", "capped", "brand"))
    val m = got.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getBoolean(3), r.getString(4)))
      .toMap
    // blob refused: each member is its own golden record, flagged
    for (f <- Seq("f1", "f2", "f3", "f4"))
      assert(m(f)._1 == 1L && m(f)._3, s"$f should be a capped singleton")
    assert(m("f2") == ((1L, 3.0, true, "B")))
    // under-cap cluster merges exactly as without the guard
    assert(m("g1") == ((2L, 7.0, false, "X")))
    assert(m("h1") == ((1L, 5.0, false, "Z")))
    assert(m.size == 6)
    // guard off: no capped column (q212's oracle-pinned legacy schema)
    val legacy = Dedup.goldenRecords(rows, pairs, "id",
      modeFields = Seq("brand"), minFields = Seq("price"))
    assert(legacy.columns.toSeq ==
      Seq("cluster", "n_members", "min_price", "brand"))
    assert(legacy.count() == 3)
  }

  // ---- kmeansTrain (q207) -------------------------------------------------

  private def lloydReference(vecs: Seq[(Long, Seq[Float])], k: Int,
      rounds: Int): Map[Long, (Long, BigInt, Seq[Long])] = {
    // sequential in-memory replay of the EXACT integer contract:
    // micro-quantize, argmin with (dist, cid) ties, floor-div update,
    // empty cluster keeps its previous centroid
    val q = vecs.sortBy(_._1).map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1000000d).toLong)
    }
    var cents: Seq[(Long, Seq[Long])] =
      q.take(k).zipWithIndex.map { case ((_, qe), i) => (i.toLong, qe) }
    def assignAll = q.map { case (id, qe) =>
      val (dist, cid) = cents.map { case (cid, cv) =>
        (qe.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.min
      (id, cid, dist, qe)
    }
    for (_ <- 1 to rounds) {
      val byC = assignAll.groupBy(_._2)
      cents = cents.map { case (cid, old) =>
        byC.get(cid) match {
          case None => (cid, old)
          case Some(rows) =>
            val n = rows.size
            (cid, rows.map(_._4).transpose.map { col =>
              val s = col.sum
              Math.floorDiv(s, n.toLong)
            })
        }
      }
    }
    val fin = assignAll.groupBy(_._2)
    cents.map { case (cid, cv) =>
      val rows = fin.getOrElse(cid, Seq.empty)
      cid -> (rows.size.toLong,
        rows.map(r => BigInt(r._3)).sum, cv)
    }.toMap
  }

  test("kmeansTrain equals a sequential integer Lloyd replay " +
      "(sizes, inertia, full centroid vectors)") {
    val vecs = graft.Tables.load(spark, "/root/testdata/sf0.001",
        "embeddings")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toSeq)).toSeq
    val want = lloydReference(vecs, 4, 3)
    val got = Similarity.kmeansTrain(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings"))
      .collect().map { r =>
        r.getLong(0) -> (r.getLong(1),
          BigInt(r.getLong(2)),
          r.getSeq[Long](3).toSeq)
      }.toMap
    assert(got == want,
      s"diverged: got sizes ${got.view.mapValues(_._1).toMap}, " +
        s"want ${want.view.mapValues(_._1).toMap}")
    assert(got.values.map(_._1).sum == vecs.size)
  }

  test("kmeansTrain inertia is non-increasing in rounds " +
      "(Lloyd monotonicity)") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val inertias = Seq(1, 2, 4).map { r =>
      Similarity.kmeansTrain(e, rounds = r)
        .agg(org.apache.spark.sql.functions.sum(col("inertia")))
        .collect().head.getLong(0)
    }
    assert(inertias.sliding(2).forall(p => p(0) >= p(1)),
      s"inertia increased across rounds: $inertias")
  }

  test("kmeansTrain keeps the previous centroid when a cluster empties") {
    // seeds are the 2 lowest ids; seed 0 sits at an extreme corner that
    // attracts nothing once the update pulls centroid 1 into the mass —
    // then centroid 0 itself is closer to mass... construct directly:
    // one far outlier that is its own seed, then REMOVE it from
    // gravity by making every later point identical and nearer seed 1.
    // After round 1: cluster 0 = {outlier}, cluster 1 = the rest. The
    // outlier stays its own cluster — to empty a cluster, seed 1 must
    // lose: impossible here, so use k=2 with seeds 0,1 both inside the
    // clump and ALL mass at the clump: cluster 1 keeps >= 1 member.
    // The genuinely empty case: seed 0 = clump value too -> after
    // update both centroids coincide; ties then send EVERY point to
    // cid 0 and cluster 1 empties, keeping its previous (= same) cv.
    val rows = (0L to 9L).map(i => (i, Seq.fill(4)(0.25f)))
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val out = Similarity.kmeansTrain(df, k = 2, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](3).toSeq)).sortBy(_._1)
    assert(out.length == 2)
    assert(out(0)._2 == 10L && out(1)._2 == 0L,
      s"tie rule or empty-cluster rule broke: ${out.toSeq}")
    assert(out(1)._3 == Seq.fill(4)(250000L),
      s"emptied cluster lost its centroid: ${out(1)._3}")
  }

  // ---- dbscan (q209) ------------------------------------------------------

  /** Sequential DBSCAN with the operator's deterministic refinement:
    * cluster = min core id per core-connected component (union-by-min,
    * so every root is its component's minimum), border joins the
    * min-labeled core neighbor. */
  private def dbscanReference(pts: Seq[(Long, Long, Long)], eps: Long,
      minPts: Int): Set[(Long, String, Option[Long])] = {
    val arr = pts.toArray
    def d2(p: (Long, Long, Long), q: (Long, Long, Long)): Long = {
      val dx = p._2 - q._2; val dy = p._3 - q._3; dx * dx + dy * dy
    }
    val neigh = arr.map(p =>
      arr.filter(q => d2(p, q) <= eps * eps).map(_._1).toSet)
    val idx = arr.map(_._1).zipWithIndex.toMap
    val core = arr.indices
      .filter(i => neigh(i).size >= minPts).map(arr(_)._1).toSet
    val parent = scala.collection.mutable.Map[Long, Long]() ++
      core.map(c => c -> c)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r); r
    }
    for (i <- arr.indices if core(arr(i)._1); q <- neigh(i) if core(q)) {
      val (ra, rb) = (find(arr(i)._1), find(q))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    arr.map { p =>
      if (core(p._1)) (p._1, "core", Option(find(p._1)))
      else {
        val cn = (neigh(idx(p._1)) - p._1).filter(core)
        if (cn.nonEmpty) (p._1, "border", Option(cn.map(find).min))
        else (p._1, "noise", Option.empty[Long])
      }
    }.toSet
  }

  private def collectDbscan(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) Option.empty[Long] else Option(r.getLong(2)))).toSet

  test("dbscan matches the sequential reference on the embeddings " +
      "fixture at the adaptive default AND a fixed (eps, minPts)") {
    val raw = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.expr(
          "CAST(floor(CAST(embedding[0] AS DOUBLE) * 1000000D) AS BIGINT)"),
        org.apache.spark.sql.functions.expr(
          "CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000D) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val df = raw.toDF("vid", "x", "y")
    // adaptive sentinel resolves to adaptiveEpsMicro(n) — same result
    val epsAd = Similarity.adaptiveEpsMicro(raw.size.toLong)
    val wantAd = dbscanReference(raw, epsAd, 5)
    assert(collectDbscan(Similarity.dbscan(df)) == wantAd)
    // every role occurs on the fixture (the test is non-vacuous)
    assert(Set("core", "border", "noise")
      .subsetOf(wantAd.map(_._2)), s"degenerate fixture: ${wantAd.map(_._2)}")
    assert(wantAd.flatMap(_._3).size > 1, "single-cluster fixture")
    // a fixed wider setting exercises a different grid resolution
    val want = dbscanReference(raw, 40000L, 10)
    assert(collectDbscan(
      Similarity.dbscan(df, epsMicro = 40000L, minPts = 10)) == want)
  }

  test("adaptiveEpsMicro halves eps exactly at refN·4^s boundaries " +
      "and never reaches zero") {
    assert(Similarity.adaptiveEpsMicro(1L) == 20000L)
    assert(Similarity.adaptiveEpsMicro(500L) == 20000L)
    assert(Similarity.adaptiveEpsMicro(501L) == 10000L)
    assert(Similarity.adaptiveEpsMicro(2000L) == 10000L)
    assert(Similarity.adaptiveEpsMicro(2001L) == 5000L)
    assert(Similarity.adaptiveEpsMicro(Long.MaxValue) == (20000L >> 14))
    assert((20000L >> 14) >= 1L)
  }

  test("dbscan pairs points across grid-cell boundaries, borders take " +
      "the min component label and never bridge two clusters") {
    import spark.implicits._
    // eps=10, minPts=4. Cluster A (ids 1-4) and cluster B (ids 10-13)
    // are separate components; id 5 is within eps of a core in EACH —
    // border, labeled min(1, 10) = 1, and A/B stay distinct (borders do
    // not merge components). (-2,0) vs (0,0) straddle cells -1 and 0.
    val df = Seq(
      (1L, -2L, 0L), (2L, 0L, 0L), (3L, 2L, 0L), (4L, 0L, 2L),
      (5L, 11L, 0L),
      (10L, 20L, 0L), (11L, 26L, 0L), (12L, 28L, 0L), (13L, 26L, 2L),
      (30L, 1000L, 1000L)).toDF("vid", "x", "y")
    val got = collectDbscan(Similarity.dbscan(df, epsMicro = 10L,
      minPts = 4))
    val want: Set[(Long, String, Option[Long])] =
      Set((1L, "core", Some(1L)), (2L, "core", Some(1L)),
        (3L, "core", Some(1L)), (4L, "core", Some(1L)),
        (5L, "border", Some(1L)),
        (10L, "core", Some(10L)), (11L, "core", Some(10L)),
        (12L, "core", Some(10L)), (13L, "core", Some(10L)),
        (30L, "noise", None))
    assert(got == want, s"got $got")
  }

  // ---- kCore (q210) -------------------------------------------------------

  /** Sequential peel reference: repeatedly delete vertices with induced
    * degree < k; returns surviving vertex → induced degree. */
  private def kCoreReference(edges: Seq[(Long, Long)], k: Int)
      : Map[Long, Long] = {
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
    edges.filter(e => e._1 != e._2).foreach { case (a, b) =>
      adj(a) = adj.getOrElse(a, Set.empty) + b
      adj(b) = adj.getOrElse(b, Set.empty) + a
    }
    var cur = adj.keySet.toSet
    var done = false
    while (!done) {
      val drop = cur.filter(v => (adj(v) intersect cur).size < k)
      if (drop.isEmpty) done = true else cur = cur -- drop
    }
    cur.map(v => v -> (adj(v) intersect cur).size.toLong).toMap
  }

  private def runKCore(edges: Seq[(Long, Long)], k: Int,
      maxRounds: Int = 64): Map[Long, Long] = {
    import spark.implicits._
    Graph.kCore(edges.toDF("a", "b"), k, maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("kCore: a clique survives intact, a path peels to empty, and a " +
      "clique with a pendant chain peels exactly the chain") {
    val clique = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    assert(runKCore(clique, 4) == (1L to 5L).map(_ -> 4L).toMap)
    val path = (1L until 12L).map(i => (i, i + 1))
    assert(runKCore(path, 2) == Map.empty) // every round exposes new ends
    val chained = clique ++ Seq((5L, 10L), (10L, 11L), (11L, 12L))
    assert(runKCore(chained, 2) ==
      (1L to 5L).map(_ -> 4L).toMap) // chain gone, clique degrees intact
  }

  test("kCore matches the sequential peel on seeded random graphs " +
      "at several k") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val edges = Seq.fill(300)(
        (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter(e => e._1 != e._2)
      for (k <- Seq(2, 4, 6)) {
        val want = kCoreReference(edges, k)
        assert(runKCore(edges, k) == want, s"k=$k diverged")
      }
    }
  }

  test("kCore refuses to return a non-core superset when maxRounds is " +
      "too small") {
    val path = (1L until 12L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      runKCore(path, 2, maxRounds = 3) // needs ~6 peel rounds
    }
  }

  // ---- shortestPaths (q213) -----------------------------------------------

  /** Dijkstra reference over the symmetrized min-collapsed graph. */
  private def ssspReference(edges: Seq[(Long, Long, Long)], src: Long)
      : Map[Long, Option[Long]] = {
    val w = scala.collection.mutable.Map[(Long, Long), Long]()
    edges.filter(e => e._1 != e._2).foreach { case (a, b, x) =>
      w((a, b)) = math.min(w.getOrElse((a, b), Long.MaxValue), x)
      w((b, a)) = math.min(w.getOrElse((b, a), Long.MaxValue), x)
    }
    val adj = w.toSeq.groupBy(_._1._1)
      .map { case (v, es) => v -> es.map(e => (e._1._2, e._2)) }
    val dist = scala.collection.mutable.Map[Long, Long]()
    if (adj.contains(src)) {
      val pq = scala.collection.mutable.PriorityQueue[(Long, Long)]()(
        Ordering.by(-_._1))
      pq.enqueue((0L, src))
      while (pq.nonEmpty) {
        val (d, v) = pq.dequeue()
        if (!dist.contains(v)) {
          dist(v) = d
          adj(v).foreach { case (u, x) =>
            if (!dist.contains(u)) pq.enqueue((d + x, u))
          }
        }
      }
    }
    adj.keys.map(v => v -> dist.get(v)).toMap
  }

  private def runSssp(edges: Seq[(Long, Long, Long)], src: Long,
      maxRounds: Int = 32): Map[Long, Option[Long]] = {
    import spark.implicits._
    Graph.shortestPaths(edges.toDF("a", "b", "w"), src, maxRounds)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
  }

  test("shortestPaths matches Dijkstra on seeded random weighted graphs, " +
      "including an unreachable island (NULL dist)") {
    val rnd = new scala.util.Random(23)
    (1 to 3).foreach { _ =>
      // main component on 0..39 plus an island on 100..104
      val edges = Seq.fill(150)((rnd.nextInt(40).toLong,
        rnd.nextInt(40).toLong, (rnd.nextInt(99) + 1).toLong))
        .filter(e => e._1 != e._2) ++
        (100L until 104L).map(i => (i, i + 1, 7L))
      val want = ssspReference(edges, 0L)
      assert(want.exists(_._2.isEmpty), "island must be unreachable")
      assert(runSssp(edges, 0L) == want)
    }
  }

  test("shortestPaths takes the minimum over parallel edges and " +
      "fails loud when maxRounds is too small") {
    assert(runSssp(Seq((1L, 2L, 9L), (2L, 1L, 4L), (1L, 2L, 6L)), 1L)
      == Map(1L -> Some(0L), 2L -> Some(4L)))
    val path = (1L until 10L).map(i => (i, i + 1, 1L))
    intercept[IllegalStateException] {
      runSssp(path, 1L, maxRounds = 3) // tree depth 9 needs ~10 rounds
    }
    intercept[Exception] { // non-positive weight rejected fail-loud
      runSssp(Seq((1L, 2L, 0L)), 1L)
    }
  }

  // ---- labelPropagation (q211) --------------------------------------------

  /** Sequential synchronous weighted LPA with the operator's exact
    * semantics: label = argmax Σw over neighbor labels, ties to the
    * minimum label, run exactly `rounds` rounds. */
  private def lpaReference(edges: Seq[(Long, Long, Long)], rounds: Int)
      : Map[Long, Long] = {
    val sym = scala.collection.mutable.Map[(Long, Long), Long]()
    edges.filter(e => e._1 != e._2).foreach { case (a, b, w) =>
      sym((a, b)) = sym.getOrElse((a, b), 0L) + w
      sym((b, a)) = sym.getOrElse((b, a), 0L) + w
    }
    val adj = sym.toSeq.groupBy(_._1._1)
      .map { case (v, es) => v -> es.map(e => (e._1._2, e._2)) }
    var lbl = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      lbl = adj.map { case (v, ns) =>
        val scores = ns.groupBy(n => lbl(n._1))
          .map { case (l, xs) => (l, xs.map(_._2).sum) }
        v -> scores.toSeq.minBy(s => (-s._2, s._1))._1
      }
    }
    lbl
  }

  private def runLpa(edges: Seq[(Long, Long, Long)], rounds: Int)
      : Map[Long, Long] = {
    import spark.implicits._
    Graph.labelPropagation(edges.toDF("a", "b", "w"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("labelPropagation matches the sequential synchronous reference " +
      "on seeded random weighted graphs at 1 AND 4 rounds") {
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { _ =>
      val edges = Seq.fill(200)((rnd.nextInt(50).toLong,
        rnd.nextInt(50).toLong, (rnd.nextInt(9) + 1).toLong))
        .filter(e => e._1 != e._2)
      for (r <- Seq(1, 4)) {
        assert(runLpa(edges, r) == lpaReference(edges, r),
          s"rounds=$r diverged")
      }
    }
  }

  test("labelPropagation: two heavy triangles with a light bridge " +
      "settle into two communities") {
    val tri1 = Seq((1L, 2L, 10L), (2L, 3L, 10L), (3L, 1L, 10L))
    val tri2 = Seq((10L, 11L, 10L), (11L, 12L, 10L), (12L, 10L, 10L))
    val edges = tri1 ++ tri2 ++ Seq((3L, 10L, 1L))
    val got = runLpa(edges, 4)
    assert(got == lpaReference(edges, 4))
    val c1 = Set(1L, 2L, 3L).map(got)
    val c2 = Set(10L, 11L, 12L).map(got)
    assert(c1.size == 1 && c2.size == 1 && c1 != c2,
      s"triangles did not form two communities: $got")
  }

  test("labelPropagation ties break to the minimum label (square, " +
      "equal weights, one round)") {
    val sq = Seq((1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L), (4L, 1L, 5L))
    assert(runLpa(sq, 1) == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("dbscan plan has no cross join and no broadcast nested loop") {
    val raw = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings").select(col("vec_id").as("vid"),
        org.apache.spark.sql.functions.expr(
          "CAST(floor(CAST(embedding[0] AS DOUBLE) * 1000000D) AS BIGINT)")
          .as("x"),
        org.apache.spark.sql.functions.expr(
          "CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000D) AS BIGINT)")
          .as("y"))
    val plan = Similarity.dbscan(raw)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"quadratic join shape in plan:\n$plan")
  }
}
