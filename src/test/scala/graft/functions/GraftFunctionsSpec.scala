package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Native DotProduct + SQL registration: bit-parity with the builtin
  * higher-order formulation, null contract, codegen participation, and
  * the graft_* SQL surface.
  */
class GraftFunctionsSpec extends SparkTestBase {

  private def vecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    (1 to 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b")
  }

  private val builtinDot = graft.ops.Dialect.sparkDot("a", "b")

  test("bit-identical to the builtin aggregate/zip_with fold") {
    GraftFunctions.ensureRegistered(spark)
    val df = vecs.select(
      expr("graft_dot(a, b)").as("native"),
      expr(builtinDot).as("builtin"))
    assert(df.filter(col("native") =!= col("builtin")).count() == 0)
    // strict equality of doubles — fold order must match exactly
    df.collect().foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null contract: null input, length mismatch, null element") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1f, 2f), Array(3f, 4f)), // ok
      (null, Array(3f, 4f)), // null side
      (Array(1f), Array(3f, 4f)) // length mismatch
    ).toDF("a", "b")
    val got = df.select(expr("graft_dot(a, b)")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(11.0), None, None))
  }

  test("participates in whole-stage codegen") {
    GraftFunctions.ensureRegistered(spark)
    // repartition keeps the projection out of the eagerly-evaluated
    // LocalTableScan so a real codegen stage forms around it
    val df = vecs.repartition(2).select(expr("graft_dot(a, b)").as("d"))
    // collect() executes THIS df's queryExecution (count() would build a
    // separate one), letting AQE materialize the final plan for inspection
    assert(df.collect().length == 50)
    // the `*(N)` prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[graft_dot""".r.findFirstIn(plan).isDefined,
      plan)
  }

  test("graft_cosine, graft_tsize, graft_hash60 via spark.sql") {
    GraftFunctions.ensureRegistered(spark)
    vecs.createOrReplaceTempView("gf_vecs")
    val cos = spark.sql(
      "SELECT max(abs(graft_cosine(a, a) - 1.0)) FROM gf_vecs").head.getDouble(0)
    assert(cos < 1e-12) // self-cosine == 1 up to rounding
    val ts = spark.sql("SELECT graft_tsize(3), graft_tsize(1000)").head
    assert(ts.getString(0) == "SMALL" && ts.getString(1) == "CUSTOM")
    // hash60 matches the Dialect fragment it mirrors
    val h = spark.sql(
      s"""SELECT graft_hash60('abc') = ${graft.ops.Dialect.sparkHash60("'abc'")}""")
      .head.getBoolean(0)
    assert(h)
  }

  test("graft_minhash bit-identical to the lambda formulation") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 40).map(_ =>
      Array.fill(1 + rnd.nextInt(200))(rnd.nextLong().abs % 2147483647L))
      .toDF("hs")
    val got = df.select(
      expr("graft_minhash(hs, 12, 2147483647)").as("native"),
      expr("""aggregate(hs, array_repeat(2147483647L, 12),
           |  (acc, v) -> zip_with(acc, sequence(0, 11),
           |    (m, j) -> least(m, ((2*j + 1) * v + 101*j) % 2147483647L)))"""
        .stripMargin).as("lambda"))
    assert(got.filter(col("native") =!= col("lambda")).count() == 0)
  }

  test("graft_simhash60 bit-identical to the lambda formulation") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val df = (1 to 40).map(_ =>
      Array.fill(1 + rnd.nextInt(150))(rnd.nextLong() & ((1L << 60) - 1)))
      .toDF("hs")
    val got = df.select(
      expr("graft_simhash60(hs)").as("native"),
      expr("""aggregate(
           |  zip_with(
           |    aggregate(hs, array_repeat(0L, 60),
           |      (acc, h) -> zip_with(acc, sequence(0, 59),
           |        (a, j) -> a + 2 * (shiftright(h, j) & 1) - 1)),
           |    sequence(0, 59),
           |    (c, j) -> CASE WHEN c > 0 THEN shiftleft(1L, j) ELSE 0L END),
           |  0L, (a, x) -> a + x)""".stripMargin).as("lambda"))
    assert(got.filter(col("native") =!= col("lambda")).count() == 0)
  }

  test("sketch expressions: empty and null inputs") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(
      (1, Array.empty[Long]),
      (2, null.asInstanceOf[Array[Long]])).toDF("id", "hs")
    val rows = df.select(col("id"),
        expr("graft_minhash(hs, 4, 97)"), expr("graft_simhash60(hs)"))
      .orderBy("id").collect()
    // empty array: minima stay at prime, simhash counts all <= 0 => 0
    assert(rows(0).getSeq[Long](1) == Seq(97L, 97L, 97L, 97L))
    assert(rows(0).getLong(2) == 0L)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("graft_minhash rejects out-of-range n and prime at analysis time") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(Array(1L, 2L)).toDF("hs")
    def analysisError(sql: String, needle: String): Unit = {
      val e = intercept[Exception](df.select(expr(sql)).collect())
      assert(e.getMessage.contains(needle), s"$sql -> ${e.getMessage}")
    }
    // overflow preconditions (Sketches.scala): n <= 32, prime < 2^31
    analysisError("graft_minhash(hs, 1000, 97)", "[1, 32]")
    analysisError("graft_minhash(hs, 0, 97)", "[1, 32]")
    analysisError("graft_minhash(hs, 4, 1099511627776)", "2^31")
    analysisError("graft_minhash(hs, 4, 1)", "2^31")
    // boundary values stay accepted
    assert(df.select(expr("graft_minhash(hs, 32, 2147483647)")).head()
      .getSeq[Long](0).size == 32)
  }

  test("graft_overlap equals size(array_intersect) incl nulls and dups") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def arr(): Seq[String] = Seq.fill(rnd.nextInt(12))(
      if (rnd.nextInt(10) == 0) null else s"t${rnd.nextInt(8)}")
    val rows = Seq.fill(60)((arr(), arr())) :+
      (Seq.empty[String], Seq("a")) :+ (Seq("a", "a", null), Seq(null, "a"))
    val df = rows.toDF("a", "b")
    // expected computed driver-side: comparing against the builtin
    // composition in-session would be vacuous — ensureRegistered installs
    // the rewrite that turns size(array_intersect) INTO graft_overlap
    val expected = rows.map { case (a, b) =>
      a.distinct.count(e => b.contains(e))
    }
    val got = df.select(expr("graft_overlap(a, b)").as("native"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == expected)
    // long arrays take the same code path with primitive boxing
    val lg = Seq((Seq(1L, 2L, 2L, 3L), Seq(2L, 3L, 9L))).toDF("a", "b")
      .select(expr("graft_overlap(a, b)").as("n")).head()
    assert(lg.getInt(0) == 2)
    // null input → null, matching size(array_intersect) sizeOfNull=false
    val nullRow = Seq((null.asInstanceOf[Seq[String]], Seq("x")))
      .toDF("a", "b").select(expr("graft_overlap(a, b)")).head()
    assert(nullRow.isNullAt(0))
  }

  test("NativeOverlapRewrite rewrites size(array_intersect) in the plan") {
    GraftFunctions.ensureRegistered(spark)
    // Range source, id-dependent arrays: a LocalRelation or literal-only
    // input would be constant-folded before the plan assertion can look
    val df = spark.range(3)
      .select(array(concat(lit("t"), col("id")), lit("b")).as("x"),
        array(lit("b"), lit("t1")).as("y"))
      .select(expr("size(array_intersect(x, y))").as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_overlap"), optimized)
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 1))
    // float arrays must NOT rewrite (NaN/-0.0 set-op normalization)
    val f = spark.range(2)
      .select(array(col("id").cast("float")).as("x"),
        array(lit(1.0f)).as("y"))
      .select(expr("size(array_intersect(x, y))").as("n"))
    assert(!f.queryExecution.optimizedPlan.toString.contains("graft_overlap"))
    assert(f.collect().map(_.getInt(0)).toSeq == Seq(0, 1))
  }

  test("graft_hash60_array matches the scalar hex-parse hash elementwise") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(Seq("", "a", "hello world", "ünïcödé", "x" * 500))
      .toDF("arr")
    val scalar = graft.ops.Dialect.sparkHash60("x")
    val got = df.select(
      expr("graft_hash60_array(arr)").as("native"),
      expr(s"transform(arr, x -> $scalar)").as("hexparse"),
      expr("graft_hash60_array(arr, 97)").as("native_mod"),
      expr(s"transform(arr, x -> $scalar % 97)").as("hexparse_mod")).head()
    assert(got.getSeq[Long](0) == got.getSeq[Long](1))
    assert(got.getSeq[Long](2) == got.getSeq[Long](3))
  }

  test("graft_shingles matches the builtin transform/slice/distinct shape") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(
      "the quick brown fox jumps over the quick brown fox",
      "one two", "solo", "").toDF("text")
    val got = df.select(
      expr("graft_shingles(regexp_extract_all(text, '[a-z]+', 0), 3)")
        .as("native"),
      expr("""array_distinct(transform(
           |  sequence(1, greatest(size(regexp_extract_all(text, '[a-z]+', 0)) - 2, 1)),
           |  i -> array_join(slice(regexp_extract_all(text, '[a-z]+', 0), i, 3), ' ')))"""
        .stripMargin).as("builtin"))
    got.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("graft_char_ngrams matches the builtin per-position substring shape") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq("abcdefg", "aaaa", "ab", "a", "", "héllo wörld").toDF("text")
    val got = df.select(
      expr("graft_char_ngrams(text, 3)").as("native"),
      expr("""array_distinct(transform(sequence(1, greatest(length(text)-2, 1)),
           |  i -> substring(text, i, 3)))""".stripMargin).as("builtin"))
    got.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("NativeDotRewrite rewrites the builtin dot idiom to graft_dot") {
    import graft.plans.NativeDotRewrite
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ NativeDotRewrite
    try {
      // repartition keeps ConvertToLocalRelation from evaluating the
      // projection at optimization time
      val src = vecs.repartition(2)
      val df = src.select(expr(builtinDot).as("d"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_dot"), optimized)
      // rewritten result identical to the interpreted evaluation
      val direct = src.select(expr("graft_dot(a, b)").as("d"))
        .collect().map(_.getDouble(0)).sorted
      assert(df.collect().map(_.getDouble(0)).sorted.toSeq == direct.toSeq)

      // conservative: a different merge function must NOT fire
      val other = src.select(expr(
        """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          |CAST(0 AS DOUBLE), (acc, v) -> acc + 2 * v)""".stripMargin))
      assert(!other.queryExecution.optimizedPlan.toString
        .contains("graft_dot"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == NativeDotRewrite)
    }
  }

  test("graft_window_min matches the builtin slice/array_min shape") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val df = ((1 to 30).map(_ =>
      Array.fill(1 + rnd.nextInt(40))(rnd.nextLong())) :+ Array(7L, 3L))
      .toDF("hs")
    val got = df.select(
      expr("graft_window_min(hs, 4)").as("native"),
      expr("""transform(sequence(1, greatest(size(hs)-3, 1)),
           |  j -> array_min(slice(hs, j, 4)))""".stripMargin).as("builtin"))
    got.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("extensions class registers on a fresh session") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // same SparkContext, new session — function must resolve there
    assert(s2.sql("SELECT graft_tsize(25)").head.getString(0) == "LARGE")
  }

  test("graft_bloom_contains: no false negatives, null contract, exact composition") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val keys = (1L to 1000L).map(_ * 7L)
    val bf = keys.toDF("k").stat.bloomFilter("k", keys.length.toLong, 0.01)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
      bos.toByteArray
    }
    val probe = GraftFunctions.bloomProbe(bytes, "v")
    // every inserted key must test true (bloom filters have no false
    // negatives — the property the runtime-filter pattern relies on)
    val inserted = keys.toDF("v").select(probe.as("hit")).collect()
    assert(inserted.forall(_.getBoolean(0)))
    // a NULL probe value is NULL, not false
    val nullRow = Seq[Option[Long]](None).toDF("v").select(probe).head()
    assert(nullRow.isNullAt(0))
    // exact composition: bloom pre-filter + exact semi join == plain semi
    // join (false positives removed, nothing lost)
    val facts = (1L to 10000L).toDF("v")
    val dims = keys.toDF("k")
    val viaBloom = facts.filter(probe)
      .join(dims, col("v") === col("k"), "left_semi")
      .collect().map(_.getLong(0)).sorted.toSeq
    val plain = facts.join(dims, col("v") === col("k"), "left_semi")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaBloom == plain)
    // non-literal filter argument is rejected at analysis time
    val e = intercept[Exception] {
      Seq((bytes, 1L)).toDF("f", "v")
        .select(expr("graft_bloom_contains(f, v)"))
        .collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("q79 plan: the bloom probe runs below the semi join, on the fact side") {
    // the runtime-filter contract is a PLAN property: the probe must
    // execute in the fact table's scan stage (before the join and its
    // exchange), not as a post-join residual — otherwise the shuffle
    // savings it exists for never happen
    val plan = graft.SparkEntry.queries("q79_bloom_semi_join")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val root = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val joins = root.collect {
      case j if j.nodeName.toLowerCase.contains("join") => j
    }
    assert(joins.nonEmpty, s"no join in plan:\n$root")
    val factSide = joins.head.children
      .filter(_.toString.contains("graft_bloom_contains"))
    assert(factSide.nonEmpty,
      s"bloom probe not below the join:\n$root")
  }

  test("graft_bpe: rank-ordered LTR merges, chained merges, overlap skip") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val merges = "t h,th e,i n,a n,an d" // ranks 1..5
    val got = Seq(
      ("the",   1), // t+h → th; th+e → the      (chained through ranks)
      ("thin",  2), // th + in — rank 3 applies AFTER the rank-1 merge
      ("and",   3), // a+n → an (rank 4); an+d → and (rank 5)
      ("xq",    4), // no merge applies → char symbols survive
      ("ttthhh", 5), // only ONE t,h adjacency (LTR, middle): t t th h h
      ("a",     6)) // single char: nothing to merge
      .toDF("w", "i")
      .selectExpr(s"i", s"graft_bpe(array(w), '$merges')[0] AS e")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(1) == "the", got.toString)
    assert(got(2) == "th in", got.toString)
    assert(got(3) == "and", got.toString)
    assert(got(4) == "x q", got.toString)
    assert(got(5) == "t t th h h", got.toString)
    assert(got(6) == "a", got.toString)
    // self-pair LTR semantics: scan resumes AFTER a merge — "aaa" under
    // a+a is [aa, a], never [a, aa]
    val aaa = Seq(Tuple1("aaa")).toDF("w")
      .selectExpr("graft_bpe(array(w), 'a a')[0] AS e")
      .head().getString(0)
    assert(aaa == "aa a", aaa)
  }

  test("bpeEncode public API on custom columns; literal-merges guard") {
    import spark.implicits._
    val df = Seq((1L, "The Thin"), (2L, "")).toDF("id", "body")
    val enc = graft.ops.TextAnalysis.bpeEncode(df,
        Seq("t" -> "h", "th" -> "e", "i" -> "n"), textCol = "body")
      .select("id", "bpe").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(enc(1L) == Seq("the", "th in"), enc.toString) // lowercased words
    assert(enc(2L) == Seq(), enc.toString)               // empty doc → []
    // non-literal merge argument must fail at analysis, not mid-job
    val err = intercept[Exception] {
      df.selectExpr("graft_bpe(array(body), body)").collect()
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
  }

  test("BoundedTimelineAgg: first-k contract, splice, observability") {
    import graft.functions.BoundedTimelineAgg
    val agg = new BoundedTimelineAgg(3)
    def fold(xs: Seq[(Long, Long, String)]) =
      agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    // keeps the k EARLIEST by (ts, id, type) regardless of arrival order
    val evs = Seq((5L, 1L, "e"), (1L, 1L, "a"), (3L, 1L, "c"), (2L, 1L, "b"))
    assert(fold(evs) == Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c")))
    // a LATE early event splices in and the current latest falls out
    val lateLast = Seq((5L, 1L, "e"), (3L, 1L, "c"), (2L, 1L, "b"), (1L, 1L, "a"))
    assert(fold(lateLast) == fold(evs), "arrival-order independence")
    // merge of partial buffers == fold of the union (shuffle-safe)
    val (l, r) = evs.splitAt(2)
    val merged = agg.finish(agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
    assert(merged == fold(evs))
    // buffer never exceeds k mid-fold (the streaming-state bound)
    val big = (1L to 100L).map(i => (i, i, "x"))
    val buf = big.foldLeft(agg.zero)(agg.reduce)
    assert(buf.items.size == 3)
    // truncation is observable: size(finish) < n_events iff dropped
    assert(fold(big).size == 3 && big.size > 3)
    // under-capacity: everything kept, sorted
    assert(fold(Seq((2L, 1L, "b"), (1L, 1L, "a"))) ==
      Seq((1L, 1L, "a"), (2L, 1L, "b")))
  }
}
