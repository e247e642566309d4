package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The public operator API on caller-supplied tables with NON-default
  * parameters — the battery exercises only the defaults, so this is the
  * proof the parameterization works (custom columns, custom keys,
  * custom k/thresholds), i.e. that the functions are a usable library
  * surface rather than battery plumbing.
  */
class PublicApiSpec extends SparkTestBase {

  private def corpus = {
    import spark.implicits._
    Seq(
      (10L, "alpha beta gamma delta epsilon zeta", "s1"),
      (11L, "alpha beta gamma delta epsilon eta", "s1"), // near-dup of 10
      (12L, "one two three four five six seven", "s2"),
      (13L, "alpha beta gamma delta epsilon zeta", "s2"), // exact dup of 10
      (14L, "totally unrelated text goes here now", "s2"))
      .toDF("id", "body", "src")
  }

  test("exact dedup + survivors on custom column names and key width") {
    val key = Dedup.dedupKey(textCol = "body", tokens = 3)
    val stats = Dedup.exactDedupStats(corpus, key, groupCol = "src")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 10, 11, 13 share the first-3-token key "alpha beta gamma"
    assert(stats("s1") == ((2L, 1L)), stats.toString)
    assert(stats("s2") == ((3L, 3L)), stats.toString)
    val surv = Dedup.keepFirstSurvivors(corpus, key, orderCol = "id")
    val ids = surv.select("id").collect().map(_.getLong(0)).toSet
    // one survivor (lowest id) for the shared key, across sources
    assert(ids == Set(10L, 12L, 14L), ids.toString)
  }

  test("minHashLshPairs finds the near-dup pair on a custom table") {
    val pairs = Dedup.minHashLshPairs(corpus, idCol = "id", textCol = "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the exact dup pair must surface with jac == 1.0
    assert(pairs.exists(p => p._1 == 10L && p._2 == 13L && p._3 == 1.0),
      s"pairs: ${pairs.mkString(";")}")
    // every reported jac is a real Jaccard in (0, 1]
    assert(pairs.forall(p => p._3 > 0.0 && p._3 <= 1.0))
  }

  test("lshCandidates fails fast when the banding over-runs the signature") {
    // 8 hashes cannot cover default 4 bands x 3 rows — without the guard
    // the empty fourth band gives every doc the same key (all-pairs join)
    val sigs = Dedup.minHashSignatures(corpus, idCol = "id",
      textCol = "body", numHashes = 8)
    val e = intercept[Exception] {
      Dedup.lshCandidates(sigs, idCol = "id").collect()
    }
    assert(e.getMessage.contains("bands*rowsPerBand"), e.getMessage)
    // a matching banding over the same signatures works AND still
    // surfaces the exact-dup pair (identical docs → identical signature
    // → every band collides)
    val cand = Dedup.lshCandidates(sigs, bands = 4, rowsPerBand = 2,
      idCol = "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((10L, 13L)), cand.toString)
  }

  test("simHash pairs rank the exact dup at Hamming zero") {
    val sims = Dedup.simHashSignatures(corpus, idCol = "id", textCol = "body")
      .persist()
    val pairs = Dedup.simHashPairs(sims, idCol = "id")
      .select("d1", "d2", "ham")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 10L && p._2 == 13L && p._3 == 0))
    sims.unpersist()
  }

  test("bruteForceTopK honors custom k and matches a hand-computed winner") {
    import spark.implicits._
    val cands = Seq(
      (100L, Array(1.0f, 0.0f)), (101L, Array(0.9f, 0.1f)),
      (102L, Array(0.0f, 1.0f)), (103L, Array(-1.0f, 0.0f)))
      .toDF("cid", "cv")
    val qs = Seq((1L, Array(1.0f, 0.0f))).toDF("qid", "qv")
    val top2 = Similarity.bruteForceTopK(cands, qs, k = 2, saltBuckets = 4)
      .orderBy("rn").collect()
    assert(top2.length == 2)
    assert(top2(0).getLong(1) == 100L) // exact match first
    assert(top2(1).getLong(1) == 101L)
  }

  test("asOfJoin / rangeJoinPairs / sessionCounts on custom columns") {
    import spark.implicits._
    // (sensor, t, rid, reading): two sensors, readings and probes interleaved
    val quotes = Seq(
      (7L, 100L, 1L, 10.0), (7L, 200L, 3L, 20.0), (8L, 150L, 5L, 50.0))
      .toDF("sensor", "t", "rid", "reading")
    val probes = Seq(
      (7L, 150L, 2L, "p2"), (7L, 250L, 4L, "p4"), (8L, 100L, 6L, "p6"))
      .toDF("sensor", "t", "rid", "tag")
    val asof = Temporal.asOfJoin(probes, quotes,
      keyCol = "sensor", tsCol = "t", idCol = "rid", valCol = "reading")
    // contract: left keeps ALL its columns, no internal working columns
    assert(asof.columns.toSet ==
      Set("sensor", "t", "rid", "tag", "asof_val", "asof_event"),
      asof.columns.mkString(","))
    val joined = asof
      .select("sensor", "rid", "asof_val")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(joined((7L, 2L)).contains(10.0)) // probe@150 sees reading@100
    assert(joined((7L, 4L)).contains(20.0)) // probe@250 sees reading@200
    assert(joined((8L, 6L)).isEmpty) // probe@100 precedes reading@150

    // range pairs within (0, 100] time units, key/ts/id renamed
    val ev = Seq((7L, 100L, 1L), (7L, 180L, 2L), (7L, 300L, 3L))
      .toDF("sensor", "t", "rid")
    val pairs = Temporal.rangeJoinPairs(ev, windowUs = 100L,
      keyCol = "sensor", tsCol = "t", idCol = "rid")
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), pairs.toString) // 180-100=80 ≤ 100; 300-180=120 > 100

    // sessions with a 100-unit gap: strictly-greater splits
    val sc = Temporal.sessionCounts(ev, gapUs = 100L,
      keyCol = "sensor", tsCol = "t", idCol = "rid").head()
    assert((sc.getLong(1), sc.getLong(2)) == ((2L, 3L)),
      sc.toString) // [100,180] merge (gap 80), 300 splits (gap 120 > 100)
  }

  test("bloomSemiJoin equals plain semi join; tableDiff classifies all four statuses") {
    import spark.implicits._
    val fact = (1L to 500L).map(i => (i, i % 7)).toDF("fk", "grp")
    val dim = (1L to 500L by 5).toDF("dk")
    val viaBloom = Relational.bloomSemiJoin(fact, "fk", dim, "dk")
      .select("fk").collect().map(_.getLong(0)).sorted.toSeq
    val plain = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .select("fk").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaBloom == plain && plain.nonEmpty)
    // fact and dim sharing the key NAME must not be ambiguous
    val sameName = Relational.bloomSemiJoin(
      fact.withColumnRenamed("fk", "k"), "k", dim.withColumnRenamed("dk", "k"),
      "k", expectedItems = 100L)
      .count()
    assert(sameName == plain.length.toLong)

    val l = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "s", "v")
    val r = Seq((1L, "a", 1.0), (2L, "b", 9.0), (4L, "d", 4.0))
      .toDF("id", "s", "v")
    val statuses = Temporal.tableDiff(l, r, "id", Seq("s", "v"))
      .collect().map(row => row.getLong(1) -> row.getString(0)).toMap
    assert(statuses == Map(1L -> "match", 2L -> "mismatch",
      3L -> "left_only", 4L -> "right_only"), statuses.toString)
    // NULL keys pair null-safely and classify by PRESENCE, not key-nullness
    val ln = Seq((Some(1L), "a"), (None, "n")).toDF("id", "s")
    val rn = Seq((Some(1L), "a"), (None, "n")).toDF("id", "s")
    val nullStatuses = Temporal.tableDiff(ln, rn, "id", Seq("s"))
      .select("status").collect().map(_.getString(0)).sorted.toSeq
    assert(nullStatuses == Seq("match", "match"), nullStatuses.toString)
    val leftOnlyNull = Temporal.tableDiff(ln, rn.filter(col("id").isNotNull),
      "id", Seq("s")).filter(col("id").isNull).head().getString(0)
    assert(leftOnlyNull == "left_only", leftOnlyNull)
  }

  test("repetitionStats matches hand-computed metrics and NULLs short docs") {
    import spark.implicits._
    val docs = Seq(
      // bigrams: "a b","b a","a b","b a","a b","b c" → top "a b" = 3 of 6;
      // 5-grams: 3 total, all distinct → dup5 = 0
      (1L, "a b a b a b c"),
      // 10 tokens, 6 5-grams, "x y z w v" repeats → 5 distinct → 1 - 5/6
      (2L, "x y z w v x y z w v"),
      // 1 token: no bigrams, no 5-grams → all metrics NULL
      (3L, "lonely"),
      // 4 tokens: bigrams exist, 5-grams don't
      (4L, "p q p q"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.repetitionStats(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(1) == 6L && m(1L).getLong(2) == 3L)
    assert(m(1L).getDouble(3) == 0.5 && m(1L).getDouble(4) == 0.0)
    assert(m(2L).getDouble(4) == 0.166667, m(2L).toString)
    assert(m(3L).isNullAt(2) && m(3L).isNullAt(3) && m(3L).isNullAt(4))
    assert(m(4L).getLong(1) == 3L && m(4L).getLong(2) == 2L
      && m(4L).isNullAt(4), m(4L).toString)
  }

  test("tableChecksum: content-sensitive, order-independent, count-guarded") {
    import spark.implicits._
    val a = Seq((1L, "x", "g"), (2L, "y", "g"), (3L, "z", "h"))
      .toDF("id", "s", "grp")
    val key = "concat_ws('|', CAST(id AS STRING), s)"
    def sums(df: org.apache.spark.sql.DataFrame) =
      Temporal.tableChecksum(df, key, Seq("grp"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    // same content in a different row order → identical checksums
    assert(sums(a) == sums(a.orderBy(col("id").desc)))
    // one changed value flips its group's checksum, leaves the other
    val b = Seq((1L, "x", "g"), (2L, "Y", "g"), (3L, "z", "h"))
      .toDF("id", "s", "grp")
    assert(sums(a)("g")._2 != sums(b)("g")._2)
    assert(sums(a)("h") == sums(b)("h"))
    // XOR caveat: an even duplication cancels the checksum — n_rows is
    // the guard that still catches it
    val dup = Seq((1L, "x", "g"), (2L, "y", "g"), (2L, "y", "g"),
      (2L, "y", "g"), (3L, "z", "h")).toDF("id", "s", "grp")
    assert(sums(dup)("g")._2 == sums(a)("g")._2
      && sums(dup)("g")._1 != sums(a)("g")._1)
  }

  test("gapFill carries the last observation across empty buckets") {
    import spark.implicits._
    // sensor 7: readings in buckets 0 and 3 (gap at 1, 2); bucket 0 has
    // two readings — the LATER one (ts 90, id 2) must be the carried value.
    // sensor 8: single bucket, no grid beyond it.
    val ev = Seq(
      (7L, 10L, 1L, 1.5), (7L, 90L, 2L, 2.5), (7L, 310L, 3L, 9.0),
      (8L, 150L, 4L, 4.0))
      .toDF("sensor", "t", "rid", "v")
    val filled = Temporal.gapFill(ev, keyCol = "sensor", tsCol = "t",
      valCol = "v", idCol = "rid", bucketUs = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), Option(r.get(3)), r.getDouble(4))).toMap
    assert(filled.keySet == Set((7L, 0L), (7L, 1L), (7L, 2L), (7L, 3L),
      (8L, 1L)))
    assert(filled((7L, 0L)) == ((2L, Some(2.5), 2.5))) // later reading wins
    assert(filled((7L, 1L)) == ((0L, None, 2.5)))      // gap: carried
    assert(filled((7L, 2L)) == ((0L, None, 2.5)))
    assert(filled((7L, 3L)) == ((1L, Some(9.0), 9.0)))
    assert(filled((8L, 1L)) == ((1L, Some(4.0), 4.0)))

    // FLOOR bucketing for pre-epoch timestamps: t = -150 lands in bucket
    // -2 (floor), not -1 (truncation), and the grid spans -2..0 with the
    // gap at -1 carried — `div`'s toward-zero truncation would give a
    // double-width bucket 0 and a wrong grid
    val pre = Seq((9L, -150L, 1L, 1.0), (9L, 50L, 2L, 7.0))
      .toDF("sensor", "t", "rid", "v")
    val preFilled = Temporal.gapFill(pre, keyCol = "sensor", tsCol = "t",
      valCol = "v", idCol = "rid", bucketUs = 100L)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getDouble(4))).toMap
    assert(preFilled == Map(-2L -> ((1L, 1.0)), -1L -> ((0L, 1.0)),
      0L -> ((1L, 7.0))), preFilled.toString)

    // NULL-value contract: a NULL observation that is LATEST in its bucket
    // makes the bucket's last_val NULL (the last observation had no
    // value), counts in n_events, and never overwrites the carry — here
    // nothing was carried yet, so filled is NULL too until a real value
    val nv = Seq((10L, 10L, 1L, Some(3.0)), (10L, 20L, 2L, None),
      (10L, 110L, 3L, Some(8.0)))
      .toDF("sensor", "t", "rid", "v")
    val nvRows = Temporal.gapFill(nv, keyCol = "sensor", tsCol = "t",
      valCol = "v", idCol = "rid", bucketUs = 100L)
      .orderBy("bucket").collect()
    assert(nvRows(0).getLong(2) == 2L && nvRows(0).isNullAt(3)
      && nvRows(0).isNullAt(4), nvRows(0).toString)
    assert(nvRows(1).getDouble(4) == 8.0)
  }

  test("gapFillMulti rolls several columns forward independently") {
    import spark.implicits._
    // two readings per row; temperature NULL at t=90 must NOT block
    // humidity's carry, and vice versa — each column's LOCF is its own
    val ev = Seq(
      (7L, 10L, 1L, Some(1.5), Some(40.0)),
      (7L, 90L, 2L, None, Some(55.0)), // temp missing, hum present
      (7L, 310L, 3L, Some(9.0), None)) // temp present, hum missing
      .toDF("sensor", "t", "rid", "temp", "hum")
    val rows = Temporal.gapFillMulti(ev, keyCol = "sensor", tsCol = "t",
      valCols = Seq("temp" -> "temp_filled", "hum" -> "hum_filled"),
      idCol = "rid", bucketUs = 100L)
      .orderBy("bucket").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L))
    def f(r: org.apache.spark.sql.Row, c: String): Option[Double] = {
      val i = r.fieldIndex(c)
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    }
    // bucket 0: latest row (t=90) has temp NULL, hum 55 — temp's bucket
    // last is NULL but its carry falls back to nothing-before (NULL);
    // hum carries 55
    assert(f(rows(0), "last_temp").isEmpty
      && f(rows(0), "temp_filled").isEmpty)
    assert(f(rows(0), "hum_filled").contains(55.0))
    // gap buckets 1-2: both columns carry their own last non-null
    assert(f(rows(1), "temp_filled").isEmpty
      && f(rows(1), "hum_filled").contains(55.0))
    // bucket 3: temp 9.0 observed; hum NULL observed → hum still 55
    assert(f(rows(3), "temp_filled").contains(9.0)
      && f(rows(3), "hum_filled").contains(55.0))
    // single physical window: one sort satisfies every fill column
    val plan = Temporal.gapFillMulti(ev, "sensor", "t",
      Seq("temp" -> "tf", "hum" -> "hf"), "rid", 100L)
      .queryExecution.executedPlan.toString
    assert("(?m)^\\s*\\+?-?\\s*Window ".r.findAllIn(plan).size <= 2,
      plan) // in-bucket rank window + ONE shared fill window
  }

  test("piiRedact masks every class in order and counts on the original") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at a.b+c@mail.example.org or 555-123-4567, " +
        "host 10.0.0.1, acct 123456789"),
      (2L, "two mails x@y.io and z@w.co; ip-ish 999.1.2.3"),
      (3L, "clean text, no pii at all"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(r1.fieldIndex("n_emails")) == 1
      && r1.getLong(r1.fieldIndex("n_phones")) == 1
      && r1.getLong(r1.fieldIndex("n_ipv4s")) == 1
      && r1.getLong(r1.fieldIndex("n_digit_ids")) == 1)
    val red1 = r1.getString(r1.fieldIndex("redacted"))
    assert(red1 == "reach me at <EMAIL> or <PHONE>, host <IP>, acct <ID>",
      red1)
    val r2 = out(2L)
    assert(r2.getLong(r2.fieldIndex("n_emails")) == 2)
    // 999.1.2.3 is NOT an IPv4 address: the octet-range pattern rejects
    // out-of-range quads instead of eating version strings / section
    // numbers (round-9 advice — the masker is now also a validator)
    assert(r2.getLong(r2.fieldIndex("n_ipv4s")) == 0)
    assert(r2.getString(r2.fieldIndex("redacted")).contains("999.1.2.3"))
    val r3 = out(3L)
    assert(r3.getString(r3.fieldIndex("redacted")) ==
      "clean text, no pii at all")
    assert(Seq("n_emails", "n_phones", "n_ipv4s", "n_digit_ids")
      .forall(c => r3.getLong(r3.fieldIndex(c)) == 0))
  }

  test("piiRedact IPv4 octet ranges and class precedence") {
    import spark.implicits._
    val docs = Seq(
      (1L, "edge 255.255.255.255 ok"), // max octets mask
      (2L, "v 999.999.1.1 and 256.1.1.1 and 01.2.3.4"), // all out of range
      (3L, "mid 1234.5.6.7 run"), // \b stops a mid-number ".5.6.7" match
      (4L, "mail user123456789@mail.example.com only"), // digit run INSIDE
      // an email: counts are on the original (where \b\d{9,}\b fails on
      // the letter boundary) and masking order means the run is already
      // inside <EMAIL> — no double-fire, no <ID> fragment
      (5L, "acct 9876543210 plus 10.0.0.1")) // independent classes coexist
      .toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def n(id: Long, c: String) = out(id).getLong(out(id).fieldIndex(c))
    def red(id: Long) = out(id).getString(out(id).fieldIndex("redacted"))
    assert(n(1L, "n_ipv4s") == 1 && red(1L) == "edge <IP> ok")
    assert(n(2L, "n_ipv4s") == 0 && red(2L) ==
      "v 999.999.1.1 and 256.1.1.1 and 01.2.3.4")
    assert(n(3L, "n_ipv4s") == 0 && red(3L) == "mid 1234.5.6.7 run")
    assert(n(4L, "n_emails") == 1 && n(4L, "n_digit_ids") == 0
      && red(4L) == "mail <EMAIL> only")
    assert(n(5L, "n_digit_ids") == 1 && n(5L, "n_ipv4s") == 1
      && red(5L) == "acct <ID> plus <IP>")
  }

  test("domainCap: parses authorities, binds the cap, map-side pruned") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, s"https://h${i % 2}.example.com/page/$i"))
      .toDF("doc_id", "url")
    val kept = TextAnalysis.domainCap(docs, k = 3).collect()
    val byDomain = kept.groupBy(_.getString(kept.head.fieldIndex("domain")))
    assert(byDomain.keySet == Set("h0.example.com", "h1.example.com"))
    // the cap binds exactly: 20 docs per domain → 3 kept each
    assert(byDomain.values.forall(_.length == 3))
    // deterministic: a second run keeps the identical doc ids
    val again = TextAnalysis.domainCap(docs, k = 3).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(again == kept.map(_.getLong(0)).sorted.toSeq)
    // under-cap domains pass through whole
    val tiny = Seq((1L, "https://only.example.org/x"))
      .toDF("doc_id", "url")
    assert(TextAnalysis.domainCap(tiny, k = 5).count() == 1)
    // case variants of one host are ONE domain (RFC 3986) — the cap
    // cannot be evaded by mixed-case URLs
    val cased = (1L to 9L).map(i => (i, i % 3 match {
      case 0 => s"https://Host.Example.com/$i"
      case 1 => s"https://host.example.com/$i"
      case _ => s"HTTPS://HOST.EXAMPLE.COM/$i"
    })).toDF("doc_id", "url")
    val casedKept = TextAnalysis.domainCap(cased, k = 4).collect()
    assert(casedKept.length == 4, casedKept.mkString(";"))
    assert(casedKept.forall(r =>
      r.getString(r.fieldIndex("domain")) == "host.example.com"))
    // unparseable / null URLs pass through UNCAPPED with domain NULL —
    // never silently capped as one garbage stratum
    val junk = Seq((1L, "www.nohost.example/x"), (2L, null),
      (3L, "https://real.example.com/a"), (4L, "ftp//broken"),
      (5L, "relative/path")).toDF("doc_id", "url")
    val junkOut = TextAnalysis.domainCap(junk, k = 1).collect()
    assert(junkOut.length == 5, junkOut.mkString(";"))
    assert(junkOut.count(r => r.isNullAt(r.fieldIndex("domain"))) == 4)
    // a pre-existing domain column is rejected, not clobbered
    val clash = Seq((1L, "https://a.example.com/x", "meta"))
      .toDF("doc_id", "url", "domain")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.domainCap(clash, k = 1)
    }
    assert(e.getMessage.contains("domain"))
    // rank-limit compiles to WindowGroupLimit: map tasks pre-trim to
    // local top-k before the per-domain shuffle (q94's scale property)
    val plan = TextAnalysis.domainCap(docs, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("urlHost strips the evasion vectors: userinfo, port, case, dot") {
    import spark.implicits._
    val cases = Seq(
      "https://user:pw@Host.Example.COM:8443/x" -> "host.example.com",
      "https://x@host.example.com/a" -> "host.example.com",
      "https://host.example.com:443/" -> "host.example.com",
      "https://HOST.EXAMPLE.COM./p" -> "host.example.com",
      "http://[2001:db8::1]:8080/v6" -> "[2001:db8::1]",
      "http://[2001:db8::1]/v6" -> "[2001:db8::1]",
      "https://plain.example.org" -> "plain.example.org",
      "not-a-url" -> null,
      (null: String) -> null)
    val out = cases.map(_._1).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("i", "u")
      .select(col("i"), TextAnalysis.urlHost(col("u")).as("h"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    cases.zipWithIndex.foreach { case ((u, want), i) =>
      assert(out(i.toLong) == want, s"urlHost($u) = ${out(i.toLong)}")
    }
  }

  test("registrableDomain follows PSL semantics over the snapshot") {
    import spark.implicits._
    val cases = Seq(
      // multi-label registry: eTLD+1 under co.uk, not uk
      "a.b.example.co.uk" -> "example.co.uk",
      "example.co.uk" -> "example.co.uk",
      "deep.sub.tree.example.com" -> "example.com",
      // PSL private-section: each subdomain is its own publisher
      "foo.github.io" -> "foo.github.io",
      "a.foo.github.io" -> "foo.github.io",
      "bucket.s3.amazonaws.com" -> "bucket.s3.amazonaws.com",
      // a bare public suffix has NO registrable domain
      "github.io" -> null,
      "co.uk" -> null,
      "com" -> null,
      // unknown TLD: the PSL default `*` rule (last label is suffix)
      "foo.randomtld" -> "foo.randomtld",
      "a.b.foo.randomtld" -> "foo.randomtld",
      // single label: nothing to register under
      "localhost" -> null)
    val out = cases.zipWithIndex
      .map { case ((h, _), i) => (i.toLong, h) }.toDF("i", "h")
      .select(col("i"), TextAnalysis.registrableDomain(col("h")).as("d"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    cases.zipWithIndex.foreach { case ((h, want), i) =>
      assert(out(i.toLong) == want,
        s"registrableDomain($h) = ${out(i.toLong)}, want $want")
    }
  }

  test("domainCap registrable mode: one budget per eTLD+1") {
    import spark.implicits._
    // 12 URL variants of ONE registrable domain (example.co.uk):
    // subdomain, userinfo, port, and case all vary — every raw
    // authority distinct, so host-mode would never bind at k=3
    val docs = (1L to 12L).map { i =>
      val user = if (i % 3 == 0) "u:p@" else ""
      val hostLabel = if (i % 2 == 0) s"S$i" else s"s$i"
      val port = if (i % 4 == 0) ":8443" else ""
      (i, s"https://$user$hostLabel.example.co.uk$port/d/$i")
    }.toDF("doc_id", "url")
    val kept = TextAnalysis.domainCap(docs, k = 3, registrable = true)
      .collect()
    assert(kept.length == 3, kept.mkString(";"))
    assert(kept.forall(r =>
      r.getString(r.fieldIndex("domain")) == "example.co.uk"))
    // host mode on the same rows: 12 distinct hosts → nothing capped
    assert(TextAnalysis.domainCap(docs, k = 3).count() == 12)
    // no-registrable rows (bare suffix, single label) pass UNCAPPED
    val edge = Seq((1L, "https://github.io/x"), (2L, "https://github.io/y"),
      (3L, "https://localhost/z")).toDF("doc_id", "url")
    val eOut = TextAnalysis.domainCap(edge, k = 1, registrable = true)
      .collect()
    assert(eOut.length == 3)
    assert(eOut.forall(_.isNullAt(eOut.head.fieldIndex("domain"))))
  }

  test("q98/q99 plan shapes: redaction is map-only, scoring shuffles once") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, "s", s"w$i a b c"))
      .toDF("doc_id", "source", "text")
    // piiRedact: pure projection — NO exchange anywhere (scan-speed claim)
    val p98 = TextAnalysis.piiRedact(docs)
      .queryExecution.executedPlan.toString
    assert(!p98.contains("Exchange"), p98)
    // unigramLogProb: exactly 3 exchanges — the single vocabulary
    // hash-shuffle (the token stream shuffles ONCE), the 1-row map
    // aggregation, and the broadcast of the map to the scorers; a
    // regression that re-aggregates the vocabulary per branch shows up
    // as 5-6 here
    val p99 = TextAnalysis.unigramLogProb(docs)
      .queryExecution.executedPlan.toString
    val nEx = "(?<!Reused)Exchange".r.findAllIn(p99).length
    assert(nEx == 3, s"expected 3 exchanges, got $nEx:\n$p99")
  }

  test("unigramLogProb: exact millinat sums from the corpus's own model") {
    import spark.implicits._
    // corpus: 4 'a', 2 'b', 2 'c' → total 8; ln(p) quantized to millinats:
    // a: ln(.5)=-0.6931→-694 (floor); b,c: ln(.25)=-1.3863→-1387
    val docs = Seq(
      (1L, "s", "a a b"), (2L, "s", "b c c a a"), (3L, "s", ""))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.unigramLogProb(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    // doc 1: 2 a + 1 b = -694*2 + -1387 = -2775; floor(-2775000/3) = -925000
    assert(got(1L) == ((3L, -2775L, Some(-925000L))), got(1L).toString)
    // doc 2: 2a + 1b + 2c = -1388 - 1387 - 2774 = -5549;
    // floor(-5549000/5) = -1109800
    assert(got(2L) == ((5L, -5549L, Some(-1109800L))), got(2L).toString)
    // zero-token doc: n=0, sum=0, mean NULL
    assert(got(3L) == ((0L, 0L, None)), got(3L).toString)
  }

  test("unigramLogProb: join path bit-equal, auto-selected by vocab size") {
    import spark.implicits._
    val docs = ((1 to 40).map(i =>
      (i.toLong, "s", s"w${i % 7} alpha beta w${i % 5} gamma"))
      :+ ((99L, "s", ""))).toDF("doc_id", "source", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    val bc = rows(TextAnalysis.unigramLogProb(docs,
      scoreViaJoin = Some(false)))
    val jn = rows(TextAnalysis.unigramLogProb(docs,
      scoreViaJoin = Some(true)))
    // bit-equality: integer millinat sums are order-independent, so the
    // broadcast fold and the distributed join MUST agree exactly
    assert(bc == jn, s"broadcast=$bc\njoin=$jn")
    assert(jn(99L) == ((0L, 0L, None))) // empty doc survives the join path
    // auto-select: vocabulary (10 terms) above a threshold of 2 → the
    // join plan (no map_from_entries broadcast fold); under the default
    // 256-term break-even → the broadcast plan. Same rows either way.
    val auto = TextAnalysis.unigramLogProb(docs, broadcastVocabMax = 2)
    assert(!auto.queryExecution.optimizedPlan.toString
      .contains("map_from_entries"))
    assert(rows(auto) == bc)
    val autoBc = TextAnalysis.unigramLogProb(docs)
    assert(autoBc.queryExecution.optimizedPlan.toString
      .contains("map_from_entries"))
  }

  test("fuzzyNamePairs: trigram prefilter + exact edit-distance verify") {
    import spark.implicits._
    val parts = Seq(
      "large bolt", "large bolt", // duplicate rows collapse to vocabulary
      "large bold",               // 1 substitution from "large bolt"
      "large rod",                // bolt→rod = 3 edits, shares "lar/arg/rge/ge "
      "tiny screw")               // unrelated: no shared trigrams
      .toDF("name")
    val pairs = Dedup.fuzzyNamePairs(parts, "name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    // vocabulary-first: the duplicated "large bolt" yields ONE node;
    // ordering is name_a < name_b
    assert(pairs.map(p => (p._1, p._2)) ==
      Set(("large bold", "large bolt"), ("large bold", "large rod"),
        ("large bolt", "large rod")), pairs.toString)
    assert(pairs.forall(_._4 <= 3) && pairs.forall(_._3 >= 2))
    assert(pairs.find(p => p._1 == "large bold" && p._2 == "large bolt")
      .get._4 == 1L)
    // tighter maxDist drops the 3-edit pairs, keeps the 1-edit pair
    val tight = Dedup.fuzzyNamePairs(parts, "name", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(tight == Set(("large bold", "large bolt")), tight.toString)
  }

  test("stratifiedSample: exact k per stratum, deterministic, map-side pruned") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, if (i <= 80) "big" else "small"))
      .toDF("id", "grp")
    val sampled = TextAnalysis.stratifiedSample(docs, k = 7,
      keySql = "CAST(id AS STRING)", strataCols = Seq("grp"))
    // exact caller schema; exactly min(k, |stratum|) rows per stratum
    assert(sampled.columns.toSeq == Seq("id", "grp"))
    val bySize = sampled.collect().groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(bySize("big").size == 7 && bySize("small").size == 7)
    // deterministic: re-running picks the identical membership
    val again = TextAnalysis.stratifiedSample(docs, k = 7,
      keySql = "CAST(id AS STRING)", strataCols = Seq("grp"))
      .collect().groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(bySize == again)
    // a stratum smaller than k returns whole
    val tiny = TextAnalysis.stratifiedSample(docs.filter(col("id") > 95),
      k = 7, keySql = "CAST(id AS STRING)", strataCols = Seq("grp"))
    assert(tiny.count() == 5)
    // the rank-limit filter must compile to WindowGroupLimit: each map
    // task pre-prunes to its local top-k BEFORE the stratum shuffle
    assert(sampled.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"),
      sampled.queryExecution.executedPlan.toString)
  }

  test("mixtureSample is a pure reproducible filter on caller schema") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, if (i % 2 == 0) "s1" else "s2"))
      .toDF("id", "src")
    // per-source rates: s1 keeps ~100%, s2 ~0% — membership by id hash
    val rate = when(col("src") === "s1", 100).otherwise(0)
    val kept = TextAnalysis.mixtureSample(docs, rate,
      "CAST(id AS STRING)").collect()
    // exact caller schema, no working columns
    assert(kept.head.schema.fieldNames.toSeq == Seq("id", "src"))
    assert(kept.forall(_.getString(1) == "s1") && kept.length == 100)
    // deterministic: the same call yields the same membership
    val again = TextAnalysis.mixtureSample(docs, rate,
      "CAST(id AS STRING)").collect()
    assert(kept.map(_.getLong(0)).toSet == again.map(_.getLong(0)).toSet)
    // a fractional rate keeps a strict, stable subset
    val some = TextAnalysis.mixtureSample(docs, lit(50),
      "CAST(id AS STRING)").collect().map(_.getLong(0)).toSet
    assert(some.nonEmpty && some.size < 200)
  }

  test("vocabularyStats computes vocab/hapax/coverage with custom topK") {
    import spark.implicits._
    // s1: tokens a a a b c → vocab {a:3, b:1, c:1}, hapax b,c;
    // top-1 coverage = 3/5. s2: one doc, all-distinct tokens.
    val docs = Seq(
      ("s1", "a a a b"), ("s1", "c"),
      ("s2", "x y z"))
      .toDF("src", "body")
    val m = TextAnalysis.vocabularyStats(docs, groupCol = "src",
      textCol = "body", topK = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("s1").getLong(1) == 3L && m("s1").getLong(2) == 5L)
    assert(m("s1").getLong(3) == 2L)
    assert(m("s1").getDouble(4) == 0.666667) // 2 hapax of 3 terms
    assert(m("s1").getDouble(5) == 0.6)      // top-1 term a = 3/5 tokens
    assert(m("s2").getLong(1) == 3L && m("s2").getLong(3) == 3L)
    assert(m("s2").getDouble(4) == 1.0)
    // deterministic tiebreak: all counts 1 → top-1 is lexicographic 'x'
    assert(m("s2").getDouble(5) == 0.333333)
  }

  test("quantizationStats: exact on grid points, bounded error, constant-dim guard") {
    import spark.implicits._
    // dim 0 spans [0, 2] (x = 1.0 lands exactly on code 0); dim 1 is
    // CONSTANT (the mx = mn guard: code 0, exact reconstruction); dim 2
    // holds an off-grid value whose error must be positive but ≤ the
    // half-step bound (step/2)² = ((mx-mn)/254/2)²
    val vecs = Seq(
      (1L, Array(0.0f, 5.0f, 0.0f)),
      (2L, Array(1.0f, 5.0f, 0.3f)),
      (3L, Array(2.0f, 5.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val m = Similarity.quantizationStats(vecs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m.keySet == Set(0L, 1L, 2L))
    assert(m(0L).getLong(1) == 3L)
    // grid points (min, exact midpoint, max) reconstruct exactly
    assert(m(0L).getLong(4) == 0L, s"dim0 sse: ${m(0L)}")
    // constant dim: zero error, lo == hi
    assert(m(1L).getLong(4) == 0L && m(1L).getDouble(2) == 5.0
      && m(1L).getDouble(3) == 5.0)
    // off-grid 0.3 over [0, 1]: positive error within the half-step bound
    val halfStepSe = math.pow(1.0 / 254 / 2, 2) * 1e12
    assert(m(2L).getLong(4) > 0L, s"dim2 sse: ${m(2L)}")
    assert(m(2L).getLong(5) <= math.ceil(halfStepSe).toLong + 1,
      s"dim2 max_se ${m(2L).getLong(5)} exceeds half-step bound $halfStepSe")
  }

  test("q87/q88 plan shapes: repetition is shuffle-free, vocabulary shuffles twice") {
    import spark.implicits._
    val docs = Seq(("s1", 1L, "a b c d e f g"), ("s2", 2L, "h i j k l m n"))
      .toDF("source", "doc_id", "text")
    // per-row folds only → the whole operator is one map-side pass
    val rep = TextAnalysis.repetitionStats(docs)
    assert(!rep.queryExecution.executedPlan.toString.contains("Exchange"),
      rep.queryExecution.executedPlan.toString)
    // explode → (source, term) partial+final agg [exchange 1] → per-source
    // rank window [exchange 2] → final per-source agg REUSES the window's
    // hash partitioning on source — two exchanges total, no third
    val vocab = TextAnalysis.vocabularyStats(docs)
    val nEx = "(?<!Reused)Exchange".r
      .findAllIn(vocab.queryExecution.executedPlan.toString).length
    assert(nEx == 2, s"expected 2 exchanges:\n" +
      vocab.queryExecution.executedPlan.toString)
  }

  test("tokenPackingViaScan equals the window form on a single stream") {
    import spark.implicits._
    // 60 docs, ~5 tokens each, budget 16 → bins split mid-stream many
    // times; repartition so the scan's buckets genuinely span partitions
    val docs = (1L to 60L)
      .map(i => (i, "src", s"w$i " * (1 + (i % 5).toInt)))
      .toDF("doc_id", "source", "text").repartition(5)
    def collectManifest(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val viaWindow = collectManifest(
      TextAnalysis.tokenPacking(docs, budget = 16L))
    val viaScan = collectManifest(
      TextAnalysis.tokenPackingViaScan(docs, budget = 16L))
    assert(viaScan == viaWindow, s"scan=$viaScan\nwin=$viaWindow")
    assert(viaWindow.size > 3) // the budget genuinely split the stream
    // grouped scan: multi-source input packs EVERY source independently
    // in one pass — each source's bins match the per-source window form
    // exactly (carry-ins chain within a source, never across sources)
    val multi = (1L to 40L)
      .map(i => (i, if (i % 2 == 0) "a" else "b", s"w$i " * (1 + (i % 4).toInt)))
      .toDF("doc_id", "source", "text").repartition(5)
    val multiWin = collectManifest(
      TextAnalysis.tokenPacking(multi, budget = 16L))
    val multiScan = collectManifest(
      TextAnalysis.tokenPackingViaScan(multi, budget = 16L))
    assert(multiScan == multiWin, s"scan=$multiScan\nwin=$multiWin")
    assert(multiWin.keySet.map(_._1) == Set("a", "b"))
    assert(multiWin.size > 4) // both sources genuinely split into bins
  }

  test("tokenPacking with a tiny budget splits groups at token boundaries") {
    val packed = TextAnalysis.tokenPacking(corpus, budget = 10L,
      groupCol = "src", orderCol = "id", textCol = "body")
      .orderBy("src", "bin").collect()
    // s1: 12 tokens over 2 docs → doc 10 in bin 0 (prev=0), doc 11 in
    // bin 0 (prev=6 < 10) → one bin; s2: docs at prev 0, 7, 13 → bins 0,0,1
    val bySrc = packed.groupBy(_.getString(0))
    assert(bySrc("s1").map(_.getLong(1)).toSeq == Seq(0L))
    assert(bySrc("s2").map(_.getLong(1)).toSeq == Seq(0L, 1L))
    // token mass is conserved across bins
    val total = packed.map(_.getLong(3)).sum
    assert(total == 6 + 6 + 7 + 6 + 6, s"rows: ${packed.mkString(";")}")
  }

  test("duplicatedSpans: doc-start/end spans, overlap+touch merge, short docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),            // "a b c" repeats in doc 2 → span AT DOC START
      (2L, "x x a b c y z a b c"),    // two hits, second span ends AT DOC END
      (3L, "p q r s p q r s"),        // self-repeat: windows overlap AND touch
      (4L, "hi yo"),                  // shorter than k → no grams at all
      (5L, "m n o")).toDF("id", "body")
    val spans = Dedup.duplicatedSpans(docs, textCol = "body", k = 3,
        idCol = "id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc 3: covered windows [0,3),[1,4),[4,7),[5,8) — [1,4) overlaps,
    // [4,7) TOUCHES the running end 4 — all merge into one span [0,8)
    assert(spans == Set((1L, 0, 3), (2L, 2, 5), (2L, 7, 10), (3L, 0, 8)),
      spans.toString)
  }

  test("stripDuplicatedSpans removes exactly the covered tokens, '' when all") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x x a b c y z a b c"),
      (3L, "p q r s p q r s"),
      (4L, "hi yo"),
      (5L, "m n o")).toDF("id", "body")
    val strip = Dedup.stripDuplicatedSpans(docs, textCol = "body", k = 3,
        idCol = "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(strip == Map(
      1L -> "d e f",       // span stripped from the front
      2L -> "x x y z",     // both spans stripped, middle + tail
      3L -> "",            // entirely duplicated → empty survivor
      4L -> "hi yo",       // sub-k doc passes through verbatim
      5L -> "m n o"), strip.toString)
  }

  test("skyline: custom columns, tie multiplicity, non-default buckets") {
    import spark.implicits._
    // maximize score, minimize cost. (5,3) dominates (4,4) and (5,4);
    // (3,1) and (5,3) are incomparable; (4,1) dominates (3,1).
    val rows = Seq(
      ("a", 5L, 3L), ("b", 4L, 4L), ("c", 5L, 4L),
      ("d", 3L, 1L), ("e", 4L, 1L), ("f", 4L, 1L), // tie pair: both survive
      ("g", 2L, 2L)).toDF("id", "score", "cost")
    val got = Relational.skyline(rows, maxCol = "score", minCol = "cost",
        buckets = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map((5L, 3L) -> 1L, (4L, 1L) -> 2L), got.toString)
  }

  test("skyline: single point and fully-dominated chain degenerate cases") {
    import spark.implicits._
    val chain = Seq((1L, 5L), (2L, 4L), (3L, 3L)).toDF("v", "c")
    // (3,3) dominates the rest
    val got = Relational.skyline(chain, "v", "c", buckets = 2).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((3L, 3L)))
    val one = Seq((7L, 7L)).toDF("v", "c")
    assert(Relational.skyline(one, "v", "c").count() == 1L)
  }

  test("basketPairs: custom columns, support floor binds, lift exact") {
    import spark.implicits._
    val b = Seq(
      (1L, "x"), (1L, "y"), (1L, "y"), // dup within basket collapses
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "y")).toDF("bid", "sku")
    val all = Relational.basketPairs(b, basketCol = "bid", itemCol = "sku",
        minSupportPerMille = 0)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // x in 3 baskets, y in 3, z in 1, 4 baskets total
    assert(all(("x", "y")) == (2L, 3L, 3L, 2L * 4L * 1000L / 9L))
    assert(all(("x", "z")) == (1L, 3L, 1L, 1L * 4L * 1000L / 3L))
    assert(!all.contains(("y", "z")))
    // a 600-per-mille floor keeps only pairs in >= 60% of baskets: none
    // (x,y is in 2/4 = 50%)
    val floored = Relational.basketPairs(b, "bid", "sku",
      minSupportPerMille = 600)
    assert(floored.count() == 0L)
  }

  test("transitionMatrix: custom columns, per-mille mass, order pinning") {
    import spark.implicits._
    val moves = Seq(
      ("m1", 1L, "A"), ("m1", 2L, "B"), ("m1", 3L, "A"),
      ("m2", 1L, "A"), ("m2", 2L, "A"),
      ("m3", 5L, "B")).toDF("machine", "seq", "st")
    val got = Behavior.transitionMatrix(moves, keyCol = "machine",
        stateCol = "st", orderCols = Seq("seq"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // transitions: m1: A->B, B->A; m2: A->A; m3 has none
    assert(got == Map(
      ("A", "B") -> (1L, 2L, 500L),
      ("A", "A") -> (1L, 2L, 500L),
      ("B", "A") -> (1L, 1L, 1000L)), got.toString)
    // null states drop up front and the sequence splices: A, NULL, B
    // yields exactly A->B (null never appears in the matrix), and a
    // caller column named prev_state does not collide with the
    // internal lag column
    val withNull = Seq(
      ("k", 1L, Some("A"), "shadow"), ("k", 2L, None, "shadow"),
      ("k", 3L, Some("B"), "shadow"))
      .toDF("machine", "seq", "st", "prev_state")
    val g2 = Behavior.transitionMatrix(withNull, "machine", "st", Seq("seq"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(g2 == Map(("A", "B") -> 1L), g2.toString)
  }

  test("slidingDistinct: custom span, complete windows only, dedup") {
    import spark.implicits._
    val visits = Seq(
      ("u1", 10L), ("u1", 10L), ("u1", 12L),
      ("u2", 11L), ("u3", 13L)).toDF("visitor", "day")
    val got = Behavior.slidingDistinct(visits, entityCol = "visitor",
        bucketCol = "day", span = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // complete 3-day windows end at 12 and 13
    // [10..12]: u1, u2 → 2; [11..13]: u1, u2, u3 → 3
    assert(got == Map(12L -> 2L, 13L -> 3L), got.toString)
  }

  test("tableProfile: nulls counted, dtype-aware rendering, sketch mode") {
    import spark.implicits._
    val t = Seq(
      (1L, Some(1.255), Some("b")),
      (2L, None, Some("a")),
      (3L, Some(2.5), None),
      (3L, Some(2.5), Some("a"))).toDF("k", "v", "s")
    val got = Stats.tableProfile(t, doubleScale = 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(got("k") == (0L, 3L, "1", "3"))
    // doubleScale=1 renders through DECIMAL(18,1)
    assert(got("v") == (1L, 2L, "1.3", "2.5"))
    assert(got("s") == (1L, 2L, "a", "b"))
    // sketch mode still profiles (exact distincts replaced by HLL)
    val approx = Stats.tableProfile(t, exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(approx.keySet == Set("k", "v", "s"))
    assert(approx.values.forall(_ >= 2L))
  }
}
