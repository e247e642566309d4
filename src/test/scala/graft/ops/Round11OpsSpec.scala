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

  test("q130 table profile matches a direct in-memory replay") {
    val rows = graft.Tables.load(spark, sf, "orders").collect()
    val got = graft.SparkEntry.queries("q130_table_profile")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    assert(got.keySet == Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
    val keys = rows.map(_.getLong(0))
    assert(got("o_orderkey") ==
      (0L, keys.distinct.length.toLong, keys.min.toString, keys.max.toString))
    val stats = rows.map(_.getString(2))
    assert(got("o_orderstatus") ==
      (0L, stats.distinct.length.toLong, stats.min, stats.max))
    val prices = rows.map(_.getDouble(3))
    assert(got("o_totalprice")._2 == prices.distinct.length.toLong)
    assert(got("o_totalprice")._3 ==
      BigDecimal(prices.min).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .toString)
    // profile is null-free on this generator: every column reports 0 nulls
    assert(got.values.forall(_._1 == 0L))
  }

  test("q132 logit-space accept counts match a direct in-memory replay") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String) = "[a-z]+".r.findAllIn(t).toVector
    val expect = docs.flatMap { case (_, lang, text) =>
      val ts = toks(text)
      if (ts.isEmpty) None else {
        val n = ts.size.toDouble
        val fStop = math.floor(
          1000.0 * ts.count(t => t == "a" || t == "the") / n).toLong
        val fDist = math.floor(1000.0 * ts.distinct.size / n).toLong
        val fLen = math.floor(1000.0 * ts.map(_.length).sum / n).toLong
        val z = -345000L + 6000L * ts.size - 500L * fStop + 600L * fDist -
          50L * fLen
        Some((lang, z >= 0L, z))
      }
    }.groupBy(t => (t._1, t._2)).map { case (k, xs) =>
      k -> (xs.length.toLong, xs.map(_._3).min, xs.map(_._3).max)
    }
    val got = graft.SparkEntry.queries("q132_quality_logreg")(spark, sf)
      .collect().map(r => (r.getString(0), r.getBoolean(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (k, e) => assert(got(k) == e, s"group $k") }
    // the model discriminates: both outcomes occur
    assert(expect.keys.exists(_._2) && expect.keys.exists(!_._2))
  }

  test("q133 inverted index matches a direct in-memory replay") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val td = docs.flatMap { case (id, text) =>
      "[a-z]+".r.findAllIn(text).toSeq.groupBy(identity)
        .map { case (t, xs) => (t, id, xs.size.toLong) }
    }
    val byTerm = td.groupBy(_._1)
    val nDocs = docs.length
    val expect = byTerm.collect {
      case (term, xs) if xs.size * 20 >= nDocs =>
        term -> (xs.size.toLong, xs.map(_._3).sum,
          xs.map(_._2).sorted.take(10).mkString(","))
    }
    val got = graft.SparkEntry.queries("q133_inverted_index")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (t, e) => assert(got(t) == e, s"term $t") }
    assert(expect.nonEmpty)
  }

  test("q134 triangle counts match a direct in-memory replay") {
    val raw = Graph.tradeEdges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val maxW = raw.map(_._3).max
    val und = raw.filter(t => t._1 != t._2 && t._3 * 3 >= maxW)
      .map(t => if (t._1 < t._2) (t._1, t._2) else (t._2, t._1)).toSet
    val nodes = und.flatMap(e => Set(e._1, e._2))
    val nbrs = nodes.map(n =>
      n -> und.collect { case (a, b) if a == n => b
                         case (a, b) if b == n => a }).toMap
    val expect = nodes.map { n =>
      val nb = nbrs(n).toSeq
      val t = (for {
        i <- nb.indices; j <- (i + 1) until nb.length
        if und.contains(if (nb(i) < nb(j)) (nb(i), nb(j)) else (nb(j), nb(i)))
      } yield 1).size
      n -> (nb.length.toLong, t.toLong)
    }.toMap
    val got = graft.SparkEntry.queries("q134_triangles")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (n, (d, t)) =>
      assert(got(n)._1 == d, s"degree of $n")
      assert(got(n)._2 == t, s"triangles of $n")
      val cc = if (d < 2) 0.0 else 2.0 * t / (d * (d - 1.0))
      assert(math.abs(got(n)._3 - cc) < 1e-6, s"clustering of $n")
    }
    // topology is non-trivial: some node is not fully clustered
    assert(got.values.exists(v => v._3 > 0.0 && v._3 < 1.0))
  }

  test("q135 merged partial aggregates equal a full in-memory recompute") {
    val rows = graft.Tables.load(spark, sf, "orders")
      .selectExpr("o_orderpriority",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)",
        "CAST(o_orderdate AS DATE)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDate(2)))
    val expect = rows.groupBy(_._1).map { case (p, xs) =>
      p -> (xs.length.toLong, xs.map(_._2).sum / 100.0)
    }
    val got = graft.SparkEntry.queries("q135_agg_maintenance")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (p, (n, t)) =>
      assert(got(p)._1 == n, s"count for $p")
      assert(math.abs(got(p)._2 - t) < 1e-6, s"total for $p")
    }
    // the merge is real: both the base and the delta side are non-empty
    val cutoff = rows.map(_._3.toLocalDate).max.minusDays(30)
    assert(rows.exists(_._3.toLocalDate.isBefore(cutoff)))
    assert(rows.exists(r => !r._3.toLocalDate.isBefore(cutoff)))
  }

  test("q137 skyline matches a brute-force dominance replay") {
    val pairs = graft.Tables.load(spark, sf, "orders")
      .selectExpr("o_totalprice", "CAST(o_orderdate AS DATE)")
      .collect().map(r => (r.getDouble(0), r.getDate(1).toLocalDate))
      .groupBy(identity).map { case (k, xs) => (k._1, k._2, xs.size.toLong) }
      .toSeq
    def dominates(y: (Double, java.time.LocalDate),
        x: (Double, java.time.LocalDate)): Boolean =
      y._1 >= x._1 && !y._2.isAfter(x._2) &&
        (y._1 > x._1 || y._2.isBefore(x._2))
    val expect = pairs.filter { p =>
      !pairs.exists(q => (q._1, q._2) != (p._1, p._2) &&
        dominates((q._1, q._2), (p._1, p._2)))
    }.map(p => (p._1, p._2.toString) -> p._3).toMap
    val got = graft.SparkEntry.queries("q137_skyline")(spark, sf)
      .collect()
      .map(r => (r.getDouble(0), r.getDate(1).toString) -> r.getLong(2))
      .toMap
    assert(got == expect)
    assert(got.nonEmpty && got.size < pairs.size) // a real frontier
  }

  test("q136 z-order blocks are tight quads matching an in-memory replay") {
    val rows = graft.Tables.load(spark, sf, "orders")
      .selectExpr("o_custkey",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (cmin, cmax) = (rows.map(_._1).min, rows.map(_._1).max)
    val (dmin, dmax) = (rows.map(_._2).min, rows.map(_._2).max)
    def interleave(bx: Long, by: Long): Long =
      (bx & 1) | ((by & 1) << 1) | ((bx & 2) << 1) | ((by & 2) << 2) |
        ((bx & 4) << 2) | ((by & 4) << 3) | ((bx & 8) << 3) | ((by & 8) << 4)
    val expect = rows.map { case (c, d) =>
      val bx = (c - cmin) * 16 / (cmax - cmin + 1)
      val by = (d - dmin) * 16 / (dmax - dmin + 1)
      (interleave(bx, by) / 16, bx, by)
    }.groupBy(_._1).map { case (zb, xs) =>
      zb -> (xs.length.toLong, xs.map(_._2).min, xs.map(_._2).max,
        xs.map(_._3).min, xs.map(_._3).max)
    }
    val got = graft.SparkEntry.queries("q136_zorder_layout")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (zb, (n, bxn, bxx, byn, byx)) =>
      val g = got(zb)
      assert((g._1, g._2, g._3, g._4, g._5) == (n, bxn, bxx, byn, byx),
        s"zblock $zb")
      // the Morton property: an upper-4-bit block is a 4×4 quad, so its
      // envelope never exceeds 16 of the 256 grid cells
      assert(g._6 <= 16L, s"zblock $zb envelope")
    }
  }

  test("q138 Markov transitions match a direct in-memory replay") {
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_type", "event_id", "ts div 1000")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ordered = xs.sortBy(e => (e._4, e._3)).map(_._2)
      ordered.zip(ordered.drop(1))
    }
    val counts = trans.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val outTot = counts.groupBy(_._1._1)
      .map { case (p, m) => p -> m.values.sum }
    val got = graft.SparkEntry.queries("q138_markov_transitions")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == counts.keySet)
    counts.foreach { case (k, n) =>
      assert(got(k) == (n, outTot(k._1), n * 1000 / outTot(k._1)), s"$k")
    }
    // per-prev probabilities sum to ~1000 (floor-div slack < |types|)
    got.toSeq.groupBy(_._1._1).foreach { case (p, xs) =>
      val s = xs.map(_._2._3).sum
      assert(s > 1000 - xs.size && s <= 1000, s"prob mass for $p: $s")
    }
  }

  test("q139 basket pair lift matches a direct in-memory replay") {
    val li = graft.Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brand = graft.Tables.load(spark, sf, "part")
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ob = li.map { case (o, p) => (o, brand(p)) }.distinct
    val nB = ob.map(_._1).distinct.length.toLong
    val marg = ob.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val expect = ob.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val bs = xs.map(_._2).sorted
      for (i <- bs.indices; j <- (i + 1) until bs.length)
        yield (bs(i), bs(j))
    }.groupBy(identity).collect {
      case (k, v) if v.size * 50 >= nB =>
        k -> (v.size.toLong, marg(k._1), marg(k._2),
          v.size * nB * 1000 / (marg(k._1) * marg(k._2)))
    }.toMap
    val got = graft.SparkEntry.queries("q139_basket_pairs")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q140 chi-square contributions match an in-memory replay") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toLong
    val rt = docs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val ct = docs.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val o = docs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val expect = (for (l <- rt.keys; s <- ct.keys) yield {
      val obs = o.getOrElse((l, s), 0L)
      val d = BigInt(obs * n - rt(l) * ct(s))
      val m = BigInt(n * rt(l) * ct(s))
      ((l, s), (obs, rt(l) * ct(s) * 1000 / n, (d * d * 1000000 / m).toLong))
    }).toMap
    val got = graft.SparkEntry.queries("q140_chi2_independence")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expect)
    // grid covers zero cells too: |langs| × |sources| rows
    assert(got.size == rt.size * ct.size)
  }

  test("q141 time-weighted averages match a direct in-memory replay") {
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_type", "event_id", "ts div 1000",
        "CAST(floor(value * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val ivs = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val o = xs.sortBy(e => (e._4, e._3))
      o.zip(o.drop(1)).map { case (a, b) =>
        (a._2, a._5, (b._4 - a._4) / 1000) }
    }
    val expect = ivs.groupBy(_._1).map { case (t, xs) =>
      val dt = xs.map(_._3).sum
      val vdt = xs.map(x => x._2 * x._3).sum
      t -> (xs.length.toLong, dt, vdt, vdt / dt)
    }
    val got = graft.SparkEntry.queries("q141_time_weighted")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expect)
    assert(got.values.forall(v => v._2 > 0))
  }

  test("q142 top event paths match a direct in-memory replay") {
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_type", "event_id", "ts div 1000")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val o = xs.sortBy(e => (e._4, e._3)).map(_._2)
      o.sliding(3).filter(_.size == 3).map(_.mkString(">"))
    }
    val expect = paths.groupBy(identity)
      .map { case (p, v) => (p, v.size.toLong) }.toSeq
      .sortBy { case (p, n) => (-n, p) }.take(10)
    val got = graft.SparkEntry.queries("q142_event_paths")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("q143 stream-built transition matrix matches the batch entry") {
    val got = graft.SparkEntry.queries("q143_stream_transitions")(spark, sf)
      .collect()
    val batch = graft.SparkEntry.queries("q138_markov_transitions")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got.nonEmpty && got.length == batch.size)
    got.foreach { r =>
      assert(r.getBoolean(3), s"gate bit for ${(r.getString(0), r.getString(1))}")
      assert(batch((r.getString(0), r.getString(1))) == r.getLong(2))
    }
  }

  test("q144 sliding distinct actives match a direct in-memory replay") {
    val ud = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "(ts div 1000) div 86400000000")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val d0 = ud.map(_._2).min
    val d1 = ud.map(_._2).max
    val expect = (d0 + 6 to d1).map { we =>
      we -> ud.filter(p => p._2 >= we - 6 && p._2 <= we)
        .map(_._1).distinct.length.toLong
    }.toMap
    val got = graft.SparkEntry.queries("q144_sliding_distinct")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // windows overlap: adjacent counts differ by less than a full window
    assert(got.size >= 2)
  }

  test("q145 typed EWMA fold matches a direct in-memory replay") {
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "ts div 1000", "event_id",
        "CAST(floor(value * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val expect = ev.groupBy(_._1).map { case (u, xs) =>
      val o = xs.sortBy(e => (e._2, e._3)).map(_._4)
      var s = o.head; var anom = 0L
      o.drop(1).foreach { v =>
        if (math.abs(v - s) > 5000L) anom += 1
        s = (7 * s + 3 * v) / 10
      }
      u -> (o.length.toLong, s, anom)
    }
    val got = graft.SparkEntry.queries("q145_typed_ewma")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
    // the anomaly gate fires somewhere (non-degenerate corpus)
    assert(expect.values.map(_._3).sum > 0)
  }

  test("q146 perceptual-hash duplicate groups match an in-memory replay") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.length >= 64)
    def phash(t: String): String = {
      val stride = (t.length - 1) / 63
      val samples = (0 to 63).map(j => t.charAt(j * stride).toLong)
      val total = samples.sum
      samples.map(x => if (x * 64 > total) '1' else '0').mkString
    }
    val expect = docs.map { case (id, t) => (phash(t), id) }
      .groupBy(_._1).collect { case (h, xs) if xs.length >= 2 =>
        h -> (xs.length.toLong, xs.map(_._2).min, xs.map(_._2).max)
      }.toMap
    val got = graft.SparkEntry.queries("q146_image_phash")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
    // exact-duplicate payloads exist in the corpus, so groups exist
    assert(got.nonEmpty)
    assert(got.keys.forall(h => h.length == 64 && h.forall("01".contains(_))))
  }

  test("q147 padding audit matches an in-memory replay; sorting wins") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "source",
        "CAST(size(regexp_extract_all(text, '[a-z]+', 0)) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def stats(ordered: Seq[Long]): (Long, Long, Long) = {
      val batches = ordered.grouped(8).toSeq
      val real = ordered.sum
      val slots = batches.map(b => b.max * b.length).sum
      (batches.length.toLong, real, slots)
    }
    val expect = docs.groupBy(_._2).flatMap { case (src, xs) =>
      val fifo = stats(xs.sortBy(_._1).map(_._3))
      val srt = stats(xs.sortBy(d => (d._3, d._1)).map(_._3))
      Seq((src, "fifo") -> fifo, (src, "sorted") -> srt)
    }
    val got = graft.SparkEntry.queries("q147_padding_audit")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (k, (nb, real, slots)) =>
      assert(got(k) == (nb, real, slots, slots - real,
        (slots - real) * 1000 / slots), s"group $k")
    }
    // length-sorting never pads more than arrival order, and wins overall
    val bySrc = got.keys.map(_._1).toSet
    bySrc.foreach { s =>
      assert(got((s, "sorted"))._4 <= got((s, "fifo"))._4, s"source $s")
    }
    assert(bySrc.map(s => got((s, "fifo"))._4 - got((s, "sorted"))._4).sum > 0)
  }

  test("q148 negative mining is label-disjoint, deterministic, and ranked") {
    val got = graft.SparkEntry.queries("q148_negative_mining")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    // every negative has a different label from its anchor
    assert(got.forall { case (_, al, _, _, nl) => al != nl })
    // exactly 5 ranked negatives per anchor, ranks 1..5
    val byAnchor = got.groupBy(_._1)
    assert(byAnchor.forall(_._2.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L)))
    // negatives are distinct within an anchor
    assert(byAnchor.forall { case (_, xs) =>
      xs.map(_._4).distinct.length == xs.length })
    // deterministic: a second run returns the identical pair set
    val again = graft.SparkEntry.queries("q148_negative_mining")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(again == got.map(t => (t._1, t._3, t._4)).toSet)
  }

  test("q131 group-wise OLS matches a direct in-memory replay") {
    val rows = graft.Tables.load(spark, sf, "orders")
      .selectExpr("o_orderpriority",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).map { case (p, xs) =>
      val n = xs.length.toDouble
      val sx = xs.map(_._2).sum.toDouble
      val sxx = xs.map(t => t._2 * t._2).sum.toDouble
      val sy = xs.map(_._3).sum.toDouble
      val sxy = xs.map(t => t._2 * t._3).sum.toDouble
      val syy = xs.map(t => BigInt(t._3) * BigInt(t._3)).sum.toDouble
      val numer = n * sxy - sx * sy
      val denx = n * sxx - sx * sx
      val slope = numer / denx / 100.0
      p -> (xs.length.toLong, slope, (sy / 100.0 - slope * sx) / n,
        numer * numer / (denx * (n * syy - sy * sy)))
    }
    val got = graft.SparkEntry.queries("q131_groupwise_ols")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (p, (n, slope, icpt, r2)) =>
      val g = got(p)
      assert(g._1 == n, s"n for $p")
      assert(math.abs(g._2 - slope) < 1e-5, s"slope for $p")
      assert(math.abs(g._3 - icpt) < 1e-3, s"intercept for $p")
      assert(math.abs(g._4 - r2) < 1e-5, s"r2 for $p")
      assert(g._4 >= 0.0 && g._4 <= 1.0, s"r2 range for $p")
    }
  }
}
