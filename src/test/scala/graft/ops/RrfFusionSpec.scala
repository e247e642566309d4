package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins [[Similarity.rrfFuse]] and [[Similarity.jaccardTopK]] (q221). */
class RrfFusionSpec extends SparkTestBase {

  import spark.implicits._

  test("rrfFuse: hand-computed micro scores on a two-leg fixture") {
    // k=60: rank 1 → 10^6 div 61 = 16393, rank 2 → 10^6 div 62 = 16129
    val leg1 = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("qid", "cid", "rn")
    val leg2 = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("qid", "cid", "rn")
    val got = Similarity.rrfFuse(Seq(leg1, leg2))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSeq.sortBy(_._4)
    assert(got === Seq(
      (11L, 16393L + 16129L, 2L, 1), // ranked by both legs: wins
      (10L, 16393L, 1L, 2),
      (12L, 16129L, 1L, 3)))
  }

  test("rrfFuse of one leg preserves the leg's ranking") {
    val leg = Seq((7L, 1L, 1), (7L, 2L, 2), (7L, 3L, 3))
      .toDF("qid", "cid", "rn")
    val got = Similarity.rrfFuse(Seq(leg))
      .orderBy("rn").collect().map(_.getLong(1)).toSeq
    assert(got === Seq(1L, 2L, 3L))
  }

  test("rrfFuse ties break on cid ascending") {
    // same rank in one leg each → identical scores → cid order
    val leg1 = Seq((1L, 20L, 1)).toDF("qid", "cid", "rn")
    val leg2 = Seq((1L, 10L, 1)).toDF("qid", "cid", "rn")
    val got = Similarity.rrfFuse(Seq(leg1, leg2))
      .orderBy("rn").collect().map(_.getLong(1)).toSeq
    assert(got === Seq(10L, 20L))
  }

  test("rankAgreement: hand-computed tau on crafted rankings") {
    // shared items A(1,1) B(2,3) C(3,2); pairs: AB conc, AC conc,
    // BC disc → C=2 D=1, tau = 1000*(2-1)//3 = 333
    val legA = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4))
      .toDF("qid", "cid", "rn")
    val legB = Seq((1L, 10L, 1), (1L, 12L, 2), (1L, 11L, 3), (1L, 99L, 4))
      .toDF("qid", "cid", "rn")
    val r = Similarity.rankAgreement(legA, legB).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 3L, "n_shared")
    assert(r(0).getLong(2) === 2L, "concordant")
    assert(r(0).getLong(3) === 1L, "discordant")
    assert(r(0).getLong(4) === 333L, "tau_milli")
  }

  test("rankAgreement: identical legs give tau = 1000, disjoint give NULL") {
    val leg = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("qid", "cid", "rn")
    val same = Similarity.rankAgreement(leg, leg).collect()(0)
    assert(same.getLong(4) === 1000L)
    val other = Seq((1L, 20L, 1), (1L, 21L, 2)).toDF("qid", "cid", "rn")
    val dis = Similarity.rankAgreement(leg, other).collect()(0)
    assert(dis.getLong(1) === 0L, "n_shared")
    assert(dis.isNullAt(4), "tau undefined on empty shared set")
  }

  test("jaccardTopK matches a brute-force twin on the real corpus") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), array_distinct(
        expr("regexp_extract_all(text, '[a-z]+', 0)")).as("tk"))
    val qs = d.filter(col("doc_id") < 5)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet))
      .filter(_._2.nonEmpty)
    val cs = d.filter(col("doc_id") >= 5)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet))
      .filter(_._2.nonEmpty)
    val expected = qs.flatMap { case (qid, qtk) =>
      cs.map { case (cid, ctk) =>
        val ov = (qtk & ctk).size.toLong
        (qid, cid, (1000L * ov) / (qtk.size.toLong + ctk.size - ov))
      }.sortBy { case (_, cid, jm) => (-jm, cid) }.take(10)
        .zipWithIndex.map { case ((q, c, jm), i) => (q, c, jm, i + 1) }
    }.toSet
    val got = Similarity.jaccardTopK(
        d.filter(col("doc_id") >= 5)
          .select(col("doc_id").as("cid"), col("tk").as("ctk")),
        d.filter(col("doc_id") < 5)
          .select(col("doc_id").as("qid"), col("tk").as("qtk")))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "fixture must exercise the leg")
  }
}
