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
