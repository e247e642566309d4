package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Round-16 pins: notInAntiJoin's three-valued NOT IN semantics (the
  * truth table Catalyst's null-aware anti join encodes in its broadcast
  * build) and its plan shape (no whole-relation broadcast, no NAAJ/BNLJ
  * node — the property that lets it survive 100 TB).
  */
class Round16OpsSpec extends SparkTestBase {

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
}
