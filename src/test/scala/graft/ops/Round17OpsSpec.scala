package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions.{col, count, least, greatest, lit}

/** Round-17 pins: degree-ordered triangle orientation — the answer is
  * unchanged (vs brute-force triple enumeration) while the wedge join's
  * fan-out is bounded on skewed graphs (star fixture: 0 oriented wedges
  * where the id-canonical join materializes ~n²/4).
  */
class Round17OpsSpec extends SparkTestBase {

  import spark.implicits._

  private def undOf(edges: Seq[(String, String)]) =
    edges.toDF("x", "y")
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("u"),
        greatest(col("x"), col("y")).as("v"))
      .distinct()

  test("triangleStats matches hand-computed counts and clustering on " +
      "the two-triangle diamond") {
    val und = undOf(Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"),
      ("c", "d")))
    val got = Graph.triangleStats(und).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == Set(
      ("a", 2L, 1L, 1.0), ("b", 3L, 2L, 0.666667),
      ("c", 3L, 2L, 0.666667), ("d", 2L, 1L, 1.0)), s"got $got")
  }

  test("triangleStats matches brute-force triple enumeration on a " +
      "seeded pseudo-random graph (orientation changes the plan, " +
      "never the answer)") {
    // deterministic LCG edge set over 24 vertices — no RNG object,
    // replayable by inspection
    val n = 24
    val ids = (0 until n).map(i => f"v$i%02d")
    val edges = (0 until 160).map { i =>
      val a = ((i * 37 + 11) % n); val b = ((i * 53 + 29) % n)
      (ids(a), ids(b))
    }.filter { case (a, b) => a != b }
    val und = undOf(edges)
    val undSet = und.collect().map(r =>
      (r.getString(0), r.getString(1))).toSet
    def adj(a: String, b: String) =
      undSet.contains(if (a < b) (a, b) else (b, a))
    val vertices = undSet.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = vertices.map { v =>
      val nbrs = vertices.filter(w => w != v && adj(v, w))
      val t = nbrs.combinations(2).count { case Seq(x, y) => adj(x, y) }
      val d = nbrs.size
      val c = if (d < 2) 0.0
        else BigDecimal(2.0 * t / (d.toDouble * (d - 1.0)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (v, d.toLong, t.toLong, c)
    }.toSet
    val got = Graph.triangleStats(und).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == brute, s"got ${got.diff(brute)} vs ${brute.diff(got)}")
  }

  test("star-graph skew probe: degree orientation bounds the wedge " +
      "fan-out (0 wedges through the hub) where the id-canonical join " +
      "is quadratic in hub degree") {
    // hub 'mm' with 100 leaves below ('a…') and 100 above ('z…') in id
    // order — the adversarial fixture for id-canonical orientation
    val leavesLo = (0 until 100).map(i => f"a$i%03d")
    val leavesHi = (0 until 100).map(i => f"z$i%03d")
    val und = undOf((leavesLo ++ leavesHi).map(l => (l, "mm")))
    val deg = und.select(col("u").as("id"))
      .union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    // id-canonical orientation = the (u, v) edges themselves
    val canonicalWedges = Graph.wedges(
      und.select(col("u").as("s"), col("v").as("d"))).count()
    val orientedWedges = Graph.wedges(Graph.rankOrient(und, deg)).count()
    assert(canonicalWedges == 100L * 100L,
      s"fixture should blow up the canonical join: $canonicalWedges")
    assert(orientedWedges == 0L,
      s"degree orientation must kill hub fan-out: $orientedWedges")
    // and the stats are still right: a star has no triangles
    val stats = Graph.triangleStats(und)
    assert(stats.filter(col("n_triangles") =!= 0L).count() == 0L)
    assert(stats.count() == 201L)
  }
}
