package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins [[MisraGriesAggregator]] (q228) — the deterministic-bound
  * frequent-items summary — on a hand-computable fixture, the
  * mergeable-summaries theorem under adversarial partitioning, and the
  * battery entry's guaranteed-set semantics.
  */
class MisraGriesSpec extends SparkTestBase {

  import spark.implicits._

  private def sketch(keys: Seq[Long], k: Int, parts: Int)
      : Map[Long, Long] =
    spark.createDataset(keys).repartition(parts)
      .select(new MisraGriesAggregator(k).toColumn)
      .head()

  test("capacity never exceeded; exact when distinct keys fit") {
    // 3 distinct keys, k = 8 (capacity 7): no decrement ever fires, so
    // the summary IS the exact histogram
    val keys = Seq.fill(5)(1L) ++ Seq.fill(3)(2L) ++ Seq.fill(2)(3L)
    for (parts <- Seq(1, 2, 5)) {
      val m = sketch(scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).shuffle(keys), 8, parts)
      assert(m === Map(1L -> 5L, 2L -> 3L, 3L -> 2L), s"parts=$parts")
    }
  }

  test("theorem bound holds under every partitioning (real skew)") {
    // quadratic density: key j appears 2j+1 times, j = 0..29 — n = 900,
    // 30 distinct keys, k = 8 forces constant decrement pressure
    val keys = (0L to 29L).flatMap(j => Seq.fill(2 * j.toInt + 1)(j))
    val n = keys.size.toLong
    val k = 8
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong)
    for (parts <- Seq(1, 3, 16, 32)) {
      val m = sketch(keys, k, parts)
      assert(m.size <= k - 1, s"capacity violated at parts=$parts")
      m.foreach { case (key, est) =>
        val f = exact(key)
        assert(est <= f, s"over-estimate at parts=$parts key=$key")
        assert(est * k >= f * k - n,
          s"bound violated at parts=$parts key=$key: est=$est f=$f")
      }
      // any key with f·k > n must be present, regardless of merge order
      exact.filter(_._2 * k > n).keys.foreach { key =>
        assert(m.contains(key),
          s"guaranteed key $key missing at parts=$parts")
      }
    }
  }

  test("q228 entry: guaranteed set is exact and bits are gated TRUE") {
    // sf0.01 = the driver's gate scale; sf0.001's 15-user domain
    // truncates the quadratic density below the guarantee line (an
    // EMPTY set there is the correct answer, mirrored by the oracle)
    val rows = graft.SparkEntry.queries("q228_heavy_hitters")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty, "adaptive k must keep the set non-empty")
    rows.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3),
        s"theorem bit false for key ${r.getLong(0)}")
    }
    // replay the guarantee: every returned key exceeds n/k for the
    // adaptive k — recompute both from the raw table
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.01", "events")
    val u = ev.agg(max(col("user_id"))).head().getLong(0) + 1
    val shift = (1 to 20).filter(s => (1L << (2 * s)) <= u).last
    val k = 1L << shift
    val n = ev.filter(col("user_id").isNotNull).count()
    rows.foreach { r =>
      assert(r.getLong(1) * k > n,
        s"key ${r.getLong(0)} returned but not guaranteed-heavy")
    }
    // and the empty-at-truncated-domain case both runs and is empty
    assert(graft.SparkEntry.queries("q228_heavy_hitters")(
      spark, "/root/testdata/sf0.001").count() === 0L)
  }
}
