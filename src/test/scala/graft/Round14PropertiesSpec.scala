package graft

import graft.functions.{BoundedTimelineAgg, TopKAggregator}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pins for the round-14 bounded aggregators: shuffle-safety is
  * the whole contract (partial buffers merge in arbitrary order inside
  * Spark's aggregation), so the properties fold random inputs under
  * random partitionings and demand the result equal the sequential
  * definition.
  */
class Round14PropertiesSpec extends SparkTestBase {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val evGen = Gen.chooseNum(30, 70).flatMap(n =>
    Gen.listOfN(n, Gen.zip(
      Gen.chooseNum(0L, 20L), Gen.chooseNum(0L, 5L),
      Gen.oneOf("a", "b", "c"))))

  test("BoundedTimelineAgg == sorted-take-k under any partitioning") {
    val agg = new BoundedTimelineAgg(7)
    samples(Gen.zip(evGen, Gen.chooseNum(1, 5)), 8).foreach {
      case (events, nParts) =>
        // sequential definition: total-order sort, first k
        val expect = events.sorted.take(7)
        // partitioned fold: split arbitrarily, reduce each, then merge
        // REVERSED and ROTATED-BY-ONE — both must equal the sequential
        // result (a merge that assumed generation order would pass the
        // identity order but fail these)
        val parts = events.grouped(
          math.max(1, events.size / nParts)).toList
        val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        Seq(bufs.reverse, bufs.drop(1) ++ bufs.take(1)).foreach { order =>
          val merged = order.foldLeft(agg.zero)(agg.merge)
          assert(agg.finish(merged) == expect,
            s"events=$events parts=$nParts order=$order")
        }
        // the state bound holds on every partial, not just the result
        bufs.foreach(b => assert(b.items.size <= 7))
    }
  }

  test("TopKAggregator == sort-by-(value desc, tie asc)-take-k") {
    val agg = new TopKAggregator(5)
    val gen = Gen.listOfN(40, Gen.zip(
      Gen.chooseNum(-9, 9).map(_.toDouble), Gen.chooseNum(0L, 99L)))
    samples(Gen.zip(gen, Gen.chooseNum(1, 4)), 8).foreach {
      case (rows, nParts) =>
        val expect = rows.sortBy { case (v, t) => (-v, t) }.take(5)
        val parts = rows.grouped(math.max(1, rows.size / nParts)).toList
        val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce))
          .reverse.foldLeft(agg.zero)(agg.merge)
        assert(agg.finish(merged) == expect, s"rows=$rows")
    }
  }
}
