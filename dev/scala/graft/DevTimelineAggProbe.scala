package graft

/** Dev-only: insert throughput of [[graft.functions.BoundedTimelineAgg]]'s
  * buffer at k = 4096 — the binary-search + saturated-reject Vector
  * buffer vs the former sorted-immutable-List cons-walk splice (inlined
  * here as the baseline, since the product code no longer carries it).
  *
  * Workload shape mirrors the streaming monitor: a shuffled stream of n
  * events folds into one key's buffer, so after the first ~k admits the
  * buffer is saturated and most arrivals reject. No Spark session —
  * this is a JVM micro-probe of the per-event state update cost.
  *
  * Usage: `runMain graft.DevTimelineAggProbe [k] [nEvents]`
  */
object DevTimelineAggProbe {
  type E = (Long, Long, String)

  private def lt(a: E, b: E): Boolean =
    a._1 < b._1 || (a._1 == b._1 &&
      (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)))

  // the round-12 implementation, verbatim shape: span-walk + cons splice
  private def insertList(k: Int)(items: List[E], v: E): List[E] = {
    val (before, after) = items.span(e => lt(e, v))
    (before ::: v :: after).take(k)
  }

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(4096)
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(400000)
    val rnd = new scala.util.Random(42)
    val events: Array[E] =
      Array.fill(n)((rnd.nextLong(1000000L), rnd.nextLong(), "ev"))

    val agg = new graft.functions.BoundedTimelineAgg(k)
    def timeVector(): Double = {
      val t0 = System.nanoTime()
      var b = agg.zero
      var i = 0
      while (i < n) { b = agg.reduce(b, events(i)); i += 1 }
      require(b.items.length == k)
      (System.nanoTime() - t0) / 1e9
    }
    def timeList(): Double = {
      val t0 = System.nanoTime()
      var items: List[E] = Nil
      var i = 0
      while (i < n) { items = insertList(k)(items, events(i)); i += 1 }
      require(items.length == k)
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths, then min-of-3
    timeVector(); timeList()
    val tv = (1 to 3).map(_ => timeVector()).min
    val tl = (1 to 3).map(_ => timeList()).min
    println(f"TIMELINEAGG k=$k n=$n vector=$tv%.3fs list=$tl%.3fs " +
      f"speedup=${tl / tv}%.1fx " +
      f"vector_evps=${n / tv}%.0f list_evps=${n / tl}%.0f")
  }
}
