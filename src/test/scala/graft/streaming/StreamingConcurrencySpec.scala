package graft.streaming

import graft.SparkTestBase
import graft.streaming.StreamingConcurrency._
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming sweep-line: bucket summaries + global fold must equal the
  * batch brute force once the watermark closes the buckets.
  */
class StreamingConcurrencySpec extends SparkTestBase {

  private val BucketUs = 1000000L // 1s buckets

  private def interval(id: String, startSec: Long, endSec: Long,
      pods: Long): QueryInterval =
    QueryInterval(id, new Timestamp(startSec * 1000),
      new Timestamp(endSec * 1000), pods, pods * 2, pods * 3, 1L, 1L)

  /** Run intervals through the streaming pipeline, flushing with a far
    * sentinel so every real bucket times out; returns real summaries.
    */
  private def runStream(intervals: Seq[QueryInterval],
      sentinelSec: Long): Seq[BucketSummary] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[QueryInterval]
    val ev = events(input.toDS(), BucketUs)
    val summaries = bucketSummaries(ev, BucketUs, "0 seconds")
    val qname = s"conc_${System.nanoTime()}"
    val q = summaries.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      input.addData(intervals)
      q.processAllAvailable()
      // the sentinel batch advances the watermark past every real bucket;
      // the subsequent no-data batch fires the event-time timeouts
      input.addData(Seq(interval("sentinel", sentinelSec, sentinelSec + 1, 0)))
      q.processAllAvailable()
      val sentinelBucket = sentinelSec * 1000000 / BucketUs
      spark.table(qname).as[BucketSummary].collect().toSeq
        .filter(_.bucket < sentinelBucket)
    } finally q.stop()
  }

  private def bruteMaxQueries(qs: Seq[QueryInterval]): Long =
    qs.map(q => qs.count(o => o.admitted.getTime <= q.admitted.getTime &&
      q.admitted.getTime < o.end.getTime).toLong).max

  private def bruteMaxPods(qs: Seq[QueryInterval]): Long =
    qs.map(q => qs.filter(o => o.admitted.getTime <= q.admitted.getTime &&
      q.admitted.getTime < o.end.getTime).map(_.pods).sum).max

  test("streamed maxima equal batch brute force (seeded random)") {
    val rnd = new scala.util.Random(23)
    val qs = (1 to 120).map { i =>
      val s = 100L + rnd.nextInt(60)
      interval(f"q$i%03d", s, s + 1 + rnd.nextInt(20), 1 + rnd.nextInt(4))
    }
    val m = GlobalAccumulator.fold(runStream(qs, sentinelSec = 100000)).get
    assert(m.maxConcurrentQueries == bruteMaxQueries(qs))
    assert(m.maxPods == bruteMaxPods(qs))
  }

  test("cross-bucket running footprint carries over (long interval)") {
    // one query spans many buckets; a second starts inside a later bucket
    val qs = Seq(interval("a", 10, 200, 2), interval("b", 150, 160, 3))
    val m = GlobalAccumulator.fold(runStream(qs, sentinelSec = 100000)).get
    assert(m.maxConcurrentQueries == 2)
    assert(m.maxPods == 5L)
    assert(m.maxPodsAtUs == 150L * 1000000)
  }

  test("tsUs/usTs round-trip full µs precision (getTime truncates to ms)") {
    val us = 1736954321123456L // sub-ms µs component: 456
    assert(tsUs(usTs(us)) == us)
    assert(usTs(us).getTime == us / 1000) // ms view is truncated
  }

  test("scanBucket: end-before-start tiebreak within a bucket") {
    val ts = new Timestamp(5000)
    val evs = List(
      Event(5, ts, 0, "a", -1L, -2L, 0, 0, 0, 0), // end of a at t=5
      Event(5, ts, 1, "b", 1L, 3L, 0, 0, 0, 0)) // start of b at t=5
    val s = scanBucket(5, evs)
    // end sorts first: prefix at b's start is (0)+1 = 1 query, 1 pod
    assert(s.maxPrefCount == 0L) // -1 then +1 => 0 at the start event
    assert(s.maxPrefPods == 1L) // -2 then +3
  }

  test("scanBucket orders sub-ms events by full µs, not truncated ms") {
    // two starts 400µs apart inside the same millisecond: the later one
    // must see the earlier one's delta in its prefix
    val t1 = usTs(5000100) // 5.000100 s
    val t2 = usTs(5000500) // 5.000500 s
    val evs = List(
      Event(5, t2, 1, "b", 1L, 3L, 0, 0, 0, 0),
      Event(5, t1, 1, "a", 1L, 2L, 0, 0, 0, 0))
    val s = scanBucket(5, evs)
    assert(s.maxPrefPods == 5L)
    assert(s.maxPrefAtUs == 5000500L)
  }

  test("GlobalAccumulator ignores start-free buckets but carries their nets") {
    val s1 = BucketSummary(1, 1, -1L, -2L, 0, 0, 0, 0,
      Long.MinValue, Long.MinValue, Long.MinValue, Long.MinValue,
      Long.MinValue, Long.MinValue, Long.MinValue, hasStart = false)
    val s2 = BucketSummary(2, 1, 1L, 5L, 0, 0, 0, 0,
      1L, 5L, 0, 0, 0, 0, 2000000L, hasStart = true)
    val m = GlobalAccumulator.fold(Seq(s2, s1)).get // any arrival order
    assert(m.maxConcurrentQueries == 0L) // carry -1 + local 1
    assert(m.maxPods == 3L) // carry -2 + local 5
  }
}
