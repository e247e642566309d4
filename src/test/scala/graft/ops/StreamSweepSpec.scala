package graft.ops

import graft.{SparkEntry, SparkTestBase}

/** q73: the streamed sweep-line maxima must equal the batch q20 operator
  * on the same derived querylog (sf0.001) — the parity bit IS the check
  * the driver's rows-only gate relies on.
  */
class StreamSweepSpec extends SparkTestBase {

  test("q73 stream maxima match batch q20 on sf0.001") {
    val row = SparkEntry.queries("q73_stream_sweep")(
      spark, "/root/testdata/sf0.001").head()
    assert(row.getBoolean(row.fieldIndex("matches_batch")),
      s"stream/batch divergence: $row")
    assert(row.getLong(row.fieldIndex("max_concurrent_queries")) > 0)
  }

  test("q74 streaming dedup matches batch distinct per source on sf0.001") {
    val rows = SparkEntry.queries("q74_stream_dedup")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)), s"divergence: ${rows.mkString(";")}")
  }

  test("q77 stream-stream interval join equals the batch join set") {
    val rows = SparkEntry.queries("q77_stream_join")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(3)), s"divergence: ${rows.mkString(";")}")
  }

  test("q75 streamed append-mode windows equal finalized batch windows") {
    val rows = SparkEntry.queries("q75_stream_window")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(4)), s"divergence: ${rows.take(5).mkString(";")}")
  }
}
