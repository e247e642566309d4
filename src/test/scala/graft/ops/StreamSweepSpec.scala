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
}
