package graft.ops

import graft.SparkTestBase

/** q97: the REST DSv2 source's gate entry — real loopback HTTP, real
  * jvm fetcher with basic auth, pagination + the adaptive truncation
  * cascade, parity against the no-HTTP twin.
  */
class RestGateSpec extends SparkTestBase {

  test("q97 ingests the full fixture over HTTP and parity-matches") {
    val got = RestGate.queries("q97_rest_ingest")(
      spark, "/root/testdata/sf0.001")
    val rows = got.collect()
    assert(rows.nonEmpty)
    // every summary row carries a TRUE parity bit (the gate would raise
    // on false, but assert directly so a gate regression is visible here)
    assert(rows.forall(r => r.getBoolean(r.fieldIndex("matches_batch"))))
    // the fixture genuinely splits into pools with real query mass
    val n = rows.map(r => r.getLong(r.fieldIndex("n_queries"))).sum
    assert(n > 500, s"suspiciously few ingested rows: $n")
    // the adaptive truncation-window cascade genuinely executed — a
    // fixture too small to truncate would pass parity while exercising
    // nothing of the py:152–158 protocol
    assert(RestGate.truncationsServed.get() > 0,
      "no truncation warning was ever served")
  }
}
