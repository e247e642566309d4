package graft.ops

import graft.SparkTestBase

/** q101: the full CSV pipeline battery entry — structural invariants
  * that hold at any sf (the DuckDB oracle checks exact values; this
  * spec gives a fast local signal when the harness itself regresses).
  */
class SizingE2eSpec extends SparkTestBase {

  test("q101 invariants: routing partitions, sinks round-trip, report") {
    val r = Sizing.queries("q101_pipeline_e2e")(
      spark, "/root/testdata/sf0.001").collect()
    assert(r.length == 1)
    val row = r(0)
    def l(c: String) = row.getLong(row.fieldIndex(c))
    def d(c: String) = row.getDouble(row.fieldIndex(c))
    // routing partitions the input: skipped + (kept + pruned) = events
    val events = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet").count()
    assert(l("n_skipped") + l("total_queries") == events)
    assert(l("n_kept") + l("n_pruned") == l("total_queries"))
    assert(l("n_skipped") > 0, "the F2 skip flow never fired")
    // the tsize histogram read back from the main CSV covers every kept row
    val tsizes = Seq("n_xsmall", "n_small", "n_medium", "n_large",
      "n_custom").map(l).sum
    assert(tsizes == l("n_kept"))
    // every kept query needs at least one pod; report scalars are sane
    assert(l("kept_pods") >= l("n_kept"))
    assert(l("max_concurrent_queries") >= 1
      && l("max_concurrent_queries") <= l("n_kept"))
    assert(l("min_executor_pod_workload") >= 1)
    assert(d("total_query_time_sec") > 0)
    Seq("util_cache_pct", "util_mem_pct", "util_cpu_pct",
      "util_spill_pct").foreach(c => assert(d(c) >= 0, c))
    val tsizeWl = row.getString(row.fieldIndex("tsize_workload"))
    assert(Seq("XSMALL", "SMALL", "MEDIUM", "LARGE", "CUSTOM")
      .contains(tsizeWl))
    // constrained_by names at least one dimension at the workload tsize
    assert(row.getString(row.fieldIndex("constrained_by")).nonEmpty)
  }
}
