package graft.sizing

import graft.SparkTestBase

/** Three-way skip/keep/prune routing (SURVEY §2.3, F2–F4). */
class RoutingSpec extends SparkTestBase {

  private def raw = {
    import spark.implicits._
    Seq(
      // (id, pool, dur_ms, cpu_s, backends, cache_gb, mem_gb (null=skip), spill_gb)
      ("keep1", "etl", 1000L, 1.0, 1, 100.0, Some(100.0), 0.0),
      ("keep2", "bi", 1000L, 1.0, 1, 500.0, Some(10.0), 0.0),
      ("skip1", "etl", 1000L, 1.0, 1, 100.0, None, 0.0),
      // cache ratio 150000/1000 = 150 pods > default podLimit 100 => prune
      ("prune1", "etl", 1000L, 1.0, 1, 150000.0, Some(1.0), 0.0)
    ).toDF("query_id", "pool", "duration_millis", "cpu_time_sec",
      "num_backends", "reqd_cache_gb", "reqd_agg_mem", "memory_spilled_gb")
  }

  test("skip/keep/prune split (F2+F4)") {
    val (skipped, kept, pruned) = Routing.route(raw, SizingConfig())
    assert(skipped.select("query_id").collect().map(_.getString(0)).toSet
      == Set("skip1"))
    assert(kept.select("query_id").collect().map(_.getString(0)).toSet
      == Set("keep1", "keep2"))
    assert(pruned.select("query_id").collect().map(_.getString(0)).toSet
      == Set("prune1"))
  }

  test("pool filter applies before routing when configured (F3)") {
    val (skipped, kept, pruned) =
      Routing.route(raw, SizingConfig(pool = Some("etl")))
    assert(skipped.count() == 1)
    assert(kept.select("query_id").collect().map(_.getString(0)).toSet
      == Set("keep1"))
    assert(pruned.count() == 1)
  }

  test("total_queries counts kept+pruned, not skipped (Q10 stance)") {
    val (_, kept, pruned) = Routing.route(raw, SizingConfig())
    assert(kept.count() + pruned.count() == 3)
  }
}
