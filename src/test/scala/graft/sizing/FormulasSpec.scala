package graft.sizing

import graft.SparkTestBase

/** Sizing formulas P2–P11 (SURVEY §2.2) against hand-computed fixtures,
  * including the Q9 zero-duration guard and the Q3/Q4 quirk stances.
  */
class FormulasSpec extends SparkTestBase {

  private val cfg = SizingConfig() // parallelFactor=16, cpuAdj=80

  private def deriveOne(durationMs: Long, cpuSec: Double, backends: Int,
      cacheGb: Double, memGb: Double, spillGb: Double) = {
    import spark.implicits._
    val df = Seq((durationMs, cpuSec, backends, cacheGb, memGb, spillGb))
      .toDF("duration_millis", "cpu_time_sec", "num_backends",
        "reqd_cache_gb", "reqd_agg_mem", "memory_spilled_gb")
    Formulas.derive(df, cfg).head
  }

  test("hand-computed fixture row (py:219–258)") {
    val r = deriveOne(durationMs = 10000, cpuSec = 40.0, backends = 2,
      cacheGb = 3000.0, memGb = 500.0, spillGb = 1500.0)
    assert(r.getAs[Double]("duration_sec") == 10.0)
    assert(r.getAs[Long]("min_parallelism") == 4) // ceil(40/10)
    assert(r.getAs[Double]("avg_vcores_per_node") == 2.0)
    assert(r.getAs[Double]("avg_mem_per_node") == 250.0)
    assert(r.getAs[Double]("avg_cache_per_node") == 1500.0)
    assert(r.getAs[Double]("avg_spill_per_node") == 750.0)
    assert(r.getAs[Double]("avg_data_rate_per_node") == 150.0)
    assert(r.getAs[Long]("min_executor_pod_data") == 3) // 3000/1000
    assert(r.getAs[Long]("min_executor_pod_mem") == 3) // ceil(500/200)
    assert(r.getAs[Long]("min_executor_pod_cpu") == 1) // ceil(4*0.8/16)
    assert(r.getAs[Long]("min_executor_pod_spill") == 2) // ceil(1500/1000)
    // P11: ceil of the max UN-ceiled ratio (3.0), not max of the ceils
    assert(r.getAs[Long]("min_executor_pod") == 3)
  }

  test("overall pod uses un-ceiled ratios (py:257)") {
    // ratios: data=0.5, mem=2.1/2=1.05 -> ceil each = 1,2 but overall
    // = ceil(max(0.5, 1.05, ...)) = 2 — and NOT max-of-ceils artifacts.
    val r = deriveOne(10000, 0.0, 1, 500.0, 210.0, 0.0)
    assert(r.getAs[Long]("min_executor_pod_data") == 1)
    assert(r.getAs[Long]("min_executor_pod_mem") == 2)
    assert(r.getAs[Long]("min_executor_pod") == 2)
  }

  test("zero duration is guarded, not a crash (Q9)") {
    val r = deriveOne(0, 99.0, 3, 100.0, 100.0, 0.0)
    assert(r.getAs[Long]("min_parallelism") == 0)
    assert(r.getAs[Double]("avg_data_rate_per_node") == 0.0)
  }

  test("zero backends is guarded (safeDiv)") {
    val r = deriveOne(1000, 1.0, 0, 100.0, 100.0, 0.0)
    assert(r.getAs[Double]("avg_mem_per_node") == 0.0)
  }

  test("cache adjustment applies when configured away from 100 (Q3 flag)") {
    import spark.implicits._
    val df = Seq((10000L, 0.0, 1, 1000.0, 0.0, 0.0))
      .toDF("duration_millis", "cpu_time_sec", "num_backends",
        "reqd_cache_gb", "reqd_agg_mem", "memory_spilled_gb")
    val r = Formulas.derive(df, cfg.copy(cacheAdjustmentPct = 50)).head
    assert(r.getAs[Long]("min_executor_pod_data") == 1) // 1000*0.5/1000
  }
}
