package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-17 engine-infrastructure entries: q242 (equi-depth histogram +
  * selectivity audit), q243 (zone-map manifest + partition-pruned
  * scan), q244 (block-sampling design effect).
  */
class EngineStatsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  // --- q242 ---------------------------------------------------------------

  test("q242: estimator error is bounded by the equi-depth guarantee") {
    val rows = q("q242_equidepth_selectivity")
      .orderBy("cut_id").collect()
    assert(rows.length === 15)
    val n = graft.Tables.load(spark, sf, "lineitem").count()
    // A point in bucket i can misestimate by at most the bucket's own
    // depth (~n/K) + interpolation slack; assert a 2× cushion of the
    // per-bucket depth so a broken boundary or off-by-one in the
    // interpolation (error ~n/2) fails loudly.
    val bound = 2L * n / 32 + 32
    rows.foreach { r =>
      val err = r.getLong(4)
      assert(err <= bound, s"cut ${r.getLong(0)}: abs_err $err > $bound")
      assert(r.getLong(2) >= 0L && r.getLong(2) <= n)
    }
  }

  test("q242: cuts, estimates and truths are all monotone in the cut") {
    val rows = q("q242_equidepth_selectivity")
      .orderBy("cut_id").collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) < b.getLong(1), "cut grid not increasing")
      assert(a.getLong(2) <= b.getLong(2), "est_rows not monotone")
      assert(a.getLong(3) <= b.getLong(3), "true_rows not monotone")
    }
  }

  // --- q243 ---------------------------------------------------------------

  test("q243: pruning reads fewer files than exist and loses no match") {
    val r = q("q243_zonemap_prune").head()
    val nFiles = r.getLong(0); val scanned = r.getLong(1)
    val rowsScanned = r.getLong(2); val nMatch = r.getLong(3)
    val total = graft.Tables.load(spark, sf, "lineitem").count()
    assert(scanned < nFiles, "zone map pruned nothing — layout broken?")
    assert(scanned > 0L && rowsScanned < total)
    assert(nMatch <= rowsScanned)
    // truth recomputed independently from the base table: the pruned
    // read must see every matching row
    val li = graft.Tables.load(spark, sf, "lineitem")
      .withColumn("sd", expr("CAST(l_shipdate AS DATE)"))
    val gmin = li.agg(min(col("sd"))).head().getDate(0).toLocalDate
    val truth = li.filter(
      col("sd").between(
        lit(gmin.plusDays(400).toString).cast("date"),
        lit(gmin.plusDays(800).toString).cast("date"))).count()
    assert(nMatch === truth)
  }

  test("partition-pruned read carries PartitionFilters in the scan") {
    // The q243 claim is FILE SKIPPING, not post-read filtering: an
    // isin() on the partition column must surface as a planning-time
    // partition filter. Pin that on a minimal partitioned write so the
    // entry's mechanism (not just its arithmetic) is under test.
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-zonemap-spec").toString
    try {
      Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 2L)).toDF("v", "zfile")
        .write.mode("overwrite").partitionBy("zfile").parquet(dir)
      val pruned = spark.read.parquet(dir)
        .filter(col("zfile").cast("long").isin(0L, 2L))
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: ["), plan.take(400))
      assert(!plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)].*", "$1")
        .trim.isEmpty, "partition filter list is empty — no pruning:\n" +
        plan.take(400))
      assert(pruned.count() === 3L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
    }
  }

  // --- q244 ---------------------------------------------------------------

  test("q244: internal identities hold (HT scaling, error fields, deff)") {
    val r = q("q244_block_sample_deff").head()
    val nUsed = r.getLong(0); val nBlocks = r.getLong(1)
    val m = r.getLong(2); val tTrue = r.getLong(3)
    val estB = r.getLong(4); val estR = r.getLong(5)
    assert(m === 128L && nUsed === nBlocks * m)
    assert(r.getLong(6) === math.abs(estB - tTrue))
    assert(r.getLong(7) === math.abs(estR - tTrue))
    val icc = r.getDouble(8); val deff = r.getDouble(9)
    assert(icc >= -1.0 && icc <= 1.0)
    // deff is the same rounded expression over the same icc input;
    // reconstruct within the rounding step
    assert(math.abs(deff - (1.0 + 127.0 * icc)) < 2e-4,
      s"deff $deff vs 1+127*icc ${1.0 + 127.0 * icc}")
  }

  test("q244: block-constant values drive icc -> 1, deff -> m (ANOVA " +
      "fixture)") {
    import spark.implicits._
    // 4 blocks of 128 rows, each block a single constant value: zero
    // within-block variance means the ANOVA estimator must return
    // icc = 1 exactly and deff = m — the textbook worst case for block
    // sampling. Routed through the real entry via a synthetic lineitem
    // table (the entry only reads orderkey/linenumber/quantity).
    val dir = java.nio.file.Files
      .createTempDirectory("graft-deff-spec").toString
    try {
      (0 until 512).map { i =>
        (i.toLong, 1, Seq(10.0, 30.0, 10.0, 50.0)(i / 128))
      }.toDF("l_orderkey", "l_linenumber", "l_quantity")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/lineitem.parquet")
      val r = graft.SparkEntry
        .queries("q244_block_sample_deff")(spark, dir).head()
      assert(r.getLong(1) === 4L, "block count")
      assert(math.abs(r.getDouble(8) - 1.0) < 1e-9,
        s"icc ${r.getDouble(8)} != 1 on block-constant data")
      assert(math.abs(r.getDouble(9) - 128.0) < 1e-6,
        s"deff ${r.getDouble(9)} != m")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
    }
  }
}
