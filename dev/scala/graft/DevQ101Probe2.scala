package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: Pipeline.finish stage attribution (replicated with timers). */
object DevQ101Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val s = spark
    import graft.sizing._
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    def ts(usCol: String) =
      date_format(expr(s"timestamp_micros($usCol)"), fmt)
    val tmp = java.nio.file.Files.createTempDirectory("graft-q101p2-")
    val base = QuerylogAdapter.withUnits(QuerylogAdapter.fromEvents(s, sfDir))
    val csvIn = base.select(
      col("query_id").cast("string").as("query_id"),
      col("pool"), ts("start_us").as("start_time"), ts("end_us").as("end_time"),
      col("duration_millis"), col("reqd_cache_gb"),
      when(col("query_id") % 31 === 0, lit(null).cast("double"))
        .otherwise(col("reqd_agg_mem")).as("reqd_agg_mem"),
      col("memory_spilled_gb"), col("cpu_time_sec"),
      lit("QUERY").as("query_type"), col("admission_wait"), col("num_backends"))
    val inPath = s"$tmp/querylog_csv"
    csvIn.write.option("header", "true").mode("overwrite").csv(inPath)
    val cfg = SizingConfig(podLimit = 40, inputFile = Some(inPath))
    val outDir = s"$tmp/out"
    val raw = time("read+instants (lazy)")(
      Pipeline.withEventInstants(Pipeline.readQuerylogCsv(s, inPath)))
    val cached = raw.persist()
    val (skipped, kept0, pruned0) = Routing.route(cached, cfg)
    val kept = kept0.persist()
    val pruned = pruned0.persist()
    val pre = time("routedCounts")(Report.routedCounts(kept, pruned, skipped))
    time("main sink write")(
      Pipeline.outputRow(kept).write.mode("overwrite").option("header", "true")
        .csv(s"$outDir/${cfg.outputFile}"))
    if (pre.getAs[Long]("n_pruned") > 0)
      time("prune sink write")(
        Pipeline.outputRow(pruned).write.mode("overwrite")
          .option("header", "true").csv(s"$outDir/${cfg.pruneOutputFile}"))
    if (pre.getAs[Long]("n_skipped") > 0)
      time("skip sink write")(
        skipped.select(concat_ws("|", col("query_id"), col("duration_millis"),
            col("start_time"), col("end_time")).as("value"))
          .write.mode("overwrite").text(s"$outDir/${cfg.skipQueryFile}"))
    val conc = time("concurrency (lazy+head via build)")(
      Pipeline.concurrency(kept))
    time("build: g agg")(kept.agg(count(lit(1))).head())
    time("build: sizeMatrix")(Aggregates.sizeMatrix(kept).collect())
    time("build: concurrency head")(conc.head())
    val rep = time("Report.build")(Report.build(cfg, kept,
      Pipeline.concurrency(kept), pre))
    println("report total=" + rep.totalQueries)
    graft.Fs.deleteRecursively(tmp)
    spark.stop()
  }
}
