package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: q101 phase attribution. */
object DevQ101Probe {
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
    // warm
    SparkEntry.queries("q101_pipeline_e2e")(s, "/root/testdata/sf0.001")
      .write.mode("overwrite").format("noop").save()
    s.catalog.clearCache()
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    def ts(usCol: String) =
      date_format(expr(s"timestamp_micros($usCol)"), fmt)
    val tmp = java.nio.file.Files.createTempDirectory("graft-q101p-")
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
    time("input csv write")(
      csvIn.write.option("header", "true").mode("overwrite").csv(inPath))
    val e2eCfg = SizingConfig(podLimit = 40, inputFile = Some(inPath))
    val outDir = s"$tmp/out"
    val report = time("Pipeline.run")(Pipeline.run(s, e2eCfg, outDir))
    time("readback+aggs") {
      val main = s.read.option("header", "true")
        .csv(s"$outDir/${e2eCfg.outputFile}")
      main.agg(count(lit(1)), sum(col("duration_millis").cast("long"))).head()
    }
    println("rows=" + s.read.option("header","true").csv(inPath).count())
    graft.Fs.deleteRecursively(tmp)
    spark.stop()
  }
}
