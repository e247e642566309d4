package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the q20 sweep-line pipeline. */
object DevSweepProbe {
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

    // warm JIT/codegen
    SparkEntry.queries("q20_sweepline")(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    val cfg = graft.sizing.SizingConfig()
    val derived = graft.sizing.QuerylogAdapter.derived(spark, sfDir, cfg)
      .filter(col("min_executor_pod") <= 40)
    time("derived count")(derived.count())
    time("derived minmax")(derived.agg(min("admitted_us"), max("end_us")).head())
    val sweep = time("sweep construct (bounds agg)")(
      graft.sizing.Concurrency.sweep(derived))
    time("sweep scan job")(
      sweep.write.mode("overwrite").format("noop").save())
    time("maxima")(graft.sizing.Concurrency.maxima(sweep)
      .write.mode("overwrite").format("noop").save())
    spark.catalog.clearCache()
    time("q20 full")(SparkEntry.queries("q20_sweepline")(spark, sfDir)
      .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
