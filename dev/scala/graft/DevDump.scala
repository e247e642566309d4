package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump intermediate sweep-line state for oracle diffing. */
object DevDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val cfg = sizing.SizingConfig()
    val kept = sizing.QuerylogAdapter.derived(spark, sfDir, cfg)
      .filter(col("min_executor_pod") <= 40)
    sizing.Concurrency.sweep(kept)
      .select("query_id", "ts_us", "kind", "d_count", "run_count", "run_pods")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/sweep_events")
    spark.stop()
  }
}
