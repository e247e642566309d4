package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only beyond-sf10 probe for the streaming drains (round-14 ask:
  * one sf30 datapoint for a streaming entry, or a written bound).
  *
  * The battery's q78/q126 entries drain into a MEMORY sink and collect
  * the answer for the in-row parity gate — correct for the gate, but at
  * sf30 the ANSWER itself (~30M session rows) exceeds the driver's 1 GiB
  * collect cap, so the gate harness can't measure the decade. This probe
  * runs the IDENTICAL streaming query — same file source, watermark,
  * session_window aggregate, RocksDB state store — but drains into a
  * parquet sink (the distributed production shape: no driver collect
  * anywhere). What it measures is therefore exactly the per-micro-batch
  * streaming cost (source listing + state-store ops + sink write) with
  * the harness's terminal collect removed from the picture.
  *
  * Usage: runMain graft.DevStreamScaleProbe [dir ...]
  *   defaults: /tmp/graft-sf10 /tmp/graft-sf30
  */
object DevStreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft-sf10", "/tmp/graft-sf30")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("DevStreamScaleProbe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "48g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    for (dir <- dirs if new java.io.File(dir).isDirectory) {
      val out = java.nio.file.Files
        .createTempDirectory("stream-scale-probe").toString
      val schema = spark.read.parquet(s"$dir/events.parquet").schema
      val t0 = System.nanoTime()
      val (rows, batches) = streaming.StreamConf.withStateParts(spark) {
        val src = Tables.normalizeEvents(
            spark.readStream.schema(schema).parquet(s"$dir/events*.parquet"))
          .withColumn("event_ts", expr("timestamp_micros(ts div 1000)"))
          .withWatermark("event_ts", "0 seconds")
        val sessions = src
          .groupBy(session_window(col("event_ts"), "15 minutes").as("w"),
            col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(expr("CAST(floor(value * 1000) AS BIGINT)")).as("sum_v"))
          .select(col("w.start").as("s_start"), col("w.end").as("s_end"),
            col("user_id"), col("n_events"), col("sum_v"))
        val q = sessions.writeStream
          .format("parquet")
          .option("path", s"$out/data")
          .option("checkpointLocation", s"$out/ckpt")
          .outputMode("append")
          .start()
        try {
          q.processAllAvailable()
          (spark.read.parquet(s"$out/data").count(),
            q.recentProgress.length)
        } finally q.stop()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STREAMSCALE q78_parquet_sink dir=$dir%s " +
        f"wall=$sec%.1fs rows=$rows%d batches=$batches%d")
      // best-effort cleanup — /tmp, sized ~answer rows
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    }
    spark.stop()
  }
}
