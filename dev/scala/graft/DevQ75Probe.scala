package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: phase-level timing of the q75/q84 streamWindowParity harness
  * — where do ~2.7 s go at sf0.1? Phases: schema read, streaming query
  * (start + processAllAvailable + collect), batch twin (agg + collect),
  * gate materialization.
  */
object DevQ75Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm once at sf0.001 like Bench
    SparkEntry.queries("q75_stream_window")(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    (1 to 3).foreach { round =>
      println(s"== round $round ==")
      val path = s"$sfDir/events.parquet"
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = time("schema")(spark.read.parquet(path).schema)
      def withEventTs(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("event_ts", expr("timestamp_micros(ts div 1000)"))
      def windowed(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(window(col("event_ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(expr("CAST(floor(value * 1000) AS BIGINT)")).as("sum_v"))
        .select(col("w.start").as("w_start"), col("event_type"),
          col("n_events"), col("sum_v"))
      val qname = s"probe75_${round}"
      val nStateParts = sys.env.getOrElse("PROBE_STATE_PARTS", cpus)
      spark.conf.set("spark.sql.shuffle.partitions", nStateParts)
      val q = time("stream_start") {
        windowed(withEventTs(Tables.normalizeEvents(
            spark.readStream.schema(schema)
              .parquet(s"$sfDir/events*.parquet")))
          .withWatermark("event_ts", "0 seconds"))
          .writeStream.format("memory").queryName(qname)
          .outputMode("append").start()
      }
      val streamed = try {
        time("processAll")(q.processAllAvailable())
        time("stream_collect")(spark.table(qname).collect())
      } finally {
        q.stop(); spark.catalog.dropTempView(qname)
        spark.conf.set("spark.sql.shuffle.partitions", cpus)
      }
      val events = time("tables_load")(Tables.load(spark, sfDir, "events"))
      val maxTsUs = time("max_ts")(
        events.agg(max(expr("ts div 1000"))).head().getLong(0))
      val watermarkUs = Math.floorDiv(maxTsUs, 1000L) * 1000L
      val batch = time("batch_collect") {
        windowed(withEventTs(events))
          .filter(expr(s"unix_micros(w_start) + 3600000000L <= $watermarkUs"))
          .collect()
      }
      println(s"PROBE sizes streamed=${streamed.length} batch=${batch.length}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
