package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: q78 stream/batch session diff with full µs — prints the
  * symmetric difference between the streamed append-mode session set and
  * the batch session_window set under the eviction predicate.
  */
object DevQ78Debug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    def withEventTs(df: DataFrame): DataFrame =
      df.withColumn("event_ts", expr("timestamp_micros(ts div 1000)"))
    def sessions(df: DataFrame): DataFrame = df
      .groupBy(session_window(col("event_ts"), "15 minutes").as("w"),
        col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(expr("CAST(floor(value * 1000) AS BIGINT)")).as("sum_v"))
      .select(expr("unix_micros(w.start)").as("s_us"),
        expr("unix_micros(w.end)").as("e_us"),
        col("user_id"), col("n_events"), col("sum_v"))

    val qname = s"dbg_${System.nanoTime()}"
    val q = sessions(
      withEventTs(Tables.normalizeEvents(
          s.readStream.schema(schema).parquet(s"$dir/events*.parquet")))
        .withWatermark("event_ts", "0 seconds"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    val streamed =
      try { q.processAllAvailable(); s.table(qname).collect() }
      finally { q.stop(); s.catalog.dropTempView(qname) }

    val events = Tables.load(s, dir, "events")
    val maxTsUs = events.agg(max(expr("ts div 1000"))).head().getLong(0)
    val wmUs = Math.floorDiv(maxTsUs, 1000L) * 1000L
    val batch = sessions(withEventTs(events))
      .filter(col("e_us") <= wmUs)
      .collect()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val sSet = streamed.map(key).toSet
    val bSet = batch.map(key).toSet
    println(s"maxTsUs=$maxTsUs wmUs=$wmUs streamed=${sSet.size} batch=${bSet.size}")
    println("stream-only (first 10):")
    (sSet -- bSet).take(10).foreach(println)
    println("batch-only (first 10):")
    (bSet -- sSet).take(10).foreach(println)
    s.stop()
  }
}
