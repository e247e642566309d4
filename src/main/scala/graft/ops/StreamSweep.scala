package graft.ops

import graft.{QueryModule, Tables}
import graft.sizing.{Concurrency, QuerylogAdapter, SizingConfig}
import graft.streaming.StreamingConcurrency
import graft.streaming.StreamingConcurrency._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The streaming gate module: Structured Streaming surfaces under the
  * driver's correctness battery. The oracle cannot execute a stream, so
  * every entry here is rows-only checked AND carries an in-row
  * `matches_batch` parity bit against the equivalent batch operator —
  * whose own result IS oracle-hash-checked, making stream correctness
  * transitive. q73 = the stateful sweep-line; q75 = watermarked tumbling
  * windows in append mode (emission-boundary semantics included);
  * q74 (streaming exact dedup) lives with the dedup ops in [[Dedup]].
  *
  * q73: the streaming sweep-line under the driver's correctness gate.
  *
  * Runs [[graft.streaming.StreamingConcurrency]] (the Structured Streaming
  * analog of the reference's interval-overlap analysis, py:307–396) over
  * the SAME derived querylog as the batch q20_sweepline, folds the closed
  * buckets into global maxima, and emits one row with q20's schema plus a
  * `matches_batch` parity bit computed against the batch operator's own
  * result on identical input. The oracle cannot execute a stream, so the
  * driver records a rows-only check — the parity bit is what makes that
  * check meaningful: a `true` asserts stream == batch == (transitively,
  * via q20's hash-check) the DuckDB oracle.
  *
  * Driver-side collects here are the STREAM HARNESS, not the operator:
  * MemoryStream is fed from the driver by construction (production would
  * be a Kafka source), and the folded bucket summaries are one row per
  * non-empty time bucket — bounded by the analysis window, not the data.
  * The per-bucket scans — the actual O(events) work — run distributed
  * inside flatMapGroupsWithState.
  *
  * Cost shape at sf0.1 (measured, DevStreamProbe): ≈1.5 s interval
  * collect/encode, ≈5 s data micro-batch, ≈2.5 s sentinel micro-batch +
  * timeout flush, ≈4 s the batch q20 parity run — q73's bench time is the
  * price of executing BOTH engines plus fixed micro-batch machinery, not
  * a plan defect; the streamed operator itself is one 2|kept|-row shuffle
  * and per-bucket local scans.
  */
object StreamSweep extends QueryModule {

  private val cfg = SizingConfig() // reference defaults (sizing.conf)
  private val keptLimit = 40 // same F4 prune threshold as q18–q20
  // Bucket count target: buckets are the unit of state AND parallelism —
  // a state-store group per bucket. Too fine (60s over a month = 43k
  // groups) and per-group state-store commit overhead dominates; too
  // coarse and one group sorts everything. ~8 buckets per core balances
  // both; correctness is bucket-width independent (spec-pinned).
  private val TargetBuckets = 256L

  private def q73(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val kept = QuerylogAdapter.derived(s, dir, cfg)
      .filter(col("min_executor_pod") <= keptLimit)
      .persist() // read 3×: interval collect, batch sweep (×2 inside)

    // Feed the memory stream. queryId is zero-padded so the streaming
    // String tiebreak orders identically to the batch operator's numeric
    // query_id sort (Q5 tie rule) — required for exact parity.
    val intervals = kept.select(
      format_string("%020d", col("query_id")).as("qid"),
      col("admitted_us"), col("end_us"),
      col("min_executor_pod").cast("long"),
      col("cache_b_per_backend").cast("long"),
      col("mem_b_per_backend").cast("long"),
      col("cpu_mv_per_backend").cast("long"),
      col("spill_b_per_backend").cast("long"))
      .collect()
      .map(r => QueryInterval(r.getString(0), usTs(r.getLong(1)),
        usTs(r.getLong(2)), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7)))
      .toSeq

    val maxEndUs = intervals.map(q => tsUs(q.end)).max
    val minAdmittedUs = intervals.map(q => tsUs(q.admitted)).min
    val bucketUs = math.max(1_000_000L,
      (maxEndUs - minAdmittedUs) / TargetBuckets + 1)
    // one sentinel interval far past every real bucket: its event time
    // advances the watermark so the real buckets' event-time timeouts fire
    val sentinelUs = maxEndUs + 10 * bucketUs
    val sentinelBucket = Math.floorDiv(sentinelUs, bucketUs)

    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[QueryInterval]
    val summaries = StreamingConcurrency.bucketSummaries(
      StreamingConcurrency.events(input.toDS(), bucketUs), bucketUs,
      "0 seconds")
    val qname = s"q73_${System.nanoTime()}"
    val query = summaries.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    val folded = try {
      // data + sentinel in ONE batch: the watermark advances to the
      // sentinel's instant after it, and the engine's automatic no-data
      // micro-batch then fires every real bucket's event-time timeout —
      // two micro-batches total instead of three.
      input.addData(intervals :+ QueryInterval("sentinel", usTs(sentinelUs),
        usTs(sentinelUs + bucketUs), 0, 0, 0, 0, 0))
      query.processAllAvailable()
      val closed = s.table(qname).as[BucketSummary].collect().toSeq
        .filter(_.bucket < sentinelBucket)
      GlobalAccumulator.fold(closed)
    } finally {
      query.stop()
      s.catalog.dropTempView(qname)
    }
    val m = folded.getOrElse(sys.error("q73: no closed buckets — empty querylog?"))

    // Parity against the batch operator on the same kept querylog.
    val b = Concurrency.maxima(Concurrency.sweep(kept)).head()
    kept.unpersist()
    val matches = b.getLong(0) == m.maxConcurrentQueries &&
      b.getLong(1) == m.maxPods && b.getLong(2) == m.maxCache &&
      b.getLong(3) == m.maxMem && b.getLong(4) == m.maxCpu &&
      b.getLong(5) == m.maxSpill && b.getLong(6) == m.maxPodsAtUs

    val schema = StructType(Seq(
      StructField("max_concurrent_queries", LongType, nullable = false),
      StructField("max_concurrent_pods", LongType, nullable = false),
      StructField("max_concurrent_cache_b", LongType, nullable = false),
      StructField("max_concurrent_mem_b", LongType, nullable = false),
      StructField("max_concurrent_cpu_mv", LongType, nullable = false),
      StructField("max_concurrent_spill_b", LongType, nullable = false),
      StructField("max_pods_at_us", LongType, nullable = false),
      StructField("matches_batch", BooleanType, nullable = false)))
    s.createDataFrame(
      java.util.Arrays.asList(Row(m.maxConcurrentQueries, m.maxPods,
        m.maxCache, m.maxMem, m.maxCpu, m.maxSpill, m.maxPodsAtUs,
        matches)),
      schema)
  }

  // --- q75: watermarked tumbling-window aggregation under the gate --------
  // Streams the events parquet through a real FILE source, watermarks on
  // event time, aggregates per (1-hour window, event_type) in APPEND mode
  // — the mode whose contract is the interesting one: a window row is
  // emitted exactly once, only after the watermark passes its end. The
  // final (still-open) windows are therefore correctly ABSENT from the
  // stream output; parity against batch asserts both the emitted values
  // and that emission boundary:
  //   streamed == batch rows with window_end <= max event time.
  // Sum parity uses floor(value*1000) longs — integer partial sums are
  // order-independent, so stream/batch/any-partitioning agree exactly.
  private def q75(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = s"$dir/events.parquet"
    // events.ts is TIMESTAMP(NANOS): surfaced as a nanos long
    // (legacy.parquet.nanosAsLong, same stance as Tables.load), re-typed
    // to a µs TimestampType column for the watermark.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(path).schema
    // events.ts is a nanos long; the µs TimestampType column the watermark
    // hangs off is derived once and shared by both sides (the watermark
    // tag lives on the event_ts attribute — it must flow into the window,
    // not be re-derived after the fact).
    def withEventTs(df: DataFrame): DataFrame =
      df.withColumn("event_ts", expr("timestamp_micros(ts div 1000)"))
    def windowed(df: DataFrame): DataFrame = df
      .groupBy(window(col("event_ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(expr("CAST(floor(value * 1000) AS BIGINT)")).as("sum_v"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("n_events"), col("sum_v"))

    val qname = s"q75_${System.nanoTime()}"
    // glob, not the bare file: FileStreamSource force-sets basePath to a
    // non-glob path and then requires it to be a directory
    val q = windowed(
      withEventTs(s.readStream.schema(schema)
          .parquet(s"$dir/events*.parquet"))
        .withWatermark("event_ts", "0 seconds"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    val streamed =
      try { q.processAllAvailable(); s.table(qname).collect() }
      finally { q.stop(); s.catalog.dropTempView(qname) }

    val events = Tables.load(s, dir, "events")
    val maxTsUs = events.agg(max(expr("ts div 1000"))).head().getLong(0)
    val batch = windowed(withEventTs(events))
      .filter(expr(s"unix_micros(w_start) + 3600000000L <= $maxTsUs"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    streamed.toSeq
      .map { r =>
        val key = (r.getTimestamp(0), r.getString(1))
        (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3),
          batch.get(key).contains((r.getLong(2), r.getLong(3))) &&
            batch.size == streamed.length)
      }
      .toDF("w_start", "event_type", "n_events", "sum_v", "matches_batch")
  }

  // --- q77: stream-stream interval join under the gate --------------------
  // The hardest streaming operator: two watermarked streams (views and
  // clicks, both read from the events file source) joined on user with a
  // time-range condition — the range bound is what lets the engine evict
  // join state once the watermark passes it, the contract that makes the
  // join runnable on an unbounded stream. Inner-join output for a finite
  // input is complete (state eviction happens only behind the watermark),
  // so the streamed match SET must equal the batch join exactly —
  // asserted per-row with the same transitive-parity scheme as q73–q75.
  private def q77(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = s.read.parquet(path).schema
    def side(df: DataFrame, kind: String, alias: String): DataFrame = df
      .filter(col("event_type") === kind)
      .select(
        col("event_id").as(s"${alias}_id"),
        col("user_id").as(s"${alias}_user"),
        expr("timestamp_micros(ts div 1000)").as(s"${alias}_ts"))
    def joined(views: DataFrame, clicks: DataFrame): DataFrame = views
      .join(clicks,
        col("v_user") === col("c_user") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("v_id"), col("c_id"), col("v_user").as("user_id"))

    def stream() = s.readStream.schema(schema).parquet(s"$dir/events*.parquet")
    val qname = s"q77_${System.nanoTime()}"
    val q = joined(
      side(stream(), "view", "v").withWatermark("v_ts", "0 seconds"),
      side(stream(), "click", "c").withWatermark("c_ts", "0 seconds"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    val streamed =
      try { q.processAllAvailable(); s.table(qname).collect() }
      finally { q.stop(); s.catalog.dropTempView(qname) }

    val events = Tables.load(s, dir, "events")
    val batch = joined(side(events, "view", "v"), side(events, "click", "c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    streamed.toSeq
      .map { r =>
        val t = (r.getLong(0), r.getLong(1), r.getLong(2))
        (t._1, t._2, t._3,
          batch.contains(t) && batch.size == streamed.length)
      }
      .toDF("v_id", "c_id", "user_id", "matches_batch")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_stream_sweep" -> q73 _,
    "q75_stream_window" -> q75 _,
    "q77_stream_join" -> q77 _)

  // not SQL-expressible (the oracle cannot run a stream) → rows-only check;
  // the matches_batch column carries the real assertion
  val oracleSql: Map[String, String] = Map.empty
}
