package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query entry point takes an `sfDir` (e.g. `/root/testdata/sf0.01`)
  * and reads only the tables it needs — Catalyst prunes columns and pushes
  * filters into the parquet scan, so "load" here is just a lazy plan node.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Older generator layouts carried events.ts as TIMESTAMP(NANOS), which
    // the vectorized reader rejects unless nanos are surfaced as a long
    // column. Runtime-settable, idempotent, and a no-op for µs layouts.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  /** Normalize the events frame to the library's internal contract:
    * `ts` = epoch NANOS as BIGINT. The generator has shipped two physical
    * layouts — TIMESTAMP(NANOS) (surfaced as a nanos long via
    * `legacy.parquet.nanosAsLong`) and TIMESTAMP(MICROS, NTZ) — and every
    * temporal operator (and its DuckDB oracle twin) is pinned to integer
    * nanos arithmetic, so the conversion happens ONCE here rather than in
    * each consumer. The NTZ value is naive UTC by the generator's
    * convention; the session timezone is pinned to UTC everywhere
    * (builder + javaOptions), so the LTZ cast below is value-preserving.
    * Works on streaming frames too (a stateless projection) — the
    * file-source entries route their post-`readStream` frame through it.
    */
  def normalizeEvents(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.LongType
    if (!df.schema.fieldNames.contains("ts") ||
        df.schema("ts").dataType == LongType) df
    else df.withColumn("ts",
      org.apache.spark.sql.functions.expr(
        "unix_micros(CAST(ts AS TIMESTAMP_LTZ)) * 1000"))
  }

  /** Register all tables as temp views so `spark.sql` users get the same
    * relational surface the reference exposes through its CSV pipeline.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
