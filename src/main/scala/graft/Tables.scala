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
    // events.parquet carries TIMESTAMP(NANOS), which the vectorized reader
    // rejects unless nanos are surfaced as a long column. Runtime-settable,
    // idempotent, and harmless for the other tables.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register all tables as temp views so `spark.sql` users get the same
    * relational surface the reference exposes through its CSV pipeline.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
