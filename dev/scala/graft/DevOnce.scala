package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: SINGLE-SHOT timing of named battery entries on one sfDir —
  * the harness for decade-steps where min-of-3 is unaffordable (sf30
  * heavyweights: one q214 pass is tens of minutes there). Single-shots
  * are noisier than DevScaleSweep's min-of-3; PERF.md entries citing
  * this harness say so, and cross-harness deltas under ~3× are
  * measurement condition, not plan change (see the verify skill's
  * localCheckpoint-accumulation gotcha).
  *
  * Usage: `runMain graft.DevOnce <sfDir> <entry> [entry...]`
  */
object DevOnce {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DevOnce <sfDir> <entry> [entry...]")
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def exec(n: String, dir: String): Unit =
      SparkEntry.queries(n)(spark, dir)
        .write.mode("overwrite").format("noop").save()
    names.foreach { n =>
      exec(n, "/root/testdata/sf0.001") // warm JIT/codegen
      spark.catalog.clearCache()
      val rows = spark.read.parquet(s"$sfDir/documents.parquet").count()
      val t0 = System.nanoTime()
      exec(n, sfDir)
      println(f"ONCE $n $sfDir ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(documents=$rows%,d)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
