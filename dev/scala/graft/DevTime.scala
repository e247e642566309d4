package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time specific SparkEntry queries with the driver's bench
  * config (local[N], N shuffle partitions), repeated, plus plan dump.
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q2_join_agg", "q3_topk", "q20_sweepline")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // q126's complete-mode gate collects ~1 GiB on the driver at sf10
      // (see DevFullSf10) — same headroom here for ad-hoc sf10 timings
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink, same as Bench: count() would let column pruning drop the
    // projected expressions and time a parquet row-count instead.
    def exec(n: String, dir: String): Unit =
      SparkEntry.queries(n)(spark, dir)
        .write.mode("overwrite").format("noop").save()
    names.foreach { n =>
      exec(n, "/root/testdata/sf0.001") // warm
      spark.catalog.clearCache()
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        exec(n, sfDir)
        println(f"TIMING $n run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache() // match Bench: per-query cache scope
      }
    }
    spark.stop()
  }
}
