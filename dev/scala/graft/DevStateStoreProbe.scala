package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: per-backend cost of the gated streaming entries — the price
  * of the RocksDB default at harness (tiny-state) scale. Each entry runs
  * min-of-3 under each backend via the session conf the entries read.
  */
object DevStateStoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = Seq("q73_stream_sweep", "q74_stream_dedup",
      "q75_stream_window", "q77_stream_join", "q78_session_window",
      "q84_stream_sliding", "q96_stream_checksum", "q105_stream_neardup",
      "q122_stream_ivf", "q126_stream_dupgrams")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val cells = Seq("hdfs", "rocksdb").map { b =>
        spark.conf.set(graft.streaming.StreamConf.StateStoreKey, b)
        run(n) // warm
        val t = (1 to 3).map(_ => run(n)).min
        f"$b=$t%.2fs"
      }
      println(s"SSPROBE $n  ${cells.mkString("  ")}")
    }
    spark.stop()
  }
}
