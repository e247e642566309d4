package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: compare bench action strategies (full-plan execution cost). */
object DevSim {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q38_approx_distinct")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"ACTION $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    names.foreach { n =>
      def df = SparkEntry.queries(n)(spark, sfDir)
      time(s"$n warm-count")(df.count())
      time(s"$n count")(df.count())
      time(s"$n collect")(df.collect())
      time(s"$n noop-write")(df.write.mode("overwrite").format("noop").save())
      time(s"$n toRdd")(df.queryExecution.toRdd.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
