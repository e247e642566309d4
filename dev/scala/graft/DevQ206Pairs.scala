package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: q206/q208 OUTPUT-pair counts per decade — the denominator
  * for the time-per-pair read of the exact-join sweeps (an exact
  * similarity join must emit every qualifying pair, so wall time is
  * lower-bounded by output size; this probe separates "plan got slower"
  * from "answer got bigger"). */
object DevQ206Pairs {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = Seq(
      "sf0.1" -> "/root/testdata/sf0.1",
      "sf1" -> sys.env.getOrElse("GRAFT_SF1_DIR", "/tmp/graft-sf1")) ++
      (if (args.contains("sf10"))
        Seq("sf10" -> sys.env.getOrElse("GRAFT_SF10_DIR", "/tmp/graft-sf10"))
       else Nil)
    dirs.foreach { case (label, dir) =>
      val n = SparkEntry.queries("q206_exact_simjoin")(spark, dir).count()
      println(s"Q206PAIRS $label pairs=$n")
    }
    spark.stop()
  }
}
