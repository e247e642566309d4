package graft

import graft.sizing.{Pipeline, SizingConfig}
import org.apache.spark.sql.SparkSession

/** CLI mirroring `python impala_query_sizing.py sizing.conf` (py:58–69):
  * one arg = config path (key=value format), optional second arg = output
  * directory (default "."). Prints the five-section report.
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.Main <sizing.conf> [outDir]")
      sys.exit(1)
    }
    val cfg = SizingConfig.fromProperties(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(args(0)))))
    val outDir = if (args.length > 1) args(1) else "."
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-sizing")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try println(Pipeline.run(spark, cfg, outDir).render)
    finally spark.stop()
  }
}
