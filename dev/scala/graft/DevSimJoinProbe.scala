package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: prefixFilteredJaccardJoin (q206) cardinality + runtime per
  * decade — the output of an exact all-pairs-above-threshold join is
  * inherently corpus-shaped (quadratic where the corpus has large
  * near-identical groups), so this measures both the pair count and the
  * wall time to decide the battery-entry shape and document the scale
  * story honestly.
  */
object DevSimJoinProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { d =>
      val t0 = System.nanoTime()
      val toks = Tables.load(spark, d, "documents")
        .select(col("doc_id"),
          array_distinct(split(lower(col("text")), " ")).as("tk"))
      val n = ops.Dedup.prefixFilteredJaccardJoin(toks).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"SIMJOIN dir=$d pairs=$n%,d t=$t%.2fs")
    }
    spark.stop()
  }
}
