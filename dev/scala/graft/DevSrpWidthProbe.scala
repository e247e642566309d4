package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev-only: the SRP width knob, demonstrated at the sf10 decade.
  *
  * The round-12 sweep measured q125/q127 going 41× for the 10× step to
  * sf10 — fixed 8-plane SRP means 256 buckets forever, so bucket load
  * grows linearly with the corpus and candidate-pair work quadratically.
  * This probe times the near-dup edge build (clone-collapsed, the
  * q125/q127 core) at several plane widths on the same corpus: widening
  * planes with log₂(n) restores the flat profile, which is exactly how
  * a deployment sizes the knob (`nPlanes ≈ log₂(n / target_load)`).
  *
  * Usage: `runMain graft.DevSrpWidthProbe [sfDir] [planes...]`
  */
object DevSrpWidthProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf10")
    val planes = if (args.length > 1) args.tail.map(_.toInt).toSeq
      else Seq(8, 12, 16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vectors = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = vectors.count()
    planes.foreach { p =>
      val t0 = System.nanoTime()
      val edges = graft.ops.Similarity
        .cloneCollapsedNearDupEdges(vectors, nPlanes = p)
      val nEdges = edges.count()
      val stars = edges.filter(col("a") > col("b")).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"SRPWIDTH planes=$p%2d buckets=${1L << p}%7d n=$n%,d " +
        f"edges=$nEdges%,d (stars=$stars%,d) t=$t%.2fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
