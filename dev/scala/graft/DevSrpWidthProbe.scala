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
      val edges = graft.ops.Similarity
        .cloneCollapsedNearDupEdges(vectors, nPlanes = p)
      // timed window covers EXACTLY one materialization of the edge
      // build; the star count runs on a cheap aggregate afterwards and
      // is excluded (a second full count would re-execute the pair join
      // and inflate the published number)
      val t0 = System.nanoTime()
      val counts = edges.select(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(col("a") > col("b"), 1L)
            .otherwise(0L)).as("stars")).collect().head
      val t = (System.nanoTime() - t0) / 1e9
      println(f"SRPWIDTH planes=$p%2d buckets=${1L << p}%7d n=$n%,d " +
        f"edges=${counts.getLong(0)}%,d (stars=${counts.getLong(1)}%,d) " +
        f"t=$t%.2fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
