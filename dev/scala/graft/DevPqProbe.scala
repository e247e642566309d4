package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: per-query recall@10 of the IVF-PQ ADC pipeline vs exact
  * q29, against the q41 coarse-IVF ceiling (same anchors + nProbe), for
  * several shortlist sizes — the calibration evidence behind q205's
  * pinned floor and PqShortlist default.
  */
object DevPqProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { d =>
      val exact = SparkEntry.queries("q29_knn_brute")(spark, d)
        .select(col("qid"), col("cid")).localCheckpoint()
      def rec(df: DataFrame): Seq[(Long, Long)] =
        df.select(col("qid"), col("cid"))
          .join(exact, Seq("qid", "cid"))
          .groupBy("qid").agg(count(lit(1)).as("h"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
      val e = Tables.load(spark, d, "embeddings")
      val cands = e.filter(col("vec_id") >= 5)
      val qs = e.filter(col("vec_id") < 5)
      val anchors = e.filter(col("vec_id") >= 5 && col("vec_id") < 21)
        .select(col("vec_id").as("cell"), col("embedding").as("av"))
      println(s"PQPROBE dir=$d ivf_ceiling=" +
        rec(SparkEntry.queries("q41_ann_ivf")(spark, d)).mkString(","))
      val seed = e.filter(col("vec_id") >= 21 &&
        col("vec_id") < 21 + ops.Similarity.PqK)
      println(s"PQPROBE dir=$d K=${ops.Similarity.PqK} shortlist=adaptive " +
        "recall=" +
        rec(ops.Similarity.ivfPqTopK(cands, qs, anchors, seed)).mkString(","))
    }
    spark.stop()
  }
}
