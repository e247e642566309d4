package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: measured recall@10 of the q30 (SRP) and q41 (IVF) ANN
  * entries vs exact q29, per scale decade — the calibration evidence
  * behind q202's pinned floors.
  */
object DevRecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1", "/tmp/graft-sf1", "/tmp/graft-sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { d =>
      val exact = SparkEntry.queries("q29_knn_brute")(spark, d)
        .select(col("qid"), col("cid"))
      def rec(name: String): Seq[(Long, Long)] =
        SparkEntry.queries(name)(spark, d)
          .select(col("qid"), col("cid"))
          .join(exact, Seq("qid", "cid"))
          .groupBy("qid").agg(count(lit(1)).as("h"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
      // multi-probe SRP prototype: probe the query's bucket plus all
      // Hamming-1 neighbors (flip each of the w sign bits)
      def multiProbe(ham2: Boolean): Seq[(Long, Long)] = {
        graft.functions.GraftFunctions.ensureRegistered(spark)
        val e = Tables.load(spark, d, "embeddings")
        val w = ops.Similarity.adaptiveNPlanes(e.count())
        val cands = e.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cid"), col("embedding").as("cv"),
            ops.Similarity.srpSignature("embedding", w).as("sig"))
        val flips1 = (0 until w).map(p => s"CAST(sig ^ ${1L << p} AS BIGINT)")
        val flips2 = if (!ham2) Nil else (for {
          p <- 0 until w; q <- (p + 1) until w
        } yield s"CAST(sig ^ ${(1L << p) | (1L << q)} AS BIGINT)")
        val probeExprs = (Seq("CAST(sig AS BIGINT)") ++ flips1 ++ flips2)
          .mkString("array(", ", ", ")")
        val queries = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"),
            ops.Similarity.srpSignature("embedding", w).as("sig"))
          .withColumn("sig", explode(expr(probeExprs)))
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
        cands.join(broadcast(queries), "sig")
          .withColumn("sim", expr(
            "graft_dot(cv, qv) / (sqrt(graft_dot(cv, cv)) * " +
              "sqrt(graft_dot(qv, qv)))"))
          .select("qid", "cid", "sim").distinct()
          .withColumn("rn", row_number().over(win))
          .filter(col("rn") <= 10)
          .select(col("qid"), col("cid"))
          .join(exact, Seq("qid", "cid"))
          .groupBy("qid").agg(count(lit(1)).as("h"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
      }
      println(s"RECALL $d ivf=${rec("q41_ann_ivf")} srp=${rec("q30_ann_lsh")} " +
        s"srpMp1=${multiProbe(false)} srpMp2=${multiProbe(true)}")
    }
    spark.stop()
  }
}
