package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: q199 phase attribution (tmp write / stream drain / post). */
object DevQ199Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("graft-q199p").toString
    val docs = Tables.load(s, sfDir, "documents")
    time("tmp write") {
      docs.repartition(4, col("doc_id"))
        .write.mode("overwrite").parquet(s"$tmp/in")
    }
    val schema = s.read.parquet(s"$tmp/in").schema
    val sink = s"$tmp/sink"
    val K = 5
    time("stream drain") {
      graft.streaming.StreamConf.withStateParts(s, n = 8) {
        val q = graft.ops.DevQ199Access.grams(
            s.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in"),
            "text", K)
          .groupBy("g").agg(count(lit(1)).as("n"))
          .writeStream
          .outputMode("update")
          .foreachBatch { (batch: DataFrame, id: Long) =>
            batch.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(sink)
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
    }
    time("post (all)") {
      val appended = s.read.parquet(sink)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("batch_id").desc)
      val resolved = appended
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("g", "n")
        .ckptLocal(eager = false)
      val batchCounts = graft.ops.DevQ199Access.grams(docs, "text", K)
        .groupBy("g").agg(count(lit(1)).as("bn"))
      val jv = resolved.join(batchCounts, Seq("g"), "full_outer")
        .agg(coalesce(sum(when(col("n").isNull || col("bn").isNull ||
            col("n") =!= col("bn"), 1L).otherwise(0L)), lit(0L)),
          coalesce(sum(when(col("bn").isNotNull, 1L).otherwise(0L)), lit(0L)))
        .head()
      val be = appended.agg(countDistinct(col("batch_id")), count(lit(1))).head()
      val h = resolved.groupBy("n").agg(count(lit(1))).collect()
      (jv, be, h.length)
    }
    graft.Fs.deleteRecursively(java.nio.file.Paths.get(tmp))
    spark.stop()
  }
}
