package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: dump per-doc simhash + token-hash intermediates for q27
  * cross-engine diffing.
  */
object DevSim {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val simhash =
      s"""aggregate(sequence(0, 59), 0L, (acc, j) ->
         |  acc + CASE WHEN aggregate(hs, 0L,
         |      (a, h) -> a + 2 * (shiftright(h, j) & 1) - 1) > 0
         |    THEN shiftleft(1L, j) ELSE 0L END)""".stripMargin
    Tables.load(spark, sfDir, "documents")
      .withColumn("hs", expr(
        s"transform(regexp_extract_all(text, '[a-z]+', 0)," +
          s" t -> ${ops.Dialect.sparkHash60("t")})"))
      .select(col("doc_id"), expr(simhash).as("sim"),
        expr("size(hs)").as("n_toks"), expr("hs[0]").as("h0"))
      .coalesce(1).write.mode("overwrite").parquet(outDir)
    spark.stop()
  }
}
