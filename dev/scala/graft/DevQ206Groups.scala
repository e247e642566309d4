package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: identical-token-set group audit for q206/q208. */
object DevQ206Groups {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        array_distinct(split(lower(col("text")), " ")).as("tk"))
      .filter(size(col("tk")) > 0)
    val g = docs.groupBy(sort_array(col("tk")).as("s"))
      .agg(count(lit(1)).as("n"))
    println("q206 groups=" + g.count())
    println("q206 groupsize: " + g.select(min("n"), max("n"), avg("n")).head())
    val sh = graft.ops.Dedup.shingledDocs(spark, sfDir)
      .filter(size(col("tk")) > 0)
    val g2 = sh.groupBy(sort_array(col("tk")).as("s"))
      .agg(count(lit(1)).as("n"))
    println("q208 groups=" + g2.count())
    println("q208 groupsize: " + g2.select(min("n"), max("n"), avg("n")).head())
    spark.stop()
  }
}
