package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: q206 candidate-stage cardinalities (emission fan-out audit). */
object DevQ206Emis {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tMilli = 900
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        array_distinct(split(lower(col("text")), " ")).as("tk"))
    val toks = docs
      .select(col("doc_id").as("__id"), col("tk").as("__tk"))
      .filter(size(col("__tk")) > 0)
    println("docs=" + toks.count())
    println("tok stats: " + toks.select(
      min(size(col("__tk"))), max(size(col("__tk"))),
      avg(size(col("__tk")))).head())
    val df = toks.select(explode(col("__tk")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    println("vocab=" + df.count())
    val ord = toks.select(col("__id"), explode(col("__tk")).as("tok"))
      .join(df, "tok")
      .groupBy("__id")
      .agg(sort_array(collect_list(struct(col("df"), col("tok"))))
        .as("ord"))
      .withColumn("l", size(col("ord")))
      .ckptLocal(eager = false)
    val pref = ord.select(col("__id"), col("l"),
      posexplode(expr(
        s"slice(ord, 1, greatest(l - ((${tMilli}L * l + 999) div 1000) + 1, 1))")))
      .select(col("__id"), col("l"), (col("pos") + 1).as("pp"),
        col("col.tok").as("tok"))
    println("prefixRows=" + pref.count())
    val joined = pref.select(col("__id").as("d1"), col("l").as("la"),
        col("pp").as("pa"), col("tok"))
      .join(pref.select(col("__id").as("d2"), col("l").as("lb"),
        col("pp").as("pb"), col("tok")), Seq("tok"))
      .filter(col("d1") < col("d2"))
    println("emissions_d1ltd2=" + joined.count())
    val kept = joined.filter(
      lit(1000L + tMilli) *
        (lit(1L) + least(col("la") - col("pa"), col("lb") - col("pb"))) >=
        lit(tMilli.toLong) * (col("la").cast("bigint") + col("lb")))
    println("emissions_posfiltered=" + kept.count())
    println("cand=" + kept.select("d1", "d2").distinct().count())
    spark.stop()
  }
}
