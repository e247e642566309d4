package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing probes for the heavy dedup/LSH ops. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    time("docs.count")(docs.count())

    val shingles =
      """array_distinct(transform(
        |  sequence(1, greatest(size(regexp_extract_all(text, '[a-z]+', 0)) - 2, 1)),
        |  i -> array_join(slice(regexp_extract_all(text, '[a-z]+', 0), i, 3), ' ')))"""
        .stripMargin
    val sh = docs.withColumn("sh", expr(shingles))
    time("shingles only")(
      sh.select(sum(expr("size(sh)"))).head)
    val mh = sh.withColumn("mh",
      expr("graft_minhash(graft_hash60_array(sh, 2147483647), 12, 2147483647)"))
    time("shingles+hash+minhash")(
      mh.select(sum(expr("aggregate(mh, 0L, (a,x) -> a+x)"))).head)
    spark.stop()
  }
}
