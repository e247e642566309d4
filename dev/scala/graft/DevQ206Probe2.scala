package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage attribution of q206 prefixFilteredJaccardJoin. */
object DevQ206Probe2 {
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
    val tMilli = 900
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        array_distinct(split(lower(col("text")), " ")).as("tk"))
    val toks = docs
      .select(col("doc_id").as("__id"), col("tk").as("__tk"))
      .filter(size(col("__tk")) > 0)
    val df = toks.select(explode(col("__tk")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    time("df agg")(df.count())
    val ord = toks.select(col("__id"), explode(col("__tk")).as("tok"))
      .join(df, "tok")
      .groupBy("__id")
      .agg(sort_array(collect_list(struct(col("df"), col("tok"))))
        .as("ord"))
      .withColumn("tks", expr("transform(ord, p -> p.tok)"))
      .withColumn("l", size(col("ord")))
      .ckptLocal(eager = false)
    time("ord build")(ord.count())
    val pref = ord.select(col("__id"), col("l"),
      posexplode(expr(
        s"slice(ord, 1, greatest(l - ((${tMilli}L * l + 999) div 1000) + 1, 1))")))
      .select(col("__id"), col("l"), (col("pos") + 1).as("pp"),
        col("col.tok").as("tok"))
    time("pref explode")(pref.count())
    val cand = pref.select(col("__id").as("d1"), col("l").as("la"),
        col("pp").as("pa"), col("tok"))
      .join(pref.select(col("__id").as("d2"), col("l").as("lb"),
        col("pp").as("pb"), col("tok")), Seq("tok"))
      .filter(col("d1") < col("d2") &&
        lit(1000L + tMilli) *
          (lit(1L) + least(col("la") - col("pa"), col("lb") - col("pb"))) >=
          lit(tMilli.toLong) * (col("la").cast("bigint") + col("lb")))
      .select("d1", "d2").distinct()
    val nc = time("cand join+distinct")(cand.count())
    println(s"candidates=$nc")
    val out = cand
      .join(ord.select(col("__id").as("d1"), col("tks").as("o1"),
        col("l").as("l1")), "d1")
      .join(ord.select(col("__id").as("d2"), col("tks").as("o2"),
        col("l").as("l2")), "d2")
      .withColumn("ov", size(array_intersect(col("o1"), col("o2"))))
      .filter(lit(1000L + tMilli) * col("ov") >=
        lit(tMilli.toLong) * (col("l1").cast("bigint") + col("l2")))
    val no = time("verify join")(out.count())
    println(s"pairs=$no")
    time("q206 whole")(SparkEntry.queries("q206_exact_simjoin")(spark, sfDir)
      .write.mode("overwrite").format("noop").save())
    time("q208 whole")(SparkEntry.queries("q208_containment_join")(spark, sfDir)
      .write.mode("overwrite").format("noop").save())
    time("q214 whole")(SparkEntry.queries("q214_exact_curation")(spark, sfDir)
      .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
