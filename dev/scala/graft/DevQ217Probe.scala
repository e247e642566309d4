package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for q217: exact recall leg vs LSH ensemble leg, plus
  * candidate-stage fan-out counts (bucket degeneracy check for the
  * single-row r=1 bands).
  */
object DevQ217Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = ops.Dedup.shingledDocs(spark, dir)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"Q217PROBE $label rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm
    docs.write.mode("overwrite").format("noop").save()

    time("words_explode")(Tables.load(spark, dir, "documents")
      .select(explode(split(lower(col("text")), " "))).count())
    time("shingles_explode")(docs.select(explode(col("tk"))).count())
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.CollapseProject")
    time("shingles_noCollapse")(docs.select(explode(col("tk"))).count())
    spark.conf.unset("spark.sql.optimizer.excludedRules")
    val docsCW = Tables.load(spark, dir, "documents")
      .withColumn("ws", split(lower(col("text")), " "))
      .select(col("doc_id"), expr(
        """array_distinct(CASE WHEN size(ws) >= 3
          |THEN transform(sequence(1, size(ws) - 2),
          |  i -> ws[i - 1] || ' ' || ws[i] || ' ' || ws[i + 1])
          |ELSE array() END)""".stripMargin).as("tk"))
    time("shingles_concatop")(docsCW.select(explode(col("tk"))).count())
    time("exact_leg")(ops.Dedup.containmentJoin(docs,
      probeIdFilter = Some(id => id % 4 === 0)).count())
    time("lsh_leg")(ops.Dedup.containmentLshJoin(
      docs.filter(col("doc_id") % 4 === 0), docs).count())

    // ---- stage decomposition of the exact leg (inline copy of
    // containmentJoin's internals, dev-only) ----
    val t = 900L
    val toks = docs
      .select(col("doc_id").as("__id"), col("tk").as("__tk"))
      .filter(size(col("__tk")) > 0)
    time("tok_explode")(toks.select(explode(col("__tk")).as("tok")).count())
    val dfreq = toks.select(explode(col("__tk")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    time("dfreq")(dfreq.count())
    val ord = toks.select(col("__id"), explode(col("__tk")).as("tok"))
      .join(dfreq, "tok")
      .groupBy("__id")
      .agg(sort_array(collect_list(struct(col("df"), col("tok"))))
        .as("ord"))
      .withColumn("tks", expr("transform(ord, p -> p.tok)"))
      .withColumn("l", size(col("ord")))
      .localCheckpoint(eager = false)
    time("ord_build")(ord.count())
    val prefSrc = ord.filter(col("__id") % 4 === 0)
    val pref = prefSrc.select(col("__id"), col("l"),
      explode(expr(
        s"slice(ord, 1, greatest(l - ((${t}L * l + 999) div 1000) + 1, 1))"))
        .as("p"))
      .select(col("__id").as("a"), col("l").as("la"), col("p.tok").as("tok"))
    time("pref")(pref.count())
    val post = ord.select(col("__id").as("b"), col("l").as("lb"),
        explode(col("tks")).as("tok"))
      .join(pref.select("tok").distinct(), Seq("tok"), "left_semi")
    time("post")(post.count())
    val cand = pref.join(post, Seq("tok"))
      .filter(col("a") =!= col("b") &&
        lit(t) * col("la") <= lit(1000L) * col("lb"))
      .select("a", "b").distinct()
    time("cand")(cand.count())
    val ver = cand
      .join(ord.select(col("__id").as("a"), col("tks").as("ta"),
        col("l").as("la")), "a")
      .join(ord.select(col("__id").as("b"), col("tks").as("tb")), "b")
      .withColumn("ov", size(array_intersect(col("ta"), col("tb"))))
      .filter(lit(1000L) * col("ov") >= lit(t) * col("la"))
    time("verify")(ver.count())
    spark.stop()
  }
}
