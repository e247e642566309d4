package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Dev-only: per-round instrumented copy of Graph.connectedComponents. */
object DevCcProbe3 {
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
    val pts = Tables.load(spark, sfDir, "embeddings").select(
      col("vec_id").as("vid"),
      expr("CAST(floor(CAST(embedding[0] AS DOUBLE) * 1000000D) AS BIGINT)").as("x"),
      expr("CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000D) AS BIGINT)").as("y"))
    val eps = 10000L
    val binned = pts
      .withColumn("cx", expr(s"(x - pmod(x, ${eps}L)) div ${eps}L"))
      .withColumn("cy", expr(s"(y - pmod(y, ${eps}L)) div ${eps}L"))
    val probeDf = binned.select(col("vid").as("a"), col("x").as("ax"),
        col("y").as("ay"),
        explode(expr("flatten(transform(sequence(-1L, 1L), dx -> " +
          "transform(sequence(-1L, 1L), dy -> " +
          "struct(cx + dx AS cx, cy + dy AS cy))))")).as("nc"))
      .select(col("a"), col("ax"), col("ay"),
        col("nc.cx").as("cx"), col("nc.cy").as("cy"))
    val pairs = probeDf
      .join(binned.select(col("vid").as("b"), col("x").as("bx"),
        col("y").as("by"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter((col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by")) <=
        lit(eps * eps))
      .select("a", "b")
      .localCheckpoint(eager = true)
    val cores = pairs.groupBy("a").agg(count(lit(1)).as("nn"))
      .filter(col("nn") >= 5).select(col("a").as("id"))
      .localCheckpoint(eager = true)
    val edges = pairs
      .join(cores.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
      .join(cores.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
      .localCheckpoint(eager = true)
    println("edges=" + edges.count())
    time("CC library")(ops.Graph.connectedComponents(edges).count())

    // instrumented CC copy
    val pairs2 = edges.select(col("a"), col("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val verts = pairs2
      .select(explode(array(col("a"), col("b"))).as("id")).distinct()
    val und = pairs2.filter(col("a") =!= col("b"))
    val sym = und
      .union(und.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist()
    var labels = time("init labels")(
      verts.select(col("id"), col("id").as("comp")).localCheckpoint(true))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 48) {
      val msgs = sym
        .join(labels.select(col("id").as("a"), col("comp").as("ca")), "a")
        .join(labels.select(col("id").as("b"), col("comp").as("cb")), "b")
        .select(col("ca").as("id"), col("cb").as("comp"))
      val hooked = labels.withColumn("own", lit(true))
        .unionByName(msgs.withColumn("own", lit(false)))
        .groupBy("id").agg(
          min(col("comp")).as("comp"),
          min(when(col("own"), col("comp"))).as("prev"))
        .localCheckpoint(false)
      changed = time(s"round $iter hook+count")(
        hooked.filter(col("comp") =!= col("prev")).count())
      labels = hooked.select(col("id"), col("comp"))
      var compressing = changed > 0
      var cstep = 0
      while (compressing) {
        val stepped = labels
          .join(labels.select(col("id").as("comp"), col("comp").as("jump")),
            "comp")
          .localCheckpoint(false)
        compressing = time(s"round $iter compress $cstep")(
          stepped.filter(col("jump") =!= col("comp")).count() > 0)
        labels = stepped.select(col("id"), col("jump").as("comp"))
        cstep += 1
      }
      iter += 1
    }
    println(s"rounds=$iter")
    spark.stop()
  }
}
