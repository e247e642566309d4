package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: attribute connectedComponents' per-round fixed cost.
  * Times CC on q209's core eps-graph under config variants.
  */
object DevCcProbe2 {
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
      .localCheckpoint(eager = false)
    val probe = binned.select(col("vid").as("a"), col("x").as("ax"),
        col("y").as("ay"),
        explode(expr("flatten(transform(sequence(-1L, 1L), dx -> " +
          "transform(sequence(-1L, 1L), dy -> " +
          "struct(cx + dx AS cx, cy + dy AS cy))))")).as("nc"))
      .select(col("a"), col("ax"), col("ay"),
        col("nc.cx").as("cx"), col("nc.cy").as("cy"))
    val pairs = probe
      .join(binned.select(col("vid").as("b"), col("x").as("bx"),
        col("y").as("by"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter((col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by")) <=
        lit(eps * eps))
      .select("a", "b")
      .localCheckpoint(eager = false)
    val cores = pairs.groupBy("a").agg(count(lit(1)).as("nn"))
      .filter(col("nn") >= 5).select(col("a").as("id"))
      .localCheckpoint(eager = false)
    val coreEdges = pairs
      .join(cores.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
      .join(cores.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
      .localCheckpoint(eager = true)
    println("coreEdges=" + coreEdges.count())

    // variant 1: as shipped
    val ccres = time("CC call")(ops.Graph.connectedComponents(coreEdges))
    time("CC final count")(ccres.count())
    time("CC final count2")(ccres.count())
    time("CC default run2")(ops.Graph.connectedComponents(coreEdges).count())
    // variant 2: AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("CC aqe-off")(ops.Graph.connectedComponents(coreEdges).count())
    time("CC aqe-off run2")(ops.Graph.connectedComponents(coreEdges).count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // variant 3: shuffle partitions 4
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    time("CC sp=4")(ops.Graph.connectedComponents(coreEdges).count())
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()
  }
}
