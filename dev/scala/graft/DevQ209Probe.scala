package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage attribution for q209 dbscan at sf0.1. */
object DevQ209Probe {
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
    val n = time("pts count")(pts.count())
    val eps = ops.Similarity.adaptiveEpsMicro(n)
    println(s"n=$n eps=$eps")
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
    val np = time("pairs count")(pairs.count())
    println(s"pairs=$np")
    val cores = pairs.groupBy("a").agg(count(lit(1)).as("nn"))
      .filter(col("nn") >= 5).select(col("a").as("id"))
      .localCheckpoint(eager = false)
    println("cores=" + time("cores count")(cores.count()))
    val coreEdges = pairs
      .join(cores.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
      .join(cores.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
    val comp = time("CC total")(
      { val c = ops.Graph.connectedComponents(coreEdges, maxIter = 48)
        c.count(); c })
    time("q209 whole")(SparkEntry.queries("q209_dbscan")(spark, sfDir)
      .write.mode("overwrite").format("noop").save())
    time("q209 whole run2")(SparkEntry.queries("q209_dbscan")(spark, sfDir)
      .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
