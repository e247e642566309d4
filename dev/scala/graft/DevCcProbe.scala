package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: round-by-round convergence trace of the
  * [[graft.ops.Graph.connectedComponents]] loop on q209's sf0.1 core
  * graph — run after the sf0.1 non-convergence to see whether label
  * propagation is doubling (log d rounds) or creeping (linear).
  *
  * NOTE: this is a deliberate SNAPSHOT of the round-13 loop (and of
  * dbscan's grid pairing) kept for the PERF.md trace provenance — it is
  * NOT wired to the production code. If connectedComponents changes,
  * re-derive the trace rather than trusting this copy. */
object DevCcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val pts = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id").as("__id"),
        expr("CAST(floor(CAST(embedding[0] AS DOUBLE) * 1000000D) AS BIGINT)")
          .as("x"),
        expr("CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000D) AS BIGINT)")
          .as("y"))
    val eps = 10000L
    val binned = pts
      .withColumn("cx", expr(s"(x - pmod(x, ${eps}L)) div ${eps}L"))
      .withColumn("cy", expr(s"(y - pmod(y, ${eps}L)) div ${eps}L"))
    val probe = binned.select(col("__id").as("a"), col("x").as("ax"),
        col("y").as("ay"),
        explode(expr("flatten(transform(sequence(-1L, 1L), dx -> " +
          "transform(sequence(-1L, 1L), dy -> " +
          "struct(cx + dx AS cx, cy + dy AS cy))))")).as("nc"))
      .select(col("a"), col("ax"), col("ay"),
        col("nc.cx").as("cx"), col("nc.cy").as("cy"))
    val pairs = probe
      .join(binned.select(col("__id").as("b"), col("x").as("bx"),
        col("y").as("by"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter((col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by")) <=
        lit(eps * eps))
      .select("a", "b").persist()
    val cores = pairs.groupBy("a").agg(count(lit(1)).as("nn"))
      .filter(col("nn") >= 5).select(col("a").as("id")).persist()
    val edges = pairs
      .join(cores.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
      .join(cores.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
      .persist()
    println(s"CCPROBE cores=${cores.count()} edges=${edges.count()}")

    // replicate the connectedComponents hook+compression loop with a
    // per-round trace (same shape as Graph.connectedComponents)
    val verts = edges.select(explode(array(col("a"), col("b"))).as("id"))
      .distinct()
    val und = edges.select(col("a"), col("b"))
      .filter(col("a") =!= col("b"))
    val sym = und.union(und.select(col("b").as("a"), col("a").as("b")))
      .distinct().persist()
    var labels = verts.select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 60) {
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
      changed = hooked.filter(col("comp") =!= col("prev")).count()
      labels = hooked.select(col("id"), col("comp"))
      var steps = 0
      var compressing = changed > 0
      while (compressing) {
        val stepped = labels
          .join(labels.select(col("id").as("comp"), col("comp").as("jump")),
            "comp")
          .localCheckpoint(false)
        compressing = stepped.filter(col("jump") =!= col("comp")).count() > 0
        labels = stepped.select(col("id"), col("jump").as("comp"))
        steps += 1
      }
      iter += 1
      println(s"CCPROBE round=$iter changed=$changed compressSteps=$steps")
    }
    println(s"CCPROBE done iter=$iter comps=" +
      labels.select("comp").distinct().count())
    spark.stop()
  }
}
