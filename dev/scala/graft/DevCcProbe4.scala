package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: CC variant with EAGER per-round checkpoints — tests the
  * lineage-truncation-at-construction hypothesis. */
object DevCcProbe4 {
  def ccEager(edges: DataFrame, maxIter: Int = 48): DataFrame = {
    val pairs = edges.select(col("a"), col("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val verts = pairs
      .select(explode(array(col("a"), col("b"))).as("id")).distinct()
    val und = pairs.filter(col("a") =!= col("b"))
    val sym = und
      .union(und.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist()
    var labels = verts.select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val msgs = sym
        .join(labels.select(col("id").as("a"), col("comp").as("ca")), "a")
        .join(labels.select(col("id").as("b"), col("comp").as("cb")), "b")
        .select(col("ca").as("id"), col("cb").as("comp"))
      val hooked = labels.withColumn("own", lit(true))
        .unionByName(msgs.withColumn("own", lit(false)))
        .groupBy("id").agg(
          min(col("comp")).as("comp"),
          min(when(col("own"), col("comp"))).as("prev"))
        .localCheckpoint(true)
      changed = hooked.filter(col("comp") =!= col("prev")).count()
      labels = hooked.select(col("id"), col("comp"))
      var compressing = changed > 0
      var cstep = 0
      while (compressing) {
        if (cstep >= 64) throw new IllegalStateException("corrupt")
        val stepped = labels
          .join(labels.select(col("id").as("comp"), col("comp").as("jump")),
            "comp")
          .localCheckpoint(true)
        compressing = stepped.filter(col("jump") =!= col("comp")).count() > 0
        labels = stepped.select(col("id"), col("jump").as("comp"))
        cstep += 1
      }
      iter += 1
    }
    sym.unpersist()
    if (changed > 0) throw new IllegalStateException("no converge")
    labels
  }

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
      .localCheckpoint(eager = false)
    val cores = pairs.groupBy("a").agg(count(lit(1)).as("nn"))
      .filter(col("nn") >= 5).select(col("a").as("id"))
      .localCheckpoint(eager = false)
    val coreEdges = pairs
      .join(cores.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
      .join(cores.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
      .localCheckpoint(eager = true)
    println("coreEdges=" + coreEdges.count())
    val mainT = Thread.currentThread()
    val watcher = new Thread(() => {
      while (true) {
        Thread.sleep(1500)
        val st = mainT.getStackTrace
        println("STACK> " + st.take(12).mkString(" | "))
      }
    })
    watcher.setDaemon(true)
    watcher.start()
    val a = time("CC eager")(ccEager(coreEdges))
    time("CC eager count")(a.count())
    val b = time("CC eager run2")(ccEager(coreEdges))
    time("CC eager run2 count")(b.count())
    // cross-check identical output vs library
    val lib = ops.Graph.connectedComponents(coreEdges)
    val diff = a.withColumnRenamed("comp", "c1")
      .join(lib.withColumnRenamed("comp", "c2"), Seq("id"), "full_outer")
      .filter(not(col("c1") <=> col("c2"))).count()
    println(s"diff_vs_library=$diff")
    spark.stop()
  }
}
