package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: attribute q107's wall-clock — edge build vs rank rounds. */
object DevQ107Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 3).foreach { i =>
      val edges = ops.Graph.tradeEdges(spark, sfDir).persist()
      t(s"edges_materialize_$i")(edges.count())
      val pr = ops.Graph.pageRank(edges, 3, smallVertexSet = true)
      t(s"rounds_$i")(pr.write.mode("overwrite").format("noop").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
