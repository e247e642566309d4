package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: attribute q50's scale curve — pair generation vs component
  * rounds, pair/edge counts per sf (is a superlinear wall-clock a plan
  * term or a data term?).
  */
object DevQ50Probe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    dirs.foreach { dir =>
      println(s"== $dir")
      graft.functions.GraftFunctions.ensureRegistered(spark)
      val docs = Tables.load(spark, dir, "documents")
      val sigs = ops.Dedup.minHashSignatures(docs).persist()
      t("sigs_materialize")(sigs.count())
      val cand = t("candidates") {
        val c = ops.Dedup.lshCandidates(sigs).persist()
        println(s"PROBE n_candidates ${c.count()}"); c
      }
      val edges = t("verify") {
        val e = ops.Dedup.verifyJaccard(cand, sigs)
          .filter(col("jac") >= 0.6)
          .select(col("d1").as("a"), col("d2").as("b")).persist()
        println(s"PROBE n_edges ${e.count()}"); e
      }
      t("components") {
        val comp = ops.Graph.connectedComponents(edges)
        println(s"PROBE n_vertices ${comp.count()}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
