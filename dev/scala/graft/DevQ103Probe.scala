package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: attribute q103's flat ~2.4 s cost — planning/codegen vs
  * execution (run the same entry repeatedly in one session; a per-plan
  * compile cost repeats, a JIT cost amortizes).
  */
object DevQ103Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
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
    (1 to 4).foreach { i =>
      t(s"q103_run$i") {
        SparkEntry.queries("q103_domain_cap_etld")(spark, dir)
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
    }
    (1 to 2).foreach { i =>
      t(s"q102_run$i") {
        SparkEntry.queries("q102_domain_cap")(spark, dir)
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
    }
    // planning only: build the frame + analyzed/optimized plan, no action
    t("q103_plan_only") {
      SparkEntry.queries("q103_domain_cap_etld")(spark, dir)
        .queryExecution.executedPlan
    }
    // codegen attribution: same entry with whole-stage codegen off
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    (1 to 2).foreach { i =>
      t(s"q103_noWSCG_run$i") {
        SparkEntry.queries("q103_domain_cap_etld")(spark, dir)
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
    }
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    (1 to 2).foreach { i =>
      t(s"q103_interp_run$i") {
        SparkEntry.queries("q103_domain_cap_etld")(spark, dir)
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
