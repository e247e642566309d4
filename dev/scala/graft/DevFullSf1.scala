package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: FULL-battery sf1 pass — every `SparkEntry.queries` entry
  * executed once at sf0.1 and once at sf1 ([[DevMakeSf1]] output). The
  * per-entry [[DevScaleSweep]] covers the known-heavy ~30 with min-of-3
  * rigor; this closes the other ~160: a data term that only appears at
  * 6M rows (state growth, fan-out, skew) surfaces here as a failure or a
  * time ratio far above the 10× row ratio. Single-shot timing is enough
  * for outlier DETECTION — anything flagged gets re-measured min-of-3
  * via DevScaleSweep before it is believed.
  *
  * Output: one `FULLSF1 <name> sf0.1=<t>s sf1=<t>s x=<ratio>` line per
  * entry (x=-1 on failure), then a `FULLSF1TOTAL` summary with the
  * worst ratios. Recorded in PERF.md per round.
  *
  * Usage: `runMain graft.DevFullSf1 [startAt]` — optional entry name to
  * resume from (alphabetical order), for re-runs after a crash.
  */
object DevFullSf1 {
  def main(args: Array[String]): Unit = {
    val sf1Dir = sys.env.getOrElse("GRAFT_SF1_DIR", "/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def exec(n: String, dir: String): Unit =
      SparkEntry.queries(n)(spark, dir)
        .write.mode("overwrite").format("noop").save()

    val all = SparkEntry.queries.keys.toSeq.sorted
    val names = args.headOption match {
      case Some(start) =>
        // a typo'd resume point must fail loud, not run zero queries
        require(all.contains(start),
          s"unknown entry '$start' — valid: ${all.take(3).mkString(", ")} …")
        all.dropWhile(_ != start)
      case None => all
    }
    val results = names.map { n =>
      // warm once on the tiny tables so codegen/JIT never lands in a cell
      try { exec(n, "/root/testdata/sf0.001") }
      catch { case e: Throwable =>
        System.err.println(s"[fullsf1] warm $n FAILED: ${e.getMessage}") }
      spark.catalog.clearCache()
      def time(dir: String): Double =
        try {
          val t0 = System.nanoTime()
          exec(n, dir)
          val t = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          t
        } catch { case e: Throwable =>
          System.err.println(s"[fullsf1] $n @ $dir FAILED: ${e.getMessage}")
          spark.catalog.clearCache()
          -1.0
        }
      val t01 = time("/root/testdata/sf0.1")
      val t1 = time(sf1Dir)
      val ratio = if (t01 > 0 && t1 > 0) t1 / t01 else -1.0
      println(f"FULLSF1 $n%-28s sf0.1=$t01%7.2fs sf1=$t1%7.2fs x=$ratio%5.2f")
      (n, t01, t1, ratio)
    }
    val failed = results.filter(_._4 < 0).map(_._1)
    val worst = results.filter(_._4 > 0).sortBy(-_._4).take(8)
      .map { case (n, _, _, r) => f"$n=$r%.1fx" }
    println(f"FULLSF1TOTAL n=${results.size} " +
      f"sf0.1=${results.map(_._2).filter(_ > 0).sum}%.1fs " +
      f"sf1=${results.map(_._3).filter(_ > 0).sum}%.1fs " +
      s"failed=${failed.mkString(",")} worst=${worst.mkString(",")}")
    spark.stop()
  }
}
