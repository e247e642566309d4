package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: FULL-battery sf10 pass — every `SparkEntry.queries` entry
  * executed once at sf1 and once at sf10 (the chained [[DevMakeSf1]]
  * output, 60M-row lineitem). The round-12 sf10 decade covered only the
  * ~10-entry audit set; this closes the rest at the decade that
  * actually bites: a data term invisible at 6M rows (state growth,
  * fan-out, bucket skew) surfaces here as a failure or a ratio far
  * above the 10× row ratio. Single-shot timing — outlier DETECTION
  * only; flagged entries get re-measured min-of-3 via DevScaleSweep
  * before being believed.
  *
  * Output: one `FULLSF10 <name> sf1=<t>s sf10=<t>s x=<ratio>` line per
  * entry (x=-1 on failure), then a `FULLSF10TOTAL` summary. Recorded in
  * PERF.md per round.
  *
  * Usage: `runMain graft.DevFullSf10 [startAt]` — optional entry name
  * to resume from (alphabetical order), for re-runs after a crash.
  */
object DevFullSf10 {
  def main(args: Array[String]): Unit = {
    val sf1Dir = sys.env.getOrElse("GRAFT_SF1_DIR", "/tmp/graft-sf1")
    val sf10Dir = sys.env.getOrElse("GRAFT_SF10_DIR", "/tmp/graft-sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // q126's complete-mode memory-sink gate collects the full gram
      // table on the driver (~1.05 GiB serialized at sf10 — measured;
      // the default 1 GiB cap kills the stream). Deliberate harness
      // cost: the gate needs the whole state table for its full-outer
      // diff; q199 is the update-mode serving shape.
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def exec(n: String, dir: String): Unit =
      SparkEntry.queries(n)(spark, dir)
        .write.mode("overwrite").format("noop").save()

    val all = SparkEntry.queries.keys.toSeq.sorted
    // `[startAt]` resumes alphabetically; `--only a,b,c` runs just the
    // listed entries (crash-failure re-runs).
    val names = args.toSeq match {
      case Seq("--only", list) =>
        val picked = list.split(',').toSeq
        picked.foreach(n => require(all.contains(n), s"unknown entry '$n'"))
        picked
      case Seq(start) =>
        require(all.contains(start),
          s"unknown entry '$start' — valid: ${all.take(3).mkString(", ")} …")
        all.dropWhile(_ != start)
      case Seq() => all
      case _ => sys.error("usage: DevFullSf10 [startAt | --only a,b]")
    }
    val results = names.map { n =>
      try { exec(n, "/root/testdata/sf0.001") }
      catch { case e: Throwable =>
        System.err.println(s"[fullsf10] warm $n FAILED: ${e.getMessage}") }
      spark.catalog.clearCache()
      def time(dir: String): Double =
        try {
          val t0 = System.nanoTime()
          exec(n, dir)
          val t = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          t
        } catch { case e: Throwable =>
          System.err.println(s"[fullsf10] $n @ $dir FAILED: ${e.getMessage}")
          spark.catalog.clearCache()
          -1.0
        }
      val t1 = time(sf1Dir)
      val t10 = time(sf10Dir)
      val ratio = if (t1 > 0 && t10 > 0) t10 / t1 else -1.0
      println(f"FULLSF10 $n%-28s sf1=$t1%7.2fs sf10=$t10%8.2fs x=$ratio%5.2f")
      (n, t1, t10, ratio)
    }
    val failed = results.filter(_._4 < 0).map(_._1)
    val worst = results.filter(_._4 > 0).sortBy(-_._4).take(10)
      .map { case (n, _, _, r) => f"$n=$r%.1fx" }
    println(f"FULLSF10TOTAL n=${results.size} " +
      f"sf1=${results.map(_._2).filter(_ > 0).sum}%.1fs " +
      f"sf10=${results.map(_._3).filter(_ > 0).sum}%.1fs " +
      s"failed=${failed.mkString(",")} worst=${worst.mkString(",")}")
    spark.stop()
  }
}
