package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnose q180's expectation mismatch: print the stream-emitted window
  * set vs the batch-derived expected set, plus the watermark-drop ledger
  * vs |early|.
  *
  * Deliberately lands the early half MULTI-FILE (unlike the entry, which
  * coalesces to one part file): the live query polls the directory while
  * the batch write renames task files into place, so a slow multi-file
  * commit can straddle a listing and split the early half across
  * micro-batches — double-counting windows in the per-batch drop
  * ledger. This probe is the reproducer for that race (seen at sf1/sf10
  * under local[32]); the per-batch PROBE lines make the split visible.
  */
object DevQ180Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("timestamp_micros(ts div 1000)").as("event_ts"))
    val tMidUs = ev.agg(
        ((min(expr("unix_micros(event_ts)"))
          + max(expr("unix_micros(event_ts)"))) / lit(2L)).cast("long"))
      .head().getLong(0)
    val early = ev.filter(expr(s"unix_micros(event_ts) < ${tMidUs}L"))
    val late = ev.filter(expr(s"unix_micros(event_ts) >= ${tMidUs}L"))
    val nEarly = early.count()

    val scratch = java.nio.file.Files
      .createTempDirectory("graft-q180probe-").toString
    val qname = "q180probe"
    try {
      late.write.mode("append").parquet(scratch)
      val q = s.readStream.schema(ev.schema).parquet(scratch)
        .withWatermark("event_ts", "0 seconds")
        .groupBy(window(col("event_ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(expr("unix_micros(w.start)").as("w_start_us"),
          col("n_events"))
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      q.processAllAvailable()
      val afterB1 = s.table(qname).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      early.write.mode("append").parquet(scratch)
      q.processAllAvailable()
      q.recentProgress.toSeq.foreach { p =>
        val d = p.stateOperators.toSeq.map(_.numRowsDroppedByWatermark).sum
        if (p.numInputRows > 0 || d > 0)
          println(s"PROBE batch=${p.batchId} inputRows=${p.numInputRows} " +
            s"dropped=$d")
      }
      val drops = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq)
        .map(_.numRowsDroppedByWatermark).sum
      val rows = s.table(qname).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      q.stop()

      val wmUs = late.agg(max(expr("unix_micros(event_ts)")))
        .head().getLong(0) / 1000 * 1000
      val expected = late
        .groupBy(window(col("event_ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(expr("unix_micros(w.start)").as("w_start_us"),
          col("n_events"), expr("unix_micros(w.end)").as("w_end_us"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val expClosed = expected.filter(_._3 <= wmUs)
        .map(t => (t._1, t._2)).toMap

      println(s"PROBE nEarly=$nEarly drops=$drops")
      println(s"PROBE emitted=${rows.length} afterB1=${afterB1.size} " +
        s"expectedClosed=${expClosed.size} allLateWindows=${expected.length}")
      val emittedMap = rows.toMap
      val onlyEmitted = emittedMap.keySet -- expClosed.keySet
      val onlyExpected = expClosed.keySet -- emittedMap.keySet
      println(s"PROBE onlyEmitted=${onlyEmitted.toSeq.sorted.take(5)}")
      println(s"PROBE onlyExpected=${onlyExpected.toSeq.sorted.take(5)}")
      val countDiff = emittedMap.keySet.intersect(expClosed.keySet)
        .filter(k => emittedMap(k) != expClosed(k))
      println(s"PROBE countDiffs=${countDiff.toSeq.sorted.take(5)
        .map(k => (k, emittedMap(k), expClosed(k)))}")
      println(s"PROBE wmUs=$wmUs maxLate=${wmUs}")
      // was the mismatched window emitted in batch 1 or 2?
      val b2 = emittedMap.keySet -- afterB1.keySet
      println(s"PROBE emittedInBatch2=${b2.toSeq.sorted.take(5)}")
    } finally {
      Fs.deleteRecursively(java.nio.file.Paths.get(scratch))
    }
    s.stop()
  }
}
