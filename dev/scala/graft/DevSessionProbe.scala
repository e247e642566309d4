package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Dev-only: pin the streaming session_window eviction boundary.
  * Three single-event users whose session ends sit at different margins
  * behind the final watermark: margin < gap, margin ≈ gap, margin > gap.
  * Which ones does append mode emit after the no-data batch?
  */
object DevSessionProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    implicit val ctx = s.sqlContext

    def ts(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    val base = 1700000000L * 1000000L
    val gapUs = 900L * 1000000L
    // (user, event µs): session end = event + 900s; watermark = max event
    val events = Seq(
      (1L, base),                          // end margin vs wm: 2000s - 900s = wm-end = 1100s > gap
      (2L, base + 1100L * 1000000L),       // end = base+2000s → margin 0? compute below
      (3L, base + 1993L * 1000000L + 207L),// end = base+2893.000207s → margin ~6.99s < gap
      (9L, base + 2900L * 1000000L))       // global max → wm = base+2900s
    // margins: u1 end=base+900s, wm-end=2000s (>gap). u2 end=base+2000s,
    // margin 900s (=gap). u3 end=base+2893.000207s, margin ~6.9998s (<gap).
    // u9 end=base+3800s (>wm, open).
    val input = MemoryStream[(Long, Timestamp)]
    val q = input.toDS().toDF("user", "event_ts")
      .withWatermark("event_ts", "0 seconds")
      .groupBy(session_window(col("event_ts"), "15 minutes"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(expr("unix_micros(session_window.start)").as("s"),
        expr("unix_micros(session_window.end)").as("e"), col("user"))
      .writeStream.format("memory").queryName("sessprobe")
      .outputMode("append").start()
    try {
      input.addData(events.map { case (u, us) => (u, ts(us)) })
      q.processAllAvailable()
      val rows = s.table("sessprobe").collect()
      val wm = base + 2900L * 1000000L
      println(s"wm(ms-trunc)=${Math.floorDiv(wm, 1000L) * 1000L}")
      rows.sortBy(_.getLong(2)).foreach { r =>
        println(s"user=${r.getLong(2)} end=${r.getLong(1)} margin=${(Math.floorDiv(wm,1000L)*1000L - r.getLong(1)) / 1e6}s")
      }
      println("emitted users: " + rows.map(_.getLong(2)).sorted.mkString(","))
    } finally q.stop()
    s.stop()
  }
}
