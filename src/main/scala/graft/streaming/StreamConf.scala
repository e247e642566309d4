package graft.streaming

import org.apache.spark.sql.SparkSession

/** Session-conf scoping for the streaming parity harnesses.
  *
  * A Structured Streaming query captures `spark.sql.shuffle.partitions`
  * at START as its STATE partition count, and every micro-batch then
  * pays a state-store commit per partition. The battery's parity
  * harnesses carry tiny state (10²–10⁴ keys), so the session's 32
  * batch-shuffle partitions are pure commit overhead — measured at
  * sf0.1: 32 parts ≈ 1.9 s per processAllAvailable vs 4 parts ≈ 1.2 s
  * (DevQ75Probe). A production stream sizes this to its state volume
  * (state-rows ÷ target-rows-per-store), exactly as this helper's `n`;
  * the number is a deployment knob, not a semantic one.
  */
object StreamConf {
  /** Harness default: generous for 10⁴-key state, ¼ of the test cores. */
  val HarnessStateParts = 4

  /** Run `body` (which must both START and fully DRAIN its streaming
    * query) with `spark.sql.shuffle.partitions` = `n`, restoring the
    * caller's value after — batch twins in the same entry keep the
    * session's partitioning.
    *
    * SINGLE-THREADED BY ASSUMPTION: this mutates the session-global
    * conf and restores it on exit, which is only safe because battery
    * entries run sequentially on one session. A concurrent entry — or a
    * BATCH plan built inside `body`, which would capture `n` as its
    * shuffle parallelism — would be silently misconfigured. Keep batch
    * twins OUTSIDE the block (as every current call site does) and
    * never call this from parallel test suites sharing a session.
    */
  def withStateParts[T](s: SparkSession, n: Int = HarnessStateParts)(
      body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, old)
  }
}
