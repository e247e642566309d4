package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge into spark-sql package-private API (hence the package name —
  * `Dataset.ofRows` and `LogicalRDD` are `private[sql]`): local
  * checkpointing with CLAMPED statistics.
  *
  * Why this exists (optimization round 17): `Dataset.localCheckpoint`
  * truncates lineage but deliberately CARRIES the un-truncated plan's
  * cost-based statistics into the new `LogicalRDD` leaf
  * (`originStats`), so broadcast decisions survive the checkpoint. For
  * ITERATIVE operators that is a time bomb: the size-only estimator
  * multiplies child `sizeInBytes` across a join, so a loop of the form
  *
  *   labels = labels.join(labels, ...).localCheckpoint(...)   // per round
  *
  * squares the estimate every round — the BigInt's BIT LENGTH doubles
  * per self-join (measured: 22 bits → 2,687 bits in 8 rounds), and
  * after ~20 checkpointed joins the driver spends SECONDS per planned
  * frame inside `BigInteger.multiply` (Karatsuba/Toom-Cook frames in
  * every thread dump) just to conclude "too big to broadcast".
  * Measured on q209's 815-vertex core graph: connectedComponents spent
  * ~15 s of its 17 s wall in driver-side planning over these numbers.
  *
  * The fix preserves every decision the planner could make: statistics
  * are kept UNCHANGED while `sizeInBytes` (and `rowCount`, which
  * explodes the same way) fit in a signed 64-bit long — the only
  * regime where their magnitude can flip a threshold comparison — and
  * `sizeInBytes` is clamped to `Long.MaxValue` beyond that, which
  * compares identically to the astronomic original against every size
  * threshold (broadcast, shuffled-hash, AQE advisories are all ≤ a few
  * GB); a still-sane `sizeInBytes` survives untouched when only
  * `rowCount` overflowed. `rowCount` and attribute-level stats are
  * DROPPED (not clamped) in that regime — they are products of the
  * same blown estimates — and the origin plan's constraints are
  * carried through unchanged, exactly as stock `localCheckpoint` does,
  * so constraint-propagation optimizations (inferred IsNotNull,
  * redundant-filter elimination) are identical on both paths. So:
  * identical plans, bounded planning arithmetic.
  */
object GraftPlanStats {
  private val MaxLong = BigInt(Long.MaxValue)

  /** `df.localCheckpoint(eager)` with the carried statistics clamped
    * into the 64-bit regime (no-op wrapper when they already fit). */
  def clampedLocalCheckpoint(df: Dataset[Row], eager: Boolean): DataFrame = {
    val ck = df.localCheckpoint(eager).asInstanceOf[classic.Dataset[Row]]
    ck.logicalPlan match {
      case lr: LogicalRDD =>
        val st = lr.stats
        val sane = st.sizeInBytes <= MaxLong &&
          st.rowCount.forall(_ <= MaxLong)
        if (sane) ck
        else {
          val fresh = LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            ck.sparkSession,
            // preserve a still-sane sizeInBytes when only rowCount
            // overflowed (practically unreachable, but the cheap min
            // keeps a would-be broadcast broadcastable)
            Some(Statistics(sizeInBytes = st.sizeInBytes.min(MaxLong))),
            // constraints are NOT statistics: carry the origin plan's
            // set through like stock localCheckpoint does
            Some(lr.constraints))
          classic.Dataset.ofRows(ck.sparkSession, fresh)
        }
      case _ => ck
    }
  }

  /** Dev/spec hook: the statistics the planner sees for `df`. */
  def planStats(df: Dataset[Row]): Statistics =
    df.queryExecution.optimizedPlan.stats
}
