package object graft {

  /** Library-wide replacement for `Dataset.localCheckpoint`: identical
    * semantics and lineage truncation, but the statistics carried into
    * the checkpointed leaf are clamped into the 64-bit regime (see
    * [[org.apache.spark.sql.GraftPlanStats]]). Every iterative operator
    * (connected components, k-core, Louvain, PageRank, SSSP, HITS,
    * k-means, …) checkpoints per round; with the stock method the
    * size-only join estimator's BigInt sizeInBytes DOUBLES ITS BIT
    * LENGTH per checkpointed self-join and the driver ends up spending
    * seconds per round in BigInteger.multiply during physical planning.
    * Plan CHOICES are unaffected: stats that fit a long are passed
    * through untouched, and a clamped Long.MaxValue compares identically
    * to the astronomic original against every planner threshold.
    */
  implicit final class CkptLocalOps(
      private val df: org.apache.spark.sql.DataFrame) extends AnyVal {
    def ckptLocal(eager: Boolean = true): org.apache.spark.sql.DataFrame =
      org.apache.spark.sql.GraftPlanStats.clampedLocalCheckpoint(df, eager)
  }
}
