package graft.sizing

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Predicate routing (SURVEY §2.3, F2–F4): one input stream fans out into
  * skip / prune / keep flows, mirroring the reference's three output files
  * (py:197–200, 262–269, 336).
  *
  * Each branch is a filter over the SAME scan — Catalyst collapses shared
  * plan prefixes, and at 100 TB each branch pushes its predicate into the
  * parquet scan rather than materializing the whole input.
  */
object Routing {

  /** F2: rows missing the memory metric are skipped before derivation
    * (py:197–200) — they would poison every downstream formula.
    */
  def skipPredicate: Column = col("reqd_agg_mem").isNull

  /** F3: optional client-side pool filter (py:211–212). */
  def poolFilter(df: DataFrame, cfg: SizingConfig): DataFrame =
    cfg.pool.map(p => df.filter(col("pool") === lit(p))).getOrElse(df)

  /** F4: the prune split on the rounded overall pod count (py:262–269).
    * Returns (kept, pruned). NOTE Q10: the reference counts total_queries
    * BEFORE this split, so callers aggregate A1 over `kept ∪ pruned`.
    */
  def pruneSplit(derived: DataFrame, cfg: SizingConfig)
      : (DataFrame, DataFrame) = {
    val over = col("min_executor_pod") > cfg.podLimit
    (derived.filter(!over), derived.filter(over))
  }

  /** Three-way routing over a raw querylog: (skipped, kept, pruned).
    * Derivation runs only on non-skipped rows.
    */
  def route(raw: DataFrame, cfg: SizingConfig)
      : (DataFrame, DataFrame, DataFrame) = {
    val pooled = poolFilter(raw, cfg)
    val skipped = pooled.filter(skipPredicate)
    val derived = Formulas.derive(pooled.filter(!skipPredicate), cfg)
    val (kept, pruned) = pruneSplit(derived, cfg)
    (skipped, kept, pruned)
  }
}
