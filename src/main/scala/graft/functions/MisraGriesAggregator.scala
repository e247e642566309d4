package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a typed `Aggregator` — the
  * DETERMINISTIC-BOUND half of the sketch family (q151's count-min is
  * the probabilistic half): at most `k−1` counters, and for EVERY key
  * `f(x) − n/k ≤ est(x) ≤ f(x)` (Misra & Gries, "Finding repeated
  * elements", Sci. Comp. Prog. 1982). Any key with `f(x) > n/k` is
  * GUARANTEED present — no hash collisions, no failure probability.
  *
  * Distributed shape: the per-partition summaries merge by counter
  * addition followed by subtracting the k-th largest combined counter
  * and dropping non-positives — the bound is PRESERVED under arbitrary
  * merge trees (Agarwal, Cormode, Huang, Phillips, Wei, Yi, "Mergeable
  * summaries", PODS 2012, §3.1), so the map-side fold ships ≤ k−1
  * counters per partition and the result bound is partitioning-
  * independent. The counter VALUES are merge-order-dependent (only the
  * bound is invariant) — consumers must hash the theorem bits, never
  * the estimates (the q202 recall-audit discipline).
  *
  * Buffer is an immutable Map inside a product encoder; the decrement
  * path is O(k) but is paid at most n/k times per partition (each
  * decrement retires k−1 counts), so the fold is amortized O(1)/row.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[Long, MisraGriesAggregator.Buf, Map[Long, Long]] {
  import MisraGriesAggregator.Buf
  require(k >= 2, s"MisraGriesAggregator: k=$k must be >= 2")
  private val cap = k - 1

  override def zero: Buf = Buf(Map.empty)

  override def reduce(b: Buf, key: Long): Buf = {
    val m = b.items
    m.get(key) match {
      case Some(c) => Buf(m.updated(key, c + 1))
      case None if m.size < cap => Buf(m.updated(key, 1L))
      case None => Buf(m.collect {
        case (k2, c) if c > 1 => k2 -> (c - 1)
      })
    }
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val m = b.items.foldLeft(a.items) { case (acc, (k2, c)) =>
      acc.updated(k2, acc.getOrElse(k2, 0L) + c)
    }
    if (m.size <= cap) Buf(m)
    else {
      // subtract the k-th largest combined counter, drop non-positives:
      // at most k−1 counters strictly exceed it, and each surviving
      // estimate loses exactly what the PODS-2012 proof budgets
      val d = m.values.toSeq.sorted(Ordering[Long].reverse)(cap)
      Buf(m.collect { case (k2, c) if c - d > 0 => k2 -> (c - d) })
    }
  }

  override def finish(b: Buf): Map[Long, Long] = b.items
  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object MisraGriesAggregator {
  final case class Buf(items: Map[Long, Long])
}
