package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap grouped top-k as a typed `Aggregator` (the one
  * UDAF-shaped extension SURVEY §2.8 anticipates).
  *
  * Why: the window formulation — `row_number() OVER (PARTITION BY g
  * ORDER BY v DESC) <= k` — shuffles EVERY row of every group and sorts
  * whole partitions before discarding all but k. This aggregator keeps a
  * ≤ k+1-element bound per group on the map side, so the shuffle carries
  * at most k rows per (group × partition) — the grouped analog of
  * Spark's own TakeOrderedAndProject, which only exists for global
  * top-k.
  *
  * Determinism: ordering is (value DESC, tiebreak ASC) — a total order,
  * so the result is independent of partitioning and merge order.
  * The buffer is a sorted immutable List (k is small); `Encoders.product`
  * round-trips it through the shuffle.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), TopKAggregator.Buf, Seq[(Double, Long)]] {
  import TopKAggregator.Buf

  private def insert(items: List[(Double, Long)], v: (Double, Long))
      : List[(Double, Long)] = {
    // descending value, ascending tiebreak; keep at most k
    val (before, after) = items.span(e =>
      e._1 > v._1 || (e._1 == v._1 && e._2 < v._2))
    (before ::: v :: after).take(k)
  }

  override def zero: Buf = Buf(Nil)
  override def reduce(b: Buf, in: (Double, Long)): Buf =
    Buf(insert(b.items, in))
  override def merge(a: Buf, b: Buf): Buf =
    Buf(b.items.foldLeft(a.items)(insert))
  override def finish(b: Buf): Seq[(Double, Long)] = b.items
  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAggregator {
  final case class Buf(items: List[(Double, Long)])
}
