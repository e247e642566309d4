package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-key event timeline as a typed `Aggregator`: keeps the k
  * EARLIEST (ts, id, type) triples by (ts ASC, id ASC, type ASC) — "each
  * key's first k events" — in a sorted buffer that never exceeds k
  * elements. Built for streaming keyed state (q143's transition
  * monitor): `collect_list` state grows with a power user's full
  * history, while this buffer is O(k) per key forever, including under
  * out-of-order arrival (a late-but-early event splices in and the
  * current latest falls out — the result is arrival-order independent,
  * same argument as [[TopKAggregator]]).
  *
  * Truncation is OBSERVABLE, not silent: pair the call with a
  * `count(*)` in the same agg — `size(timeline) < n_events` iff the cap
  * dropped something — so a caller whose semantics need the full
  * history (q143's batch-parity gate) can fail loud instead of
  * reporting a matrix over a silently clipped log.
  *
  * Insertion is O(k) per event (sorted immutable list, like
  * [[TopKAggregator]]) — fine for a monitor's k (≤ thousands); a
  * hot-path variant would switch the buffer to a binary-searched
  * vector without changing the contract.
  */
class BoundedTimelineAgg(k: Int) extends Aggregator[
    (Long, Long, String), BoundedTimelineAgg.Buf, Seq[(Long, Long, String)]] {
  import BoundedTimelineAgg.Buf

  private def lt(a: (Long, Long, String), b: (Long, Long, String)): Boolean =
    a._1 < b._1 || (a._1 == b._1 &&
      (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)))

  private def insert(items: List[(Long, Long, String)],
      v: (Long, Long, String)): List[(Long, Long, String)] = {
    val (before, after) = items.span(e => lt(e, v))
    (before ::: v :: after).take(k)
  }

  override def zero: Buf = Buf(Nil)
  override def reduce(b: Buf, in: (Long, Long, String)): Buf =
    Buf(insert(b.items, in))
  override def merge(a: Buf, b: Buf): Buf =
    Buf(b.items.foldLeft(a.items)(insert))
  override def finish(b: Buf): Seq[(Long, Long, String)] = b.items
  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[(Long, Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object BoundedTimelineAgg {
  final case class Buf(items: List[(Long, Long, String)])
}
