package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic first-k admission as a MERGEABLE typed [[Aggregator]] —
  * the bounded-state primitive behind ingest quotas and per-key rate caps:
  * keep the k SMALLEST rows under a total (long, long) key, drop the rest.
  * Like [[ReservoirK]] the state is AT MOST k entries per group regardless
  * of input size, and `merge` is associative/commutative under the total
  * (k1 ASC, k2 ASC) order — map-side partials, shuffle order and
  * micro-batch arrival order all converge to the same admitted set the
  * batch row_number() computes, which is what makes the streaming twins
  * oracle-exact. The key fields are deliberately NEUTRAL (r6 advice —
  * they used to be named for the quota use only): qs21 feeds
  * (event-time µs, event_id) for an ingest quota, qs22 feeds (negated
  * integer cents, event_id) for a leaderboard, and `payload` rides along
  * untouched. All three fields are non-nullable longs by CONTRACT:
  * callers must filter NULL keys before aggregating (the typed encoder
  * would throw mid-stream, not skip — qs22 guards `value IS NOT NULL`). */
final case class AdmitEntry(k1: Long, k2: Long, payload: Long)

final class FirstK(k: Int) extends Aggregator[AdmitEntry, Seq[AdmitEntry], Seq[AdmitEntry]] {
  private val ord: Ordering[AdmitEntry] =
    Ordering.by((e: AdmitEntry) => (e.k1, e.k2))

  override def zero: Seq[AdmitEntry] = Vector.empty

  // Invariant: buffers are always sorted (zero is empty, reduce inserts in
  // place, merge re-sorts). On the ingest hot path the overwhelmingly
  // common case — buffer full, row later than the current cutoff — must
  // not re-sort or reallocate: a flooding key pays O(1) per rejected row.
  override def reduce(b: Seq[AdmitEntry], a: AdmitEntry): Seq[AdmitEntry] =
    if (b.length >= k && ord.gteq(a, b.last)) b
    else {
      val i = b.indexWhere(e => ord.gt(e, a))
      val ins = if (i < 0) b :+ a else (b.take(i) :+ a) ++ b.drop(i)
      if (ins.length > k) ins.take(k) else ins
    }

  override def merge(x: Seq[AdmitEntry], y: Seq[AdmitEntry]): Seq[AdmitEntry] =
    ((x ++ y).sorted(ord)).take(k)

  override def finish(r: Seq[AdmitEntry]): Seq[AdmitEntry] = r.sorted(ord)

  override def bufferEncoder: Encoder[Seq[AdmitEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[AdmitEntry]]()

  override def outputEncoder: Encoder[Seq[AdmitEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[AdmitEntry]]()
}
