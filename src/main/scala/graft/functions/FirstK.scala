package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic first-k admission as a MERGEABLE typed [[Aggregator]] —
  * the bounded-state primitive behind ingest quotas and per-key rate caps:
  * keep the k EARLIEST rows by (event time, id), drop the rest. Like
  * [[ReservoirK]] the state is AT MOST k entries per group regardless of
  * input size, and `merge` is associative/commutative under the total
  * (ts_us ASC, event_id ASC) order — map-side partials, shuffle order and
  * micro-batch arrival order all converge to the same admitted set the
  * batch row_number() computes, which is what makes the streaming twin
  * oracle-exact. Unlike ReservoirK the order key is the DATA's own
  * timeline, so this is a quota (admit the first k), not a sample. */
final case class AdmitEntry(ts_us: Long, event_id: Long, user_id: Long)

final class FirstK(k: Int) extends Aggregator[AdmitEntry, Seq[AdmitEntry], Seq[AdmitEntry]] {
  private val ord: Ordering[AdmitEntry] =
    Ordering.by((e: AdmitEntry) => (e.ts_us, e.event_id))

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
