package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded k-smallest-priority sample as a MERGEABLE typed [[Aggregator]]
  * — [[ReservoirK]]'s integer sibling for x165's weighted PRIORITY
  * sampling (priority = floor(hv / weight): heavier docs draw
  * stochastically smaller priorities, the k smallest win). State is AT
  * MOST k entries per group regardless of input size; `reduce` folds one
  * row in, `merge` unions two partial samples — associative, commutative
  * and idempotent-in-the-winner-set under the exact (pri ASC, doc_id ASC)
  * integer order, so map-side partials, shuffle order and micro-batch
  * arrival order all produce the SAME winner set the batch per-stratum
  * window does (x165 is that batch twin; qs39 pins the equality under the
  * driver oracle). Pure int64 keys: no rounding surface at all — the
  * cross-engine-fragility note on ReservoirK's doubles does not arise. */
final case class PriEntry(pri: Long, doc_id: Long, n_tokens: Long)

final class PriorityK(k: Int) extends Aggregator[PriEntry, Seq[PriEntry], Seq[PriEntry]] {
  private val ord: Ordering[PriEntry] =
    Ordering.by((e: PriEntry) => (e.pri, e.doc_id))

  override def zero: Seq[PriEntry] = Vector.empty

  override def reduce(b: Seq[PriEntry], a: PriEntry): Seq[PriEntry] =
    ((b :+ a).sorted(ord)).take(k)

  override def merge(x: Seq[PriEntry], y: Seq[PriEntry]): Seq[PriEntry] =
    ((x ++ y).sorted(ord)).take(k)

  override def finish(r: Seq[PriEntry]): Seq[PriEntry] = r.sorted(ord)

  override def bufferEncoder: Encoder[Seq[PriEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[PriEntry]]()

  override def outputEncoder: Encoder[Seq[PriEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[PriEntry]]()
}
