package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k reservoir as a MERGEABLE typed [[Aggregator]] — the
  * sketch pattern that makes Efraimidis–Spirakis A-RES sampling a
  * streaming/distributed primitive: state is AT MOST k entries per group
  * regardless of input size, `reduce` folds one row in, `merge` unions
  * two partial reservoirs — associative and commutative under the exact
  * (skey DESC, doc_id ASC) order, so map-side partials, shuffle order,
  * and micro-batch arrival order all produce the SAME winner set the
  * global sort would (x42 is that global-sort batch twin; qs14 pins the
  * equality under the driver oracle). The reference has no streaming
  * analog — this is the engine extension that makes "sample by weight at
  * ingest" possible with watermark-free bounded state.
  *
  * Keys must be pre-rounded (x42 rounds at 8dp) so one-ulp differences
  * cannot flip an order across engines; doc_id breaks rounded ties. */
final case class ResEntry(skey: Double, doc_id: Long, n_chars: Long)

final class ReservoirK(k: Int) extends Aggregator[ResEntry, Seq[ResEntry], Seq[ResEntry]] {
  private val ord: Ordering[ResEntry] =
    Ordering.by((e: ResEntry) => (-e.skey, e.doc_id))

  override def zero: Seq[ResEntry] = Vector.empty

  override def reduce(b: Seq[ResEntry], a: ResEntry): Seq[ResEntry] =
    // k is small (20 here): insert-and-trim by full sort is cheaper than
    // a heap below ~100 entries and keeps the state canonically ordered,
    // which makes merge() a bounded merge of two sorted runs
    ((b :+ a).sorted(ord)).take(k)

  override def merge(x: Seq[ResEntry], y: Seq[ResEntry]): Seq[ResEntry] =
    ((x ++ y).sorted(ord)).take(k)

  override def finish(r: Seq[ResEntry]): Seq[ResEntry] = r.sorted(ord)

  override def bufferEncoder: Encoder[Seq[ResEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ResEntry]]()

  override def outputEncoder: Encoder[Seq[ResEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ResEntry]]()
}
