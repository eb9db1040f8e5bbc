package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary as a MERGEABLE typed [[Aggregator]]:
  * state is AT MOST k (token, weight) entries no matter how many tokens
  * stream through. `reduce` is the classic counter algorithm (increment
  * if present; insert if room; else decrement all — implemented as a
  * batched trim), `merge` is the Agarwal et al. mergeable-summaries
  * union: add counts, then subtract the (k+1)-th largest weight from
  * every entry and drop the non-positive. The GUARANTEE that makes the
  * sketch useful: any token with true count > n/(k+1) is certainly
  * present in the final summary (each decrement step destroys k+1
  * counts, and only n total exist), so a second EXACT recount over just
  * the surviving candidates — a broadcast-membership scan, candidates
  * are metadata-scale — yields exactly the set of tokens above the
  * threshold, with exact counts. That two-pass shape (bounded-state
  * candidate generation + cheap exact verification) is how "top tokens
  * over 100 TB" avoids a corpus-wide groupBy shuffle carrying every
  * distinct token; x57 registers it under the driver oracle. */
final class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] = {
    val updated = b.updated(a, b.getOrElse(a, 0L) + 1L)
    if (updated.size <= k) updated else trim(updated)
  }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val sum = y.foldLeft(x) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
    if (sum.size <= k) sum else trim(sum)
  }

  /** Subtract the (k+1)-th largest weight from every counter and drop the
    * non-positive — equivalent to running the classic decrement step until
    * at most k counters survive, in one pass. */
  private def trim(m: Map[String, Long]): Map[String, Long] = {
    val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
    m.collect { case (t, c) if c - cut > 0 => t -> (c - cut) }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
