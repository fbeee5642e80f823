package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate: (score, id). Ordering is score DESC, id ASC —
  * a deterministic total order (ids are unique). */
case class Scored(score: Double, id: Long)

/** Typed UDAF: top-k by score with a bounded buffer (SURVEY §7 Phase 4
  * "top-k via per-partition heaps").
  *
  * Why not `row_number().over(Window.partitionBy(probe))`: with few probe
  * keys, every candidate row for a probe lands on ONE task for a full
  * sort — a single-task scale-killer at 100 TB (VERDICT r2 "What's wrong"
  * #3). As an Aggregator, Spark plans partial aggregation: each input
  * partition reduces to a ≤k buffer locally, and only those k-row buffers
  * shuffle and merge — O(k) state per partition, no global sort, and the
  * shuffle carries |groups|·k rows instead of all candidates.
  *
  * Buffer = descending-sorted Seq of ≤ k entries (k is small — a sorted
  * vector beats a heap at this size and encodes cheaply).
  */
class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0)

  private val ord: Ordering[Scored] = Ordering.by((s: Scored) => (-s.score, s.id))

  private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] =
    if (buf.length >= k && ord.gteq(x, buf.last)) buf // below the bar: drop
    else ((buf :+ x).sorted(ord)).take(k)

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] = insert(buf, in)

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
