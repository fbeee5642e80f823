package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One keyed candidate: (key, id). Ordering is key ASC then id ASC — a
  * deterministic total order even when keys repeat (duplicate texts hash
  * to the same key; the id breaks the tie identically on every engine). */
case class Keyed(key: String, id: Long)

/** Typed UDAF: lexicographically-smallest-k by string key with a bounded
  * buffer — TopK's string twin (same partial-aggregation rationale,
  * functions/TopK.scala). Built for deterministic sampling: "the k rows
  * with the smallest content hash per group" is a uniform k-sample that
  * every run, engine, and partitioning agrees on — unlike rand()-based
  * TABLESAMPLE, it is reproducible and oracle-checkable, and unlike a
  * per-group window sort it shuffles only |groups|·k rows.
  */
class BottomK(k: Int) extends Aggregator[Keyed, Seq[Keyed], Seq[Keyed]] {
  require(k > 0)

  private val ord: Ordering[Keyed] = Ordering.by((s: Keyed) => (s.key, s.id))

  private def insert(buf: Seq[Keyed], x: Keyed): Seq[Keyed] =
    if (buf.length >= k && ord.gteq(x, buf.last)) buf // above the bar: drop
    else ((buf :+ x).sorted(ord)).take(k)

  override def zero: Seq[Keyed] = Seq.empty

  // null keys are skipped (a doc with NULL text has no content hash to
  // sample by) — matching SQL semantics where ORDER BY would sort the
  // NULL out of the first k, and avoiding an NPE in the string Ordering
  override def reduce(buf: Seq[Keyed], in: Keyed): Seq[Keyed] =
    if (in.key == null) buf else insert(buf, in)

  override def merge(a: Seq[Keyed], b: Seq[Keyed]): Seq[Keyed] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[Keyed]): Seq[Keyed] = buf

  override def bufferEncoder: Encoder[Seq[Keyed]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Keyed]] = ExpressionEncoder()
}
