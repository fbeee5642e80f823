package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One [start, end) byte/row range. */
case class Interval(start: Long, end: Long)

/** Typed UDAF: total covered length of the union of [start, end) intervals
  * (Q-U2).
  *
  * This is the reference's region-mask algebra — a sorted disjoint interval
  * set into which new regions merge (reference region/region.go:28-124
  * Mask.Add/GetMissing; persisted per block, reference
  * core/freezer.go:481-509) — expressed as an `Aggregator` so it composes
  * with groupBy like any built-in.
  *
  * Buffer = flattened sorted disjoint [s0,e0,s1,e1,...]. Touching intervals
  * merge (s == curEnd joins), matching the reference's coalescing.
  *
  * 100 TB notes: partial aggregation applies (reduce per partition, merge of
  * compact masks across partitions), so the shuffle carries masks, not rows.
  * Buffer size is bounded by the number of *disjoint* runs per group, which
  * for coverage-style data collapses toward 1.
  */
class IntervalUnion extends Aggregator[Interval, Seq[Long], Long] {

  private def insert(buf: Seq[Long], s: Long, e: Long): Seq[Long] = {
    if (e <= s) return buf
    val out = Seq.newBuilder[Long]
    var cs = s
    var ce = e
    var placed = false
    var i = 0
    while (i < buf.length) {
      val (bs, be) = (buf(i), buf(i + 1))
      if (be < cs) { // strictly before the new run (no touch): keep
        out += bs += be
      } else if (bs > ce) { // strictly after: flush new run first
        if (!placed) { out += cs += ce; placed = true }
        out += bs += be
      } else { // overlaps or touches: absorb
        cs = math.min(cs, bs)
        ce = math.max(ce, be)
      }
      i += 2
    }
    if (!placed) out += cs += ce
    out.result()
  }

  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], in: Interval): Seq[Long] =
    insert(buf, in.start, in.end)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.grouped(2).foldLeft(a) { case (acc, pair) => insert(acc, pair(0), pair(1)) }

  override def finish(buf: Seq[Long]): Long =
    buf.grouped(2).map(p => p(1) - p(0)).sum

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
