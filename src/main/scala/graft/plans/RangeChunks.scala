package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Custom Catalyst Generator: split a byte range [0, size) into fixed-size
  * chunks — one output row per chunk (Q-U3).
  *
  * This is the chunk-alignment computation of the reference's lazy fetch
  * (reference core/freezer.go:125-183 ensurePulled; 200 KiB default chunk,
  * reference core/datastore.go:106) lifted into the relational layer: a
  * table of object sizes becomes a table of fetchable ranges.
  *
  * A Generator (not a UDF returning an array) so rows stream out of the
  * iterator without materializing a per-row array — at 100 TB a single
  * multi-GB object yields thousands of chunk rows; building the array first
  * would hold them all in memory per input row.
  */
case class RangeChunks(size: Expression, chunk: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(size, chunk)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("chunk_start", LongType, nullable = false),
    StructField("chunk_len", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.forall(c => c.dataType == LongType || c.dataType == IntegerType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"range_chunks expects integral (size, chunk), got " +
          children.map(_.dataType.simpleString).mkString(", "))
  }

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val szV = size.eval(input)
    val ckV = chunk.eval(input)
    if (szV == null || ckV == null) return Nil
    val sz = asLong(szV)
    val ck = asLong(ckV)
    if (sz <= 0 || ck <= 0) return Nil
    val n = (sz + ck - 1) / ck
    // iterator, not a materialized collection: rows stream out
    (0L until n).iterator.map { i =>
      InternalRow(i, i * ck, math.min(ck, sz - i * ck))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(size = newChildren(0), chunk = newChildren(1))
}

object RangeChunks {
  /** Register `range_chunks(size, chunk)` as a temp SQL function. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "range_chunks",
      (exprs: Seq[Expression]) => RangeChunks(exprs(0), exprs(1)),
      "built-in")
}
