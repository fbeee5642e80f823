package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleaving — the multi-dimensional clustering
  * key behind OPTIMIZE ZORDER-style layout maintenance.
  *
  * Range-clustering on ONE key (LayoutOps.clusterBy) gives perfect footer
  * pruning on that key and none on any other. Interleaving the bits of two
  * keys makes z-adjacent rows close in BOTH dimensions, so each output
  * file covers a bounded rectangle of (a, b) space — a scan filtering on
  * EITHER column skips most files from parquet min/max stats alone.
  *
  * The kernel is the standard mask-shift bit spread (no loop, ~12 ALU ops)
  * and runs inside whole-stage codegen via the same static-kernel pattern
  * as sign_lsh (big expression trees are a codegen killer; one call is
  * not).
  */
object ZOrderKernels {
  /** Spread the low 32 bits of v to the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 64-bit Morton code of the low 32 bits of (a, b): a takes the even
    * bits, b the odd. Monotone per dimension when the other is fixed. */
  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)
}

/** `zorder2(a, b)` — Morton-interleave two LongType columns (callers
  * normalize to 32-bit rank/bucket space first; LayoutOps does min-max
  * scaling to 16 bits per dimension). */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ZOrderKernels.interleave(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderKernels.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  /** Register `zorder2(a, b)` as a temp SQL function. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder2",
      (exprs: Seq[Expression]) => ZOrder2(exprs(0), exprs(1)),
      "built-in")
}
