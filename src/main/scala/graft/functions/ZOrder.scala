package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
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

  /** Spread the low 21 bits of v to every 3rd bit position — the 3-D
    * mask-shift spread (21 bits × 3 dims = 63 bits, sign bit clear). */
  def spread3(v: Long): Long = {
    var x = v & 0x1FFFFFL
    x = (x | (x << 32)) & 0x1F00000000FFFFL
    x = (x | (x << 16)) & 0x1F0000FF0000FFL
    x = (x | (x << 8)) & 0x100F00F00F00F00FL
    x = (x | (x << 4)) & 0x10C30C30C30C30C3L
    x = (x | (x << 2)) & 0x1249249249249249L
    x
  }

  /** 63-bit Morton code of the low 21 bits of (a, b, c): bit i of the
    * j-th input lands at position 3i + j. ~18 ALU ops, loop-free. */
  def interleave3(a: Long, b: Long, c: Long): Long =
    spread3(a) | (spread3(b) << 1) | (spread3(c) << 2)

  /** Generic N-way interleave for 4+ dimensions: bit i of vals(j) lands
    * at position i·n + j; each dimension contributes floor(63/n) bits so
    * the sign bit stays clear. A bit loop (n · 63/n ≈ 63 ALU ops), not a
    * mask-shift kernel — the 2-D/3-D hot paths above stay loop-free and
    * OPTIMIZE ZORDER beyond 3 columns has rapidly diminishing clustering
    * value anyway (each dimension keeps only 63/n bits of resolution).
    *
    * INPUT BOUND (advisor r16): bits at position ≥ floor(63/n) are
    * DROPPED — inputs must be pre-normalized to [0, 2^floor(63/n)), or
    * per-dimension monotonicity is lost (two values differing only above
    * the bound interleave identically). zorder2 keeps 32 bits and
    * zorder3 21; at n = 4 the bound is 2^15. LayoutOps normalizes to
    * min(16, 63/n) bits for exactly this reason. */
  def interleaveDyn(vals: Array[Long]): Long = {
    val n = vals.length
    val bits = 63 / n
    var out = 0L
    var j = 0
    while (j < n) {
      val v = vals(j)
      var i = 0
      while (i < bits) {
        out |= ((v >>> i) & 1L) << (i * n + j)
        i += 1
      }
      j += 1
    }
    out
  }
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

/** `zorder3(a, b, c)` — Morton-interleave three LongType columns via the
  * loop-free 21-bit spread (callers normalize to ≤16-bit rank/bucket
  * space first; LayoutOps does min-max scaling per dimension). */
case class ZOrder3(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder3"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder3 expects (bigint, bigint, bigint), got (" +
        children.map(_.dataType.simpleString).mkString(", ") + ")")

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    ZOrderKernels.interleave3(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.ZOrderKernels.interleave3($a, $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `zorderN(...)` for 4–8 LongType columns — the generic bit-loop
  * interleave (floor(63/n) bits per dimension). CodegenFallback: the
  * 2-D/3-D hot paths are the dedicated codegen'd expressions above, and
  * `ZOrder.register` dispatches to them by arity so this class only ever
  * carries the rare wide-clustering case.
  *
  * SQL-caller contract: each input must already sit in
  * [0, 2^floor(63/n)) — e.g. < 2^15 at n = 4 — or the truncated high
  * bits silently break per-dimension monotonicity (see
  * [[ZOrderKernels.interleaveDyn]]). Normalize first (LayoutOps'
  * min-max/rank bucketing is the house pattern). */
case class ZOrderDyn(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zordern"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > 8)
      TypeCheckResult.TypeCheckFailure(
        s"zorderN takes 2 to 8 columns, got ${children.size}")
    else if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorderN expects bigint columns, got (" +
        children.map(_.dataType.simpleString).mkString(", ") + ")")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v.asInstanceOf[Long]
      i += 1
    }
    ZOrderKernels.interleaveDyn(vals)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZOrder {
  /** Dispatch by arity: dedicated loop-free kernels for 2-D/3-D, the
    * generic bit-loop for 4+ (shared with GraftExtensions' injection). */
  private[graft] def dispatch(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(a, b) => ZOrder2(a, b)
    case Seq(a, b, c) => ZOrder3(a, b, c)
    case _ => ZOrderDyn(exprs)
  }

  /** Register `zorder2(a, b)`, `zorder3(a, b, c)` and variadic
    * `zorderN(...)` as temp SQL functions. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder2",
      (exprs: Seq[Expression]) => ZOrder2(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder3",
      (exprs: Seq[Expression]) => ZOrder3(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zordern", dispatch, "built-in")
  }
}
