package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native space-filling-curve keys for clustered layout writes.
  *
  * The Hilbert xy→d walk (Hilbert 1891; the compact iterative form is
  * Hamilton's, as used by Wikipedia's reference implementation and by
  * every lakehouse clustering implementation) carries a per-bit state
  * ROTATION: each level conditionally reflects and swaps (x, y) before
  * descending. Folding that over Column expressions doubles the (x, y)
  * subtree at every level — an O(2^bits) expression tree — so the curve
  * is a custom codegen'd expression instead: a real loop in generated
  * Java, O(bits) per row, identical in interpreted and codegen modes
  * (parity-pinned in LayoutSpec).
  */
object SpaceFillingExpressions {

  /** Hilbert index of (x, y) on the 2^bits × 2^bits grid; inputs are
    * masked to their low `bits` bits. Static so generated code calls it
    * directly.
    */
  def hilbertXy2d(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve's entry/exit line up
      if (ry == 0L) {
        if (rx == 1L) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbertIndex2(a: Column, b: Column, bits: Int): Column =
    GraftSqlBridge.column(HilbertIndex2(
      GraftSqlBridge.expression(a.cast("long")),
      GraftSqlBridge.expression(b.cast("long")), bits))
}

/** Codegen'd Hilbert curve index (see
  * [[SpaceFillingExpressions.hilbertXy2d]]).
  */
case class HilbertIndex2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_index2"

  override def nullSafeEval(a: Any, b: Any): Any =
    SpaceFillingExpressions.hilbertXy2d(
      a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SpaceFillingExpressions" +
        s".hilbertXy2d($a, $b, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
