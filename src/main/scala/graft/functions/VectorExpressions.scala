package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native (codegen'd) vector math for embedding columns.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`
  * — is semantically identical but runs the higher-order-function
  * interpreter per pair: it allocates an intermediate array and boxes every
  * element. On an ANN verification join that evaluates millions of pairs,
  * that interpreter is the bottleneck. `DotProduct` generates a tight
  * primitive loop inside whole-stage codegen instead: no allocation, no
  * boxing, same left-to-right fold order (so scores stay bit-identical to
  * the interpreted form and to a mirrored oracle).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused sign-bit LSH signature: bit p of the result = (v · planes(p) >
  * offsets(p)). One expression, one pass over the vector, the plane matrix
  * a single constant reference — versus composing `nPlanes` separate
  * DotProduct/when/sum expressions, which multiplies both the generated
  * code size (slow janino compiles dominate cold-query time) and the
  * per-row array traversals.
  */
case class HyperplaneSignBits(child: Expression,
                              planes: Array[Array[Double]],
                              offsets: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(planes.length <= 64 && planes.length == offsets.length,
    "at most 64 planes; one offset per plane")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_hyperplane_sign_bits"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(v.numElements(), plane.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * plane(i); i += 1 }
      if (s > offsets(p)) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val offsetsRef = ctx.addReferenceObj("offsets", offsets, "double[]")
      val sig = ctx.freshName("sig"); val p = ctx.freshName("p")
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val i = ctx.freshName("i"); val pl = ctx.freshName("pl")
      s"""
         |long $sig = 0L;
         |for (int $p = 0; $p < ${planes.length}; $p++) {
         |  double[] $pl = $planesRef[$p];
         |  int $n = java.lang.Math.min($v.numElements(), $pl.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $v.getDouble($i) * $pl[$i];
         |  }
         |  if ($s > $offsetsRef[$p]) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-level dot product over two array<double> (or castable) columns. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))

  /** Sign-bit signature of `v` against fixed hyperplanes (bit p set iff
    * v·planes(p) > offsets(p)); offsets default to the origin.
    */
  def hyperplaneSignBits(v: Column, planes: Array[Array[Double]],
                         offsets: Array[Double] = null): Column =
    GraftSqlBridge.column(HyperplaneSignBits(
      GraftSqlBridge.expression(v.cast("array<double>")),
      planes,
      if (offsets == null) new Array[Double](planes.length) else offsets))
}
