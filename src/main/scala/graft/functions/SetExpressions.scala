package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native set arithmetic over SORTED long-array set representations.
  *
  * Dedup verification evaluates Jaccard similarity for millions of candidate
  * pairs. The composable form — `size(array_intersect(a, b)) /
  * size(array_union(a, b))` — builds two hash sets and materializes two
  * result arrays per pair. When both inputs are sorted distinct longs
  * (token/shingle hashes), one fused merge-walk computes the same value with
  * zero allocation: |A∪B| = |A| + |B| − |A∩B|.
  *
  * Inputs MUST be sorted ascending and duplicate-free (as produced by
  * `array_sort(array_distinct(...))`); null elements are not expected.
  * Returns null when both sets are empty (0/0), matching the null-division
  * result of the composable form under non-ANSI semantics.
  */
case class SortedSetJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sorted_set_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n1 = x.numElements()
    val n2 = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n1 && j < n2) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    val denom = n1 + n2 - c
    if (denom == 0) null else c.toDouble / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv"); val denom = ctx.freshName("denom")
      s"""
         |int $n1 = $x.numElements();
         |int $n2 = $y.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n1 && $j < $n2) {
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |int $denom = $n1 + $n2 - $c;
         |if ($denom == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((double) $c) / $denom; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SetExpressions {
  /** Jaccard similarity of two sorted-distinct long-array columns. */
  def sortedSetJaccard(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedSetJaccard(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
