package graft.functions

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's native expressions, so config-authored
  * SQL (PipelineSpec task queries, `expr()` strings) can call them by name —
  * the same extension channel the reference exposes via agg-name strings
  * (SURVEY.md §2.10), but through Spark's sanctioned function registry.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build (cluster deployments);
  *  - [[GraftFunctions.register]] on a live session (tests, notebooks).
  */
object GraftFunctions {
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))),
    (FunctionIdentifier("graft_sorted_set_jaccard"),
      new ExpressionInfo(classOf[SortedSetJaccard].getName, "graft_sorted_set_jaccard"),
      (es: Seq[Expression]) => SortedSetJaccard(es.head, es(1))),
    (FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "graft_fingerprint"),
      (es: Seq[Expression]) => RollingFingerprint(es.head)),
    (FunctionIdentifier("graft_char_fold"),
      new ExpressionInfo(classOf[CharFold].getName, "graft_char_fold"),
      (es: Seq[Expression]) => CharFold(es.head,
        GraftSqlBridge.longLiteral(es(1)), GraftSqlBridge.longLiteral(es(2)))),
    (FunctionIdentifier("graft_token_window_hash"),
      new ExpressionInfo(classOf[TokenWindowHash].getName, "graft_token_window_hash"),
      (es: Seq[Expression]) => TokenWindowHash(es.head,
        GraftSqlBridge.longLiteral(es(1)).toInt)))

  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      GraftSqlBridge.registerFunction(spark, id, info, builder)
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
