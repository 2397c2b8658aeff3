package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column wrappers over Spark's Bloom-filter sketch expressions — the same
  * machinery Catalyst's `InjectRuntimeFilter` rule plans for large joins,
  * exposed here so dedup operators can build the sketch deliberately.
  *
  * Why not `df.stat.bloomFilter`: that public API builds the sketch with an
  * RDD `treeAggregate` outside the SQL plan (no codegen, no reuse with the
  * rest of the query). `BloomFilterAggregate` is a `TypedImperativeAggregate`
  * inside the plan: per-partition partial sketches merge map-side, one
  * binary result row comes out, and the input expression (typically an
  * `xxhash64`) stays whole-stage-codegen'd.
  */
object BloomFunctions {

  /** Aggregate column building a Bloom filter over a LONG input column,
    * sized for `expectedItems` distinct values (bits are derived from that
    * estimate and capped by
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`). Evaluates to a
    * binary sketch, or NULL when the input relation is empty.
    */
  def bloomFilterAgg(value: Column, expectedItems: Long): Column =
    GraftSqlBridge.column(
      new BloomFilterAggregate(GraftSqlBridge.expression(value), expectedItems)
        .toAggregateExpression())

  /** Membership probe against a built sketch. No false negatives; false
    * positives at the sketch's configured rate. `bloom` must be foldable
    * (e.g. a collected sketch as a literal) or a scalar subquery — the
    * expression's own type check enforces this.
    */
  def mightContain(bloom: Column, value: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      GraftSqlBridge.expression(bloom), GraftSqlBridge.expression(value)))
}
