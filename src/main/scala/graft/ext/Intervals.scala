package graft.ext

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._

/** Interval (range) joins — the join family SURVEY §2.5 records as absent
  * from both Spark's high-level API and the reference.
  *
  * The naive declaration `points.join(intervals, keys && ts BETWEEN start
  * AND end)` plans as an equi-join on the keys with the range predicate as
  * a post-join filter. That is correct but collapses at scale exactly where
  * real event data is worst: a hot key (one user, one device, one tenant
  * with millions of rows) turns into |points_k| × |intervals_k| candidate
  * pairs inside one join partition, almost all discarded by the filter.
  *
  * [[rangeJoinBucketed]] adds a time bucket to the equi-join key: intervals
  * are exploded into the buckets they cover, points carry their single
  * bucket, and the join runs on (keys..., bucket). Candidate pairs are then
  * only those within `bucketUs` of each other, so per-task work tracks the
  * TRUE match density instead of the key skew, and AQE can split what
  * remains. Each true (interval, point) pair meets in exactly one bucket —
  * the point's — so no post-join dedup is needed. Choose `bucketUs` near
  * the typical interval length: shorter buckets duplicate the interval side
  * (ceil(len/bucketUs)+1 copies), longer buckets readmit skew.
  */
object Intervals {

  /** Inner interval join: rows of `points` matched to rows of `intervals`
    * sharing all `keys` with `tsCol` in [startCol, endCol], both ends
    * inclusive. Bounds and timestamps are integer microseconds (or any
    * consistent integer clock). Column names must be disjoint apart from
    * `keys`. Bucket indices use floor division via exact integer
    * arithmetic, so pre-1970 (negative) clocks stay correct.
    *
    * Robustness guards (all semantics-preserving):
    *  - inverted intervals (end < start) match nothing under the inclusive
    *    BETWEEN, so they are filtered BEFORE the explode — a malformed row
    *    costs one comparison, not a descending `sequence` of phantom rows.
    *  - an interval spanning more than `maxBucketsPerInterval` buckets
    *    fails the job with a clear message instead of silently exploding a
    *    giant (or Spark-limit-exceeding) array; raise `bucketUs` or the cap.
    *  - the internal bucket column name is uniquified against both inputs.
    */
  def rangeJoinBucketed(intervals: DataFrame, points: DataFrame,
                        keys: Seq[String], startCol: String, endCol: String,
                        tsCol: String, bucketUs: Long,
                        maxBucketsPerInterval: Long = 1L << 16): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    // true integer division (catalyst `div`), never a double round-trip:
    // clocks near 2^63 (e.g. nanosecond epochs) stay exact. Subtracting
    // pmod first makes the numerator exactly divisible, so `div`'s
    // truncation equals floor on negative clocks too.
    def bucketOf(c: org.apache.spark.sql.Column) =
      GraftSqlBridge.column(new IntegralDivide(
        GraftSqlBridge.expression(c - pmod(c, lit(bucketUs))),
        GraftSqlBridge.expression(lit(bucketUs))))
    val taken = (intervals.columns ++ points.columns).toSet
    val bucket = Iterator.from(0).map(i => s"_bucket$i")
      .find(!taken.contains(_)).get
    val firstBucket = bucketOf(col(startCol))
    val lastBucket = bucketOf(col(endCol))
    val fanout = lastBucket - firstBucket + lit(1L)
    val iv = intervals
      .where(col(endCol) >= col(startCol))
      .withColumn(bucket, explode(sequence(
        when(fanout > lit(maxBucketsPerInterval), raise_error(concat(
          lit("rangeJoinBucketed: interval ["), col(startCol), lit(", "),
          col(endCol), lit(s"] spans "), fanout,
          lit(s" buckets > cap $maxBucketsPerInterval at bucketUs=$bucketUs;" +
            " raise bucketUs or maxBucketsPerInterval")))
        ).otherwise(firstBucket),
        lastBucket)))
    val pt = points.withColumn(bucket, bucketOf(col(tsCol)))
    pt.join(iv, keys :+ bucket)
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop(bucket)
  }
}
