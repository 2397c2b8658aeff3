package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — the Z-order
  * (Morton curve) clustering trick every 100 TB lakehouse uses
  * (Databricks `OPTIMIZE ZORDER BY`, Iceberg's z-ordered rewrites;
  * Morton 1966): a table linearly sorted on column A prunes row groups
  * only for predicates on A — a predicate on B reads EVERYTHING,
  * because every row group's B min/max spans the full domain.
  * Interleaving the bits of A and B into one sort key makes row groups
  * cover small RECTANGLES of the (A, B) space, so parquet min/max
  * statistics prune on EITHER column (single-digit file/row-group
  * shares for selective ranges, vs 100% on the off-axis column of a
  * linear sort — measured in LayoutSpec).
  *
  * Everything here is plain bit arithmetic in codegen'd expressions and
  * a range-repartition + in-partition sort — no custom writer, no table
  * format dependency; the pruning is done entirely by stock parquet
  * row-group statistics.
  */
object Layout {

  /** Morton interleave of two NON-NEGATIVE integer columns' low `bits`
    * bits: bit i of `a` lands at position 2i, bit i of `b` at 2i + 1.
    * Codegen'd (a static OR-chain of shift/mask terms — no UDF).
    * Callers whose domains exceed 2^`bits` should bucket first
    * (`col / width`): z-ordering cares about LOCALITY, not identity,
    * so coarse buckets lose nothing but tail resolution.
    */
  def zorder2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits in [1, 31], got $bits")
    zorderN(Seq(a, b), bits)
  }

  /** Morton interleave of `k` NON-NEGATIVE integer columns' low `bits`
    * bits: bit i of column j lands at position i·k + j (so `zorderN(Seq(a,
    * b), bits)` is exactly [[zorder2]]). The key must fit a non-negative
    * long: k·bits ≤ 63. Same codegen'd OR-chain shape — cost is linear in
    * k·bits, no UDF. Production tables z-order 3-4 columns routinely
    * (order, part, supplier, date); each added column divides per-column
    * resolution, which is the curve's intrinsic trade, not an
    * implementation limit.
    */
  def zorderN(cols: Seq[Column], bits: Int = 16): Column = {
    val k = cols.size
    require(k >= 2, s"zorderN needs >= 2 columns, got $k")
    require(bits >= 1 && k * bits <= 63,
      s"k*bits must be in [k, 63], got $k*$bits")
    (for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftrightunsigned(c.cast("long"), i)
      .bitwiseAND(lit(1L)), i * k + j)).reduce(_ bitwiseOR _)
  }

  /** Hilbert-curve index of two NON-NEGATIVE integer columns' low `bits`
    * bits (Hilbert 1891; the xy→d walk in Hamilton's compact form) — the
    * locality-optimal alternative to [[zorder2]]: the Hilbert curve never
    * jumps (consecutive keys are always grid neighbors), so the
    * rectangles a contiguous key range covers are tighter than Morton's,
    * which teleports across the space at every power-of-two boundary.
    * Databricks ships exactly this upgrade as liquid clustering's curve.
    * The per-bit state rotation makes a Column-fold expression tree grow
    * exponentially (x and y each feed the next level twice), so this is a
    * custom codegen'd expression — a real loop in generated Java, O(bits)
    * per row ([[graft.functions.HilbertIndex2]]).
    */
  def hilbert2(a: Column, b: Column, bits: Int = 16): Column =
    graft.functions.SpaceFillingExpressions.hilbertIndex2(a, b, bits)

  /** Write `df` to parquet CLUSTERED on the z-value of (`a`, `b`):
    * both columns are min/max-NORMALIZED to the full `bits` width
    * before interleaving — raw interleave of imbalanced domains (a
    * 14-bit orderkey against an 11-bit partkey) leaves the curve's top
    * levels pure-A, i.e. a linear sort in disguise (measured: median
    * per-group B-width 762/2000 raw vs ~200 normalized; Delta's
    * OPTIMIZE ZORDER normalizes the same way via per-column range
    * ids). Then range-repartition on the z-key (files = contiguous
    * curve segments, so file-level min/max are tight too), sort within
    * partitions (row groups = sub-segments), drop the key.
    * `rowGroupBytes` caps the parquet block size — pruning granularity
    * IS row-group granularity, so it should be sized for MANY groups
    * per table: parquet's 128 MB default is right at production scale
    * (a 100 TB table has ~10⁶ groups) and would put the test-scale
    * tables in ONE group, which is why the default here is small.
    *
    * Scale shape: one min/max aggregate (map-side partial, two rows of
    * driver state) + one range exchange (sampled bounds) + a
    * per-partition sort — the cost of any global sort write; no
    * driver-side data. At 100 TB this is the standard maintenance
    * rewrite (compaction with a smarter sort key).
    */
  def zorderWrite(df: DataFrame, a: String, b: String, path: String,
                  nFiles: Int = 4, bits: Int = 16,
                  rowGroupBytes: Int = 16 * 1024): Unit =
    zorderWriteN(df, Seq(a, b), path, nFiles, bits, rowGroupBytes)

  /** [[zorderWrite]] over `k ≥ 2` columns (key = [[zorderN]]). */
  def zorderWriteN(df: DataFrame, cols: Seq[String], path: String,
                   nFiles: Int = 4, bits: Int = 16,
                   rowGroupBytes: Int = 16 * 1024): Unit =
    clusteredWrite(df, cols, cs => zorderN(cs, bits), path, nFiles, bits,
      rowGroupBytes)

  /** [[zorderWrite]] with the Hilbert key ([[hilbert2]]) — identical
    * write shape, strictly better locality (measured in LayoutSpec). */
  def hilbertWrite(df: DataFrame, a: String, b: String, path: String,
                   nFiles: Int = 4, bits: Int = 16,
                   rowGroupBytes: Int = 16 * 1024): Unit =
    clusteredWrite(df, Seq(a, b), cs => hilbert2(cs(0), cs(1), bits), path,
      nFiles, bits, rowGroupBytes)

  private def clusteredWrite(df: DataFrame, cols: Seq[String],
                             key: Seq[Column] => Column, path: String,
                             nFiles: Int, bits: Int,
                             rowGroupBytes: Int): Unit = {
    // one min/max aggregate for every clustering column (map-side
    // partial, 2k cells of driver state)
    val aggs = cols.flatMap(n =>
      Seq(min(col(n)).cast("long"), max(col(n)).cast("long")))
    val s = df.agg(aggs.head, aggs.tail: _*).head()
    val ranges = cols.zipWithIndex.map { case (n, j) =>
      require(!s.isNullAt(2 * j),
        s"clusteredWrite: $n must be a non-null numeric column")
      (n, s.getLong(2 * j), s.getLong(2 * j + 1))
    }
    val top = (1L << bits) - 1
    ranges.foreach { case (n, mn, mx) =>
      // (v − mn)·top must stay under 2^53: Spark's `/` on longs is
      // DOUBLE division, and below 2^53 the numerator is exactly
      // representable, so truncation equals exact integer division
      require(mx - mn < (1L << (53 - bits)),
        s"clusteredWrite: $n range ${mx - mn} too wide for $bits-bit " +
          "normalization — bucket the column first (v div width)")
    }
    def scaled(c: Column, mn: Long, mx: Long): Column =
      if (mx > mn)
        ((c.cast("long") - lit(mn)) * lit(top) / lit(mx - mn)).cast("long")
      else lit(0L)
    df.withColumn("_z", key(ranges.map { case (n, mn, mx) =>
        scaled(col(n), mn, mx) }))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(path)
  }

  /** The linear-sort counterpart (sorted on `a` alone) — the layout
    * z-ordering replaces; kept as the measured baseline in LayoutSpec
    * and for callers whose queries only ever filter one column. */
  def linearSortWrite(df: DataFrame, a: String, path: String,
                      nFiles: Int = 4,
                      rowGroupBytes: Int = 16 * 1024): Unit =
    df.repartitionByRange(nFiles, col(a))
      .sortWithinPartitions(a)
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(path)
}
