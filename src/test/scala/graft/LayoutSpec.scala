package graft

import graft.ops.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the Morton interleave must match a plain-Scala
  * reference bit for bit, the rewrite must preserve content exactly,
  * and — the point of the whole exercise — an off-axis range predicate
  * must scan a small fraction of the rows where the linear-sorted
  * layout scans all of them.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >>> i) & 1L) << (2 * i)
      z |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zorder2 ≡ plain-Scala Morton reference on randomized inputs") {
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(200)((rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong)) :+ ((0L, 0L)) :+ ((65535L, 65535L))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.zorder2(col("a"), col("b"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == mortonRef(a, b, 16), s"($a, $b)")
    }
  }

  /** Rows the scan actually emitted — i.e. rows in row groups the
    * parquet reader could NOT prune with the pushed filter (surviving
    * groups emit all their rows; Spark re-filters after the scan). */
  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString.take(2000))
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("off-axis range predicate prunes row groups under z-order, not under linear sort") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val total = li.count()
    val zPath = "target/graft-test-zorder"
    val lPath = "target/graft-test-linear"
    Layout.zorderWrite(li, "l_orderkey", "l_partkey", zPath)
    Layout.linearSortWrite(li, "l_orderkey", lPath)
    // the off-axis predicate: a ~4%-selective l_partkey range — the
    // column the linear layout did NOT sort on. No exchange in the
    // probe query, so the executed plan is non-adaptive and the scan
    // metric is directly readable.
    def probe(path: String) = spark.read.parquet(path)
      .where(col("l_partkey") >= 100 && col("l_partkey") < 180)
    val zRows = scannedRows(probe(zPath))
    val lRows = scannedRows(probe(lPath))
    val kept = probe(zPath).count()
    assert(kept == probe(lPath).count())
    // linear sort on l_orderkey leaves every row group spanning the
    // full l_partkey domain — nothing prunes
    assert(lRows == total, s"linear scanned $lRows of $total")
    // z-order prunes most groups: the scan reads a small multiple of
    // the actual answer, never the table
    assert(zRows < total / 4, s"z-order scanned $zRows of $total")
    assert(zRows >= kept)
  }

  private def mortonRefN(vs: Seq[Long], bits: Int): Long = {
    val k = vs.size
    var z = 0L
    for (j <- vs.indices; i <- 0 until bits)
      z |= ((vs(j) >>> i) & 1L) << (i * k + j)
    z
  }

  test("zorderN ≡ plain-Scala k-ary Morton reference; k = 2 ≡ zorder2") {
    val rnd = new scala.util.Random(23)
    val triples = Seq.fill(200)(Seq.fill(3)(rnd.nextInt(1 << 16).toLong))
    val got = triples.map(t => (t(0), t(1), t(2))).toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.zorderN(Seq(col("a"), col("b"), col("c")), 16).as("z"),
        Layout.zorderN(Seq(col("a"), col("b")), 16).as("z2"),
        Layout.zorder2(col("a"), col("b"), 16).as("z2ref"))
      .collect()
    got.foreach { r =>
      val vs = Seq(r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == mortonRefN(vs, 16), vs)
      assert(r.getLong(4) == r.getLong(5), vs)
    }
    // 3 columns at 16 bits = 48 key bits — legal; 4 at 16 = 64 is not
    intercept[IllegalArgumentException] {
      Layout.zorderN(Seq(col("a"), col("b"), col("c"), col("a")), 16)
    }
  }

  test("hilbert curve is a bijection with unit steps (the locality property)") {
    val bits = 4
    val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield (x, y, graft.functions.SpaceFillingExpressions
        .hilbertXy2d(x.toLong, y.toLong, bits))
    // bijection onto [0, n²)
    assert(cells.map(_._3).sorted == (0L until n.toLong * n).toSeq)
    // consecutive indices are GRID NEIGHBORS — Morton teleports at
    // power-of-two boundaries, Hilbert never does
    val byD = cells.sortBy(_._3)
    byD.sliding(2).foreach { case Seq((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("hilbert2 column ≡ static reference; interpreted ≡ codegen") {
    val rnd = new scala.util.Random(31)
    val pairs = Seq.fill(200)((rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong)) :+ ((0L, 0L)) :+ ((65535L, 65535L))
    val ref = pairs.map { case (a, b) =>
      (a, b) -> graft.functions.SpaceFillingExpressions.hilbertXy2d(a, b, 16)
    }.toMap
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.hilbert2(col("a"), col("b"), 16).as("h"))
    df.collect().foreach(r =>
      assert(r.getLong(2) == ref((r.getLong(0), r.getLong(1)))))
    // interpreted path (no codegen) must agree bit for bit
    val expr = graft.functions.HilbertIndex2(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.catalyst.expressions.BoundReference(1,
        org.apache.spark.sql.types.LongType, nullable = false), 16)
    pairs.foreach { case (a, b) =>
      val row = org.apache.spark.sql.catalyst.InternalRow(a, b)
      assert(expr.eval(row) == ref((a, b)), s"($a, $b)")
    }
  }

  test("hilbertWrite prunes the off-axis predicate at least as well as z-order") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val total = li.count()
    val hPath = "target/graft-test-hilbert"
    Layout.hilbertWrite(li, "l_orderkey", "l_partkey", hPath)
    def probe(path: String) = spark.read.parquet(path)
      .where(col("l_partkey") >= 100 && col("l_partkey") < 180)
    val hRows = scannedRows(probe(hPath))
    val kept = probe(hPath).count()
    assert(kept == li.where(col("l_partkey") >= 100 &&
      col("l_partkey") < 180).count())
    assert(hRows < total / 4, s"hilbert scanned $hRows of $total")
    assert(hRows >= kept)
  }

  test("zorderWriteN(3 cols) preserves content and prunes on the THIRD column") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val total = li.count()
    val path = "target/graft-test-zorder3"
    Layout.zorderWriteN(li, Seq("l_orderkey", "l_partkey", "l_suppkey"),
      path, bits = 16)
    // content preserved
    assert(spark.read.parquet(path).count() == total)
    // a selective range on the THIRD clustering column prunes; a 2-col
    // z-order on (orderkey, partkey) cannot prune this at all
    val (sMin, sMax) = li.agg(min("l_suppkey"), max("l_suppkey"))
      .as[(Long, Long)].head()
    val width = math.max(1L, (sMax - sMin) / 25)
    def probe(p: String) = spark.read.parquet(p)
      .where(col("l_suppkey") >= sMin && col("l_suppkey") < sMin + width)
    val zRows = scannedRows(probe(path))
    assert(zRows < total / 2, s"zorder3 scanned $zRows of $total")
  }

  test("zorderWrite preserves content exactly (multiset equality)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val path = "target/graft-test-zorder-content"
    Layout.zorderWrite(li, "l_orderkey", "l_partkey", path)
    val a = li.groupBy("l_orderkey", "l_partkey", "l_quantity")
      .count().orderBy("l_orderkey", "l_partkey", "l_quantity")
      .collect().toSeq
    val b = spark.read.parquet(path)
      .groupBy("l_orderkey", "l_partkey", "l_quantity")
      .count().orderBy("l_orderkey", "l_partkey", "l_quantity")
      .collect().toSeq
    assert(a == b)
  }
}
