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
