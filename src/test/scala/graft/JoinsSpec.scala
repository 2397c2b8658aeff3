package graft

import graft.ops.Joins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** saltedJoin must be observationally identical to the plain equi-join —
  * on skewed data, with unmatched rows on both sides, at salts = 1.
  */
class JoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("saltedJoin equals the plain join on a skewed corpus with unmatched keys") {
    val rnd = new scala.util.Random(11)
    // 80% of probe rows pile on key 1 (the skew case salting exists for);
    // keys 900+ match nothing, build key 77 has no probe rows
    val probe = (1 to 500).map { i =>
      val k = if (rnd.nextInt(5) > 0) 1L else 900L + rnd.nextInt(5)
      (k, i)
    }.toDF("k", "pv")
    val build = (Seq(1L, 2L, 77L) ++ (900L to 902L)).zipWithIndex
      .toDF("bk", "bv")
    val salted = Joins.saltedJoin(probe, build, "k", "bk",
      salts = 4, probeSalt = xxhash64(col("pv")))
    val plain = probe.join(build, col("k") === col("bk"))
    assert(canon(salted) == canon(plain))
    assert(salted.columns.toSeq == plain.columns.toSeq) // salt cols dropped
  }

  test("saltedJoin with salts = 1 degenerates to the plain join") {
    val probe = Seq((1L, "a"), (2L, "b")).toDF("k", "pv")
    val build = Seq((1L, 10), (1L, 11), (3L, 12)).toDF("bk", "bv")
    val salted = Joins.saltedJoin(probe, build, "k", "bk",
      salts = 1, probeSalt = xxhash64(col("pv")))
    assert(canon(salted) == canon(probe.join(build, col("k") === col("bk"))))
  }

  test("saltedJoin duplicates no pair: every matching pair appears exactly once") {
    // every probe row must meet every matching build row exactly once even
    // when the same key repeats on both sides
    val probe = Seq((5L, 1), (5L, 2)).toDF("k", "pv")
    val build = Seq((5L, 10), (5L, 20), (5L, 30)).toDF("bk", "bv")
    val out = Joins.saltedJoin(probe, build, "k", "bk",
      salts = 8, probeSalt = xxhash64(col("pv"))).collect()
    assert(out.length == 6)
    assert(out.map(r => (r.getInt(1), r.getInt(3))).toSet ==
      (for (p <- Seq(1, 2); b <- Seq(10, 20, 30)) yield (p, b)).toSet)
  }
}
