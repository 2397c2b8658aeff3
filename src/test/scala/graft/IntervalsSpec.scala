package graft

import graft.ext.Intervals
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed interval-join semantics: inclusive bounds, key isolation,
  * exactly-once pairs across bucket-spanning intervals, and floor-division
  * bucketing on negative clocks.
  */
class IntervalsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rangeJoinBucketed: inclusive bounds, key isolation, exactly-once pairs") {
    val intervals = Seq(
      ("A", 1L, 100L, 200L), // spans buckets 1 and 2 at width 100
      ("B", 1L, 150L, 160L),
      ("C", 2L, 100L, 200L))
      .toDF("iv_id", "user_id", "start_us", "end_us")
    val points = Seq(
      (10L, 1L, 100L), // start boundary → A
      (11L, 1L, 200L), // end boundary → A
      (12L, 1L, 155L), // inside A and B
      (13L, 1L, 250L), // no interval
      (14L, 2L, 155L), // C only — never crosses into user 1's intervals
      (15L, 3L, 155L)) // keyless
      .toDF("pt_id", "user_id", "us")
    val got = Intervals.rangeJoinBucketed(intervals, points,
      Seq("user_id"), "start_us", "end_us", "us", bucketUs = 100L)
      .select("pt_id", "iv_id").as[(Long, String)].collect().sorted.toList
    // a Seq (not a Set) so a bucket-spanning duplicate pair would fail
    assert(got == List((10L, "A"), (11L, "A"), (12L, "A"), (12L, "B"),
      (14L, "C")))
  }

  test("rangeJoinBucketed stays exact on nanosecond-scale clocks (> 2^53)") {
    // bucket arithmetic must be true integer division: a double round-trip
    // at ~1.7e18 ns carries 256-ulp input rounding
    val t0 = 1700000000000000000L // ns epoch, well above 2^53
    val hourNs = 3600000000000L
    val intervals = Seq(("G", 1L, t0, t0 + hourNs))
      .toDF("iv_id", "user_id", "start_us", "end_us")
    val points = Seq(
      (30L, 1L, t0),              // start boundary
      (31L, 1L, t0 + hourNs),     // end boundary (next bucket)
      (32L, 1L, t0 + hourNs + 1)) // just outside
      .toDF("pt_id", "user_id", "us")
    val got = Intervals.rangeJoinBucketed(intervals, points,
      Seq("user_id"), "start_us", "end_us", "us", bucketUs = hourNs)
      .select("pt_id").as[Long].collect().sorted.toList
    assert(got == List(30L, 31L))
  }

  test("rangeJoinBucketed ≡ brute-force range join on randomized relations") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3; bucketUs <- Seq(1L, 7L, 100L)) {
      val intervals = (0 until 25).map { i =>
        val start = rnd.nextInt(200) - 100L
        (i.toLong, rnd.nextInt(4).toLong, start, start + rnd.nextInt(40))
      }
      val points = (0 until 60).map { i =>
        (100L + i, rnd.nextInt(4).toLong, rnd.nextInt(240) - 120L)
      }
      val got = Intervals.rangeJoinBucketed(
        intervals.toDF("iv_id", "user_id", "start_us", "end_us"),
        points.toDF("pt_id", "user_id", "us"),
        Seq("user_id"), "start_us", "end_us", "us", bucketUs)
        .select("iv_id", "pt_id").as[(Long, Long)].collect().sorted.toList
      val expected = (for {
        (iv, k, s, e) <- intervals
        (pt, pk, ts) <- points
        if pk == k && ts >= s && ts <= e
      } yield (iv, pt)).sorted.toList
      assert(got == expected, s"trial $trial bucketUs=$bucketUs")
    }
  }

  test("rangeJoinBucketed filters inverted intervals instead of exploding them") {
    // end < start matches nothing under inclusive BETWEEN; pre-explode
    // filtering means the malformed row costs one comparison, and the
    // descending sequence (which would otherwise generate phantom buckets
    // or fail) is never built
    val intervals = Seq(("I", 1L, 500L, 100L), ("V", 1L, 100L, 200L))
      .toDF("iv_id", "user_id", "start_us", "end_us")
    val points = Seq((10L, 1L, 150L), (11L, 1L, 300L))
      .toDF("pt_id", "user_id", "us")
    val got = Intervals.rangeJoinBucketed(intervals, points,
      Seq("user_id"), "start_us", "end_us", "us", bucketUs = 100L)
      .select("pt_id", "iv_id").as[(Long, String)].collect().toList
    assert(got == List((10L, "V")))
  }

  test("rangeJoinBucketed fails loudly past the per-interval fanout cap") {
    val intervals = Seq(("W", 1L, 0L, 10000L))
      .toDF("iv_id", "user_id", "start_us", "end_us")
    val points = Seq((10L, 1L, 5L)).toDF("pt_id", "user_id", "us")
    val ex = intercept[Exception] {
      Intervals.rangeJoinBucketed(intervals, points,
        Seq("user_id"), "start_us", "end_us", "us", bucketUs = 1L,
        maxBucketsPerInterval = 100L).collect()
    }
    assert(ex.getMessage.contains("rangeJoinBucketed") ||
      Option(ex.getCause).exists(_.getMessage.contains("rangeJoinBucketed")))
    // same span succeeds under the default cap
    val ok = Intervals.rangeJoinBucketed(intervals, points,
      Seq("user_id"), "start_us", "end_us", "us", bucketUs = 1L)
      .select("pt_id").as[Long].collect().toList
    assert(ok == List(10L))
  }

  test("rangeJoinBucketed tolerates a user column named _bucket0") {
    val intervals = Seq(("A", 1L, 100L, 200L, "ivb"))
      .toDF("iv_id", "user_id", "start_us", "end_us", "_bucket0")
    val points = Seq((10L, 1L, 150L)).toDF("pt_id", "user_id", "us")
    val got = Intervals.rangeJoinBucketed(intervals, points,
      Seq("user_id"), "start_us", "end_us", "us", bucketUs = 100L)
    assert(got.columns.count(_ == "_bucket0") == 1) // user's column survives
    assert(got.select("pt_id", "_bucket0").as[(Long, String)]
      .collect().toList == List((10L, "ivb")))
  }

  test("rangeJoinBucketed buckets negative clocks by floor division") {
    val intervals = Seq(("N", 1L, -150L, -50L))
      .toDF("iv_id", "user_id", "start_us", "end_us")
    val points = Seq((20L, 1L, -100L), (21L, 1L, -151L), (22L, 1L, -49L))
      .toDF("pt_id", "user_id", "us")
    val got = Intervals.rangeJoinBucketed(intervals, points,
      Seq("user_id"), "start_us", "end_us", "us", bucketUs = 100L)
      .select("pt_id", "iv_id").as[(Long, String)].collect().toList
    assert(got == List((20L, "N")))
  }
}
