package graft

import graft.ext.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer fixed-point PageRank: must replay a plain-Scala reference of
  * the same integer update exactly (that is the whole point of the
  * integerization), honor the obvious structural orderings, and build
  * co-occurrence edges without cross-group contamination.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          damping: Long = 850L,
                          scale: Long = 1000000L): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val outdeg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    val base = scale * (1000 - damping) / 1000
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (src, _) => r(src) / outdeg(src) }.sum
      }
      r = nodes.map(n => n -> (base + damping * contrib.getOrElse(n, 0L) / 1000))
        .toMap
    }
    r
  }

  test("pageRankInt ≡ plain-Scala integer reference on a random digraph") {
    val rnd = new scala.util.Random(99)
    val edges = Seq.fill(120)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(p => p._1 != p._2)
    val got = Graph.pageRankInt(edges.toDF("src", "dst"), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == refPageRank(edges, iters = 4))
  }

  test("weighted pagerank ≡ unweighted at equal weights; weight pulls rank") {
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(80)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(p => p._1 != p._2).distinct
    // all-equal weights must reproduce the unweighted ranks exactly
    // ((r·c) div (deg·c) = r div deg for any constant c)
    val unw = Graph.pageRankInt(edges.toDF("src", "dst"), iters = 4)
      .as[(Long, Long)].collect().toMap
    for (c <- Seq(1L, 7L)) {
      val w = Graph.pageRankIntWeighted(
        edges.map(p => (p._1, p._2, c)).toDF("src", "dst", "w"), iters = 4)
        .as[(Long, Long)].collect().toMap
      assert(w == unw, s"constant weight $c")
    }
    // a hub splitting mass 9:1 ranks the heavy target above the light one
    val star = Seq((0L, 1L, 9L), (0L, 2L, 1L), (1L, 0L, 1L), (2L, 0L, 1L))
    val r = Graph.pageRankIntWeighted(star.toDF("src", "dst", "w"),
      iters = 3).as[(Long, Long)].collect().toMap
    assert(r(1L) > r(2L))
    // parallel (src, dst) rows merge by summing: (0→1, w 4)+(0→1, w 5)
    // equals one 0→1 edge of weight 9
    val merged = Graph.pageRankIntWeighted(
      (Seq((0L, 1L, 4L), (0L, 1L, 5L)) ++ star.drop(1))
        .toDF("src", "dst", "w"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(merged == r)
  }

  test("symmetric 2-cycle is a fixpoint at exactly `scale`; hubs outrank leaves") {
    // a <-> b: r' = 150000 + 850·(10⁶ div 1) div 1000 = 10⁶ every round
    val cyc = Graph.pageRankInt(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"),
      iters = 6).as[(Long, Long)].collect().toMap
    assert(cyc == Map(1L -> 1000000L, 2L -> 1000000L))
    // undirected star 0—{1,2,3}: the hub receives three whole ranks,
    // each leaf a third of the hub's
    val star = Seq((0L, 1L), (1L, 0L), (0L, 2L), (2L, 0L), (0L, 3L),
      (3L, 0L))
    val r = Graph.pageRankInt(star.toDF("src", "dst"), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(r(0L) > r(1L) && r(1L) == r(2L) && r(2L) == r(3L))
  }

  test("triangleCounts ≡ brute force; K4, path, and isolated-in-triangle cases") {
    // K4: every node sits in C(3,2) = 3 triangles; the pendant path node
    // (5) and the triangle-free edge (6-7) report 0
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val edges = k4 ++ Seq((3L, 5L), (6L, 7L))
    val got = Graph.triangleCounts(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L, 5L -> 0L,
      6L -> 0L, 7L -> 0L))
    // randomized graph vs brute-force enumeration
    val rnd = new scala.util.Random(7)
    val re = Seq.fill(150)((rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val es = re.toSet
    val nodes = re.flatMap(p => Seq(p._1, p._2)).distinct
    val want = nodes.map { n =>
      n -> (for {
        (a, b) <- re; c <- nodes
        if c != a && c != b && es.contains((math.min(a, c), math.max(a, c))) &&
          es.contains((math.min(b, c), math.max(b, c)))
        if Seq(a, b, c).contains(n)
      } yield Set(a, b, c)).distinct.size.toLong
    }.toMap
    val got2 = Graph.triangleCounts(re.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got2 == want)
  }

  test("seedDistances: BFS levels, multi-source min, hop cap, isolated seeds") {
    //   1 - 2 - 3 - 4 - 5   and seed 10 isolated; seeds {1, 4}
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = chain.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val got = Graph.seedDistances(edges.toDF("src", "dst"),
      Seq(1L, 4L, 10L).toDF("id"), maxHops = 2)
      .as[(Long, Int)].collect().toMap
    // node 3 is 2 hops from 1 but 1 hop from 4 → min wins; node 10 is a
    // seed with no edges (dist 0); nothing beyond 2 hops appears — here
    // everything is within 2 of some seed
    assert(got == Map(1L -> 0, 4L -> 0, 10L -> 0, 2L -> 1, 3L -> 1,
      5L -> 1))
    // hop cap actually cuts: from seed 1 only, node 5 (4 hops) is absent
    val capped = Graph.seedDistances(edges.toDF("src", "dst"),
      Seq(1L).toDF("id"), maxHops = 2)
      .as[(Long, Int)].collect().toMap
    assert(capped == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("kCorePeel: K5 core survives, chains cascade exactly one layer per round") {
    // K5 (every degree 4) + a pendant path 4-10-11-12: at k = 2 the path
    // peels ONE layer per round (12 goes first, then 11, then 10), so
    // the rounds bound is observable round by round
    val k5 = for (a <- 0L to 4L; b <- 0L to 4L if a < b) yield (a, b)
    val edges = (k5 ++ Seq((4L, 10L), (10L, 11L), (11L, 12L)))
      .toDF("src", "dst")
    def survivors(rounds: Int): Map[Long, Long] =
      Graph.kCorePeel(edges, k = 2, rounds = rounds)
        .as[(Long, Long)].collect().toMap
    // round 1: node 12 (deg 1) drops; 11 still had deg 2 when counted
    assert(survivors(1).keySet == Set(0L, 1L, 2L, 3L, 4L, 10L, 11L))
    // round 2: 11 (now deg 1) drops; round 3: 10 drops; K5 is stable
    assert(survivors(2).keySet == Set(0L, 1L, 2L, 3L, 4L, 10L))
    val s3 = survivors(3)
    assert(s3.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(s3.values.toSet == Set(4L)) // the clean K5: every degree 4
    // at k = 5 even K5 dies in one round
    assert(Graph.kCorePeel(edges, k = 5, rounds = 1).isEmpty)
  }

  test("coOccurrenceEdges pairs within groups only, both orientations, deduped") {
    val df = Seq((10L, "a"), (10L, "b"), (10L, "c"), (20L, "c"), (20L, "d"),
      (30L, "a"), (30L, "b"), // repeat pair in another group — must dedup
      (40L, "e"), // singleton group — no edges
      (50L, null.asInstanceOf[String])).toDF("grp", "item")
    val got = Graph.coOccurrenceEdges(df, "grp", "item")
      .as[(String, String)].collect().toSet
    val within = Set(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"))
    assert(got == within.flatMap { case (x, y) => Set((x, y), (y, x)) })
  }
}
