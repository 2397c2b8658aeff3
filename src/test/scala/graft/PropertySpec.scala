package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence properties: the distributed operators must match
  * plain-Scala reference implementations on arbitrary small inputs. These
  * exist to harden the structural refactors (exact-collapse + expansion,
  * star-contraction CC) beyond the planted-case specs — a bug in class
  * expansion or star rewiring that happens to preserve the planted cases
  * has to survive 40 random corpora and 30 random graphs here too.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  test("minhashPairs == brute-force exact Jaccard on random dup-heavy corpora") {
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 8) {
      // base docs + exact copies + near-misses, ids shuffled
      val bases = Seq.fill(5)(rnd.shuffle(vocab).take(6 + rnd.nextInt(5)))
      val docs = rnd.shuffle(
        Seq.tabulate(30) { i =>
          val b = bases(rnd.nextInt(bases.size))
          val words =
            if (rnd.nextBoolean()) b // exact copy of a base
            else if (rnd.nextBoolean()) b.updated(rnd.nextInt(b.size),
              vocab(rnd.nextInt(vocab.size))) // 1-token perturbation
            else rnd.shuffle(vocab).take(4 + rnd.nextInt(6))
          (i.toLong, words.mkString(" "))
        })
      val threshold = 0.65 + rnd.nextInt(3) * 0.1
      val got = Dedup.minhashPairs(docs.toDF("doc_id", "text"), "text", "doc_id",
          threshold = threshold, bands = 16)
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
      val want = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        sa = ta.split(" ").toSet; sb = tb.split(" ").toSet
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size if j >= threshold
      } yield (ia, ib) -> j).toMap
      // r=2/b=16 banding recall at these thresholds is ≈1 but not a theorem;
      // assert no FALSE pairs ever, exact values on everything found, and
      // recall 1 in practice on these sizes (a miss here means a real bug)
      assert(got == want, s"trial $trial t=$threshold")
    }
  }

  test("connectedComponents handles hub graphs (star + chain) exactly") {
    // the shapes that stress the contraction: a high-degree hub (every
    // leaf attached to one center) and a long chain (worst case for
    // label propagation), sharing one node
    val hubLeaves = (100L to 400L).map(i => (50L, i))
    val chain = (1L to 12L).sliding(2).map(p => (p.head, p.last)).toSeq
    val bridge = Seq((12L, 50L)) // chain joins the hub's component
    val loners = Seq(900L, 901L)
    val nodes = (hubLeaves.flatMap(e => Seq(e._1, e._2)) ++
      chain.flatMap(e => Seq(e._1, e._2)) ++ loners).distinct.toDF("id")
    val edges = (hubLeaves ++ chain ++ bridge).toDF("src", "dst")
    val out = Dedup.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(out(50L) == 1L && out(400L) == 1L && out(12L) == 1L)
    assert(out(900L) == 900L && out(901L) == 901L)
    assert(out.values.toSet == Set(1L, 900L, 901L))
  }

  test("connectedComponents == union-find on random graphs") {
    val rnd = new scala.util.Random(53)
    for (trial <- 1 to 6) {
      val n = 2 + rnd.nextInt(40)
      val ids = rnd.shuffle((1L to 200L).toVector).take(n)
      val edges = Seq.fill(rnd.nextInt(2 * n))(
        (ids(rnd.nextInt(n)), ids(rnd.nextInt(n))))
      val got = Dedup.connectedComponents(
          ids.toDF("id"), edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      // plain union-find
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      for ((a, b) <- edges) { val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      val want = ids.map(i => i -> find(i)).toMap
      assert(got == want, s"trial $trial n=$n edges=${edges.size}")
    }
  }
}
