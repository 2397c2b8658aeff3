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

  test("corpusStats == naive sorted-array quantiles on random groups") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 6) {
      val docs = (0 until 3).flatMap { g =>
        val n = 1 + rnd.nextInt(40) // including 1-doc groups
        Seq.fill(n)((s"g$g", ("w " * (1 + rnd.nextInt(30))).trim))
      }
      val got = graft.ext.Corpus.corpusStats(docs.toDF("source", "text"),
          Seq("source"), "text")
        .as[(String, Long, Double, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      for ((g, lens0) <- docs.groupBy(_._1)) {
        val lens = lens0.map(_._2.split(" ").length.toLong).sorted
        val n = lens.size
        def q(p: Int) = lens(((n - 1) * p / 100).toInt)
        val (_, nd, mean, p50, p90, p99) = got(g)
        assert(nd == n.toLong, s"trial $trial $g")
        assert(mean == lens.sum.toDouble / n, s"trial $trial $g")
        assert((p50, p90, p99) == ((q(50), q(90), q(99))), s"trial $trial $g")
      }
    }
  }

  test("decontaminateSentences == brute-force set check on random corpora") {
    val rnd = new scala.util.Random(73)
    val sentences = Vector.tabulate(12)(i =>
      s"sentence number $i with enough words to pass the floor")
    for (trial <- 1 to 5) {
      def doc() = Seq.fill(1 + rnd.nextInt(4))(
        sentences(rnd.nextInt(sentences.size))).mkString(". ")
      val train = Seq.tabulate(10)(i => (i.toLong, doc())).toDF("doc_id", "text")
      val eval_ = Seq.tabulate(6)(i => (100L + i, doc()))
      val got = graft.ext.Corpus.decontaminateSentences(
          train.toDF(), eval_.toDF("doc_id", "text"), "text", "doc_id")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val trainSet = train.as[(Long, String)].collect()
        .flatMap(_._2.split("[.!?]+")).map(_.trim).filter(_.length >= 20).toSet
      for ((id, text) <- eval_) {
        val ss = text.split("[.!?]+").map(_.trim)
          .filter(_.length >= 20).distinct
        val want = (ss.length.toLong, ss.count(trainSet).toLong)
        assert(got(id) == want, s"trial $trial doc $id")
      }
    }
  }

  test("docNovelty == brute-force trigram sharing on random corpora") {
    val rnd = new scala.util.Random(71)
    for (trial <- 1 to 8) {
      val docs = Seq.tabulate(25) { i =>
        val words = Seq.fill(rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size)))
        (i.toLong, if (rnd.nextInt(10) == 0) null else words.mkString(" "))
      }
      val got = graft.ext.Corpus.docNovelty(
          docs.toDF("doc_id", "text"), "text", "doc_id")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      // plain-Scala reference: distinct trigram STRINGS per doc, df over
      // docs, df>1 = shared (hash == string equality modulo 2^-64)
      def grams(t: String): Set[String] = {
        val w = t.split(" ", -1)
        (0 to w.length - 3).map(j => s"${w(j)} ${w(j + 1)} ${w(j + 2)}").toSet
      }
      val sets = docs.collect { case (id, t) if t != null => id -> grams(t) }
      val df = sets.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
      for ((id, t) <- docs) {
        val gs = if (t == null) Set.empty[String] else grams(t)
        val shared = gs.count(g => df(g) > 1).toLong
        val frac = if (gs.isEmpty) 0.0 else shared.toDouble / gs.size
        assert(got(id) == ((gs.size.toLong, shared, frac)),
          s"trial $trial doc $id")
      }
    }
  }

  test("dsirWeights == brute-force bucket log-ratios on random corpora") {
    val rnd = new scala.util.Random(29)
    def fold(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c) % 1000000007L)
    def bits(tot: Long, c: Long): Long = {
      val r = (tot + 64) / (c + 1)
      63L - java.lang.Long.numberOfLeadingZeros(r) // floor(log2), r >= 1
    }
    for (trial <- 1 to 8) {
      val docs = Seq.tabulate(20) { i =>
        val words = Seq.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        (i.toLong, if (rnd.nextInt(12) == 0) null else words.mkString(" "))
      }
      val raw = docs.toDF("doc_id", "text")
      val got = graft.ext.Corpus.dsirWeights(
          raw, raw.where(col("doc_id") % 3 === 0), "text", "doc_id")
        .as[(Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      def bigrams(t: String): Seq[Long] = {
        val w = t.split(" ", -1)
        (0 to w.length - 2).map(j => fold(s"${w(j)} ${w(j + 1)}") % 64)
      }
      val occ = docs.collect { case (id, t) if t != null => id -> bigrams(t) }
      val rawB = occ.flatMap(_._2)
      val tgtB = occ.collect { case (id, bs) if id % 3 == 0 => bs }.flatten
      val cr = rawB.groupBy(identity).view.mapValues(_.size.toLong)
      val ct = tgtB.groupBy(identity).view.mapValues(_.size.toLong)
        .toMap.withDefaultValue(0L)
      for ((id, t) <- docs) {
        val bs = if (t == null) Seq.empty[Long] else bigrams(t)
        val w = bs.map(b =>
          bits(rawB.size, cr(b)) - bits(tgtB.size, ct(b))).sum
        assert(got(id) == ((bs.size.toLong, w, w > 0)),
          s"trial $trial doc $id")
      }
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

  test("hardNegatives == topKBruteForce over the label-filtered corpus") {
    // the operator's defining identity, per query: mining hard negatives
    // equals plain top-k over the corpus with the query's own label
    // removed — checked on the real embeddings fixture
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for (qid <- Seq(0L, 3L, 7L)) {
      val q = emb.where(col("vec_id") === qid)
      val qLabel = q.select("label").head().getInt(0)
      val mined = graft.ext.Similarity.hardNegatives(q, emb, k = 8)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .collect().map(_.toSeq).toSeq
      val reference = graft.ext.Similarity.topKBruteForce(
          q, emb.where(col("label") =!= qLabel), k = 8)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .collect().map(_.toSeq).toSeq
      assert(mined == reference, s"query $qid")
    }
  }

  test("recallAtK: identity gives recall 1.0; disjoint gives 0.0") {
    val exact = graft.ext.Similarity.topKBruteForce(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where(col("vec_id") < 4),
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"), k = 5)
    val self = graft.ext.Similarity.recallAtK(exact, exact).collect()
    assert(self.length == 4 && self.forall(_.getAs[Double]("recall") == 1.0))
    val shifted = exact.withColumn("neighbor_id",
      col("neighbor_id") + lit(10000000L))
    val none = graft.ext.Similarity.recallAtK(exact, shifted).collect()
    assert(none.forall(_.getAs[Double]("recall") == 0.0))
  }

  test("chunkDedupWithinDoc == plain-Scala first-occurrence trim on random docs") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 10) {
      val docs = Seq.tabulate(12) { i =>
        // random texts with deliberate self-repeats: chunkTokens=2 so
        // two-word chunks collide often
        val words = Seq.fill(2 * (1 + rnd.nextInt(6)))(
          vocab(rnd.nextInt(4))) // tiny alphabet forces repeats
        (i.toLong, words.mkString(" "))
      }
      val got = graft.ext.Dedup.chunkDedupWithinDoc(
          docs.toDF("doc_id", "text"), "text", "doc_id", chunkTokens = 2)
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      docs.foreach { case (id, text) =>
        val chunks = text.split(" ").grouped(2).map(_.mkString(" ")).toSeq
        val expect = chunks.distinct.mkString(" ") // first-occurrence order
        assert(got(id) == expect, s"trial $trial doc $id: $text")
      }
    }
  }
}
