package graft

import graft.ext.{Corpus, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input behavior, pinned: a 100 TB corpus always contains
  * nulls, empties, and single-token rows, and the operators must neither
  * crash nor silently corrupt neighboring rows. Null text drops out of
  * pair outputs (null keys never equi-join) — the documented contract is
  * that callers filter nulls explicitly when they need them reported.
  */
class EdgeCaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val messy = Seq(
    (1L, "normal document with several plain tokens inside"),
    (2L, "normal document with several plain tokens inside"),
    (3L, null.asInstanceOf[String]),
    (4L, ""),
    (5L, ""),
    (6L, "single"),
    (7L, "käsefondue with ünïcode tokens straße 東京 content"))
    .toDF("doc_id", "text")

  test("exact dedup: null and empty texts group among themselves only") {
    val out = Dedup.exact(messy, "text", "doc_id")
      .select("keeper_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(out(1L) == 2L) // the two normal dups
    assert(out(4L) == 2L) // the two empties group together
    assert(out(3L) == 1L) // null groups alone (sha2(null) = null group)
    assert(out(6L) == 1L && out(7L) == 1L)
  }

  test("minhash pairs: nulls drop, empties pair at jaccard 1.0, no crashes") {
    val pairs = Dedup.minhashPairs(messy, "text", "doc_id", threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs.contains((1L, 2L, 1.0)))
    assert(pairs.contains((4L, 5L, 1.0)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "null text must not pair")
  }

  test("simhash pairs: identical/empty docs pair at distance 0, nulls drop") {
    val pairs = Dedup.simhashPairs(messy, "text", "doc_id", maxHamming = 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 2L, 0)))
    assert(pairs.contains((4L, 5L, 0)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram pairs: sub-n-token docs produce empty gram sets and never pair") {
    val docs = messy.withColumn("source", lit("one"))
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", "source", n = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // "single"/""/null have no bigrams
  }

  test("connected components: empty edge set labels every node a singleton") {
    val nodes = (1L to 5L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val out = Dedup.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(out == (1L to 5L).map(i => i -> i).toMap)
  }

  test("connected components: a chain contracts to its minimum") {
    val nodes = (1L to 6L).toDF("id")
    val edges = Seq((6L, 5L), (5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L))
      .toDF("src", "dst")
    val out = Dedup.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(out == (1L to 6L).map(i => i -> 1L).toMap)
  }

  test("round-8 operators tolerate the messy corpus without corruption") {
    // normalized dedup: empties and nulls keep exact()'s grouping contract,
    // and unicode text survives lower() untouched
    val norm = Dedup.exactNormalized(messy, "text", "doc_id")
      .select("keeper_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(norm(1L) == 2L && norm(4L) == 2L && norm(3L) == 1L)
    // corpus stats: a group whose every doc is empty still yields exact
    // zeros... an empty string is ONE empty token for tokenCount, so the
    // quantiles are 1 (same contract as q20); null text is excluded
    val stats = Corpus.corpusStats(messy.withColumn("g", lit("all")),
        Seq("g"), "text")
      .as[(String, Long, Double, Long, Long, Long)].collect().head
    assert(stats._2 == 6L) // 7 docs minus the null
    // sentence decon: empty-vs-empty never "leaks" (under the length floor)
    val sd = Corpus.decontaminateSentences(messy, messy, "text", "doc_id")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(sd(4L) == 0L && sd(3L) == 0L)
    // quantized ANN machinery: empty and null vectors don't crash
    import graft.ext.Similarity
    val vecs = Seq((1L, Seq.empty[Float]), (2L, Seq(0.5f)))
      .toDF("vec_id", "embedding")
    val qdq = vecs.select(
        Similarity.dequantize(Similarity.quantize(col("embedding"), 200.0),
          200.0).as("v"))
      .as[Seq[Double]].collect()
    assert(qdq(0).isEmpty && qdq(1) == Seq(0.5))
    // model quality gate: null text scores null and never gates true
    val gate = messy.select(col("doc_id"),
        (TextAnalysis.modelQualityScore(col("text"),
          graft.queries.TextQueries.fixtureWeights, 0.0,
          portable = true) >= 0).as("keep"))
      .as[(Long, Option[Boolean])].collect().toMap
    assert(gate(3L).isEmpty) // NULL, not true/false
    assert(gate(1L).isDefined)
  }

  test("text analysis and split assignment tolerate empty and unicode text") {
    val out = messy.where(col("text").isNotNull)
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(6L)._1 == 1)
    assert(out(7L)._2 != 0L) // unicode text fingerprints without crashing
    val splits = Corpus.splitAssign(messy.where(col("text").isNotNull), "text")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(splits.values.forall(Set("train", "val", "test")))
  }

  test("dsirWeights with an EMPTY target degenerates to rarity-minus-constant") {
    // zero target bigrams: every bucket's target surprisal is the same
    // floor(log2((0+64) div 1)) = 6-bit constant, so weights become
    // "rarity under raw − 6·n_bigrams" — deterministic, never a crash,
    // and documented as meaning nothing about any domain
    val raw = (Seq.tabulate(62)(i => (i.toLong, "aa bb")) ++
      Seq((100L, "xx zz"), (101L, "xx zz"))).toDF("doc_id", "text")
    val empty = raw.where(col("doc_id") < 0)
    val byId = Corpus.dsirWeights(raw, empty, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // common bucket: floor(log2(128//63)) − 6 = 1 − 6; rare: 5 − 6
    assert(byId(0L) == -5L && byId(100L) == -1L)
    // messy corpus: no-gram docs stay (0, 0, false) under an empty target
    val messyOut = Corpus.dsirWeights(messy, messy.where(col("doc_id") < 0),
      "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(messyOut(3L) == 0L && messyOut(6L) == 0L)
  }

  test("binary quantization tolerates empty corpora, zero vectors, dim 1") {
    import graft.ext.Similarity
    val some = Seq((1L, Seq(0.5, -0.2)), (2L, Seq(-0.1, 0.9)))
      .toDF("vec_id", "embedding")
    val none = some.where(lit(false))
    // empty corpus -> empty result, no pool/rank blowup
    assert(Similarity.binaryTopK(some, none, k = 3, dim = 2).count() == 0)
    // empty query side -> empty result
    assert(Similarity.binaryTopK(none, some, k = 3, dim = 2).count() == 0)
    // a ZERO vector must neither crash the rerank (under ANSI a bare
    // double /0 THROWS — the round-15 safeCosine guard) nor win rank 1
    // (Spark AND DuckDB sort NaN as the LARGEST double): undefined-
    // direction pairs are EXCLUDED before ranking, the
    // simhashSignatures null-doc rule
    val withZero = some.union(
      Seq((3L, Seq(0.0, 0.0))).toDF("vec_id", "embedding"))
    val out = Similarity.binaryTopK(withZero.where(col("vec_id") === 1),
      withZero, k = 2, dim = 2)
      .collect().map(r => r.getInt(4) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 2L)) // the zero vector never pairs
    // a zero-norm QUERY likewise returns no rows instead of crashing
    assert(Similarity.binaryTopK(withZero.where(col("vec_id") === 3),
      some, k = 2, dim = 2).count() == 0)
    // dim 1: one word, one bit
    val d1 = Seq((1L, Seq(1.0)), (2L, Seq(-1.0))).toDF("vec_id", "embedding")
    val w = d1.select(Similarity.binarySignWords(col("embedding"), 1))
      .collect().map(_.getSeq[Long](0))
    assert(w.map(_.toList).toSet == Set(List(1L), List(0L)))
  }

  test("similarity round-12 operators tolerate empty and null-vector inputs") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val some = Seq((1L, "A", Seq(1.0f, 0.0f)), (2L, "B", Seq(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val none = some.where(lit(false))
    // hard negatives: empty corpus -> empty result, never a crash
    assert(graft.ext.Similarity.hardNegatives(
      some.where(col("vec_id") === 1), none, k = 5).count() == 0)
    // single-label corpus: every candidate filtered -> empty, not error
    assert(graft.ext.Similarity.hardNegatives(
      some.where(col("vec_id") === 1),
      some.withColumn("label", lit("A")), k = 5).count() == 0)
    // recallAtK: empty exact side -> empty report (nothing to recall)
    assert(graft.ext.Similarity.recallAtK(
      none.select(col("vec_id").as("query_id"),
        col("vec_id").as("neighbor_id")),
      some.select(col("vec_id").as("query_id"),
        col("vec_id").as("neighbor_id"))).count() == 0)
    // embeddingDrift: one side EMPTY -> its shares are 0 (the tot > 0
    // guard), the other side's full mass reports, no division blows up
    val drift = graft.ext.Similarity
      .embeddingDrift(some.select("vec_id", "embedding"), none, cents)
      .collect().map(r => (r.getInt(0), r.getLong(3), r.getLong(4))).toSet
    assert(drift == Set((0, 500000L, 0L), (1, 500000L, 0L)))
    // NULL vectors drop on both sides, like null text in corpusStats
    val withNull = some.union(Seq((3L, "C",
      null.asInstanceOf[Seq[Float]])).toDF("vec_id", "label", "embedding"))
    assert(graft.ext.Similarity
      .embeddingDrift(withNull, withNull, cents)
      .agg(sum(col("n_a"))).head().getLong(0) == 2L)
  }
}
