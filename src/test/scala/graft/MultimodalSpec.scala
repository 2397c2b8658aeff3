package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: the decode is a stub, but schema, binary handling,
  * partition-batched execution, and determinism are real contracts.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fakeDecode is deterministic and tracks byte stats") {
    val bytes = "hello".getBytes("UTF-8")
    val (fmt, w, h, mean) = Multimodal.fakeDecode(bytes)
    assert(Multimodal.fakeDecode(bytes) == ((fmt, w, h, mean)))
    assert(mean == bytes.map(_ & 0xff).sum.toDouble / bytes.length)
    assert(Multimodal.fakeDecode(Array.emptyByteArray)._4 == 0.0)
  }

  test("decodeMedia emits the declared metadata schema, one row per blob") {
    val docs = Seq((1L, "abc"), (2L, "defghi"), (3L, "")).toDF("doc_id", "text")
    val out = Multimodal.decodeMedia(spark, Multimodal.withFakeBlob(docs, "text"))
    assert(out.schema == Multimodal.mediaMetaSchema)
    val rows = out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows == Map(1L -> 3, 2L -> 6, 3L -> 0))
  }

  test("embedMedia: deterministic vectors, identical blobs pair in ANN") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally different content with other words entirely here"))
      .toDF("doc_id", "text")
    val vecs = Multimodal.embedMedia(spark, Multimodal.withFakeBlob(docs, "text"))
    assert(vecs.schema == Multimodal.mediaEmbeddingSchema)
    val collected = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(collected(1L) == collected(2L))
    assert(collected(1L) != collected(3L))
    assert(collected(1L).sum > 0f)
    val pairs = graft.ext.Similarity
      .cosineDupPairsLsh(vecs, threshold = 0.99, dim = 64)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("sampleFrames emits every Nth chunk with its offset") {
    val docs = Seq((1L, "aabbccddee")).toDF("doc_id", "text") // 5 chunks of 2
    val out = Multimodal.sampleFrames(
      Multimodal.withFakeBlob(docs, "text"), chunkBytes = 2, everyN = 2)
      .select("frame_idx", "frame_len").as[(Int, Int)].collect().toSeq.sorted
    assert(out == Seq((0, 2), (2, 2), (4, 2))) // frames 0,2,4 sampled
  }
}
