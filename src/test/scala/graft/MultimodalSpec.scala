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

  test("sampleFrames emits every Nth chunk with its offset") {
    val docs = Seq((1L, "aabbccddee")).toDF("doc_id", "text") // 5 chunks of 2
    val out = Multimodal.sampleFrames(
      Multimodal.withFakeBlob(docs, "text"), chunkBytes = 2, everyN = 2)
      .select("frame_idx", "frame_len").as[(Int, Int)].collect().toSeq.sorted
    assert(out == Seq((0, 2), (2, 2), (4, 2))) // frames 0,2,4 sampled
  }
}
