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

  test("pngBlobs → decodeMedia round-trips real PNGs exactly") {
    val docs = Seq((1L, "abc"), (2L, "a longer document with more text"),
      (3L, "x")).toDF("doc_id", "text")
    val out = Multimodal.decodeMedia(spark,
        Multimodal.pngBlobs(spark, docs, "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getInt(3), r.getInt(4), r.getDouble(5)))).toMap
    def expect(text: String) = {
      val b = text.getBytes("UTF-8")
      val v = (b.map(_ & 0xffL).sum % 256).toDouble
      ("png", 1 + b.length % 48, 1 + (b.length / 2) % 48, v)
    }
    assert(out(1L) == expect("abc"))
    assert(out(2L) == expect("a longer document with more text"))
    assert(out(3L) == expect("x"))
    // the blob really is a PNG container (magic bytes), not pseudo-bytes
    val blob = Multimodal.pngBlobs(spark, docs, "text")
      .where(col("doc_id") === 1L).collect().head.getAs[Array[Byte]]("blob")
    assert((blob(0) & 0xff) == 0x89 && blob(1) == 'P' && blob(2) == 'N' &&
      blob(3) == 'G')
  }

  test("imageIoDecode rejects non-image bytes; decode falls back") {
    val garbage = "just some text, not an image".getBytes("UTF-8")
    assert(Multimodal.imageIoDecode(garbage).isEmpty)
    assert(Multimodal.decode(garbage) == Multimodal.fakeDecode(garbage))
    // a real PNG takes the real path, not the fallback
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach(y => (0 until 5).foreach(x =>
      img.setRGB(x, y, 0x0a141e))) // r=10 g=20 b=30 → mean 20
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Multimodal.decode(bos.toByteArray) == (("png", 5, 4, 20.0)))
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

  test("resizeMedia fits the box, preserves aspect, never upscales") {
    val docs = Seq((1L, "x" * 100), (2L, "y" * 3)).toDF("doc_id", "text")
    // n=100 → w=164, h=114; n=3 → w=67, h=65
    val out = Multimodal.resizeMedia(spark,
        Multimodal.withFakeBlob(docs, "text"), maxW = 82, maxH = 82)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    val (w1, h1, ow1, oh1) = out(1L)
    assert((w1, h1) == (164, 114))
    assert(ow1 <= 82 && oh1 <= 82)
    // aspect preserved within floor rounding: scale chosen by the W side
    assert(ow1 == 82 && oh1 == math.floor(114 * (82.0 / 164)).toInt)
    val (_, _, ow2, oh2) = out(2L)
    assert(ow2 <= 67 && oh2 <= 65, "small image must never upscale")
  }

  test("sampleFrames emits every Nth chunk with its offset") {
    val docs = Seq((1L, "aabbccddee")).toDF("doc_id", "text") // 5 chunks of 2
    val out = Multimodal.sampleFrames(
      Multimodal.withFakeBlob(docs, "text"), chunkBytes = 2, everyN = 2)
      .select("frame_idx", "frame_len").as[(Int, Int)].collect().toSeq.sorted
    assert(out == Seq((0, 2), (2, 2), (4, 2))) // frames 0,2,4 sampled
  }

  test("dHash: planted near-duplicate images pair; unrelated ones don't") {
    // same-length texts with a tiny byte-sum delta generate patterned
    // PNGs that differ by a uniform brightness shift — the dHash
    // perceptual property says most adjacent-cell comparisons survive,
    // so the pair lands within the Hamming budget; an unrelated text
    // (different length → different dims/multipliers) must not pair
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = "the quick brown fox jumps over the lazy dog again and agaio" // +1 byte sum
    val far = "completely different content with other words and lengths here yes"
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val hashes = Multimodal.dhashMedia(
      spark, Multimodal.patternPngBlobs(spark, docs, "text"))
    assert(hashes.schema == Multimodal.dhashSchema)
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs.values.forall(h => h >= 0L && h < (1L << 56))) // 56-bit, non-negative
    val pairs = graft.ext.Dedup
      .perceptualNearDupPairs(hashes, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted near-dup did not pair: $hs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"unrelated doc paired: $hs")
    // banding is EXACT by pigeonhole: equals brute force at every ham ≤ 6
    val brute = for {
      (a, ha) <- hs.toSeq; (b, hb) <- hs.toSeq if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 6
    } yield (a, b)
    assert(pairs == brute.toSet)
  }

  test("dHash is brightness-shift tolerant and wrap-aware by construction") {
    // direct unit check on the decoded-pixel path: a real PNG decodes to
    // the exact generated grays, so two texts whose only difference is a
    // small byte-sum delta yield hashes within a small Hamming distance
    val t1 = "abcdefghij klmnopqrst uvwxyz0123 456789abcd"
    val t2 = "abcdefghij klmnopqrst uvwxyz0123 456789abce" // sum +1
    val docs = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
    val hs = Multimodal.dhashMedia(
      spark, Multimodal.patternPngBlobs(spark, docs, "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(2L)) <= 6, hs.toString)
  }

  test("aHash: planted near-dup pairs, 63-bit range, banding == brute force") {
    // the planted pair is a TRUE BRIGHTNESS SHIFT: same length (so the
    // dims and the x-multiplier match) and a byte-sum delta of exactly
    // +23 ('a'→'x'), which is ≡ 0 (mod 23) so the y-multiplier
    // c = 13 + (s mod 23) matches too — every pixel of the second image
    // is the first's plus 23 (mod 256). Most cell-vs-mean comparisons
    // survive the shift (only wrap-affected cells flip): measured
    // Hamming 2, inside the banding radius — the same small-shift
    // tolerance story dHash's spec pins. The base text was searched for
    // under the fixture's own pixel formula (wrap-heavy texts can flip
    // more than 6 of 63 bits under a +23 shift; this one doesn't).
    val base = "again camera brown jumps sonata mean bright bright a"
    val near = "again camera brown jumps sonata mean bright bright x" // sum +23
    val far = "completely different content with other words and lengths here yes"
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val hashes = Multimodal.ahashMedia(
      spark, Multimodal.patternPngBlobs(spark, docs, "text"))
    assert(hashes.schema == Multimodal.ahashSchema)
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs.values.forall(_ >= 0L)) // bits 0..62 only — never the sign bit
    val pairs = graft.ext.Dedup
      .perceptualNearDupPairs(hashes, maxHamming = 6,
        hashCol = "ahash", hashBits = 63)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted near-dup did not pair: $hs")
    val brute = for {
      (a, ha) <- hs.toSeq; (b, hb) <- hs.toSeq if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 6
    } yield (a, b)
    assert(pairs == brute.toSet)
  }

  test("perceptualNearDupPairs rejects hash widths the 7 bands cannot cover") {
    // the old API took the chunk width directly, so bitsPer=7 over a
    // 56-bit hash silently banded only the low 49 bits — pairs differing
    // solely in bits 49-55 were missed, breaking the recall-1 pigeonhole
    // guarantee. Width is the parameter now; out-of-range widths fail loud.
    val hashes = Seq((1L, 5L)).toDF("doc_id", "dhash")
    intercept[IllegalArgumentException] {
      graft.ext.Dedup.perceptualNearDupPairs(hashes, hashBits = 64)
    }
    intercept[IllegalArgumentException] {
      graft.ext.Dedup.perceptualNearDupPairs(hashes, hashBits = 6)
    }
  }

  test("perceptual hashes stay total on REAL images smaller than the grid") {
    // a decodable 4x4 PNG (favicon-sized): grid cells clamp to >= 1
    // pixel instead of dividing by an empty box range
    import java.awt.image.BufferedImage
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 4)
      img.setRGB(x, y, (x * 60 + y * 17) * 0x010101)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val blobs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, bos.toByteArray))),
      Multimodal.blobSchema)
    val d = Multimodal.dhashMedia(spark, blobs).collect()
    val a = Multimodal.ahashMedia(spark, blobs).collect()
    assert(d.length == 1 && d.head.getLong(1) >= 0L)
    assert(a.length == 1 && a.head.getLong(1) >= 0L)
  }

  test("dhashMedia hashes non-image bytes through the fallback, total") {
    val out = Multimodal.dhashMedia(spark,
      Multimodal.withFakeBlob(Seq((7L, "not a png")).toDF("doc_id", "text"),
        "text"))
      .collect()
    assert(out.length == 1 && out.head.getLong(0) == 7L)
    assert(out.head.getLong(1) >= 0L)
  }

  test("documents fixture is ASCII-only (q50/q70/q71/q73 oracle assumption)") {
    // The DuckDB oracles rebuild byte arithmetic from length(text)/ascii(c)
    // — character-based — while the engine works on UTF-8 bytes. They agree
    // iff every fixture character is ASCII. Pin that here so a future
    // non-ASCII corpus fails loudly at the assumption, not as a hash
    // mismatch three layers away (see MultimodalQueries.oracles doc).
    val nonAscii = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .where(octet_length(col("text")) =!= length(col("text")))
      .count()
    assert(nonAscii == 0L)
  }

  test("videoNearDupPairs: frame-set overlap finds re-orders and trims, not strangers") {
    // 4-frame "videos" of 8-byte frames, sampled every frame so the set
    // is the full frame multiset collapsed. Every length here is an
    // exact multiple of 8, so each set also carries the trailing EMPTY
    // frame (the split contract q51's oracle pins): a re-order shares
    // ALL frames (jaccard 1.0), a one-frame trim 4 of 5 set elements
    // (0.8), a stranger only the empty frame (1/9 < threshold)
    val f = Seq("aaaaaaaa", "bbbbbbbb", "cccccccc", "dddddddd")
    val videos = Seq(
      (1L, f.mkString),                        // a b c d
      (2L, Seq(f(3), f(2), f(1), f(0)).mkString), // d c b a — re-order
      (3L, Seq(f(0), f(1), f(2)).mkString),    // a b c — trimmed
      (4L, "eeeeeeeeffffffffgggggggghhhhhhhh"))
      .toDF("doc_id", "text")
    val blobs = graft.ext.Multimodal.withFakeBlob(videos, "text")
    val got = graft.ext.Multimodal.videoNearDupPairs(blobs,
      chunkBytes = 8, everyN = 1, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got == Map((1L, 2L) -> 1.0, (1L, 3L) -> 0.8, (2L, 3L) -> 0.8))
  }
}
