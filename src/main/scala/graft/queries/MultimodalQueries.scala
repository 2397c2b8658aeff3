package graft.queries

import graft.ext.Multimodal
import graft.ops.Tables.t
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing queries: binary blobs + batched (stubbed)
  * decode. q50 runs the real mapPartitions decode stage; its fake metadata
  * is pure byte arithmetic, so DuckDB can reproduce it from the text the
  * blob was encoded from — the plumbing (binary column, batch decode,
  * metadata struct) is what's being exercised.
  */
object MultimodalQueries {
  import ParityQueries.Q

  val queries: Map[String, Q] = Map(
    "q50_multimodal_decode" -> ((s, d) => {
      val blobs = Multimodal.withFakeBlob(t(s, d, "documents"), "text")
      Multimodal.decodeMedia(s, blobs).orderBy("doc_id")
    }),

    "q51_multimodal_frames" -> ((s, d) => {
      // frame-sampling shape: every 4th 64-byte chunk per blob (rows-only:
      // chunking regex is engine-side)
      val blobs = Multimodal.withFakeBlob(t(s, d, "documents"), "text")
      Multimodal.sampleFrames(blobs, chunkBytes = 64, everyN = 4)
        .orderBy("doc_id", "frame_idx")
    }),

    "q52_multimodal_embed_ann" -> ((s, d) => {
      // end-to-end modality pipeline: blob -> batched stub encoder
      // (mapPartitions) -> embedding column -> LSH-bucketed near-dup pairs.
      // Near-dup documents produce near-dup blobs, so their chunk-hash
      // vectors pair above the cosine threshold (rows-only: encoder is
      // engine-side; semantics pinned by MultimodalSpec).
      val blobs = Multimodal.withFakeBlob(t(s, d, "documents"), "text")
      val vecs = Multimodal.embedMedia(s, blobs)
      graft.ext.Similarity.cosineDupPairsLsh(vecs, threshold = 0.98, dim = 64)
        .orderBy("id_a", "id_b")
    })
  )

  val oracles: Map[String, String] = Map(
    "q50_multimodal_decode" ->
      """WITH b AS (
           SELECT doc_id, length(text) AS n,
                  list_reduce(
                    list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(text, ''),
                        c -> CAST(ascii(c) AS BIGINT))),
                    (a, x) -> a + x) AS byte_sum
           FROM documents)
         SELECT doc_id,
                CAST(n AS INTEGER) AS n_bytes,
                CASE n % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
                CAST(64 + (n % 128) AS INTEGER) AS width,
                CAST(64 + ((n // 2) % 128) AS INTEGER) AS height,
                CAST(byte_sum AS DOUBLE) / n AS mean_intensity
         FROM b ORDER BY doc_id"""
  )
}
