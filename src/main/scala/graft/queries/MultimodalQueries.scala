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
      // frame-sampling shape: every 4th 64-byte chunk per blob. Chunk
      // lengths are pure arithmetic on length(text) — oracle-expressible
      // (incl. the regex-split's trailing empty frame at exact multiples)
      val blobs = Multimodal.withFakeBlob(t(s, d, "documents"), "text")
      Multimodal.sampleFrames(blobs, chunkBytes = 64, everyN = 4)
        .orderBy("doc_id", "frame_idx")
    }),

    "q211_video_neardup" -> ((s, d) => {
      // near-dup VIDEOS: every 2nd 32-byte frame hashed, per-video
      // DISTINCT frame-hash sets, prefix-filtered set-sim join at
      // Jaccard >= 0.5 — the re-upload/re-encode detection shape; the
      // oracle rebuilds every frame substring and the exact all-pairs
      // Jaccard from the raw text
      val blobs = Multimodal.withFakeBlob(t(s, d, "documents"), "text")
      Multimodal.videoNearDupPairs(blobs, chunkBytes = 32, everyN = 2,
        threshold = 0.5)
        .orderBy("doc_a", "doc_b")
    }),

    "q57_multimodal_resize" -> ((s, d) => {
      // fit-in-box resize over the decoded dims; the dimension arithmetic
      // (pure doubles on length(text)-derived dims) is oracle-replayable
      val blobs = Multimodal.withFakeBlob(t(s, d, "documents"), "text")
      Multimodal.resizeMedia(s, blobs, maxW = 96, maxH = 112)
        .orderBy("doc_id")
    }),

    "q70_multimodal_decode_real" -> ((s, d) => {
      // REAL javax.imageio round trip: synthesize a PNG per document
      // (uniform gray fill, dims and fill value deterministic functions of
      // the text — Multimodal.pngBlobs doc), decode it back with the JDK
      // reader. n_bytes is excluded from the projection: PNG container
      // size depends on the encoder, not the image, and has no SQL oracle.
      val blobs = Multimodal.pngBlobs(s, t(s, d, "documents"), "text")
      Multimodal.decodeMedia(s, blobs)
        .select("doc_id", "format", "width", "height", "mean_intensity")
        .orderBy("doc_id")
    }),

    "q71_multimodal_resize_real" -> ((s, d) => {
      // fit-in-box arithmetic over REAL decoded PNG dimensions
      val blobs = Multimodal.pngBlobs(s, t(s, d, "documents"), "text")
      Multimodal.resizeMedia(s, blobs, maxW = 32, maxH = 32)
        .orderBy("doc_id")
    }),

    "q200_perceptual_ahash" -> ((s, d) => {
      // q196's sibling on the AVERAGE hash: same patterned PNGs and real
      // decode, one bit per grid cell vs the integer mean of all 64
      // (63-bit hash, cell (7,7) dropped for non-negativity), banded at
      // 7 chunks × 9 bits. aHash reacts to absolute brightness structure
      // where dHash reacts to gradients — the standard two-hash pairing.
      val blobs = Multimodal.patternPngBlobs(s, t(s, d, "documents"), "text")
      val hashes = Multimodal.ahashMedia(s, blobs)
      graft.ext.Dedup.perceptualNearDupPairs(hashes, maxHamming = 6,
        hashCol = "ahash", hashBits = 63)
        .orderBy("doc_a", "doc_b")
    }),

    "q196_perceptual_neardup" -> ((s, d) => {
      // perceptual IMAGE near-dup: patterned real PNGs (every pixel a
      // deterministic function of the text — Multimodal.patternPngBlobs
      // doc), REAL javax.imageio decode, 56-bit dHash over the 8×8
      // box-downsampled grays, then pigeonhole-banded Hamming pairs
      // (recall exactly 1 at ham ≤ 6, never all-pairs). The oracle
      // recomputes every pixel, cell, bit, and pair from the raw text.
      val blobs = Multimodal.patternPngBlobs(s, t(s, d, "documents"), "text")
      val hashes = Multimodal.dhashMedia(s, blobs)
      graft.ext.Dedup.perceptualNearDupPairs(hashes, maxHamming = 6)
        .orderBy("doc_a", "doc_b")
    }),

    "q52_multimodal_embed_ann" -> ((s, d) => {
      // end-to-end modality pipeline: blob -> batched stub encoder
      // (mapPartitions) -> embedding column -> LSH-bucketed near-dup pairs.
      // Near-dup documents produce near-dup blobs, so their chunk-hash
      // vectors pair above the cosine threshold. The encoder's slot is
      // floorMod(h, 64) of a wrapping 64-bit rolling hash, and since
      // 64 | 2^64 the slot depends only on mod-64 arithmetic — the oracle
      // replays it with small-integer folds (see oracle SQL).
      val blobs = Multimodal.withFakeBlob(t(s, d, "documents"), "text")
      val vecs = Multimodal.embedMedia(s, blobs)
      graft.ext.Similarity.cosineDupPairsLsh(vecs, threshold = 0.98, dim = 64)
        .orderBy("id_a", "id_b")
    })
  )

  /** DuckDB left-fold dot product (mirrors the engine's fold order). */
  private def duckDot(a: String, b: String) =
    s"""list_reduce(list_prepend(0.0,
          list_transform(range(1, len($a) + 1),
            i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
          (x, y) -> x + y)"""

  /** DuckDB reconstruction of Multimodal.embedMedia over the UTF-8 fake
    * blob: 16-byte chunks; per chunk a rolling hash h = 31·h + byte on a
    * wrapping 64-bit int, bucketed by floorMod(h, 64). Because 64 divides
    * 2^64, floorMod(h, 64) == the same fold done directly in mod-64
    * arithmetic, seeded with 1125899906842597 mod 64 = 37 — no 64-bit
    * wraparound emulation needed. Vector = per-slot chunk counts.
    */
  private val mediaVectors =
    """SELECT doc_id, list_transform(range(0, 64),
         s -> CAST(len(list_filter(ss, x -> x = s)) AS DOUBLE)) AS vec
       FROM (
         SELECT doc_id, list_transform(
           list_transform(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT)),
             k -> substr(text, CAST(k * 16 + 1 AS INTEGER), 16)),
           ch -> list_reduce(
                   list_prepend(CAST(37 AS BIGINT),
                     list_transform(range(1, length(ch) + 1),
                       i -> CAST(ascii(substr(ch, i, 1)) AS BIGINT))),
                   (m, b) -> (m * 31 + b) % 64)) AS ss
         FROM documents)"""

  /** ORACLE FIXTURE ASSUMPTION — ASCII-only text. The q50/q70/q71 oracles
    * reconstruct byte arithmetic (`getBytes("UTF-8").length`, byte sums)
    * from DuckDB's `length(text)` (characters) and `ascii(c)` (code
    * points); the two agree only while every fixture character is ASCII
    * (one byte, code point == byte value). The generated `documents`
    * corpus satisfies this and MultimodalSpec pins it
    * ("documents fixture is ASCII-only"); a non-ASCII corpus would need
    * these oracles rebased onto octet_length/encode. q73's charFoldBytes
    * oracle (TextQueries) shares the same assumption.
    */
  /** Shared q196/q200 replay prelude: the patterned PNG's pixels from
    * the raw text, box-averaged to the integer 8×8 grid (`cells`:
    * doc_id, i, j, cv). */
  private val patternCells =
    """b AS (
           SELECT doc_id, length(text) AS n,
                  list_reduce(
                    list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(text, ''),
                        c -> CAST(ascii(c) AS BIGINT))),
                    (a, x) -> a + x) AS s
           FROM documents WHERE text IS NOT NULL),
         dims AS (
           SELECT doc_id, s,
                  16 + (n % 17) AS w, 16 + ((n // 2) % 17) AS h,
                  17 + (n % 29) AS a, 13 + (s % 23) AS c
           FROM b),
         grid AS (
           SELECT doc_id, s, w, h, a, c,
                  unnest(range(0, 64)) AS k
           FROM dims),
         gx AS (
           SELECT doc_id, s, a, c, h, k % 8 AS i, k // 8 AS j,
                  unnest(range((k % 8) * w // 8,
                               ((k % 8) + 1) * w // 8)) AS x
           FROM grid),
         gy AS (
           SELECT doc_id, s, a, c, i, j, x,
                  unnest(range(j * h // 8, (j + 1) * h // 8)) AS y
           FROM gx),
         px AS (
           SELECT doc_id, i, j, (s + x * a + y * c) % 256 AS v
           FROM gy),
         cells AS MATERIALIZED (
           SELECT doc_id, i, j, sum(v) // count(*) AS cv
           FROM px GROUP BY doc_id, i, j)"""

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
         FROM b ORDER BY doc_id""",

    // frame lengths are arithmetic on length(text): the engine splits on a
    // zero-width regex every 64 chars with Java limit=-1 semantics, which
    // KEEPS the trailing empty frame when the length is an exact multiple
    "q51_multimodal_frames" ->
      """WITH f AS (
           SELECT doc_id, length(text) AS n,
                  CASE WHEN length(text) % 64 = 0 THEN length(text) // 64 + 1
                       ELSE CAST(ceil(length(text) / 64.0) AS BIGINT) END AS n_frames
           FROM documents)
         SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
                CAST(LEAST(64, n - i * 64) AS INTEGER) AS frame_len
         FROM (SELECT doc_id, n, unnest(range(0, n_frames)) AS i FROM f)
         WHERE i % 4 = 0
         ORDER BY doc_id, frame_idx""",

    // q211: frame boundaries replay q51's chunk arithmetic (incl. the
    // trailing empty frame at exact multiples); sets compare by raw
    // frame CONTENT where the engine compares 64-bit frame hashes —
    // identical Jaccard modulo 2^-64 collisions (the q33 rule)
    "q211_video_neardup" ->
      """WITH f AS (
           SELECT doc_id, substr(text, 32 * CAST(i AS INTEGER) + 1, 32)
                    AS frame
           FROM (SELECT doc_id, text,
                        unnest(range(0,
                          CASE WHEN length(text) % 32 = 0
                               THEN length(text) // 32 + 1
                               ELSE CAST(ceil(length(text) / 32.0) AS BIGINT)
                          END)) AS i
                 FROM documents WHERE text IS NOT NULL)
           WHERE i % 2 = 0),
         sets AS (SELECT doc_id, list_distinct(list(frame)) AS fs
                  FROM f GROUP BY doc_id),
         s2 AS (SELECT doc_id, fs, len(fs) AS l FROM sets
                WHERE len(fs) >= 1)
         SELECT doc_a, doc_b, jaccard FROM (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(len(list_intersect(a.fs, b.fs)) AS DOUBLE)
                    / (len(a.fs) + len(b.fs)
                       - len(list_intersect(a.fs, b.fs))) AS jaccard
           FROM s2 a JOIN s2 b ON a.doc_id < b.doc_id)
         WHERE jaccard >= 0.5
         ORDER BY doc_a, doc_b""",

    "q57_multimodal_resize" ->
      """WITH d AS (
           SELECT doc_id,
                  CAST(64 + length(text) % 128 AS INTEGER) AS width,
                  CAST(64 + (length(text) // 2) % 128 AS INTEGER) AS height
           FROM documents),
         s AS (
           SELECT doc_id, width, height,
                  LEAST(96.0 / width, 112.0 / height, 1.0) AS scale
           FROM d)
         SELECT doc_id, width, height,
                CAST(floor(width * scale) AS INTEGER) AS out_width,
                CAST(floor(height * scale) AS INTEGER) AS out_height
         FROM s ORDER BY doc_id""",

    // the PNG is a uniform gray fill: width/height are modular arithmetic
    // on |utf8|, and the decoded mean is EXACTLY the fill value
    // (byte_sum mod 256) because PNG is lossless and all pixels agree
    "q70_multimodal_decode_real" ->
      """WITH b AS (
           SELECT doc_id, length(text) AS n,
                  list_reduce(
                    list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(text, ''),
                        c -> CAST(ascii(c) AS BIGINT))),
                    (a, x) -> a + x) AS byte_sum
           FROM documents)
         SELECT doc_id,
                'png' AS format,
                CAST(1 + (n % 48) AS INTEGER) AS width,
                CAST(1 + ((n // 2) % 48) AS INTEGER) AS height,
                CAST(byte_sum % 256 AS DOUBLE) AS mean_intensity
         FROM b ORDER BY doc_id""",

    "q71_multimodal_resize_real" ->
      """WITH d AS (
           SELECT doc_id,
                  CAST(1 + (length(text) % 48) AS INTEGER) AS width,
                  CAST(1 + ((length(text) // 2) % 48) AS INTEGER) AS height
           FROM documents),
         s AS (
           SELECT doc_id, width, height,
                  LEAST(32.0 / width, 32.0 / height, 1.0) AS scale
           FROM d)
         SELECT doc_id, width, height,
                CAST(floor(width * scale) AS INTEGER) AS out_width,
                CAST(floor(height * scale) AS INTEGER) AS out_height
         FROM s ORDER BY doc_id""",

    // q196: replay the patterned PNG's every pixel from the text (the
    // engine decodes REAL pixels; PNG is lossless and channel-uniform so
    // gray(x,y) = (s + x·a + y·c) mod 256 exactly), box-average to the
    // 8×8 grid in integer arithmetic, rebuild the 56-bit dHash, then
    // brute-force the Hamming pairs — the banded engine result equals
    // brute force EXACTLY by the pigeonhole theorem (ham 6 < 7 chunks)
    "q196_perceptual_neardup" ->
      s"""WITH $patternCells,
         hashes AS (
           SELECT l.doc_id,
                  sum(CASE WHEN r.cv > l.cv
                      THEN CAST(1 AS BIGINT) << CAST(l.j * 7 + l.i AS INTEGER)
                      ELSE 0 END) AS dhash
           FROM cells l
           JOIN cells r ON r.doc_id = l.doc_id AND r.j = l.j
                       AND r.i = l.i + 1
           GROUP BY l.doc_id)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
         FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
         ORDER BY doc_a, doc_b""",

    // q200: the same cells, aHash bits — threshold = Σ cells div 64,
    // bit (j·8 + i) for k < 63, then the brute-force Hamming pairs
    "q200_perceptual_ahash" ->
      s"""WITH $patternCells,
         thr AS (
           SELECT doc_id, sum(cv) // 64 AS t
           FROM cells GROUP BY doc_id),
         hashes AS (
           SELECT c.doc_id,
                  sum(CASE WHEN c.j * 8 + c.i < 63 AND c.cv > thr.t
                      THEN CAST(1 AS BIGINT) << CAST(c.j * 8 + c.i AS INTEGER)
                      ELSE 0 END) AS ahash
           FROM cells c JOIN thr ON thr.doc_id = c.doc_id
           GROUP BY c.doc_id)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming
         FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.ahash, b.ahash)) <= 6
         ORDER BY doc_a, doc_b""",

    "q52_multimodal_embed_ann" ->
      s"""WITH v AS ($mediaVectors),
          e AS (SELECT doc_id, vec,
                       sqrt(${duckDot("vec", "vec")}) AS nrm
                FROM v)
          SELECT id_a, id_b, cos_sim FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   ${duckDot("a.vec", "b.vec")} / (a.nrm * b.nrm) AS cos_sim
            FROM e a JOIN e b ON a.doc_id < b.doc_id)
          WHERE cos_sim >= 0.98
          ORDER BY id_a, id_b"""
  )
}
