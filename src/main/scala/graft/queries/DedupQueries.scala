package graft.queries

import graft.ext.Dedup
import graft.ops.Tables.t
import org.apache.spark.sql.functions._

/** Dedup operator queries. Exact and n-gram Jaccard have DuckDB oracles
  * (pure set arithmetic); MinHash/SimHash signatures hash with xxhash64,
  * which DuckDB cannot reproduce, so those two get rows-only checks — their
  * semantics are pinned by DedupSpec unit tests instead (planted
  * duplicates must be found; verified Jaccard bounds must hold).
  */
object DedupQueries {
  import ParityQueries.Q

  val queries: Map[String, Q] = Map(
    "q30_dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"), "text", "doc_id")
        .select(col("keeper_id"), col("n_copies"))
        .orderBy("keeper_id")),

    "q31_dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minhashPairs(t(s, d, "documents"), "text", "doc_id",
        threshold = 0.9)
        .orderBy("doc_a", "doc_b")),

    "q32_dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), "text", "doc_id",
        maxHamming = 7, chunks = 8)
        .orderBy("doc_a", "doc_b")),

    "q33_dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(t(s, d, "documents"), "text", "doc_id",
        bucketCol = "source", n = 2, threshold = 0.05)
        .orderBy("bucket", "doc_a", "doc_b")),

    "q34_dedup_cluster" -> ((s, d) =>
      Dedup.dedupClusters(t(s, d, "documents"), "text", "doc_id",
        bucketCol = "source", n = 2, threshold = 0.05)
        .orderBy("doc_id")),

    "q38_dedup_embed_cosine" -> ((s, d) => {
      // embedding-cosine near-dup, LSH-bucketed (the q36 brute-force's scale
      // path): docs are feature-hash embedded, near-dup docs land above 0.9
      val vecs = t(s, d, "documents").select(col("doc_id").as("vec_id"),
        graft.ext.TextAnalysis.hashEmbedding(col("text"), 64).as("embedding"))
      // 0.98: planted near-dups sit >=0.98 in hash-embedding space, while
      // unrelated same-language docs cluster at 0.85-0.9 (shared stopwords)
      graft.ext.Similarity.cosineDupPairsLsh(vecs, threshold = 0.98, dim = 64)
        .orderBy("id_a", "id_b")
    })
  )

  val oracles: Map[String, String] = Map(
    "q30_dedup_exact" ->
      """SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
         FROM documents GROUP BY text ORDER BY keeper_id""",

    // q31/q32: no oracle (xxhash64-based signatures); rows-only check.

    "q33_dedup_ngram_jaccard" ->
      """WITH g AS (
           SELECT source AS bucket, doc_id,
                  list_distinct(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1])) AS grams
           FROM (SELECT source, doc_id, string_split(text, ' ') AS toks
                 FROM documents))
         SELECT a.bucket AS bucket, a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                  / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
                  AS jaccard
         FROM g a JOIN g b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
               >= 0.05
         ORDER BY a.bucket, doc_a, doc_b""",

    // connected components as a recursive reachability CTE: comp(node) =
    // min(node reachable) — exact dual of the engine's label propagation
    "q34_dedup_cluster" ->
      """WITH RECURSIVE g AS (
           SELECT source AS bucket, doc_id,
                  list_distinct(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1])) AS grams
           FROM (SELECT source, doc_id, string_split(text, ' ') AS toks
                 FROM documents)),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM g a JOIN g b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                   / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
                 >= 0.05),
         edges AS (
           SELECT doc_a AS a, doc_b AS b FROM pairs
           UNION ALL
           SELECT doc_b AS a, doc_a AS b FROM pairs),
         reach(node, r) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a)
         SELECT node AS doc_id, min(r) AS cluster_rep,
                CAST(CASE WHEN node = min(r) THEN 1 ELSE 0 END AS INTEGER) AS is_keeper
         FROM reach GROUP BY node ORDER BY doc_id"""
  )
}
