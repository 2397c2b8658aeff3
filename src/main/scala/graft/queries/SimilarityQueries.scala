package graft.queries

import graft.ext.Similarity
import graft.ops.Tables.t
import org.apache.spark.sql.functions._

/** Similarity-search queries over the embeddings table. Cosine math is
  * deterministic double arithmetic with a fixed fold order, so the
  * brute-force queries have exact DuckDB oracles (mirrored fold, norms
  * precomputed per vector exactly as the engine does). The LSH variant's
  * bucketing constants aren't SQL-reproducible → rows-only.
  */
object SimilarityQueries {
  import ParityQueries.Q

  /** DuckDB dot product mirroring Similarity.dot's left fold exactly:
    * widen floats to double, multiply pairwise in index order, left-fold
    * addition seeded with 0.0.
    */
  private def duckDot(a: String, b: String) =
    s"""list_reduce(list_prepend(0.0,
          list_transform(range(1, len($a) + 1),
            i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
          (x, y) -> x + y)"""

  val queries: Map[String, Q] = Map(
    "q35_sim_topk_bruteforce" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.topKBruteForce(
        emb.where(col("vec_id") < 10), emb, k = 10)
        .orderBy("query_id", "rank")
    }),

    "q36_sim_cosine_dup" -> ((s, d) =>
      Similarity.cosineDupPairs(t(s, d, "embeddings"), threshold = 0.4)
        .orderBy("id_a", "id_b")),

    "q37_sim_topk_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.topKLsh(
        emb.where(col("vec_id") < 10), emb, k = 10, nBits = 8, dim = 64)
        .orderBy("query_id", "rank")
    }),

    "q39_sim_topk_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.topKIvf(
        emb.where(col("vec_id") < 10), emb, k = 10, dim = 64)
        .orderBy("query_id", "rank")
    })
  )

  val oracles: Map[String, String] = Map(
    "q35_sim_topk_bruteforce" ->
      s"""WITH e AS (SELECT vec_id, embedding,
                            sqrt(${duckDot("embedding", "embedding")}) AS nrm
                     FROM embeddings),
              scored AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ${duckDot("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos_sim
                FROM e c CROSS JOIN (SELECT * FROM e WHERE vec_id < 10) q
                WHERE q.vec_id <> c.vec_id),
              ranked AS (
                SELECT query_id, neighbor_id, cos_sim,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos_sim DESC, neighbor_id) AS rank
                FROM scored)
          SELECT query_id, neighbor_id, cos_sim, rank
          FROM ranked WHERE rank <= 10
          ORDER BY query_id, rank""",

    "q36_sim_cosine_dup" ->
      s"""WITH e AS (SELECT vec_id, embedding,
                            sqrt(${duckDot("embedding", "embedding")}) AS nrm
                     FROM embeddings)
          SELECT id_a, id_b, cos_sim FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos_sim
            FROM e a JOIN e b ON a.vec_id < b.vec_id)
          WHERE cos_sim >= 0.4
          ORDER BY id_a, id_b"""

    // q37: LSH bucketing constants live in the engine; rows-only check.
  )
}
