package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Determinism: all vector math is done in DOUBLE after an exact
  * float→double widening, with a fixed left-to-right fold order
  * (`aggregate` over `zip_with`), so scores are bit-identical across
  * engines and partition layouts — an oracle can reproduce them exactly.
  *
  * Scale shapes:
  *  - brute force: queries broadcast against the corpus scan — correct
  *    baseline, O(|Q|·|C|) but one pass, no shuffle of the corpus. Right
  *    whenever |Q| is small (ad-hoc probes, eval sets).
  *  - LSH (random hyperplanes): corpus bucketed by signature; the join is
  *    an equi-join on the bucket key, so each query only scores its bucket.
  *    Signature length trades recall for bucket size; at 100 TB add
  *    multi-probe (flip one bit) instead of shortening signatures.
  */
object Similarity {

  /** Exact double dot product with fixed left-to-right fold order.
    * Backed by the codegen'd [[graft.functions.DotProduct]] expression —
    * bit-identical to `aggregate(zip_with(...))` but runs as a primitive
    * loop inside whole-stage codegen instead of the HOF interpreter.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in deterministic double arithmetic. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors for each query vector.
    * The query set is broadcast; ranking ties break on corpus id.
    * Norms are computed ONCE per vector before the join — at |Q|·|C| pairs
    * the per-pair work is a single dot fold, not three.
    */
  def topKBruteForce(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // float→double widening happens ONCE per vector here, not per pair
    // inside the join (a per-pair cast re-allocates both arrays for every
    // one of the |Q|·|C| combinations).
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"),
      norm(col(vecCol)).as("q_norm"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("c_vec"),
      norm(col(vecCol)).as("c_norm"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic random hyperplanes (fixed seed) for sign-bit LSH. */
  private def hyperplanes(nBits: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new java.util.Random(7L)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH signature: bit i = (v · h_i) > 0. Pure expression — the
    * hyperplane constants fold into the plan, no UDF.
    */
  def lshSignature(vec: Column, nBits: Int, dim: Int): Column = {
    val planes = hyperplanes(nBits, dim)
    val bits = planes.zipWithIndex.map { case (h, i) =>
      val proj = dot(vec, array(h.map(lit(_)): _*))
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Bucketed ANN: equi-join query and corpus on the LSH bucket, exact
    * cosine within the bucket, top-k per query. Approximate — recall
    * depends on nBits; pairs in different buckets are never scored.
    */
  def topKLsh(queries: DataFrame, corpus: DataFrame, k: Int, nBits: Int, dim: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"),
      norm(col(vecCol)).as("q_norm"),
      lshSignature(col(vecCol), nBits, dim).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("c_vec"),
      norm(col(vecCol)).as("c_norm"),
      lshSignature(col(vecCol), nBits, dim).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold. Brute-force
    * within-corpus self-join here; at scale route through topKLsh buckets
    * first and verify exactly, same as Dedup.minhashPairs.
    */
  def cosineDupPairs(corpus: DataFrame, threshold: Double,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"),
      col(vecCol).cast("array<double>").as("v_a"),
      norm(col(vecCol)).as("n_a"))
    val b = corpus.select(col(idCol).as("id_b"),
      col(vecCol).cast("array<double>").as("v_b"),
      norm(col(vecCol)).as("n_b"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }
}
