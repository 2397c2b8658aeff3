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
  *    Signature length trades recall for bucket size; at 100 TB raise
  *    recall with multi-probe (`topKLsh(nProbe = …)` — query-side bit-flip
  *    probes into Hamming-1 buckets) instead of shortening signatures,
  *    which would grow EVERY bucket.
  */
object Similarity {

  /** Exact double dot product with fixed left-to-right fold order.
    * Backed by the codegen'd [[graft.functions.DotProduct]] expression —
    * bit-identical to `aggregate(zip_with(...))` but runs as a primitive
    * loop inside whole-stage codegen instead of the HOF interpreter.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in deterministic double arithmetic. Zero-norm
    * inputs yield NaN (undefined direction — the [[normalizeVec]]
    * contract): under Spark 4's default ANSI mode a bare x/0.0 THROWS
    * DIVIDE_BY_ZERO even for doubles, so every scoring path must branch
    * on the zero denominator or crash on the first zero embedding. NaN
    * sorts LAST under a descending rank, so zero vectors lose every
    * top-k contest instead of killing the job. */
  def cosine(a: Column, b: Column): Column =
    safeCosine(dot(a, b), norm(a), norm(b))

  /** The ONE guarded cosine division every pair-scoring site goes
    * through (see [[cosine]] — ANSI throws on double /0). */
  private[ext] def safeCosine(dotCol: Column, na: Column,
                              nb: Column): Column =
    when(na * nb === lit(0.0), lit(Double.NaN))
      .otherwise(dotCol / (na * nb))

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
        safeCosine(dot(col("q_vec"), col("c_vec")),
          col("q_norm"), col("c_norm"))
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    // zero-norm sides score NaN (safeCosine), and BOTH Spark and DuckDB
    // sort NaN as the LARGEST double — unfiltered, a zero vector would
    // win rank 1 of every top-k. Undefined-direction pairs are EXCLUDED
    // (the simhashSignatures null-doc rule); joinBackToCorpus restores
    // coverage rows where a caller needs them.
    scored.where(!isnan(col("cos_sim")))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Pack the SIGN BITS of a (castable) vector column into
    * ceil(dim/63) NON-NEGATIVE longs — bit j of word w set iff
    * coordinate (w·63 + j) > 0. 63 bits per word keeps every word
    * strictly non-negative, the repo's portable-bit-surface convention
    * (56-bit dHash, 63-bit aHash): band extraction, XOR, and popcount
    * replay in engines whose BIGINT ops reject sign-bit games. The bit
    * value is `pow(2, j)` cast to long — powers of two are EXACTLY
    * representable doubles up to 2^62, so the cast is exact (the Scala
    * Column API's shiftleft takes only a literal shift, and this keeps
    * the whole pack one codegen-able expression, O(dim) per vector —
    * the norm-binding discipline of [[normalizeVec]]).
    */
  def binarySignWords(v: Column, dim: Int): Column = {
    require(dim >= 1, s"dim must be positive: $dim")
    val d = v.cast("array<double>")
    val words = (dim + 62) / 63
    array((0 until words).map { w =>
      val lo = w * 63
      val n = math.min(63, dim - lo)
      aggregate(
        zip_with(slice(d, lo + 1, n), sequence(lit(0), lit(n - 1)),
          (x, j) => when(x > lit(0.0), pow(lit(2.0), j).cast("long"))
            .otherwise(lit(0L))),
        lit(0L), (acc, b) => acc.bitwiseOR(b))
    }: _*)
  }

  /** Hamming distance between two [[binarySignWords]] arrays: Σ over
    * words of popcount(xor) — codegen'd bit math, no per-bit loop. */
  def hammingWords(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, h) => acc + h)

  /** BINARY-QUANTIZATION ANN: top-k cosine neighbors via sign-bit
    * Hamming candidates + exact rerank — the 1-bit-per-dimension scale
    * path production vector stores ship next to PQ (FAISS binary
    * indexes, Qdrant/Milvus binary quantization): for unit-ish vectors
    * the angle between two vectors is monotone-ish in the Hamming
    * distance of their coordinate sign patterns (each agreeing sign bit
    * is one axis-aligned hyperplane both sides of — the
    * Goemans–Williamson sign-hash bound at the identity basis), so
    * ranking by sign Hamming is a cheap candidate generator and an
    * exact cosine pass over `overfetch·k` candidates repairs the
    * approximation where it matters.
    *
    * Scale shape — why this exists next to [[topKBruteForce]]: the
    * candidate stage scans 8·ceil(dim/63) BYTES per corpus vector
    * (64× smaller than the raw doubles at dim 64, 512× at dim 4096)
    * and evaluates popcounts, not dot products; the per-query
    * `h_rank <= overfetch·k` filter plans as a map-side
    * WindowGroupLimit, so each partition forwards at most M rows per
    * query into the exchange; the exact rerank joins FULL vectors for
    * only |Q|·M candidates. Fully deterministic: Hamming ties break on
    * neighbor id (so the candidate SET is a pure function of the data
    * and the oracle replays it), cosine ties likewise.
    *
    * Recall is governed by the pool depth: on the synthetic testdata's
    * near-uniform dim-64 embeddings (the ADVERSARIAL case for sign
    * bits — real text/image embeddings cluster, where sign patterns
    * separate far better) the measured recall@10 ladder vs exact
    * brute force is 0.33 / 0.48 / 0.65 at overfetch 4 / 8 / 16
    * (BASELINE.md). Threshold-centering variants (per-vector mean,
    * per-dimension mean, per-vector median) measured within noise of
    * plain sign-of-coordinate on this data, so the simplest
    * oracle-replayable rule stays; the pool stays k·overfetch rows per
    * query at ANY corpus size, so raising overfetch buys recall at
    * rerank cost, never at scan cost.
    *
    * Output: (query_id, neighbor_id, hamming, cos_sim, rank),
    * rank 1..k per query by exact cosine over the candidate pool.
    */
  def binaryTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                 overfetch: Int = 16, dim: Int = 64,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame =
    binaryServeSigs(
      corpus.select(col(idCol).as("neighbor_id"),
        binarySignWords(col(vecCol), dim).as("words")),
      queries, corpus, k, overfetch, dim, idCol, vecCol)

  /** The ONE binary serve tail shared by the inline [[binaryTopK]] and
    * every persisted-index serve ([[binaryTopKIndexed]] live / snapshot
    * / previous), so they answer bit-identically over the same
    * effective signature relation. `sigs` is (neighbor_id, words);
    * reranking reads raw vectors from `corpus` — the index never
    * duplicates them (the pqTopKRerankIndexed convention). */
  private def binaryServeSigs(sigs: DataFrame, queries: DataFrame,
                              corpus: DataFrame, k: Int, overfetch: Int,
                              dim: Int, idCol: String,
                              vecCol: String): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    require(overfetch >= 1, s"overfetch must be positive: $overfetch")
    val m = k * overfetch
    val qSig = queries.select(col(idCol).as("query_id"),
      binarySignWords(col(vecCol), dim).as("q_sig"))
    // the candidate scan carries ONLY (id, packed sign words) — never
    // the vector itself
    val ham = sigs
      .select(col("neighbor_id"), col("words").as("c_sig"))
      .crossJoin(broadcast(qSig))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        hammingWords(col("q_sig"), col("c_sig")).as("hamming"))
    val wH = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("neighbor_id"))
    val cand = ham.withColumn("h_rank", row_number().over(wH))
      .where(col("h_rank") <= m).drop("h_rank")
    // exact rerank over candidate-sized relations only
    val qVec = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"),
      norm(col(vecCol)).as("q_norm"))
    val cVec = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("c_vec"),
      norm(col(vecCol)).as("c_norm"))
    val scored = cand
      .join(cVec, Seq("neighbor_id"))
      .join(broadcast(qVec), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("hamming"),
        safeCosine(dot(col("q_vec"), col("c_vec")),
          col("q_norm"), col("c_norm"))
          .as("cos_sim"))
    val wC = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    // NaN (zero-norm) pairs excluded before ranking — see topKBruteForce
    scored.where(!isnan(col("cos_sim")))
      .withColumn("rank", row_number().over(wC))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("hamming"),
        col("cos_sim"), col("rank"))
  }

  /** MMR-DIVERSIFIED top-k retrieval (Carbonell & Goldstein, SIGIR'98 —
    * maximal marginal relevance): per query, k results chosen greedily
    * by `λ·cos(q, c) − (1−λ)·max_{s∈picked} cos(c, s)` — the second
    * term is what plain top-k lacks: it PENALIZES picking another
    * near-copy of something already picked, so the result set covers
    * the neighborhood instead of repeating its densest cluster (the
    * retrieval-augmentation and eval-set-builder default). Entirely
    * deterministic: the candidate pool is the EXACT brute-force
    * top-`fetch` (ties by id), every score is IEEE double arithmetic
    * in pinned operation order (the [[topKBruteForce]] discipline, so
    * the DuckDB oracle replays every pick), score ties break to the
    * smaller id, and the empty-selection first pick is plain top-1
    * for any λ > 0 (at λ = 0 — pure diversity, no relevance term —
    * every first-pick score is 0·cos − 1·0 = 0 and the id tie-break
    * decides; still deterministic and oracle-replayed, just not top-1).
    * Any `lam` in [0,1] oracle-replays exactly: the replay emits
    * BOTH engine coefficients — `lam` and the computed double
    * `1.0 − lam` — as shortest-round-trip decimal literals
    * (`Double.toString` round-trips by the IEEE 754 / Java spec, and
    * DuckDB parses a decimal literal to the nearest double), so e.g.
    * λ=0.3 replays with literals 0.3 and 0.7000000000000001, never the
    * NOT-equal double 0.7.
    *
    * Scale shape: stage 1 is [[topKBruteForce]] (broadcast query side);
    * stage 2 is one groupBy over the (|Q|·fetch)-sized candidate
    * relation and a per-query greedy fold as a codegen'd HOF — k
    * iterations over ≤ fetch candidates with ≤ k·dim flops each,
    * bounded per group, never corpus-sized. The candidate relation
    * broadcasts into the corpus-side vector join.
    *
    * Output: (query_id, neighbor_id, cos_sim, mmr_score, rank),
    * rank 1..k per query.
    */
  def mmrTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              fetch: Int = 50, lam: Double = 0.5,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    require(fetch >= k, s"fetch ($fetch) must be >= k ($k)")
    require(lam >= 0.0 && lam <= 1.0, s"lambda in [0,1], got $lam")
    val cands = topKBruteForce(queries, corpus, fetch, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    val cvecs = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("vec"),
      norm(col(vecCol)).as("nrm"))
    // (|Q|·fetch)-sized side broadcasts into the corpus-sized one
    mmrGreedy(cvecs.join(broadcast(cands), Seq("neighbor_id")), k, lam)
  }

  /** [[mmrTopK]] served from the PERSISTED IVF index — diversified
    * retrieval at the amortized-index price: the candidate pool is
    * [[topKIvfIndexed]] at depth `fetch` (partition-pruned probe of the
    * inverted lists), and the redundancy sims compute over the INDEX'S
    * OWN dequantized codes, so the whole pick sequence is a pure
    * function of the persisted state (oracle-replayed end to end, like
    * the q82 family). Tombstoned vectors never enter (the serve masks
    * them). Same determinism contract as [[mmrTopK]].
    */
  def mmrTopKIndexed(spark: org.apache.spark.sql.SparkSession,
                     queries: DataFrame, path: String, k: Int,
                     fetch: Int = 40, nProbe: Int = 4, lam: Double = 0.5,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    require(fetch >= k, s"fetch ($fetch) must be >= k ($k)")
    // ONE tombstone read, ONE meta load, ONE lists resolve — shared by
    // the candidate probe AND the redundancy-vector read. Two separate
    // resolves would let a concurrent maintenance publish land between
    // them: candidates from version V1 joined to vectors (and scale)
    // from V2 — silently fewer than k rows, or OLD codes dequantized
    // with NEW parameters after a rebuild.
    val tomb = graft.ops.Stage.pendingTombstones(spark, path)
    val listsDir = graft.ops.Stage.resolve(spark, s"$path/lists")
    val (scale, _) = loadIvfMeta(spark, path)
    val served = serveIvf(spark, queries, path, listsDir, tomb, fetch,
      nProbe, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    val cvec = if (scale > 0) dequantize(col("code"), scale)
      else col("code")
    val vecs = spark.read.parquet(listsDir)
      .select(col("vec_id").as("neighbor_id"), cvec.as("vec"))
      .withColumn("nrm", norm(col("vec")))
    mmrGreedy(vecs.join(broadcast(served), Seq("neighbor_id")), k, lam)
  }

  /** DIVERSE hard negatives from the persisted IVF index —
    * [[hardNegativesIndexed]] composed with the MMR greedy: over-fetch
    * `fetch` candidates from the pruned probe, drop same-label rows,
    * then pick k by relevance-vs-redundancy instead of plain top-k.
    * Why a contrastive batch wants it: the k hardest negatives are
    * frequently k near-copies of ONE confusable item — diverse
    * negatives cover more of the decision boundary per batch slot
    * (the in-batch-negative diversity argument). Same determinism and
    * oracle-replay contract as [[mmrTopKIndexed]]; labels ride along
    * as evidence columns. Queries whose label-filtered pool holds
    * fewer than k rows return that many (raise `fetch`/`nProbe`).
    */
  def diverseHardNegativesIndexed(spark: org.apache.spark.sql.SparkSession,
                                  queries: DataFrame, path: String,
                                  labels: DataFrame, k: Int,
                                  fetch: Int = 40, nProbe: Int = 4,
                                  lam: Double = 0.5,
                                  labelCol: String = "label",
                                  idCol: String = "vec_id",
                                  vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k >= 1, got $k") // k=0 would make the greedy's
    // sequence(1, k) DESCEND to [1, 0] and return 2 rows, not 0
    require(fetch >= k, s"fetch ($fetch) must be >= k ($k)")
    // shared single resolve — the mmrTopKIndexed torn-read rationale
    val tomb = graft.ops.Stage.pendingTombstones(spark, path)
    val listsDir = graft.ops.Stage.resolve(spark, s"$path/lists")
    val (scale, _) = loadIvfMeta(spark, path)
    val served = serveIvf(spark, queries, path, listsDir, tomb, fetch,
      nProbe, idCol, vecCol)
    val qL = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("query_label"))
    val nL = labels.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("neighbor_label"))
    val cross = served
      .join(broadcast(qL), Seq("query_id"))
      .join(nL, Seq("neighbor_id"))
      .where(col("neighbor_label") =!= col("query_label"))
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    val cvec = if (scale > 0) dequantize(col("code"), scale)
      else col("code")
    val vecs = spark.read.parquet(listsDir)
      .select(col("vec_id").as("neighbor_id"), cvec.as("vec"))
      .withColumn("nrm", norm(col("vec")))
    mmrGreedy(vecs.join(broadcast(cross), Seq("neighbor_id")), k, lam)
      .join(broadcast(qL), Seq("query_id"))
      .join(nL, Seq("neighbor_id"))
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"), col("cos_sim"), col("mmr_score"),
        col("rank"))
  }

  /** The shared greedy stage of [[mmrTopK]]/[[mmrTopKIndexed]]: input is
    * the vector-enriched candidate relation (query_id, neighbor_id,
    * cos_sim, vec, nrm); one groupBy and a per-query k-iteration HOF
    * fold, bounded per group. */
  private def mmrGreedy(enriched: DataFrame, k: Int,
                        lam: Double): DataFrame = {
    require(lam >= 0.0 && lam <= 1.0, s"lambda in [0,1], got $lam")
    // the id keeps its NATIVE type end to end: a cast("long") here
    // would turn string ids (UUIDs — legal everywhere else in this
    // file) into NULLs, and the de-dup `exists` below would silently
    // drop every candidate after the first pick (one row per query, no
    // error). The argmax therefore cannot lean on id negation either —
    // it is an explicit (score DESC, id ASC) comparison fold.
    val idT = enriched.schema("neighbor_id").dataType.sql
    val candT =
      s"struct<id:$idT,cos:double,vec:array<double>,nrm:double>"
    val pickT = s"array<struct<id:$idT,cos:double,score:double," +
      "vec:array<double>,nrm:double>>"
    val grouped = enriched.groupBy("query_id")
      .agg(collect_list(struct(
        col("neighbor_id").as("id"),
        col("cos_sim").as("cos"), col("vec"), col("nrm")).cast(candT))
        .as("cands"))
    def pickStep(acc: Column): Column = {
      val remaining = filter(col("cands"), c =>
        !exists(acc, p => p.getField("id") === c.getField("id")))
      val scoredC = transform(remaining, c => {
        val maxsim = coalesce(array_max(transform(acc, p =>
          dot(c.getField("vec"), p.getField("vec")) /
            (c.getField("nrm") * p.getField("nrm")))), lit(0.0))
        struct(
          (lit(lam) * c.getField("cos") - lit(1.0 - lam) * maxsim)
            .as("score"),
          c.getField("id").as("id"), c.getField("cos").as("cos"),
          c.getField("vec").as("vec"), c.getField("nrm").as("nrm"))
      })
      // argmax by (score DESC, id ASC), type-agnostically: fold the
      // scored array against its own first element
      val best = aggregate(scoredC, element_at(scoredC, 1), (b, c) =>
        when(c.getField("score") > b.getField("score") ||
          (c.getField("score") === b.getField("score") &&
            c.getField("id") < b.getField("id")), c).otherwise(b))
      val pickedT = s"struct<id:$idT,cos:double,score:double," +
        "vec:array<double>,nrm:double>"
      when(size(scoredC) > 0,
        concat(acc, array(struct(
          best.getField("id").as("id"), best.getField("cos").as("cos"),
          best.getField("score").as("score"),
          best.getField("vec").as("vec"),
          best.getField("nrm").as("nrm")).cast(pickedT))))
        .otherwise(acc)
    }
    val greedy = aggregate(sequence(lit(1), lit(k)),
      array().cast(pickT), (acc, _) => pickStep(acc))
    grouped
      .select(col("query_id"),
        posexplode(greedy).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        col("p.cos").as("cos_sim"), col("p.score").as("mmr_score"),
        (col("pos") + 1).as("rank"))
  }

  /** HARD-NEGATIVE mining for metric-learning / embedding-model training
    * data: per query, the k most-similar corpus vectors whose LABEL
    * DIFFERS from the query's — the "looks like a match, must be pushed
    * apart" pairs a contrastive objective needs (easy negatives are
    * already far and teach nothing). Same exact brute-force shape as
    * [[topKBruteForce]] (broadcast query side, one codegen'd dot per
    * surviving pair, per-query window heap); the label-mismatch filter
    * runs BEFORE the dot, so same-label pairs cost an equality test, not
    * a d-length fold. Output adds both labels as evidence columns.
    *
    * Scale path: compose the same post-filter over [[topKIvfIndexed]]
    * output with an OVER-FETCH (serve k' > k, filter, re-rank) — an
    * inverted list cannot label-filter internally without one index per
    * label, and over-fetch is the standard remedy; this exact form is
    * the oracle-checkable baseline the over-fetched serve is validated
    * against (q135).
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
                    labelCol: String = "label", idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("query_label"),
      col(vecCol).cast("array<double>").as("q_vec"),
      norm(col(vecCol)).as("q_norm"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("neighbor_label"),
      col(vecCol).cast("array<double>").as("c_vec"),
      norm(col(vecCol)).as("c_norm"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id") &&
        col("neighbor_label") =!= col("query_label"))
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"),
        safeCosine(dot(col("q_vec"), col("c_vec")),
          col("q_norm"), col("c_norm"))
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    // zero-norm sides score NaN (safeCosine), and BOTH Spark and DuckDB
    // sort NaN as the LARGEST double — unfiltered, a zero vector would
    // win rank 1 of every top-k. Undefined-direction pairs are EXCLUDED
    // (the simhashSignatures null-doc rule); joinBackToCorpus restores
    // coverage rows where a caller needs them.
    scored.where(!isnan(col("cos_sim")))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** L2-normalize a (castable) vector column elementwise — the
    * pre-step that makes PQ's approximate INNER PRODUCT an approximate
    * COSINE. Zero vectors become NaN (undefined direction) — callers'
    * contract, as with cosine itself; the zero-norm case is an explicit
    * branch because under Spark 4's default ANSI mode a bare x/0.0
    * would THROW DIVIDE_BY_ZERO instead of yielding the documented NaN
    * (which the family's isnan filters key on).
    *
    * The norm is BOUND as a lambda variable (transform over a 1-element
    * array holding it) so the dot product evaluates exactly ONCE per
    * vector no matter where the column lands: a higher-order-function
    * lambda body re-evaluates per element, so placing `sqrt(dot(d,d))`
    * inline inside the per-element branch made the whole normalize
    * O(dim²) — the same re-evaluation class as topGramRatio's sort and
    * pqCodes' argmin accumulator, measured as a 1.3–1.8× PQ-family
    * regression at dim=64 and a 100–1000× blowup at production dims.
    * The zero-vector branch sits at ARRAY level (array_repeat of NaN),
    * outside the per-element map. */
  def normalizeVec(v: Column): Column = {
    val d = v.cast("array<double>")
    element_at(
      transform(array(sqrt(dot(d, d))), nrm =>
        when(nrm === lit(0.0), array_repeat(lit(Double.NaN), size(d)))
          .otherwise(transform(d, x => x / nrm))),
      1)
  }

  /** PRODUCT-QUANTIZATION codebooks (Jégou, Douze, Schmid — "Product
    * Quantization for Nearest Neighbor Search", TPAMI'11): the vector
    * space splits into `m` contiguous subspaces of dim/m dimensions,
    * each with its own `nCent`-entry codebook; a vector encodes as m
    * small code indices — here 8 codes over 16 centroids = 8 bytes per
    * vector vs 256 for raw floats, the 30×-class compression that lets
    * a 100 TB corpus's candidate scan fit in memory. Codebooks are the
    * first `nCent` corpus vectors' NORMALIZED subvectors (the frozen
    * smallest-id sample convention of [[sampleCentroids]]/q39 — fully
    * deterministic, so the oracle re-derives them from the table).
    */
  def pqCodebooks(corpus: DataFrame, m: Int, nCent: Int, dim: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding")
      : Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim=$dim must split evenly into m=$m subspaces")
    val subDim = dim / m
    val seeds = sampleCentroids(
      corpus.select(col(idCol), normalizeVec(col(vecCol)).as(vecCol)),
      nCent, idCol, vecCol)
    Array.tabulate(m)(j => seeds.map(_.slice(j * subDim, (j + 1) * subDim)))
  }

  /** K-MEANS-TRAINED PQ codebooks: [[pqCodebooks]]' frozen smallest-id
    * seeds refined by `iters` Lloyd iterations of plain (non-spherical)
    * per-subspace k-means — the TPAMI'11 training recipe. Each iteration
    * is DataFrame work (one corpus pass: explode to (subspace, subvector)
    * rows, argmin-L2² assignment against the literal codebooks, one
    * groupBy re-estimation); only the m×nCent×subDim codebook matrix
    * reaches the driver, so training a 100 TB corpus is `iters`
    * distributed passes, exactly like [[trainCentroids]].
    *
    * DETERMINISM — the property that lets an oracle value-check a
    * TRAINED model: a float mean over shuffled partitions is
    * order-dependent in its last ulp, and a last-ulp flip near a Voronoi
    * boundary flips code assignments. So the update statistics accumulate
    * on a 2^-20 fixed-point grid (the [[quantize]] floor(x·G + 0.5)
    * convention applied to the k-means update): per (subspace, code,
    * position) the sum of LONG-quantized coordinates is exact integer
    * arithmetic in any engine and any order, and the re-estimated
    * coordinate is one division chain (sum / n / G) spelled identically
    * in the replay. Assignment ties keep the SMALLEST code (strict <,
    * mirroring [[pqCodes]]); empty clusters keep their previous entry.
    * The 1e-6 grid error is far below any plausible cluster geometry —
    * it buys bit-identical codebooks, not worse ones.
    */
  def trainPqCodebooks(corpus: DataFrame, m: Int, nCent: Int, dim: Int,
                       iters: Int = 1, idCol: String = "vec_id",
                       vecCol: String = "embedding")
      : Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim=$dim must split evenly into m=$m subspaces")
    require(iters >= 0, s"iters=$iters must be non-negative")
    val subDim = dim / m
    val Grid = 1048576.0 // 2^20
    var cb = pqCodebooks(corpus, m, nCent, dim, idCol, vecCol)
    // (j, sv) rows: every vector's m normalized subvectors. The
    // normalize sits in its own projection (see pqCodes), the explode in
    // the next — one corpus pass per iteration re-reads this lineage.
    val sub = corpus
      .select(normalizeVec(col(vecCol)).as("nv"))
      // a zero vector's NaN subvectors would carry the -1 argmin
      // sentinel into the stats collect and index the codebook array at
      // -1 on the driver (AIOOBE mid-training) — the pqCodes rule
      .where(!isnan(element_at(col("nv"), 1)))
      .select(explode(array((0 until m).map(j =>
        struct(lit(j).as("j"),
          slice(col("nv"), j * subDim + 1, subDim).as("sv"))): _*)).as("e"))
      .select(col("e.j").as("j"), col("e.sv").as("sv"))
    for (_ <- 1 to iters) {
      // array-by-subspace of (code, centroid) pairs, one literal — the
      // bound-lambda HOF argmin of pqCodes, indexed by the row's j
      val cbLit = typedLit(cb.map(_.zipWithIndex.map {
        case (cv, c) => (c, cv.toSeq)
      }.toSeq).toSeq)
      val cbJ = element_at(cbLit, col("j") + 1)
      // aliases on struct fields built from lambda-bound values get
      // stripped by the analyzer here (unlike pqCodeArray's literal-fed
      // variant), so both branches cast to one explicit struct type
      val accType = "struct<d:double,c:int>"
      val code = aggregate(cbJ,
        struct(lit(Double.MaxValue).as("d"), lit(-1).as("c")).cast(accType),
        (acc, e) => {
          val dd = aggregate(
            zip_with(col("sv"), e.getField("_2"), (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, z) => a + z)
          when(dd < acc.getField("d"),
            struct(dd.as("d"), e.getField("_1").as("c")).cast(accType))
            .otherwise(acc)
        }).getField("c")
      val stats = sub
        .select(col("j"), code.as("c"),
          posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("j", "c", "pos")
        .agg(sum(floor(col("x") * Grid + lit(0.5)).cast("long")).as("smi"),
          count(lit(1)).as("n"))
        .collect()
      val next = cb.map(_.map(_.clone()))
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          r.getLong(3).toDouble / r.getLong(4) / Grid
      }
      cb = next
    }
    cb
  }

  /* FAMILY OVERVIEW (plain comment, not scaladoc — it describes the
   * whole PQ group, not the next member):
   * PQ ENCODE + ADC SERVE: corpus vectors normalize, encode to m code
    * indices (per subspace, argmin exact-L2² against the codebook —
    * strict `<` keeps the SMALLEST index on ties, mirrored by the
    * oracle's (d, c) rank), and queries rank candidates by the
    * asymmetric distance computation: approx cos(q, v) =
    * Σ_j dot(q_subj, codebook_j[code_j(v)]) — the QUERY side stays
    * exact, only the corpus side is quantized (Jégou et al.'s ADC,
    * which dominates symmetric code-to-code distances). The sum folds
    * j-ascending left-associated, spelled identically in the oracle.
    *
    * Scale shape: encoding is MAP-ONLY against the broadcast literal
    * codebooks (one pass, then the 8-byte codes persist in place of
    * 256-byte vectors); serving broadcasts the query side and scans
    * CODES, never raw vectors — per pair m array lookups + m tiny dots
    * instead of a dim-length dot. Compose with the IVF lists for the
    * full IVF-PQ shape (coarse cells prune, codes rank); here the flat
    * scan keeps the oracle replay exact end to end.
    */
  /** PQ ENCODE alone: (id, codes) — each vector's m argmin-L2² code
    * indices against the normalized codebooks (strict `<` keeps the
    * SMALLEST index on ties). The argmin runs as an `aggregate` HOF
    * over the literal codebook — the accumulator is a bound lambda
    * variable, so the plan stays LINEAR in nCent (a Column-level
    * foldLeft of when/otherwise would copy the accumulator subtree per
    * step: exponential tree, driver OOM — measured). Normalization
    * sits in its OWN projection: `nv` feeds all m subspace encoders,
    * and CollapseProject refuses to inline a non-cheap expression
    * referenced m times — without the boundary the whole normalize
    * tree would re-evaluate once per subspace per row (4.5× slower,
    * measured at sf0.1).
    */
  def pqCodes(corpus: DataFrame, dim: Int,
              codebooks: Array[Array[Array[Double]]],
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    corpus
      .select(col(idCol), normalizeVec(col(vecCol)).as("nv"))
      // zero vectors normalize to all-NaN, every subspace distance is
      // NaN, the argmin keeps its -1 sentinel, and element_at(codes, 0)
      // would crash EVERY later ADC serve against the poisoned index —
      // exclude them, the trainCentroids rule (a zero embedding has no
      // direction to quantize)
      .where(!isnan(element_at(col("nv"), 1)))
      .select(col(idCol), pqCodeArray(col("nv"), dim, codebooks).as("codes"))
  }

  /** The m-element PQ code array for a NORMALIZED vector column —
    * shared by [[pqCodes]] and [[ivfPqTopK]] so both paths encode
    * identically. See [[pqCodes]] for the HOF-argmin and projection-
    * boundary rationale. */
  private def pqCodeArray(nv: Column, dim: Int,
                          codebooks: Array[Array[Array[Double]]]): Column = {
    val m = codebooks.length
    require(m > 0 && dim % m == 0, s"dim=$dim must split into m=$m")
    val subDim = dim / m
    def codeOf(j: Int): Column = {
      val sub = slice(nv, j * subDim + 1, subDim)
      val cbJ = typedLit(codebooks(j).zipWithIndex.map {
        case (cv, c) => (c, cv.toSeq)
      }.toSeq) // array<struct<_1: code, _2: centroid subvector>>
      aggregate(cbJ,
        struct(lit(Double.MaxValue).as("d"), lit(-1).as("c")),
        (acc, e) => {
          val dd = aggregate(
            zip_with(sub, e.getField("_2"), (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, z) => a + z)
          when(dd < acc.getField("d"),
            struct(dd.as("d"), e.getField("_1").as("c")))
            .otherwise(acc)
        }).getField("c")
    }
    array((0 until m).map(codeOf): _*)
  }

  /** The ADC score expression shared by [[pqTopK]] and [[ivfPqTopK]]:
    * Σ_j dot(q_subj, codebook_j[code_j]) as a j-ascending left fold. */
  private def adcScore(qv: Column, codes: Column, dim: Int,
                       codebooks: Array[Array[Array[Double]]]): Column = {
    val m = codebooks.length
    val subDim = dim / m
    val cbLit = typedLit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    (0 until m).map { j =>
      dot(slice(qv, j * subDim + 1, subDim),
        element_at(element_at(cbLit, j + 1),
          element_at(codes, j + 1) + lit(1)))
    }.reduceLeft(_ + _)
  }

  /** The FULL IVF-PQ composition (the production ANN shape at 100 TB:
    * coarse cells PRUNE, compact codes RANK): corpus vectors carry an
    * IVF cell (argmax raw dot against the frozen coarse centroids —
    * the q39 assignment convention, ties to the larger index via the
    * (d, c) struct max) AND their PQ codes; queries probe their
    * `nProbe` nearest cells and rank ONLY those cells' candidates by
    * ADC. Per query the scan cost is (corpus/nCells)·nProbe code rows
    * — cell pruning bounds candidates, 8-byte codes bound bytes, and
    * the query side stays exact. Recall loss vs [[pqTopK]]'s flat scan
    * is exactly the IVF probe miss, measurable with [[recallAtK]].
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
                codebooks: Array[Array[Array[Double]]],
                centroidsIn: Array[Array[Double]], nProbe: Int = 4,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    def centDots(v: Column): Column = centDotsFor(centroidsIn)(v)
    val c = corpus
      .select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("dv"),
        normalizeVec(col(vecCol)).as("nv"))
      .where(!isnan(element_at(col("nv"), 1))) // the pqCodes zero-vector rule
      .select(col("neighbor_id"),
        array_max(centDots(col("dv"))).getField("c").as("centroid"),
        pqCodeArray(col("nv"), dim, codebooks).as("codes"))
    val q = queries
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("dv"),
        normalizeVec(col(vecCol)).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(transform(
          slice(reverse(array_sort(centDots(col("dv")))), 1, nProbe),
          p => p.getField("c"))).as("centroid"))
    val scored = c.join(broadcast(q), Seq("centroid"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        adcScore(col("qv"), col("codes"), dim, codebooks).as("approx_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
             codebooks: Array[Array[Array[Double]]],
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    pqServeCodes(
      pqCodes(corpus, dim, codebooks, idCol, vecCol)
        .withColumnRenamed(idCol, "neighbor_id"),
      queries, k, dim, codebooks, idCol, vecCol)

  /** The ADC serve tail over a (neighbor_id, codes) relation — ONE
    * implementation shared by the inline [[pqTopK]] and the persisted
    * [[pqTopKIndexed]], so fresh and stored codes serve bit-identically
    * (the writeIvfLists argument, applied to PQ). */
  private def pqServeCodes(codes: DataFrame, queries: DataFrame, k: Int,
                           dim: Int, codebooks: Array[Array[Array[Double]]],
                           idCol: String, vecCol: String): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      normalizeVec(col(vecCol)).as("qv"))
    val scored = codes.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        adcScore(col("qv"), col("codes"), dim, codebooks).as("approx_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** PQ with EXACT RE-RANKING — the standard production recovery for
    * code distortion: ADC over-fetches a `fetch`-deep shortlist from
    * the compact codes, then ONLY those candidates' raw vectors are
    * read and re-scored with exact cosine, and the top k of the exact
    * scores serve. Recall loss then comes only from true neighbors
    * missing the shortlist entirely (measured in RecallCheck on the
    * sf0.01 corpus: recall@10 0.25 → 0.35/0.55/0.76 at fetch
    * 20/50/100 — random embeddings are PQ's worst case; clustered real
    * corpora retain far more), while the scan stays
    * code-sized — raw vectors are touched for |queries|·fetch rows,
    * not the corpus. The re-rank join keys on the shortlist (semi-join
    * pruning of the vector read), and the final window sees fetch rows
    * per query, never the corpus.
    */
  def pqTopKRerank(queries: DataFrame, corpus: DataFrame, k: Int,
                   fetch: Int, dim: Int,
                   codebooks: Array[Array[Array[Double]]],
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    require(fetch >= k, s"fetch=$fetch must be >= k=$k")
    val shortlist = pqTopK(queries, corpus, fetch, dim, codebooks,
      idCol, vecCol).select(col("query_id"), col("neighbor_id"))
    val cVec = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("c_vec"),
      norm(col(vecCol)).as("c_norm"))
    val qVec = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"),
      norm(col(vecCol)).as("q_norm"))
    val exact = shortlist
      .join(cVec, Seq("neighbor_id"))
      .join(broadcast(qVec), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        safeCosine(dot(col("q_vec"), col("c_vec")),
          col("q_norm"), col("c_norm"))
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    // NaN (zero-norm) pairs excluded before ranking — see topKBruteForce
    exact.where(!isnan(col("cos_sim")))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  // ----------------------------------------------------- PQ index persistence

  /** Persist a servable PQ index under `path` — the production form of
    * the [[pqTopK]] claim: 8-byte codes stand in for 256-byte raw
    * vectors ON DISK, so every later query batch scans codes, never
    * re-encodes the corpus. Layout (all parquet):
    *
    *  - `codes/`: (vec_id, codes ARRAY<INT>) — one row per vector,
    *    BORN VERSIONED ([[graft.ops.Stage.publishRebuild]], the
    *    saveIvfIndex convention: a rebuild severs previous-serving
    *    grace, so stale codes can never pair with new codebooks);
    *  - `codebooks/`: (j, c, vec) — the m×nCent codebook entries, tiny;
    *  - `meta/`: one row (dim, m, n_cent).
    *
    * `trainIters` > 0 trains the codebooks ([[trainPqCodebooks]] —
    * oracle-replayable fixed-point Lloyd); 0 keeps the frozen
    * smallest-id sample. Codes are a pure function of (vector,
    * codebooks), so append/delete (frozen codebooks) leave the index
    * bit-identical in content to a fresh build over the effective
    * corpus — the invariant the q161 oracle and SimilaritySpec pin.
    * Deletes are immediate anti-join rewrites, deliberately: the codes
    * relation is ~32× smaller than raw vectors by construction, so the
    * rewrite costs what a tombstone COMPACTION would — the pending-
    * tombstone machinery would buy nothing here.
    */
  def savePqIndex(corpus: DataFrame, path: String, m: Int, nCent: Int,
                  dim: Int, trainIters: Int = 0, idCol: String = "vec_id",
                  vecCol: String = "embedding",
                  codebooksIn: Array[Array[Array[Double]]] = null): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    graft.ops.Stage.clearLedger(spark, path)
    graft.ops.Stage.clearTombstones(spark, path)
    graft.ops.Stage.clearSnapshots(spark, s"$path/codes")
    // codebooksIn is the SHELL path for streaming ingest: codebooks from
    // the full (static) corpus, an empty codes relation, the stream
    // fills it (q114's shell convention for the IVF lists)
    val cb = if (codebooksIn != null) codebooksIn
    else if (trainIters > 0)
      trainPqCodebooks(corpus, m, nCent, dim, trainIters, idCol, vecCol)
    else pqCodebooks(corpus, m, nCent, dim, idCol, vecCol)
    cb.zipWithIndex.flatMap { case (cbJ, j) =>
      cbJ.zipWithIndex.map { case (cv, c) => (j, c, cv.toSeq) }
    }.toSeq.toDF("j", "c", "vec")
      .repartition(1).write.mode("overwrite").parquet(s"$path/codebooks")
    Seq((dim, m, nCent)).toDF("dim", "m", "n_cent")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
    graft.ops.Stage.publishRebuild(spark, s"$path/codes")(versionDir =>
      pqCodes(corpus, dim, cb, idCol, vecCol)
        .withColumnRenamed(idCol, "vec_id")
        .write.mode("overwrite").parquet(versionDir))
  }

  /** The (dim, codebooks) a persisted PQ index was built with — one
    * loader for every function that must agree on them bit-exactly.
    * Only m×nCent×subDim doubles reach the driver. */
  private def loadPqMeta(spark: org.apache.spark.sql.SparkSession,
                         path: String): (Int, Array[Array[Array[Double]]]) = {
    val meta = spark.read.parquet(
      graft.ops.Stage.resolve(spark, s"$path/meta")).head()
    val m = meta.getAs[Int]("m"); val nCent = meta.getAs[Int]("n_cent")
    val cb = Array.fill(m, nCent)(Array.empty[Double])
    spark.read.parquet(graft.ops.Stage.resolve(spark, s"$path/codebooks"))
      .collect()
      .foreach(r => cb(r.getInt(0))(r.getInt(1)) =
        r.getSeq[Double](2).toArray)
    (meta.getAs[Int]("dim"), cb)
  }

  /** Append new vectors to a persisted [[savePqIndex]] index: the saved
    * codebooks stay frozen, arrivals encode with the same argmin
    * geometry and land as new code files — batch-sized work, and the
    * grown index serves bit-identically to a fresh build over the union
    * with the same codebooks. Under the root writer lease (the torn-pin
    * argument of every other append). */
  def appendToPqIndex(newVecs: DataFrame, path: String,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Unit =
    graft.ops.Stage.withWriterLease(newVecs.sparkSession, path) {
      val spark = newVecs.sparkSession
      val (dim, cb) = loadPqMeta(spark, path)
      pqCodes(newVecs, dim, cb, idCol, vecCol)
        .withColumnRenamed(idCol, "vec_id")
        .write.mode("append")
        .parquet(graft.ops.Stage.resolve(spark, s"$path/codes"))
    }

  /** [[appendToPqIndex]] with EXACTLY-ONCE semantics for streaming
    * ingest, via the shared ledger protocol
    * ([[graft.ops.Stage.appendExactlyOnce]]): the batch encodes with
    * the frozen codebooks into staging, then publishes under a
    * batchId-deterministic name — a replayed batch is a no-op, so
    * duplicated vectors never surface as duplicate top-k candidates
    * (the [[appendToIvfIndexExactlyOnce]] argument, applied to codes).
    */
  def appendToPqIndexExactlyOnce(newVecs: DataFrame, path: String,
                                 batchId: Long, idCol: String = "vec_id",
                                 vecCol: String = "embedding"): Unit = {
    // replay fast-exit before the metadata load, like the IVF variant
    if (graft.ops.Stage.alreadyPublished(newVecs.sparkSession, path, batchId))
      return
    val (dim, cb) = loadPqMeta(newVecs.sparkSession, path)
    graft.ops.Stage.appendExactlyOnce(newVecs.sparkSession, path, batchId,
      Seq("codes")) { staging =>
      pqCodes(newVecs, dim, cb, idCol, vecCol)
        .withColumnRenamed(idCol, "vec_id")
        .write.mode("overwrite").parquet(s"$staging/codes")
    }
  }

  /** Delete vectors from a [[savePqIndex]] index — an immediate
    * anti-join rewrite of the codes relation (see [[savePqIndex]] on
    * why PQ skips pending tombstones), atomically published; codebooks
    * and meta stay frozen, so the shrunk index equals a fresh build
    * over the survivors. */
  def deleteFromPqIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String, ids: DataFrame,
                        idCol: String = "vec_id"): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      graft.ops.Stage.sweepUncommitted(spark, path, Seq("codes"))
      val del = ids.select(col(idCol).as("vec_id")).distinct()
      graft.ops.Stage.publishRewrite(spark, s"$path/codes",
        spark.read.parquet(graft.ops.Stage.resolve(spark, s"$path/codes"))
          .join(del, Seq("vec_id"), "left_anti"))
    }

  /** ADC top-k served from a persisted [[savePqIndex]] index: the scan
    * is the 8-byte-code relation, the query side stays exact —
    * bit-identical to [[pqTopK]] over the same effective corpus (shared
    * serve tail). */
  def pqTopKIndexed(spark: org.apache.spark.sql.SparkSession,
                    queries: DataFrame, path: String, k: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val (dim, cb) = loadPqMeta(spark, path)
    pqServeCodes(
      spark.read.parquet(graft.ops.Stage.resolve(spark, s"$path/codes"))
        .withColumnRenamed("vec_id", "neighbor_id"),
      queries, k, dim, cb, idCol, vecCol)
  }

  /** [[pqTopKIndexed]] from a NAMED snapshot's pinned file list — the
    * retention serve ([[graft.ops.Stage.snapshot]] semantics; appends
    * land new files beside pinned ones, so the pin records files, not
    * the directory). */
  def pqTopKIndexedSnapshot(spark: org.apache.spark.sql.SparkSession,
                            queries: DataFrame, path: String, name: String,
                            k: Int, idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val (dim, cb) = loadPqMeta(spark, path)
    val codes = graft.ops.Stage.readSnapshot(spark, s"$path/codes", name)
      .getOrElse(throw new IllegalStateException(
        s"$path/codes has no snapshot named '$name' — pin one with " +
          "snapshotPqIndex before serving it"))
    pqServeCodes(codes.withColumnRenamed("vec_id", "neighbor_id"),
      queries, k, dim, cb, idCol, vecCol)
  }

  /** [[pqTopKRerank]] served from the PERSISTED codes: the ADC
    * shortlist comes from the stored 8-byte relation, then exact cosine
    * re-scores ONLY the |queries|·fetch shortlisted raw vectors from
    * `corpus` (the raw-vector side stays wherever the vectors live —
    * the index never duplicates them). The production serve: compact
    * scan for candidates, exact math for the final order. */
  def pqTopKRerankIndexed(spark: org.apache.spark.sql.SparkSession,
                          queries: DataFrame, corpus: DataFrame,
                          path: String, k: Int, fetch: Int,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    require(fetch >= k, s"fetch=$fetch must be >= k=$k")
    val shortlist = pqTopKIndexed(spark, queries, path, fetch, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    val cVec = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("c_vec"),
      norm(col(vecCol)).as("c_norm"))
    val qVec = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"),
      norm(col(vecCol)).as("q_norm"))
    val exact = shortlist
      .join(cVec, Seq("neighbor_id"))
      .join(broadcast(qVec), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        safeCosine(dot(col("q_vec"), col("c_vec")),
          col("q_norm"), col("c_norm"))
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    // NaN (zero-norm) pairs excluded before ranking — see topKBruteForce
    exact.where(!isnan(col("cos_sim")))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Compact a [[savePqIndex]] index after a run of per-batch appends:
    * one rewrite restores a bounded file count
    * ([[graft.ops.Stage.compactionPartitions]]) and folds the ledger to
    * its high-water marker. Serving before and after is identical (the
    * codes multiset is preserved). */
  def compactPqIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      graft.ops.Stage.sweepUncommitted(spark, path, Seq("codes"))
      val n = graft.ops.Stage.compactionPartitions(spark, s"$path/codes")
      graft.ops.Stage.publishRewrite(spark, s"$path/codes",
        spark.read.parquet(graft.ops.Stage.resolve(spark, s"$path/codes"))
          .repartition(n))
      graft.ops.Stage.compactLedger(spark, path)
    }

  /** [[compactPqIndex]] when fragmentation passes the threshold — the
    * self-maintenance hook for streaming ingest. */
  def autoCompactPqIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String,
                         maxFilesPerComponent: Int = 64): Boolean = {
    val go = graft.ops.Stage.shouldCompact(spark, path, Seq("codes"),
      maxFilesPerComponent)
    if (go) compactPqIndex(spark, path)
    go
  }

  /** [[pqTopKIndexed]] from the PREVIOUS codes snapshot — the version
    * the last maintenance op superseded, kept for one publish cycle
    * ([[graft.ops.Stage.resolvePrevious]]). Fails loudly when no
    * previous version exists (fresh build, or a rebuild severed the
    * grace). */
  def pqTopKIndexedPrevious(spark: org.apache.spark.sql.SparkSession,
                            queries: DataFrame, path: String, k: Int,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val (dim, cb) = loadPqMeta(spark, path)
    val prev = graft.ops.Stage.resolvePrevious(spark, s"$path/codes")
      .getOrElse(throw new IllegalStateException(
        s"$path/codes has no previous snapshot to serve — previous-" +
          "serving needs at least two publishes"))
    pqServeCodes(
      spark.read.parquet(prev).withColumnRenamed("vec_id", "neighbor_id"),
      queries, k, dim, cb, idCol, vecCol)
  }

  /** Maintenance DIFF of the PQ index's two serveable states — PREVIOUS
    * vs LIVE top-k per query with both ranks and a status, the same
    * validation read as [[ivfMaintenanceDiff]]. Codebooks are frozen,
    * so a pair on both sides keeps its exact approx_sim; only
    * membership and rank can move. */
  def pqMaintenanceDiff(spark: org.apache.spark.sql.SparkSession,
                        queries: DataFrame, path: String, k: Int,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val before = pqTopKIndexedPrevious(spark, queries, path, k, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"),
        col("approx_sim").as("sim_before"), col("rank").as("rank_before"))
    val after = pqTopKIndexed(spark, queries, path, k, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"),
        col("approx_sim").as("sim_after"), col("rank").as("rank_after"))
    before.join(after, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("status",
        when(col("rank_after").isNull, lit("dropped"))
          .when(col("rank_before").isNull, lit("entered"))
          .when(col("rank_before") =!= col("rank_after"), lit("moved"))
          .otherwise(lit("held")))
      .orderBy("query_id", "neighbor_id")
  }

  /** Pin / restore / release / reclaim for the PQ codes component —
    * the standard [[graft.ops.Stage.snapshot]] lifecycle under the root
    * lease. */
  def snapshotPqIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String, name: String): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      graft.ops.Stage.sweepUncommitted(spark, path, Seq("codes"))
      graft.ops.Stage.snapshot(spark, s"$path/codes", name)
    }

  def restorePqIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String, name: String): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      require(graft.ops.Stage
          .resolveSnapshot(spark, s"$path/codes", name).isDefined,
        s"snapshot '$name' does not pin $path/codes — nothing restored")
      graft.ops.Stage.restoreSnapshot(spark, s"$path/codes", name)
    }

  def dropPqIndexSnapshot(spark: org.apache.spark.sql.SparkSession,
                          path: String, name: String): Unit =
    graft.ops.Stage.dropSnapshot(spark, s"$path/codes", name)

  def vacuumPqIndex(spark: org.apache.spark.sql.SparkSession,
                    path: String): Unit =
    graft.ops.Stage.vacuum(spark, s"$path/codes")

  // ------------------------------------------------ binary index persistence

  /** Persist a servable BINARY (sign-bit) index under `path` — the
    * production form of the [[binaryTopK]] claim: 8·ceil(dim/63)-byte
    * packed signatures stand in for the raw vectors ON DISK, so every
    * later query batch scans words, never re-packs the corpus. Layout:
    *
    *  - `sig/`: (vec_id, words ARRAY<BIGINT>, dim INT) — one row per
    *    vector, BORN VERSIONED ([[graft.ops.Stage.publishRebuild]]).
    *    `dim` is STAMPED on every row (RLE-compressed constant — the
    *    round-15 manifest rule: serves derive parameters from the data
    *    they actually scan, so a serve racing a rebuild that changes
    *    dim can never pack its queries against the other generation's
    *    words);
    *  - `meta/`: one row (dim), versioned, published FIRST inside the
    *    root lease — the APPEND paths' parameter source (their reads
    *    hold the lease, so they cannot race a rebuild) and the
    *    empty-index serve fallback.
    *
    * Signatures are a pure function of (vector, dim), so append/delete
    * leave the index bit-identical in content to a fresh build over
    * the effective corpus (the savePqIndex invariant — q204's oracle
    * pins it). Deletes are immediate anti-join rewrites: the sig
    * relation is 64× smaller than raw vectors at dim 64, so the
    * rewrite costs what a tombstone compaction would.
    */
  def saveBinaryIndex(corpus: DataFrame, path: String, dim: Int = 64,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    graft.ops.Stage.clearLedger(spark, path)
    graft.ops.Stage.clearTombstones(spark, path)
    graft.ops.Stage.clearSnapshots(spark, s"$path/sig")
    graft.ops.Stage.withWriterLease(spark, path) {
      graft.ops.Stage.publishRebuild(spark, s"$path/meta")(vd =>
        Seq(dim).toDF("dim")
          .repartition(1).write.mode("overwrite").parquet(vd))
      graft.ops.Stage.publishRebuild(spark, s"$path/sig")(vd =>
        binarySigRows(corpus, dim, idCol, vecCol)
          .write.mode("overwrite").parquet(vd))
    }
  }

  /** The ONE sig projection shared by build and both appends (the
    * writeManifestTables rule — a schema change applied to only one of
    * them would corrupt every later serve of a mixed index). */
  private def binarySigRows(vecs: DataFrame, dim: Int, idCol: String,
                            vecCol: String): DataFrame =
    vecs.select(col(idCol).as("vec_id"),
        binarySignWords(col(vecCol), dim).as("words"))
      .withColumn("dim", lit(dim))

  /** The index's dim — from the sig stamp when rows exist (the data the
    * serve actually reads), from versioned meta for an empty index (any
    * dim packs queries against zero candidates identically). */
  private def binaryIndexDim(spark: org.apache.spark.sql.SparkSession,
                             path: String, sigs: DataFrame): Int =
    sigs.select(col("dim")).limit(1).collect().headOption
      .map(_.getInt(0))
      .getOrElse(spark.read.parquet(
        graft.ops.Stage.resolve(spark, s"$path/meta")).head().getAs[Int]("dim"))

  /** Append new vectors to a persisted [[saveBinaryIndex]] index:
    * arrivals pack with the index's own dim and land as new sig files —
    * batch-sized work, and the grown index serves bit-identically to a
    * fresh build over the union. Under the root writer lease (the
    * torn-pin argument of every other append; the lease also means the
    * meta read cannot race a rebuild). */
  def appendToBinaryIndex(newVecs: DataFrame, path: String,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): Unit =
    graft.ops.Stage.withWriterLease(newVecs.sparkSession, path) {
      val spark = newVecs.sparkSession
      val dim = spark.read.parquet(
        graft.ops.Stage.resolve(spark, s"$path/meta")).head().getAs[Int]("dim")
      binarySigRows(newVecs, dim, idCol, vecCol)
        .write.mode("append")
        .parquet(graft.ops.Stage.resolve(spark, s"$path/sig"))
    }

  /** [[appendToBinaryIndex]] with EXACTLY-ONCE semantics for streaming
    * ingest ([[graft.ops.Stage.appendExactlyOnce]] — marker check,
    * staged publish under `b<batchId>-*`): a replayed batch never
    * doubles its signature rows (doubles would surface as duplicate
    * top-k candidates). Meta is read INSIDE the lease-held stage
    * callback (the appendToWinnowManifestExactlyOnce rule). */
  def appendToBinaryIndexExactlyOnce(newVecs: DataFrame, path: String,
                                     batchId: Long,
                                     idCol: String = "vec_id",
                                     vecCol: String = "embedding"): Unit = {
    val spark = newVecs.sparkSession
    if (graft.ops.Stage.alreadyPublished(spark, path, batchId)) return
    graft.ops.Stage.appendExactlyOnce(spark, path, batchId, Seq("sig")) {
      staging =>
        val dim = spark.read.parquet(
          graft.ops.Stage.resolve(spark, s"$path/meta")).head()
          .getAs[Int]("dim")
        binarySigRows(newVecs, dim, idCol, vecCol)
          .write.mode("overwrite").parquet(s"$staging/sig")
    }
  }

  /** Delete vectors from a [[saveBinaryIndex]] index — an immediate
    * anti-join rewrite of the sig relation (see [[saveBinaryIndex]] on
    * why binary skips pending tombstones), atomically published; the
    * shrunk index equals a fresh build over the survivors. */
  def deleteFromBinaryIndex(spark: org.apache.spark.sql.SparkSession,
                            path: String, ids: DataFrame,
                            idCol: String = "vec_id"): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      graft.ops.Stage.sweepUncommitted(spark, path, Seq("sig"))
      val del = ids.select(col(idCol).as("vec_id")).distinct()
      graft.ops.Stage.publishRewrite(spark, s"$path/sig",
        spark.read.parquet(graft.ops.Stage.resolve(spark, s"$path/sig"))
          .join(del, Seq("vec_id"), "left_anti"))
    }

  /** Hamming-candidate + exact-rerank top-k served from a persisted
    * [[saveBinaryIndex]] index: candidates come from the stored packed
    * words, the rerank reads raw vectors from `corpus` (the raw-vector
    * side stays wherever the vectors live — the index never duplicates
    * them). Bit-identical to [[binaryTopK]] over the same effective
    * corpus (shared serve tail). */
  def binaryTopKIndexed(spark: org.apache.spark.sql.SparkSession,
                        queries: DataFrame, corpus: DataFrame,
                        path: String, k: Int, overfetch: Int = 16,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val sigs = spark.read.parquet(
        graft.ops.Stage.resolve(spark, s"$path/sig"))
      .withColumnRenamed("vec_id", "neighbor_id")
    binaryServeSigs(sigs, queries, corpus, k, overfetch,
      binaryIndexDim(spark, path, sigs), idCol, vecCol)
  }

  /** [[binaryTopKIndexed]] from a NAMED snapshot's pinned file list. */
  def binaryTopKIndexedSnapshot(spark: org.apache.spark.sql.SparkSession,
                                queries: DataFrame, corpus: DataFrame,
                                path: String, name: String, k: Int,
                                overfetch: Int = 16,
                                idCol: String = "vec_id",
                                vecCol: String = "embedding"): DataFrame = {
    val sigs = graft.ops.Stage.readSnapshot(spark, s"$path/sig", name)
      .getOrElse(throw new IllegalStateException(
        s"$path/sig has no snapshot named '$name' — pin one with " +
          "snapshotBinaryIndex before serving it"))
      .withColumnRenamed("vec_id", "neighbor_id")
    binaryServeSigs(sigs, queries, corpus, k, overfetch,
      binaryIndexDim(spark, path, sigs), idCol, vecCol)
  }

  /** [[binaryTopKIndexed]] from the PREVIOUS sig snapshot — the state
    * the last maintenance op superseded, kept for one publish cycle
    * ([[graft.ops.Stage.resolvePrevious]]). */
  def binaryTopKIndexedPrevious(spark: org.apache.spark.sql.SparkSession,
                                queries: DataFrame, corpus: DataFrame,
                                path: String, k: Int, overfetch: Int = 16,
                                idCol: String = "vec_id",
                                vecCol: String = "embedding"): DataFrame = {
    val prev = graft.ops.Stage.resolvePrevious(spark, s"$path/sig")
      .getOrElse(throw new IllegalStateException(
        s"$path/sig has no previous snapshot to serve — previous-" +
          "serving needs at least two publishes"))
    val sigs = spark.read.parquet(prev)
      .withColumnRenamed("vec_id", "neighbor_id")
    binaryServeSigs(sigs, queries, corpus, k, overfetch,
      binaryIndexDim(spark, path, sigs), idCol, vecCol)
  }

  /** Maintenance DIFF of the binary index's two serveable states —
    * PREVIOUS vs LIVE top-k per query, the [[pqMaintenanceDiff]]
    * validation read. The rerank is exact cosine on both sides, so a
    * pair present on both keeps its cos_sim and only membership/rank
    * can move. */
  def binaryMaintenanceDiff(spark: org.apache.spark.sql.SparkSession,
                            queries: DataFrame, corpus: DataFrame,
                            path: String, k: Int, overfetch: Int = 16,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val before = binaryTopKIndexedPrevious(spark, queries, corpus, path,
        k, overfetch, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"),
        col("cos_sim").as("sim_before"), col("rank").as("rank_before"))
    val after = binaryTopKIndexed(spark, queries, corpus, path, k,
        overfetch, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"),
        col("cos_sim").as("sim_after"), col("rank").as("rank_after"))
    before.join(after, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("status",
        when(col("rank_after").isNull, lit("dropped"))
          .when(col("rank_before").isNull, lit("entered"))
          .when(col("rank_before") =!= col("rank_after"), lit("moved"))
          .otherwise(lit("held")))
      .orderBy("query_id", "neighbor_id")
  }

  /** Compact a [[saveBinaryIndex]] index after a run of per-batch
    * appends; serving before and after is identical (the sig multiset
    * is preserved). */
  def compactBinaryIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      graft.ops.Stage.sweepUncommitted(spark, path, Seq("sig"))
      val n = graft.ops.Stage.compactionPartitions(spark, s"$path/sig")
      graft.ops.Stage.publishRewrite(spark, s"$path/sig",
        spark.read.parquet(graft.ops.Stage.resolve(spark, s"$path/sig"))
          .repartition(n))
      graft.ops.Stage.compactLedger(spark, path)
    }

  /** [[compactBinaryIndex]] when fragmentation passes the threshold —
    * the self-maintenance hook for streaming ingest. */
  def autoCompactBinaryIndex(spark: org.apache.spark.sql.SparkSession,
                             path: String,
                             maxFilesPerComponent: Int = 64): Boolean = {
    val go = graft.ops.Stage.shouldCompact(spark, path, Seq("sig"),
      maxFilesPerComponent)
    if (go) compactBinaryIndex(spark, path)
    go
  }

  /** Pin / restore / release / reclaim for the sig component — the
    * standard [[graft.ops.Stage.snapshot]] lifecycle under the root
    * lease. */
  def snapshotBinaryIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String, name: String): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      graft.ops.Stage.sweepUncommitted(spark, path, Seq("sig"))
      graft.ops.Stage.snapshot(spark, s"$path/sig", name)
    }

  def restoreBinaryIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String, name: String): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      require(graft.ops.Stage
          .resolveSnapshot(spark, s"$path/sig", name).isDefined,
        s"snapshot '$name' does not pin $path/sig — nothing restored")
      graft.ops.Stage.restoreSnapshot(spark, s"$path/sig", name)
    }

  def dropBinaryIndexSnapshot(spark: org.apache.spark.sql.SparkSession,
                              path: String, name: String): Unit =
    graft.ops.Stage.dropSnapshot(spark, s"$path/sig", name)

  def vacuumBinaryIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String): Unit =
    graft.ops.Stage.vacuum(spark, s"$path/sig")

  /** SEMANTIC DECONTAMINATION: for every train vector, its maximum
    * cosine against a held-out probe/eval set, the probe that attains
    * it, and a `is_contaminated` verdict at `threshold` — the
    * embedding-space complement of the n-gram decontamination family
    * (exact/substring overlap can be paraphrased away; an eval item
    * reworded still lands next to its source in embedding space).
    *
    * SCALE SHAPE — the whole point of the operator: the probe set is
    * small by nature (an eval suite, not a corpus), so it is folded
    * into ONE row of (id, vec, norm) structs and broadcast; scoring is
    * then a map-only `aggregate` HOF pass over the train side — ZERO
    * shuffle at any train size, no groupBy, no window, no per-pair row
    * explosion (the |train|·|probe| pairs exist only inside the fold).
    * Contrast [[topKBruteForce]], which materializes the pair relation
    * because it must rank per QUERY; here the max is per TRAIN row, so
    * the reduction lives in the row itself. Argmax ties break to the
    * smallest probe id (probes fold in ascending-id order with a
    * strict `>`), mirroring the oracle's (cos DESC, id ASC) rank.
    * Train rows are scored against every probe INCLUDING an identical
    * twin if the caller passes overlapping sets — disjointness is the
    * caller's split contract, not re-checked here.
    */
  def semanticDecontam(train: DataFrame, probe: DataFrame,
                       threshold: Double, idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame =
    semanticDecontamScores(train, probe, threshold, idCol, vecCol)
      .orderBy(idCol)

  /** [[semanticDecontam]] WITHOUT the presentation sort — the row-local
    * scoring alone, so the same plan runs under a streaming query
    * (append mode forbids global sorts; the gate is stateless, so
    * streaming results are batch-identical row for row). */
  def semanticDecontamScores(train: DataFrame, probe: DataFrame,
                             threshold: Double, idCol: String = "vec_id",
                             vecCol: String = "embedding"): DataFrame = {
    val probes = probe
      .select(struct(col(idCol).as("pid"),
        col(vecCol).cast("array<double>").as("pv"),
        norm(col(vecCol)).as("pnrm")).as("p"))
      .agg(sort_array(collect_list(col("p"))).as("probes")) // pid asc
    val t = train.select(col(idCol),
      col(vecCol).cast("array<double>").as("tv"),
      norm(col(vecCol)).as("tnrm"))
    val init = struct(lit(-2.0).as("cos"), lit(-1L).as("pid"))
    t.crossJoin(broadcast(probes))
      .withColumn("best",
        aggregate(col("probes"), init, (acc, p) => {
          val c = safeCosine(dot(col("tv"), p.getField("pv")),
            col("tnrm"), p.getField("pnrm"))
          when(c > acc.getField("cos"),
            struct(c.as("cos"), p.getField("pid").as("pid")))
            .otherwise(acc)
        }))
      .select(col(idCol),
        col("best.pid").as("nearest_probe_id"),
        col("best.cos").as("max_probe_cos"),
        (col("best.cos") >= lit(threshold)).as("is_contaminated"))
  }

  /** Recall@k report of an approximate top-k relation against the exact
    * one — ANN index QUALITY MONITORING as an operator (the operator
    * form of tools/RecallCheck's round-11 measurement): per query, how
    * many of the exact top-k neighbors the approximate serve recovered.
    * Inputs are any two (query_id, neighbor_id, …) top-k relations —
    * [[topKLsh]] / [[topKIvf]] / [[topKIvfIndexed]] against
    * [[topKBruteForce]] — so the report slots after any serve path,
    * including snapshot serves (pin recall BEFORE a maintenance campaign,
    * re-measure after). Cost: a join of two k-rows-per-query relations —
    * the expensive parts are the inputs, which the caller already has.
    * Queries the approximate side missed entirely (empty probe buckets)
    * report recall 0, not absence. recall = n_hit / k_exact with both
    * operands small exact integers — bit-identical in any engine.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame = {
    val ex = exact.select(col("query_id"), col("neighbor_id"))
    val ap = approx.select(col("query_id"), col("neighbor_id"))
    val hits = ex.join(ap, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    ex.groupBy("query_id").agg(count(lit(1)).as("k_exact"))
      .join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"), col("k_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("k_exact").cast("double")).as("recall"))
  }

  /** Scalar int8 quantization of an embedding column: the first memory
    * lever of a 100 TB vector store (4× fewer bytes than float32 through
    * every scan, shuffle and cache; recall cost bounded by the rounding
    * error ≤ 1/(2·scale) per component). Values clamp into [−128, 127].
    * Pure expression — runs in the scan stage.
    *
    * floor(x·scale + 0.5) instead of round(): round-half-even vs half-up
    * varies across engines, while floor is the same IEEE operation
    * everywhere — so quantized vectors are bit-identical in any replayer.
    */
  def quantize(vec: Column, scale: Double): Column =
    transform(vec.cast("array<double>"), x =>
      greatest(least(floor(x * lit(scale) + lit(0.5)), lit(127.0)),
        lit(-128.0)).cast("tinyint"))

  /** Inverse of [[quantize]] (up to rounding): int8 codes back to doubles,
    * ready for the unchanged similarity operators.
    */
  def dequantize(qvec: Column, scale: Double): Column =
    transform(qvec, v => v.cast("double") / lit(scale))

  /** k-NN majority label vote over a top-k neighbor relation — the
    * embedding-quality eval (how often do a vector's nearest neighbors
    * share its label?) and the weak-labeling step of a curation pipeline.
    * `neighbors` is ANY (query_id, neighbor_id) relation —
    * [[topKBruteForce]], [[topKLsh]] or [[topKIvf]] output — so the vote
    * inherits its producer's scale contract; this stage itself only joins
    * the slim (id, label) relation (broadcast when small) and aggregates
    * |Q|·k rows. Ties break toward the smaller label — deterministic and
    * oracle-replayable. Output: (query_id, predicted_label, votes).
    */
  def knnClassify(neighbors: DataFrame, labeled: DataFrame,
                  idCol: String = "vec_id",
                  labelCol: String = "label"): DataFrame = {
    val lab = labeled.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("n_label"))
    val votes = neighbors.join(lab, Seq("neighbor_id"))
      .groupBy("query_id", "n_label").agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("n_label"))
    votes.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("query_id"), col("n_label").as("predicted_label"),
        col("votes"))
  }

  /** Deterministic random hyperplanes (fixed seed) for sign-bit LSH. */
  private def hyperplanes(nBits: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new java.util.Random(7L)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH signature: bit i = (v · h_i) > 0. One fused native
    * expression ([[graft.functions.HyperplaneSignBits]]): a single pass
    * over the vector against a constant plane matrix, instead of nBits
    * composed dot/when/sum expressions that bloat codegen.
    */
  def lshSignature(vec: Column, nBits: Int, dim: Int): Column =
    graft.functions.VectorExpressions
      .hyperplaneSignBits(vec, hyperplanes(nBits, dim))

  /** Corpus-sample hyperplanes: plane i = v(2i) − v(2i+1) over the 2·nBits
    * smallest-id vectors. One constant-size driver lookup at any corpus
    * scale (a sorted-limit scan of 2·nBits rows), deterministic, and —
    * unlike RNG planes — exactly reproducible by an external oracle engine
    * from the data alone, which is what lets an approximate ANN query
    * carry a full equality oracle. Difference-of-samples planes also adapt
    * to the data's location: for all-positive embeddings they discriminate
    * where origin-anchored Gaussian planes collapse into one orthant.
    */
  def samplePlanes(corpus: DataFrame, nBits: Int,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): Array[Array[Double]] = {
    val rows = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .orderBy(col(idCol)).limit(2 * nBits).select("v").collect()
    require(rows.length == 2 * nBits,
      s"samplePlanes needs ${2 * nBits} corpus vectors, found ${rows.length}")
    Array.tabulate(nBits) { i =>
      val a = rows(2 * i).getSeq[Double](0)
      val b = rows(2 * i + 1).getSeq[Double](0)
      a.zip(b).map { case (x, y) => x - y }.toArray
    }
  }

  /** Bucketed ANN: equi-join query and corpus on the LSH bucket, exact
    * cosine within the bucket, top-k per query. Approximate — recall
    * depends on nBits; pairs in unprobed buckets are never scored.
    * `planes` overrides the default fixed-seed Gaussian hyperplanes (see
    * [[samplePlanes]] for the oracle-reproducible choice).
    *
    * MULTI-PROBE (`nProbe` > 1): each query also probes the Hamming-1
    * neighbor buckets from flipping bits 0..nProbe-2 of its signature —
    * the near-miss buckets where one borderline hyperplane vote went the
    * other way, which is where most single-probe recall loss lives. The
    * recall lever costs query-side fan-out only: the corpus index is
    * untouched (fixed index cost), and because a (query, neighbor) pair
    * can match through exactly ONE mask (the mask must equal sig_q XOR
    * sig_c), the probe fan-out never emits duplicate pairs — no distinct
    * needed before ranking. `nProbe = nBits + 1` probes the full
    * Hamming-1 ball, a condition an oracle replays as
    * `bit_count(sig_q XOR sig_c) <= 1`.
    */
  def topKLsh(queries: DataFrame, corpus: DataFrame, k: Int, nBits: Int, dim: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              planes: Array[Array[Double]] = null, nProbe: Int = 1): DataFrame = {
    val pl = if (planes == null) hyperplanes(nBits, dim) else planes
    def sig(vec: Column): Column =
      graft.functions.VectorExpressions.hyperplaneSignBits(vec, pl)
    val masks: Seq[Long] =
      0L +: (0 until math.min(nProbe - 1, nBits)).map(i => 1L << i)
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("q_vec"),
        norm(col(vecCol)).as("q_norm"),
        sig(col(vecCol)).as("sig"))
      .select(col("query_id"), col("q_vec"), col("q_norm"),
        explode(array(masks.map(m =>
          col("sig").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("c_vec"),
      norm(col(vecCol)).as("c_norm"),
      sig(col(vecCol)).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        safeCosine(dot(col("q_vec"), col("c_vec")),
          col("q_norm"), col("c_norm"))
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    // zero-norm sides score NaN (safeCosine), and BOTH Spark and DuckDB
    // sort NaN as the LARGEST double — unfiltered, a zero vector would
    // win rank 1 of every top-k. Undefined-direction pairs are EXCLUDED
    // (the simhashSignatures null-doc rule); joinBackToCorpus restores
    // coverage rows where a caller needs them.
    scored.where(!isnan(col("cos_sim")))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Banded sign-LSH near-duplicate pairs: the scale path for
    * [[cosineDupPairsExact]]. Same candidate-first shuffle discipline as
    * `Dedup.minhashPairs`: the banded self-join carries only vector ids
    * (plus the signature words both sides already have), pair uniqueness
    * is the FIRST-MATCHING-BAND rule — a collision at band b survives only
    * if no earlier band of the signature XOR is all-zero, pure bit math —
    * then vectors join back for ONE exact cosine verification per unique
    * pair. No `distinct()` exchange over the candidate set: a dense
    * duplicate cluster costs O(pairs) long-comparisons in the candidate
    * stage, not a multi-million-row shuffle + hash aggregate.
    *
    * Recall: a pair at angle θ agrees on one bit with prob p = 1 − θ/π;
    * collision prob = 1 − (1 − p^bitsPerBand)^bands. Verification is
    * exact, so precision is always 1 regardless of banding.
    *
    * WHY 16×32 is the default — the random-collision FLOOR. Unrelated
    * pairs share a band with prob ≈ bands·2^−bitsPerBand, and that floor
    * times n²/2 is a hard candidate count no verification can dodge. The
    * old 6×6 default floored at 6/2⁶ ≈ 9.4%: measured 127 M candidates
    * for 50 k chunk-histogram embeddings at sf1 (the structural n²/32
    * disease q224 fixed for 64-bit SimHash, in cosine clothing) — 47 B
    * candidates at 1 M docs. 16-bit bands floor at 32/2¹⁶ ≈ 0.049%,
    * ~190× lower, AND the extra bands push BOUNDARY miss probability at
    * cos 0.98 — the contract threshold of every default-config caller —
    * to ≈1.1e−6 per pair (vs 1.2e−3 for the old 6×6: a 16×16 variant
    * measured here was 385× cheaper but dropped exactly one boundary
    * pair in 218 at sf1; 32 bands buy back recall with floor to spare).
    * The widened signature (512 planes = 8 words) no longer fits one
    * long, so the signature is an ARRAY of 64-bit words, 64/bitsPerBand
    * full bands per word; a single-word config (any bitsPerBand·bands ≤
    * 64, e.g. q36's explicit 4×9) produces bit-identical pair sets to
    * the pre-array implementation. Low-threshold callers (cos ≪ 0.98)
    * should pass explicit wide-band params: at cos 0.9 sixteen-bit bands
    * recall poorly where 4×9 recalls ≈0.97 — narrow bands buy their
    * floor with boundary recall, and the right trade depends on the
    * caller's threshold.
    *
    * Hyperplanes are CENTERED on the corpus mean: all-positive embeddings
    * (count vectors, post-ReLU features) live in one orthant where raw
    * sign-LSH barely discriminates — every bucket is dense and candidates
    * approach O(n²). Since dot(v−m, p) = dot(v,p) − dot(m,p), centering is
    * just a per-plane scalar offset on the bit threshold; the offsets come
    * from one corpus-mean aggregate (a constant 1×dim row at any scale) and
    * near-identical pairs still land together because both members shift
    * identically. Verification cosine stays on the RAW vectors.
    */
  def cosineDupPairsLsh(corpus: DataFrame, threshold: Double, dim: Int,
                        bitsPerBand: Int = 16, bands: Int = 32,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        planes: Array[Array[Double]] = null): DataFrame = {
    require(bitsPerBand >= 1 && bitsPerBand <= 63,
      s"bitsPerBand must be in [1, 63], got $bitsPerBand")
    val pl = if (planes == null) hyperplanes(bitsPerBand * bands, dim) else planes
    require(pl.length == bitsPerBand * bands,
      s"need ${bitsPerBand * bands} planes, got ${pl.length}")
    // (id, v, nrm) feeds FOUR subtrees (mean aggregate, banding, both
    // verification join-backs). Deliberately NOT persisted: a lazily
    // returned plan gives this function no hook to ever unpersist, so a
    // cache here leaked one full corpus projection into the block
    // manager PER CALL for the session's lifetime (a per-snapshot dedup
    // sweep accumulates corpora until eviction). The projection is
    // map-only over the corpus scan — lineage recompute per consumer is
    // the standard Spark answer; callers that hold embeddings as a
    // computed column and call this repeatedly should persist THEIR
    // input, where they can also release it.
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"), norm(col(vecCol)).as("nrm"))
    // RNG planes are origin-anchored, so they get mean-centered via per-plane
    // offsets dot(mean, p) — one tiny aggregate, collected as consts. Caller-
    // provided planes (e.g. [[samplePlanes]] differences) already adapt to
    // the data's location AND an avg-aggregate offset is float-order
    // sensitive, so zero offsets keep the whole machinery exactly replayable
    // by an external oracle engine.
    val offsets: Array[Double] =
      if (planes != null) new Array[Double](pl.length)
      else {
        val mean = c.select(posexplode(col("v")))
          .groupBy(col("pos")).agg(avg(col("col")).as("m"))
          .orderBy("pos").collect().map(_.getDouble(1))
        pl.map(p => p.zip(mean).map { case (a, b) => a * b }.sum)
      }
    // fused signatures, 64/bitsPerBand full bands per 64-bit word (one
    // HyperplaneSignBits pass per word over its plane slice); band keys
    // are bit-chunks of the owning word
    val bandsPerWord = 64 / bitsPerBand
    val nWords = (bands + bandsPerWord - 1) / bandsPerWord
    val sigWords: Seq[Column] = (0 until nWords).map { w =>
      val from = w * bandsPerWord * bitsPerBand
      val until = math.min(bands, (w + 1) * bandsPerWord) * bitsPerBand
      graft.functions.VectorExpressions.hyperplaneSignBits(
        col("v"), pl.slice(from, until), offsets.slice(from, until))
    }
    val mask = (1L << bitsPerBand) - 1
    // band b lives at bit offset (b % bandsPerWord)·bitsPerBand of word
    // b / bandsPerWord (1-indexed for element_at)
    def bandKey(sig: Column, b: Int): Column =
      shiftrightunsigned(element_at(sig, b / bandsPerWord + 1),
        (b % bandsPerWord) * bitsPerBand).bitwiseAND(lit(mask))
    val banded = c.select(col("id"), array(sigWords: _*).as("sig"))
      .select(col("id"), col("sig"),
        posexplode(array((0 until bands).map(b => bandKey(col("sig"), b)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    // candidate work is quadratic in bucket size but its input is tiny, so
    // the streamed side must be spread over the shuffle width explicitly
    // (AQE sizes partitions by input bytes and would run it single-task)
    val shufflePartitions =
      corpus.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val left = banded.select(col("band"), col("band_key"),
      col("id").as("id_a"), col("sig").as("sig_a"))
      .repartition(shufflePartitions, col("band"), col("band_key"))
    val right = banded.select(col("band"), col("band_key"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    // first-matching-band: band b survives only if no earlier bitsPerBand-
    // wide chunk of sig_a XOR sig_b (within the chunk's owning word) is
    // zero — pairs unique by construction
    def xorKey(b: Int): Column = {
      val w = b / bandsPerWord + 1
      shiftrightunsigned(
        element_at(col("sig_a"), w).bitwiseXOR(element_at(col("sig_b"), w)),
        (b % bandsPerWord) * bitsPerBand).bitwiseAND(lit(mask))
    }
    // foldLeft, not reduce: bands = 1 is legal and has no earlier band
    val earlierBandMatched = (0 until bands - 1).map { b =>
      (col("band") > b) && (xorKey(b) === 0L)
    }.foldLeft(lit(false))(_ || _)
    val candidates = left.join(right, Seq("band", "band_key"))
      .where(col("id_a") < col("id_b") && !earlierBandMatched)
      .select("id_a", "id_b")
    val pairs = candidates
      .join(c.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a")), Seq("id_a"))
      .join(c.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        safeCosine(dot(col("v_a"), col("v_b")),
          col("n_a"), col("n_b")).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
    pairs
  }

  /** Deterministic coarse-quantizer centroids (fixed seed, distinct from the
    * hyperplane seed).
    */
  private def centroids(n: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new java.util.Random(13L)
    Array.fill(n)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Coarse-quantizer centroids seeded from the data: the `n` smallest-id
    * corpus vectors. Constant driver-side work at any corpus size, and
    * exactly reproducible by an oracle engine (the seeds are rows, not RNG
    * state) — the IVF dual of [[samplePlanes]].
    */
  def sampleCentroids(corpus: DataFrame, n: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Array[Array[Double]] = {
    val rows = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .orderBy(col(idCol)).limit(n).select("v").collect()
    require(rows.length == n,
      s"sampleCentroids needs $n corpus vectors, found ${rows.length}")
    rows.map(_.getSeq[Double](0).toArray)
  }

  /** K-means-trained centroids: Lloyd iterations run AS DATAFRAME JOBS —
    * assignment is the same argmax-dot expression the IVF query uses, the
    * re-estimation is one groupBy over (centroid, position). Nothing but
    * the k×dim centroid matrix ever reaches the driver, so training a
    * 100 TB corpus is `iters` distributed passes, not a collect.
    *
    * Seeded from [[sampleCentroids]] (deterministic); vectors are
    * L2-normalized inside the objective and every centroid — seed or
    * re-estimated mean — is L2-normalized back to the unit sphere
    * (spherical k-means), so argmax-DOT assignment IS argmax-cosine and
    * the trained cells partition by DIRECTION, matching the metric the
    * IVF search ranks by. Without the re-normalization a mean of unit
    * vectors shrinks with its cluster's spread (‖mean‖ ≈ avg cos to the
    * center), and argmax-dot would systematically favor COHERENT cells
    * over diffuse ones near boundaries. Empty cells keep their previous
    * (already unit) centroid.
    */
  def trainCentroids(corpus: DataFrame, n: Int, dim: Int, iters: Int = 3,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): Array[Array[Double]] = {
    def unitize(c: Array[Double]): Array[Double] = {
      val nrm = math.sqrt(c.map(x => x * x).sum)
      if (nrm > 0.0) c.map(_ / nrm) else c
    }
    var cents = sampleCentroids(corpus, n, idCol, vecCol).map(unitize)
    val unit = {
      val v = col(vecCol).cast("array<double>")
      transform(v, x => x / sqrt(graft.functions.VectorExpressions.dot(v, v)))
    }
    val vecs = corpus.select(unit.as("v")).where(!isnan(element_at(col("v"), 1)))
    for (_ <- 1 to iters) {
      val cd = array(cents.zipWithIndex.map { case (cv, i) =>
        struct(graft.functions.VectorExpressions
          .dot(col("v"), array(cv.map(lit(_)): _*)).as("d"), lit(i).as("c"))
      }: _*)
      val means = vecs
        .select(col("v"), array_max(cd).getField("c").as("centroid"))
        .select(col("centroid"), posexplode(col("v")))
        .groupBy("centroid", "pos").agg(avg("col").as("m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      val updated = means.map(_.getInt(0)).toSet
      cents = next.zipWithIndex.map { case (c, i) =>
        if (updated(i)) unitize(c) else c }
    }
    cents
  }

  /** [[trainCentroids]] in the PORTABLE fixed-point discipline of
    * [[trainPqCodebooks]] — the variant an oracle can value-check, which
    * is what lets the TRAINED IVF path (q158) sit under the same
    * bit-exact correctness gate as the frozen-sample one (q39). Same
    * spherical-k-means semantics: seeds are the `n` smallest-id
    * NORMALIZED vectors (the q152 cent convention), assignment is
    * argmax-dot with ties to the LARGER centroid id (the engine's
    * (d, c) struct array_max == the replay's ORDER BY d DESC, c DESC),
    * and each re-estimated mean is computed from exact integer sums of
    * 2^-20-quantized coordinates, then re-unitized with one
    * fixed-order sum of squares + sqrt (both IEEE-exact in any engine).
    * Empty cells keep their previous unit centroid. `iters` distributed
    * passes; only the n×dim matrix reaches the driver.
    */
  def trainCentroidsPortable(corpus: DataFrame, n: Int, dim: Int,
                             iters: Int = 1, idCol: String = "vec_id",
                             vecCol: String = "embedding")
      : Array[Array[Double]] = {
    require(iters >= 0, s"iters=$iters must be non-negative")
    val Grid = 1048576.0 // 2^20
    def unitize(c: Array[Double]): Array[Double] = {
      // ascending-position fold, the duckDot spelling
      val nrm = math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))
      if (nrm > 0.0) c.map(_ / nrm) else c
    }
    var cents = sampleCentroids(
      corpus.select(col(idCol), normalizeVec(col(vecCol)).as(vecCol)),
      n, idCol, vecCol)
    // zero vectors normalize to all-NaN and would silently drag a
    // centroid's fixed-point update toward zero (NaN sorts greatest in
    // the argmax; its floor(NaN·G) quantizes to 0 while still counting)
    // — trainCentroids filters them (its line has the same guard), the
    // portable variant must too or the two diverge AND the oracle replay
    // of the NaN cast is engine-defined
    val nv = corpus.select(normalizeVec(col(vecCol)).as("nv"))
      .where(!isnan(element_at(col("nv"), 1)))
    for (_ <- 1 to iters) {
      val cd = array(cents.zipWithIndex.map { case (cv, i) =>
        struct(dot(col("nv"), array(cv.map(lit(_)): _*)).as("d"),
          lit(i).as("c"))
      }: _*)
      val stats = nv
        .select(array_max(cd).getField("c").as("c"),
          posexplode(col("nv")).as(Seq("pos", "x")))
        .groupBy("c", "pos")
        .agg(sum(floor(col("x") * Grid + lit(0.5)).cast("long")).as("smi"),
          count(lit(1)).as("cnt"))
        .collect()
      val next = cents.map(_.clone())
      val touched = scala.collection.mutable.Set.empty[Int]
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) =
          r.getLong(2).toDouble / r.getLong(3) / Grid
        touched += r.getInt(0)
      }
      cents = next.zipWithIndex.map { case (c, i) =>
        if (touched(i)) unitize(c) else c
      }
    }
    cents
  }

  /** IVF-style ANN: corpus rows are assigned to their best coarse centroid
    * (the inverted list); each query probes its `nProbe` nearest centroids
    * and scores only those lists. The assignment/probing is pure expression
    * work (array of (dot, idx) structs; struct ordering makes array_max an
    * argmax), the probe fan-out is an explode + equi-join on the centroid
    * id — so the corpus is scanned once and never shuffled by pair.
    *
    * Versus [[topKLsh]]: buckets follow the data's density (centroid
    * Voronoi cells) rather than fixed hyperplane sign patterns, and recall
    * is tuned at query time via nProbe with no re-indexing. `centroidsIn`
    * overrides the default fixed-seed Gaussian centroids: pass
    * [[trainCentroids]] for k-means cells (the production shape) or
    * [[sampleCentroids]] for oracle-reproducible determinism.
    */
  /** (dot, index) struct array against a constant centroid matrix — struct
    * ordering makes `array_max` an argmax with ties to the larger index.
    */
  private def centDotsFor(cents: Array[Array[Double]])(v: Column): Column =
    array(cents.zipWithIndex.map { case (cv, i) =>
      struct(dot(v, array(cv.map(lit(_)): _*)).as("d"), lit(i).as("c"))
    }: _*)

  def topKIvf(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              centroidsIn: Array[Array[Double]] = null): DataFrame = {
    val cents = if (centroidsIn == null) centroids(nCentroids, dim) else centroidsIn
    def centDots(v: Column): Column = centDotsFor(cents)(v)
    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("c_vec"),
        norm(col(vecCol)).as("c_norm"), centDots(col(vecCol).cast("array<double>")).as("cd"))
      .select(col("neighbor_id"), col("c_vec"), col("c_norm"),
        array_max(col("cd")).getField("c").as("centroid"))
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("q_vec"),
        norm(col(vecCol)).as("q_norm"), centDots(col(vecCol).cast("array<double>")).as("cd"))
      .select(col("query_id"), col("q_vec"), col("q_norm"),
        explode(transform(slice(reverse(array_sort(col("cd"))), 1, nProbe),
          p => p.getField("c"))).as("centroid"))
    val scored = c.join(broadcast(q), Seq("centroid"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        safeCosine(dot(col("q_vec"), col("c_vec")),
          col("q_norm"), col("c_norm"))
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    // zero-norm sides score NaN (safeCosine), and BOTH Spark and DuckDB
    // sort NaN as the LARGEST double — unfiltered, a zero vector would
    // win rank 1 of every top-k. Undefined-direction pairs are EXCLUDED
    // (the simhashSignatures null-doc rule); joinBackToCorpus restores
    // coverage rows where a caller needs them.
    scored.where(!isnan(col("cos_sim")))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Corpus COMPOSITION over embedding clusters: assign every vector to
    * its argmax-dot centroid (the IVF assignment geometry, frozen and
    * replayable) and roll up counts per (centroid, label) with each
    * label's share of its cluster — the mixture matrix a corpus designer
    * reads before reweighting sources (the DoReMi/SemDeDup-adjacent
    * "what does my embedding space actually contain per domain" report;
    * the same rollup keyed by source instead of label audits crawl
    * composition). Pass [[trainCentroids]] in production;
    * [[sampleCentroids]] keeps the oracle replayable.
    *
    * `share` is one IEEE division of exact integers — bit-identical in
    * any engine. Scale shape: assignment is pure map work against the
    * broadcast k×dim centroid matrix (the [[topKIvf]] expression array);
    * the only exchanges aggregate (centroid, label) rows — at most
    * k×|labels| of them — and the cluster-total join-back is a broadcast
    * of ≤ k rows.
    */
  def clusterMixture(corpus: DataFrame, labelCol: String,
                     centroidsIn: Array[Array[Double]],
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    // NULL vectors have no argmax cell — excluded, like NULL text in
    // corpusStats (callers filter explicitly when they need them counted)
    val assigned = corpus.where(col(vecCol).isNotNull)
      .select(col(labelCol).as("label"),
        array_max(centDotsFor(centroidsIn)(col(vecCol).cast("array<double>")))
          .getField("c").as("centroid"))
    val counts = assigned.groupBy("centroid", "label")
      .agg(count(lit(1)).as("n_vecs"))
    // cluster totals via a window over the k×|labels| counts relation —
    // a separate totals aggregate would repeat the counts subtree and
    // depend on ReuseExchange to avoid a second assignment pass; the
    // window states the one-pass shape structurally, and its partitions
    // are per-centroid label rows, bounded by |labels|
    val perCentroid = Window.partitionBy(col("centroid"))
    counts
      .withColumn("n_total", sum(col("n_vecs")).over(perCentroid))
      .select(col("centroid"), col("label"), col("n_vecs"), col("n_total"),
        (col("n_vecs").cast("double") / col("n_total")).as("share"))
  }

  /** EMBEDDING-SPACE drift monitor — [[graft.ext.Corpus.histogramDrift]]
    * (q124's ppm drift report) applied to the vector modality: assign
    * BOTH corpus snapshots to the same FROZEN centroids (argmax dot,
    * [[clusterMixture]]'s assignment geometry) and compare per-centroid
    * occupancy shares in integer ppm, one row per centroid with both
    * counts, both shares, and the absolute ppm delta (TVD = Σ delta / 2,
    * the same bounded metric q124 uses — no float division decides any
    * drift number). This is the signal a text-length histogram cannot
    * see: a new crawl whose documents LOOK the same but whose embedding
    * mass shifts between clusters (topic/source drift) moves these
    * shares before any length statistic moves. Centroids must be FROZEN
    * (train once on the reference, reuse — the [[saveIvfIndex]]
    * discipline); re-training per comparison would chase the drift it
    * is meant to measure.
    *
    * Scale shape: assignment is map work against the broadcast k×dim
    * matrix; the only exchanges aggregate (centroid, count) rows — at
    * most k per side — and the totals ride a window over that k-row
    * relation ([[graft.ext.Corpus.driftFromHistograms]], reused
    * verbatim so text and embedding drift share one comparison
    * arithmetic). NULL vectors are excluded on both sides.
    */
  def embeddingDrift(reference: DataFrame, current: DataFrame,
                     centroidsIn: Array[Array[Double]],
                     vecCol: String = "embedding"): DataFrame =
    Corpus.driftFromHistograms(
      centroidHistogram(reference, centroidsIn, "n_a", vecCol),
      centroidHistogram(current, centroidsIn, "n_b", vecCol))
      .withColumnRenamed("bucket", "centroid")

  /** One snapshot's (bucket = centroid, count) occupancy histogram — the
    * mergeable drift state of [[embeddingDrift]], public for the same
    * reason [[graft.ext.Corpus.lengthBucketHistogram]] is: the STREAMING
    * embedding-drift monitor maintains exactly this relation as
    * complete-mode aggregation state (k rows, corpus-size invariant),
    * and both sides of a drift comparison must assign identically. */
  def centroidHistogram(df: DataFrame, centroidsIn: Array[Array[Double]],
                        countName: String,
                        vecCol: String = "embedding"): DataFrame =
    df.where(col(vecCol).isNotNull)
      .select(array_max(
          centDotsFor(centroidsIn)(col(vecCol).cast("array<double>")))
        .getField("c").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(countName))

  // -------------------------------------------------------- index persistence

  /** Persist a servable IVF index under `path` so repeated query batches
    * skip centroid training AND corpus assignment — the build is one
    * corpus pass, amortized over every later [[topKIvfIndexed]] call.
    * Layout (all parquet):
    *
    *  - `centroids/`: (centroid INT, vec ARRAY<DOUBLE>) — the k trained
    *    centroids, tiny;
    *  - `lists/`, PARTITIONED BY centroid: (vec_id, code) — the inverted
    *    lists. `code` is the raw double vector, or int8 codes when
    *    `quantScale` > 0 ([[quantize]] — the 4× storage lever applied to
    *    the index files themselves);
    *  - `meta/`: one row (dim, n_centroids, quant_scale).
    *
    * With quantization on, centroid ASSIGNMENT runs over the
    * dequantized codes, so the index is a pure function of what it
    * stores and a replayer holding only the codes reproduces it exactly.
    * The partitionBy turns probe selectivity into directory pruning: a
    * query batch probing p of k centroids reads p/k of the index bytes
    * (dynamic partition pruning against the broadcast probe list), which
    * is the difference between an index lookup and a corpus scan at
    * 100 TB.
    */
  def saveIvfIndex(corpus: DataFrame, path: String, nCentroids: Int, dim: Int,
                   quantScale: Double = 0.0, iters: Int = 3,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   centroidsIn: Array[Array[Double]] = null): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // a rebuild starts a fresh streaming lineage: stale exactly-once
    // markers would silently no-op the new stream's first batches, a
    // stale tombstone table would mask the new corpus's vectors, and a
    // stale snapshot pin would keep serving (and keep alive) the OLD
    // corpus's lists under its name
    graft.ops.Stage.clearLedger(spark, path)
    graft.ops.Stage.clearTombstones(spark, path)
    graft.ops.Stage.clearSnapshots(spark, s"$path/lists")
    val cents = if (centroidsIn == null)
      trainCentroids(corpus, nCentroids, dim, iters, idCol, vecCol)
    else centroidsIn
    cents.zipWithIndex.toSeq.map { case (v, i) => (i, v.toSeq) }
      .toDF("centroid", "vec")
      .repartition(1).write.mode("overwrite").parquet(s"$path/centroids")
    Seq((dim, cents.length, quantScale)).toDF("dim", "n_centroids", "quant_scale")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
    // lists are BORN VERSIONED (publish on a fresh dir = v1 + pointer):
    // a Hive-partitioned component must never live as a plain layout,
    // because its first migration would leave a root that mixes
    // `centroid=N/` and version directories — unreadable as a fresh scan
    // (see Stage.resolvePrevious). publishREBUILD, not publishRewrite:
    // on a rebuild over an existing index the old corpus's version must
    // get NO previous-serving grace — topKIvfIndexedPrevious right after
    // a rebuild would otherwise silently dequantize OLD-corpus lists
    // with the NEW meta's quantScale/centroids. The rebuild boundary
    // resets the whole history (ledger/tombstones/snapshots above, and
    // the previous pointer here); previous-serving returns after the
    // first post-rebuild maintenance op.
    graft.ops.Stage.publishRebuild(spark, s"$path/lists")(versionDir =>
      writeIvfLists(corpus, cents, quantScale, idCol, vecCol, versionDir,
        "overwrite"))
  }

  /** The (scale, centroids) a persisted index was built with — ONE loader
    * for every function that must agree on them bit-exactly (serve,
    * append). Only k×dim doubles reach the driver.
    */
  private def loadIvfMeta(spark: org.apache.spark.sql.SparkSession,
                          path: String): (Double, Array[Array[Double]]) = {
    val meta = spark.read.parquet(
      graft.ops.Stage.resolve(spark, s"$path/meta")).head()
    val cents = spark.read.parquet(
        graft.ops.Stage.resolve(spark, s"$path/centroids")).orderBy("centroid")
      .select("vec").collect().map(_.getSeq[Double](0).toArray)
    (meta.getAs[Double]("quant_scale"), cents)
  }

  /** Quantize-assign-write of the inverted lists, shared by the builder
    * (overwrite) and [[appendToIvfIndex]] (append). ONE implementation on
    * purpose: build and append must agree bit-exactly on the code and the
    * assignment geometry, or a grown index silently stops matching a
    * fresh build (the invariant SimilaritySpec pins).
    */
  private def writeIvfLists(vecs: DataFrame, cents: Array[Array[Double]],
                            quantScale: Double, idCol: String,
                            vecCol: String, listsDir: String,
                            mode: String): Unit = {
    val code = if (quantScale > 0) quantize(col(vecCol), quantScale)
      else col(vecCol).cast("array<double>")
    val assignVec = if (quantScale > 0)
      dequantize(quantize(col(vecCol), quantScale), quantScale)
    else col(vecCol).cast("array<double>")
    vecs.select(col(idCol).as("vec_id"), code.as("code"),
        array_max(centDotsFor(cents)(assignVec)).getField("c").as("centroid"))
      .write.mode(mode).partitionBy("centroid").parquet(listsDir)
  }

  /** Append new vectors to a persisted [[saveIvfIndex]] index WITHOUT
    * retraining: the saved centroids stay fixed, arrivals are assigned to
    * their nearest centroid with the same quantize→dequantize geometry and
    * appended to that centroid's inverted-list partition. Because the
    * assignment is a pure function of (vector, centroids), an index built
    * on a base set and appended with a batch is bit-identical in content
    * to one built on the union with the same centroids (SimilaritySpec
    * pins this) — the daily-ingest path that keeps serving from one index
    * while the corpus grows, paying one batch-sized pass per day instead
    * of a corpus-sized rebuild. Quality caveat, as in every IVF system:
    * centroids drift stale as the distribution shifts; retrain on the
    * index's own schedule, not per batch.
    */
  def appendToIvfIndex(newVecs: DataFrame, path: String,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): Unit =
    // root lease, like the exactly-once variant: an unleased append
    // racing a [[snapshotIvfIndex]] pin could hand the pin a torn
    // (partially committed) file list
    graft.ops.Stage.withWriterLease(newVecs.sparkSession, path) {
      val (scale, cents) = loadIvfMeta(newVecs.sparkSession, path)
      writeIvfLists(newVecs, cents, scale, idCol, vecCol,
        graft.ops.Stage.resolve(newVecs.sparkSession, s"$path/lists"),
        "append")
    }

  /** [[appendToIvfIndex]] with EXACTLY-ONCE semantics for streaming
    * ingest, via the shared ledger protocol
    * ([[graft.ops.Stage.appendExactlyOnce]]): the batch's assigned lists
    * are staged with the same frozen-centroid geometry, then published
    * into the live `lists/` partitions under deterministic `b<batchId>-*`
    * names (the partition-preserving publish — each staged
    * `centroid=N/` file lands in the live `centroid=N/`). This closes the
    * at-least-once exposure the plain append has under `foreachBatch`
    * replay: a replayed batch would duplicate its vectors in the lists,
    * and duplicated vectors SURFACE IN SERVED RESULTS as duplicate top-k
    * candidate rows — unlike the manifest, where duplicates only waste
    * bytes. Batch ids are only meaningful relative to one durable
    * checkpoint lineage.
    */
  def appendToIvfIndexExactlyOnce(newVecs: DataFrame, path: String,
                                  batchId: Long, idCol: String = "vec_id",
                                  vecCol: String = "embedding"): Unit = {
    // replay no-op BEFORE the metadata load: a replayed batch must not
    // pay the meta head() + full centroid collect just to discover its
    // marker (appendExactlyOnce rechecks — this is the cheap fast exit)
    if (graft.ops.Stage.alreadyPublished(newVecs.sparkSession, path, batchId))
      return
    val (scale, cents) = loadIvfMeta(newVecs.sparkSession, path)
    graft.ops.Stage.appendExactlyOnce(newVecs.sparkSession, path, batchId,
      Seq("lists")) { staging =>
      writeIvfLists(newVecs, cents, scale, idCol, vecCol, s"$staging/lists",
        "overwrite")
    }
  }

  /** Delete vectors from a [[saveIvfIndex]] index — unlike the MinHash
    * manifest (whose docs table stores exact-collapse REPRESENTATIVES, so
    * an id-keyed delete could forget content other living docs still
    * carry), the inverted lists hold one row PER VECTOR, making id-keyed
    * deletion exact: anti-join the lists, atomically publish
    * ([[graft.ops.Stage.publishRewrite]]), centroids and meta stay frozen.
    * Assignment is a pure per-vector function of the frozen centroids, so
    * the shrunk index is bit-identical to a fresh build over the
    * survivors with the same centroids (the invariant SimilaritySpec and
    * the q106 oracle pin).
    */
  def deleteFromIvfIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String, ids: DataFrame,
                         idCol: String = "vec_id"): Unit =
      graft.ops.Stage.withWriterLease(spark, path) {
    // like every compacting rewrite: a crashed batch's uncommitted
    // b<id>-* files must not fold (the replay would double them)
    graft.ops.Stage.sweepUncommitted(spark, path, Seq("lists"))
    val del = ids.select(col(idCol).as("vec_id")).distinct()
    graft.ops.Stage.publishRewrite(spark, s"$path/lists") { versionDir =>
      spark.read.parquet(graft.ops.Stage.resolve(spark, s"$path/lists"))
        .join(del, Seq("vec_id"), "left_anti")
        .write.mode("overwrite").partitionBy("centroid").parquet(versionDir)
    }
  }

  /** TOMBSTONE vectors in a [[saveIvfIndex]] index — the batched
    * alternative to [[deleteFromIvfIndex]]'s per-call lists rewrite
    * (index-sized work per delete under a drip-feed). Appends the id set
    * (batch-sized); [[topKIvfIndexed]] anti-joins the pending ids
    * (broadcast) so deleted vectors stop appearing in served top-k
    * immediately, and [[compactIvfIndex]] folds the tombstones into a
    * physical delete then resets. Serve-equivalent to the immediate
    * delete at every point (q118 pins it against q106's oracle).
    */
  def tombstoneFromIvfIndex(spark: org.apache.spark.sql.SparkSession,
                            path: String, ids: DataFrame,
                            idCol: String = "vec_id"): Unit =
    graft.ops.Stage.appendTombstones(
      ids.select(col(idCol).as("vec_id")), path)

  /** `lists` minus tombstoned vectors (identity when nothing is
    * pending). Broadcast anti-join on vec_id; callers load
    * [[graft.ops.Stage.pendingTombstones]] once per query. */
  private def minusTombstoned(lists: DataFrame,
                              tomb: Option[DataFrame]): DataFrame =
    tomb match {
      case Some(t) => lists.join(
        t.withColumnRenamed(t.columns.head, "vec_id"),
        Seq("vec_id"), "left_anti")
      case None => lists
    }

  /** Compact a [[saveIvfIndex]] index's inverted lists after a run of
    * per-batch appends: each micro-batch leaves its own `b<batchId>-*`
    * (or plain part) files inside every `centroid=N/` partition it
    * touched, so after thousands of batches a probe pays file-listing and
    * tiny-row-group overhead proportional to batch count, not data size.
    * One lists-sized rewrite restores one-file-per-centroid:
    * `repartition(centroid)` (task count from
    * [[graft.ops.Stage.compactionPartitions]]) keeps each centroid's rows
    * in one task, and the partitionBy write lands them in one file per
    * directory — still scan-parallel at 100 TB because parquet splits on
    * row groups, not files. Content (vec_id, centroid, code) is
    * preserved exactly — centroids, meta, and served top-k are untouched
    * (SimilaritySpec pins it). Publishes atomically
    * ([[graft.ops.Stage.publishRewrite]]): a crash mid-compaction leaves
    * the fragmented-but-correct lists serving.
    */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String): Unit =
      graft.ops.Stage.withWriterLease(spark, path) {
    import graft.ops.Stage.{compactionPartitions, publishRewrite, resolve}
    // crashed-mid-publish batch leavings must not fold (see
    // Stage.sweepUncommitted — the replay would double them)
    graft.ops.Stage.sweepUncommitted(spark, path, Seq("lists"))
    val n = compactionPartitions(spark, s"$path/lists")
    // pending tombstones FOLD here (physical delete), then exactly the
    // consumed tombstone files reset (keys appended mid-fold stay)
    val snap = graft.ops.Stage.tombstoneSnapshot(spark, path)
    publishRewrite(spark, s"$path/lists") { versionDir =>
      minusTombstoned(spark.read.parquet(resolve(spark, s"$path/lists")),
        snap.map(_._1))
        .repartition(n, col("centroid"))
        .write.mode("overwrite").partitionBy("centroid").parquet(versionDir)
    }
    graft.ops.Stage.resetTombstones(spark, path,
      snap.map(_._2).getOrElse(Nil))
    graft.ops.Stage.compactLedger(spark, path)
  }

  /** [[compactIvfIndex]] when the lists have fragmented past
    * `maxFilesPerComponent` live files ([[graft.ops.Stage.shouldCompact]]);
    * otherwise a metadata-only listing. The self-maintenance hook for
    * streaming ingest sinks. Returns whether a compaction ran. */
  def autoCompactIvfIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String,
                          maxFilesPerComponent: Int = 64): Boolean = {
    val go = graft.ops.Stage.shouldCompact(spark, path, Seq("lists"),
      maxFilesPerComponent)
    if (go) compactIvfIndex(spark, path)
    go
  }

  /** Serve top-k from a [[saveIvfIndex]] index: identical ranking contract
    * to [[topKIvf]] over the same centroids and (de)quantized vectors, but
    * the corpus side is the prebuilt inverted lists — no training, no
    * assignment, and only the probed `nProbe`/k fraction of index
    * partitions read.
    */
  def topKIvfIndexed(spark: org.apache.spark.sql.SparkSession,
                     queries: DataFrame, path: String, k: Int, nProbe: Int = 4,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    // tombstones BEFORE the lists resolve (the linearizable ordering —
    // see Stage.tombstoneSnapshot)
    val tomb = graft.ops.Stage.pendingTombstones(spark, path)
    serveIvf(spark, queries, path,
      graft.ops.Stage.resolve(spark, s"$path/lists"), tomb, k, nProbe,
      idCol, vecCol)
  }

  /** [[hardNegatives]]' SCALE PATH, made concrete: mine cross-label hard
    * negatives from the PERSISTED IVF index via OVER-FETCH — serve
    * `k × overFetch` candidates per query from the inverted lists, join
    * neighbor labels from the caller's labels relation (the index stores
    * codes, not labels — one index per label would be the only
    * alternative, and it would break every other consumer), drop
    * same-label candidates, re-rank, keep k. The standard remedy for
    * post-filtered ANN: the filter can only SHRINK a ranked prefix, so
    * over-fetching restores depth; queries whose entire over-fetched
    * prefix was same-label yield fewer than k rows (raise `overFetch` or
    * `nProbe` — the exact [[hardNegatives]] is the oracle-checked
    * baseline to validate a chosen setting against, which is exactly
    * what q137's oracle does at the replayed geometry). Cost: the
    * [[topKIvfIndexed]] serve at depth k·overFetch plus one join of a
    * k·overFetch·|Q|-row relation against the labels table.
    */
  def hardNegativesIndexed(spark: org.apache.spark.sql.SparkSession,
                           queries: DataFrame, path: String,
                           labels: DataFrame, k: Int, overFetch: Int = 4,
                           nProbe: Int = 4, labelCol: String = "label",
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    require(overFetch >= 1, s"overFetch must be >= 1, got $overFetch")
    val served = topKIvfIndexed(spark, queries, path, k * overFetch,
      nProbe, idCol, vecCol)
    val qLabels = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("query_label"))
    val nLabels = labels.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("neighbor_label"))
    val filtered = served
      .join(broadcast(qLabels), Seq("query_id"))
      .join(nLabels, Seq("neighbor_id"))
      .where(col("neighbor_label") =!= col("query_label"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    filtered
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"), col("cos_sim"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** [[topKIvfIndexed]] from the PREVIOUS lists snapshot — the version a
    * delete or compaction superseded, kept for one publish cycle by the
    * versioned publish ([[graft.ops.Stage.resolvePrevious]]; the text
    * index's [[graft.ext.Search.bm25TopKIndexedPrevious]] is the same
    * read applied there). Centroids and meta are FROZEN after the build
    * (every maintenance op rewrites only `lists/`), so the previous
    * snapshot needs only the lists' prior version. Pending tombstones
    * still mask it — right-to-be-forgotten holds for validation reads.
    */
  def topKIvfIndexedPrevious(spark: org.apache.spark.sql.SparkSession,
                             queries: DataFrame, path: String, k: Int,
                             nProbe: Int = 4, idCol: String = "vec_id",
                             vecCol: String = "embedding"): DataFrame = {
    val tomb = graft.ops.Stage.pendingTombstones(spark, path)
    val listsDir = graft.ops.Stage.resolvePrevious(spark, s"$path/lists")
      .getOrElse(throw new IllegalStateException(
        s"$path/lists has no previous snapshot to serve — previous-serving " +
          "needs at least two publishes"))
    serveIvf(spark, queries, path, listsDir, tomb, k, nProbe, idCol, vecCol)
  }

  /** Pin the index's current lists version under a NAMED snapshot —
    * retention beyond [[topKIvfIndexedPrevious]]'s one-cycle validation
    * window ([[graft.ops.Stage.snapshot]]; the text index's
    * [[graft.ext.Search.snapshotTextIndex]] is the same pin there).
    * Centroids and meta are frozen after the build, so `lists/` is the
    * only component with versions to pin. Requires the lists to be
    * versioned — [[saveIvfIndex]] writes them born-versioned, so any
    * saved index qualifies immediately. */
  def snapshotIvfIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String, name: String): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      // a crashed batch's doomed partials must not be pinned (the pin
      // records file lists; a later sweep would dangle them)
      graft.ops.Stage.sweepUncommitted(spark, path, Seq("lists"))
      graft.ops.Stage.snapshot(spark, s"$path/lists", name)
    }

  /** ROLL the live lists BACK to a [[snapshotIvfIndex]] pin
    * ([[graft.ops.Stage.restoreSnapshot]]) — the undo for an
    * append/forget campaign [[ivfMaintenanceDiff]] flagged as wrong.
    * Centroids and meta are frozen at build, so restoring `lists/`
    * restores the whole serveable state; the restored partition
    * directories byte-match the pin, so dynamic partition pruning and
    * the dequantization parameters serve exactly as at pin time. The
    * pin survives; see [[Search.restoreTextIndex]] for the shared
    * tombstone/ledger contract. */
  def restoreIvfIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String, name: String): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      graft.ops.Stage.restoreSnapshot(spark, s"$path/lists", name)
    }

  /** Release a [[snapshotIvfIndex]] pin; the pinned version becomes an
    * ordinary GC candidate at the next publish — or immediately via
    * [[vacuumIvfIndex]]. */
  def dropIvfIndexSnapshot(spark: org.apache.spark.sql.SparkSession,
                           path: String, name: String): Unit =
    graft.ops.Stage.dropSnapshot(spark, s"$path/lists", name)

  /** Reclaim the index's stale list versions now
    * ([[graft.ops.Stage.vacuum]]) — the storage release after dropping a
    * pin, without waiting for the next maintenance op's publish. */
  def vacuumIvfIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String): Unit =
    graft.ops.Stage.vacuum(spark, s"$path/lists")

  /** [[topKIvfIndexed]] served from a NAMED snapshot — identical ranking
    * over the pinned lists, any number of maintenance ops later. Pending
    * tombstones still mask it; fails loudly on an unknown name. */
  def topKIvfIndexedSnapshot(spark: org.apache.spark.sql.SparkSession,
                             queries: DataFrame, path: String, name: String,
                             k: Int, nProbe: Int = 4,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding"): DataFrame = {
    val tomb = graft.ops.Stage.pendingTombstones(spark, path)
    // pinned FILE LIST, not the directory: appends publish into the
    // live version dir (see Stage.snapshot); basePath keeps the
    // centroid partition column inferable from the pinned paths
    val lists = graft.ops.Stage
      .readSnapshot(spark, s"$path/lists", name)
      .getOrElse(throw new IllegalStateException(
        s"$path/lists has no snapshot named '$name' — pin one with " +
          "snapshotIvfIndex before serving it"))
    serveIvfFrames(spark, queries, path, lists, tomb, k, nProbe, idCol,
      vecCol)
  }

  /** Maintenance DIFF of the index's two serveable states: PREVIOUS
    * (the lists snapshot the last maintenance op superseded) vs LIVE,
    * one row per (query, neighbor) pair in either top-k with both
    * ranks and a status — `dropped` (deleted, or displaced by the
    * candidate-set change), `entered`, `moved`, `held`. Centroids and
    * codes are frozen, so a pair present on both sides keeps its exact
    * cos_sim — only membership and rank can move. The first-class form
    * of the validation read ([[topKIvfIndexedPrevious]]'s purpose);
    * cost is two probes plus a full outer join of two k-per-query
    * relations. q129 pins it against a DuckDB replay of both rankings.
    */
  def ivfMaintenanceDiff(spark: org.apache.spark.sql.SparkSession,
                         queries: DataFrame, path: String, k: Int,
                         nProbe: Int = 4, idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val before = topKIvfIndexedPrevious(spark, queries, path, k, nProbe,
        idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"),
        col("cos_sim").as("cos_before"), col("rank").as("rank_before"))
    val after = topKIvfIndexed(spark, queries, path, k, nProbe, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"),
        col("cos_sim").as("cos_after"), col("rank").as("rank_after"))
    before.join(after, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("status",
        when(col("rank_after").isNull, lit("dropped"))
          .when(col("rank_before").isNull, lit("entered"))
          .when(col("rank_before") =!= col("rank_after"), lit("moved"))
          .otherwise(lit("held")))
      .orderBy("query_id", "neighbor_id")
  }

  /** The shared IVF serve body over a RESOLVED lists directory — live,
    * previous-snapshot, and named-snapshot serving must rank
    * identically. */
  private def serveIvf(spark: org.apache.spark.sql.SparkSession,
                       queries: DataFrame, path: String, listsDir: String,
                       tomb: Option[DataFrame], k: Int, nProbe: Int,
                       idCol: String, vecCol: String): DataFrame =
    serveIvfFrames(spark, queries, path, spark.read.parquet(listsDir),
      tomb, k, nProbe, idCol, vecCol)

  /** [[serveIvf]] over an already-materialized lists relation — the
    * layer snapshot serving enters at (pinned FILE LISTS, not
    * directories — see [[graft.ops.Stage.snapshot]]). */
  private def serveIvfFrames(spark: org.apache.spark.sql.SparkSession,
                             queries: DataFrame, path: String,
                             lists: DataFrame, tomb: Option[DataFrame],
                             k: Int, nProbe: Int, idCol: String,
                             vecCol: String): DataFrame = {
    val (scale, cents) = loadIvfMeta(spark, path)
    val cvec = if (scale > 0) dequantize(col("code"), scale)
      else col("code")
    val c = minusTombstoned(lists, tomb)
      .select(col("vec_id").as("neighbor_id"), cvec.as("c_vec"), col("centroid"))
      .withColumn("c_norm", norm(col("c_vec")))
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("q_vec"),
        norm(col(vecCol)).as("q_norm"),
        centDotsFor(cents)(col(vecCol).cast("array<double>")).as("cd"))
      .select(col("query_id"), col("q_vec"), col("q_norm"),
        explode(transform(slice(reverse(array_sort(col("cd"))), 1, nProbe),
          p => p.getField("c"))).as("centroid"))
    val scored = c.join(broadcast(q), Seq("centroid"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        safeCosine(dot(col("q_vec"), col("c_vec")),
          col("q_norm"), col("c_norm"))
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    // zero-norm sides score NaN (safeCosine), and BOTH Spark and DuckDB
    // sort NaN as the LARGEST double — unfiltered, a zero vector would
    // win rank 1 of every top-k. Undefined-direction pairs are EXCLUDED
    // (the simhashSignatures null-doc rule); joinBackToCorpus restores
    // coverage rows where a caller needs them.
    scored.where(!isnan(col("cos_sim")))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    * embedding space coarsely, then search for near-duplicates ONLY
    * within each cluster — the cluster assignment bounds the quadratic.
    * Per vector the verdict is: `dup_of` = the smallest earlier (lower-id)
    * same-cluster vector with cosine ≥ tau, or −1; `keep` = 1 iff no such
    * earlier duplicate exists. Keeping the minimum id makes the verdict a
    * pure function of the corpus (no RNG, no iteration order).
    *
    * Scale shape: assignment is the same argmax-dot expression array the
    * IVF path uses — pure map work against a broadcast k×dim centroid
    * matrix. The pair search is a self-join ON THE CLUSTER ID, so each
    * cluster's Θ(c²) pair work stays inside its own shuffle partitions
    * and the cross-cluster n² never materializes. The operating contract
    * at 100 TB is the paper's: k grows with the corpus (k ∝ n keeps
    * E[c²] bounded), and the AQE skew-join split handles the occasional
    * dense cell. Pass [[trainCentroids]] for production cells;
    * [[sampleCentroids]] keeps the oracle replayable.
    */
  def semDedup(corpus: DataFrame, tau: Double, dim: Int, nClusters: Int = 16,
               idCol: String = "vec_id", vecCol: String = "embedding",
               centroidsIn: Array[Array[Double]] = null): DataFrame = {
    val cents = if (centroidsIn == null) centroids(nClusters, dim) else centroidsIn
    val assigned = corpus.select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("v"),
        norm(col(vecCol)).as("nrm"),
        array_max(centDotsFor(cents)(col(vecCol).cast("array<double>")))
          .getField("c").as("centroid"))
    val a = assigned.select(col("centroid"), col("vec_id").as("id_a"),
      col("v").as("v_a"), col("nrm").as("n_a"))
    val b = assigned.select(col("centroid"), col("vec_id").as("id_b"),
      col("v").as("v_b"), col("nrm").as("n_b"))
    val dups = a.join(b, Seq("centroid"))
      .where(col("id_a") < col("id_b"))
      .where(safeCosine(dot(col("v_a"), col("v_b")),
        col("n_a"), col("n_b")) >= tau)
      .groupBy(col("id_b").as("vec_id")).agg(min(col("id_a")).as("dup_of"))
    assigned.select(col("vec_id"), col("centroid"))
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("centroid"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
        (coalesce(col("dup_of"), lit(-1L)) < 0).cast("int").as("keep"))
      .orderBy("vec_id")
  }

  /** Exact embedding-cosine pairs above a threshold — a corpus×corpus
    * self-join, O(n²) BY CONSTRUCTION. This is the small-corpus reference
    * oracle (tests, eval sets), NOT the dup-pairs operator: the production
    * contract is [[cosineDupPairsLsh]] (bucketed candidates, exact
    * verification). The `maxRows` guard makes the quadratic boundary
    * explicit — past it the job fails fast with the routing hint instead of
    * melting a cluster. The guard count is one ids-only pass, noise next to
    * the n² pair stage it protects.
    */
  def cosineDupPairsExact(corpus: DataFrame, threshold: Double,
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          maxRows: Long = 100000L): DataFrame = {
    val n = corpus.select(col(idCol)).count()
    require(n <= maxRows,
      s"cosineDupPairsExact is O(n²) and corpus has $n rows (> $maxRows); " +
        "use cosineDupPairsLsh for the bucketed scale path")
    val a = corpus.select(col(idCol).as("id_a"),
      col(vecCol).cast("array<double>").as("v_a"),
      norm(col(vecCol)).as("n_a"))
    val b = corpus.select(col(idCol).as("id_b"),
      col(vecCol).cast("array<double>").as("v_b"),
      norm(col(vecCol)).as("n_b"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        safeCosine(dot(col("v_a"), col("v_b")),
          col("n_a"), col("n_b")).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }
}
