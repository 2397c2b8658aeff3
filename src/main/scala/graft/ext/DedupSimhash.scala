package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** SimHash signatures and banded Hamming pairs, perceptual-hash pairs, word n-gram shingles, and bucketed exact n-gram Jaccard.
  * One family of [[Dedup]] — the object is assembled from the
  * per-family traits (graft.ext.Dedup*.scala) so each file stays
  * reviewable; call sites are unchanged.
  */
/** Typed Aggregator folding token hashes into a 64-bit SimHash: per bit,
  * count +1/-1 votes weighted by the token hash's bit, sign of the total
  * becomes the signature bit. Supports partial aggregation, so the
  * map-side combine reduces each partition to one 64-int buffer per doc
  * before any shuffle.
  */
class SimhashAgg extends Aggregator[Long, Array[Int], Long] {
  def zero: Array[Int] = new Array[Int](64)
  def reduce(buf: Array[Int], tokenHash: Long): Array[Int] = {
    var j = 0
    while (j < 64) {
      if (((tokenHash >>> j) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1
      j += 1
    }
    buf
  }
  def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }
  def finish(buf: Array[Int]): Long = {
    var sig = 0L
    var j = 0
    while (j < 64) { if (buf(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }
  def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

trait DedupSimhash extends DedupMinhash {
  // ---------------------------------------------------------------- SimHash


  /** (id, simhash) per document WITH TOKENS: explode distinct tokens,
    * hash them, fold with the Aggregator (partial agg keeps the shuffle
    * at one row per doc per partition). NULL-text documents have no
    * tokens and therefore NO ROW here (deliberate — an all-zero
    * signature for every null doc would pair them all with each other
    * and with anything within Hamming range of 0); callers joining back
    * to the corpus must left-join. `hasher` defaults to xxhash64
    * (codegen'd, best bit mixing); pass
    * [[TextAnalysis.portableTokenHash64]] when the signature must be
    * replayable by an external oracle engine.
    */
  def simhashSignatures(df: DataFrame, textCol: String, idCol: String,
                        hasher: Column => Column = xxhash64(_)): DataFrame = {
    val sim = udaf(new SimhashAgg, Encoders.scalaLong)
    df.select(col(idCol).as("doc"),
        explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .select(col("doc"), hasher(col("tok")).as("h"))
      .groupBy("doc").agg(sim(col("h")).as("simhash"))
  }

  /** Restore FULL-CORPUS cardinality on a per-document derived relation
    * that deliberately dropped signature-less documents — NULL text for
    * [[simhashSignatures]], undecodable blobs for the perceptual hashes
    * ([[Multimodal.dhashMedia]]/[[Multimodal.ahashMedia]] hash even
    * junk bytes via the fallback, but [[Multimodal.patternPngBlobs]]
    * and real decode pipelines skip null/absent payloads): one row per
    * corpus document, the derived columns NULL where the document has
    * no signature. This is the left join every family scaladoc told
    * callers to hand-write, shipped as an operator so the contract has
    * one exercised spelling. Scale shape: an id equi-join; AQE
    * broadcasts whichever side is small, and no token/blob payload
    * rides through it when `corpus` is pre-projected to the id.
    */
  def joinBackToCorpus(corpus: DataFrame, derived: DataFrame,
                       idCol: String = "doc_id",
                       derivedIdCol: String = "doc"): DataFrame =
    corpus.select(col(idCol)).join(
      (if (derivedIdCol == idCol) derived
       else derived.withColumnRenamed(derivedIdCol, idCol)),
      Seq(idCol), "left")

  /** SimHash near-dup pairs — the DEFAULT routes to the 128-bit scale
    * path ([[simhashPairs128]]): same recall-1 pigeonhole contract for
    * Hamming ≤ 7, ≈256× lower random-collision candidate floor than the
    * 64-bit banding (whose floor the round-16 sf1 bench measured as an
    * n²/32 wall growing 67× for 10× docs). A caller reaching for the
    * family name gets the variant that survives a corpus-size step;
    * the 64-bit signature remains available EXPLICITLY as
    * [[simhashPairs64]] (q32's pinned oracle contract). Note the
    * distances are over the doubled signature: a 64-bit near-dup at
    * Hamming h lands near 2h here — thresholds calibrated against
    * 64-bit signatures must be re-calibrated, which is why this is a
    * differently-named default and not a silent swap of
    * [[simhashPairs64]]'s output.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 7,
                   hasher: Column => Column = xxhash64(_)): DataFrame =
    simhashPairs128(df, textCol, idCol, maxHamming, hasher)

  /** 64-BIT SimHash near-dup pairs with Hamming distance ≤ maxHamming,
    * found by pigeonhole banding: split the 64-bit signature into
    * `chunks` pieces; any pair within distance < chunks must agree on ≥1
    * chunk, so an equi-join on (chunkIdx, chunkValue) finds all
    * candidates without a cross product. Requires maxHamming < chunks.
    * Recall is 1 by the pigeonhole theorem (not probabilistic), so the
    * output is EXACTLY "all pairs at Hamming ≤ maxHamming" for whatever
    * `hasher` feeds the votes — with the portable hasher that makes the
    * whole operator replayable by a brute-force oracle join.
    *
    * SCALE CEILING, measured: with Hamming ≤ 7 the banding is forced to
    * 8 chunks of 8 bits and two UNRELATED documents collide on some
    * chunk with probability ≈ 8/2⁸ — an n²/32 candidate floor (q32's
    * sf1 wall grew 66.9× for 10× docs). This variant is the pinned
    * 64-bit CONTRACT (q32's oracle replays it bit-exactly); production
    * corpora past ~10⁶ docs should call [[simhashPairs]] /
    * [[simhashPairs128]], whose 16-bit bands are measured
    * linear/output-bound at the same step.
    */
  def simhashPairs64(df: DataFrame, textCol: String, idCol: String,
                     maxHamming: Int = 7, chunks: Int = 8,
                     hasher: Column => Column = xxhash64(_)): DataFrame = {
    // chunks = 1 would need a 64-bit band mask — (1L << 64) wraps to 0,
    // every signature lands in ONE bucket, and the "banded" join
    // degenerates to the full cross product. Hamming-0 search belongs
    // to chunks = 2 (two 32-bit bands) or [[exact]].
    require(chunks >= 2 && 64 % chunks == 0,
      s"chunks must divide 64 and be >= 2, got $chunks")
    bandedHammingPairs(simhashSignatures(df, textCol, idCol, hasher)
        .select(col("doc"), col("simhash").as("sig")),
      maxHamming, chunks, 64 / chunks)
  }

  /** 128-BIT SimHash signatures — the documented SCALE PATH past
    * [[simhashPairs]]' random-collision floor. With a 64-bit signature
    * the pigeonhole banding for Hamming ≤ 7 is forced to 8 chunks of 8
    * bits, and two UNRELATED documents collide on some chunk with
    * probability ≈ 8/2⁸ — an n²/32 candidate floor that the round-16
    * sf1 bench measured directly (q32 wall 67× for 10× docs while its
    * true output grew 10×). Doubling the signature keeps the SAME 8
    * bands but widens them to 16 bits: random chunk collisions drop to
    * ≈ 8/2¹⁶ — a 256× lower floor — while the pigeonhole recall-1
    * guarantee for Hamming ≤ 7 over the FULL 128 bits is unchanged.
    *
    * The second 64 bits vote over a SALTED token hash (`tok || "#2"`)
    * — independent bits from the same replayable primitive, so the
    * portable-hash oracle replays both words. Output: (doc,
    * simhash_hi, simhash_lo); NULL-text docs emit nothing
    * ([[simhashSignatures]]' contract; [[joinBackToCorpus]] restores).
    */
  def simhashSignatures128(df: DataFrame, textCol: String, idCol: String,
                           hasher: Column => Column = xxhash64(_))
      : DataFrame = {
    val sim = udaf(new SimhashAgg, Encoders.scalaLong)
    df.select(col(idCol).as("doc"),
        explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .select(col("doc"), hasher(col("tok")).as("h1"),
        hasher(concat(col("tok"), lit("#2"))).as("h2"))
      .groupBy("doc").agg(sim(col("h1")).as("simhash_hi"),
        sim(col("h2")).as("simhash_lo"))
  }

  /** All pairs at 128-bit SimHash Hamming ≤ `maxHamming` (< 8), by the
    * same pigeonhole banding as [[simhashPairs]] but over 8 SIXTEEN-bit
    * chunks spanning both signature words — the scale path (see
    * [[simhashSignatures128]]). Recall exactly 1; first-matching-chunk
    * candidate dedup in pure bit math; hamming = popcount(xor hi) +
    * popcount(xor lo). Output (doc_a, doc_b, hamming), doc_a < doc_b.
    */
  def simhashPairs128(df: DataFrame, textCol: String, idCol: String,
                      maxHamming: Int = 7,
                      hasher: Column => Column = xxhash64(_)): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 8,
      s"128-bit pigeonhole banding uses 8 chunks; needs maxHamming < 8, " +
        s"got $maxHamming")
    val sigs = simhashSignatures128(df, textCol, idCol, hasher)
    val mask = (1L << 16) - 1
    def chunkOf(c: Int, hi: Column, lo: Column): Column =
      shiftrightunsigned(if (c < 4) hi else lo, (c % 4) * 16)
        .bitwiseAND(lit(mask))
    val banded = sigs.select(col("doc"), col("simhash_hi"),
        col("simhash_lo"),
        posexplode(array((0 until 8).map(c =>
          chunkOf(c, col("simhash_hi"), col("simhash_lo"))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val shufflePartitions = sigs.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val l = banded.select(col("chunk"), col("chunk_val"),
      col("doc").as("doc_a"), col("simhash_hi").as("hi_a"),
      col("simhash_lo").as("lo_a"))
      .repartition(shufflePartitions, col("chunk"), col("chunk_val"))
    val r = banded.select(col("chunk"), col("chunk_val"),
      col("doc").as("doc_b"), col("simhash_hi").as("hi_b"),
      col("simhash_lo").as("lo_b"))
    val xorHi = col("hi_a").bitwiseXOR(col("hi_b"))
    val xorLo = col("lo_a").bitwiseXOR(col("lo_b"))
    def chunkXor(c: Int): Column =
      shiftrightunsigned(if (c < 4) xorHi else xorLo, (c % 4) * 16)
        .bitwiseAND(lit(mask))
    val earlierChunkMatched = (0 until 7).map(c =>
      (col("chunk") > c) && (chunkXor(c) === 0L))
      .foldLeft(lit(false))(_ || _)
    l.join(r, Seq("chunk", "chunk_val"))
      .where(col("doc_a") < col("doc_b") && !earlierChunkMatched)
      .select(col("doc_a"), col("doc_b"),
        (bit_count(xorHi) + bit_count(xorLo)).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** The ONE pigeonhole-banding core shared by [[simhashPairs]] and
    * [[perceptualNearDupPairs]]: explode `chunks` bands of `bitsPer`
    * bits, equi-join on (chunkIdx, chunkValue) — any pair at Hamming
    * < chunks agrees on ≥ 1 chunk, so recall is exactly 1 — and dedupe
    * candidates in-plan with the first-matching-chunk rule (pure bit
    * math on the signature XOR: chunk c matched earlier iff its band of
    * xor is zero — no candidate distinct(), no arrays through the join,
    * all codegen'd). Input: (doc, sig). Output: (doc_a, doc_b, hamming),
    * doc_a < doc_b, hamming ≤ maxHamming. */
  private def bandedHammingPairs(sigs: DataFrame, maxHamming: Int,
                                 chunks: Int, bitsPer: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < chunks,
      s"pigeonhole banding needs 0 <= maxHamming < $chunks, got $maxHamming")
    val mask = (1L << bitsPer) - 1
    val banded = sigs.select(col("doc"), col("sig"),
      posexplode(array((0 until chunks).map(c =>
        shiftrightunsigned(col("sig"), c * bitsPer).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val shufflePartitions = sigs.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val l = banded.select(col("chunk"), col("chunk_val"),
      col("doc").as("doc_a"), col("sig").as("sig_a"))
      .repartition(shufflePartitions, col("chunk"), col("chunk_val"))
    val rgt = banded.select(col("chunk"), col("chunk_val"),
      col("doc").as("doc_b"), col("sig").as("sig_b"))
    val xor = col("sig_a").bitwiseXOR(col("sig_b"))
    // foldLeft, not reduce: chunks = 1 is legal and has no earlier chunk
    val earlierChunkMatched = (0 until chunks - 1).map(c =>
      (col("chunk") > c) &&
        (shiftrightunsigned(xor, c * bitsPer).bitwiseAND(lit(mask)) === 0L))
      .foldLeft(lit(false))(_ || _)
    l.join(rgt, Seq("chunk", "chunk_val"))
      .where(col("doc_a") < col("doc_b") && !earlierChunkMatched)
      .select(col("doc_a"), col("doc_b"),
        bit_count(xor).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** PERCEPTUAL near-dup pairs over a 56-bit image-hash relation
    * (doc, dhash) — [[Multimodal.dhashMedia]]'s output — by the same
    * pigeonhole banding as [[simhashPairs]]: 7 chunks of 8 bits, so any
    * pair at Hamming < 7 agrees on ≥1 chunk and an equi-join on
    * (chunkIdx, chunkValue) finds ALL candidates (recall exactly 1, not
    * probabilistic) without an image cross product. Requires
    * maxHamming < 7. First-matching-chunk bit math dedupes candidates
    * in-plan; output (doc_a, doc_b, hamming), doc_a < doc_b.
    *
    * Scale shape: identical to text SimHash — band explode is 7 rows per
    * image, the join keys on (chunk, chunk_val) so only same-bucket
    * images ever pair, and popcount(xor) is codegen'd. A pathological
    * bucket (billions of near-black thumbnails) skews exactly like a hot
    * SimHash chunk — AQE skew-join applies unchanged.
    *
    * `hashBits` is the signature's bit-width (56 for [[Multimodal
    * .dhashMedia]], 63 for [[Multimodal.ahashMedia]]); the chunk width
    * derives as ceil(hashBits/7) so the 7 bands always COVER the whole
    * hash. Taking the chunk width directly (the old API) let a caller
    * under-cover — bitsPer=7 over a 56-bit hash banded only the low 49
    * bits, silently missing pairs that differ solely in bits 49-55 and
    * breaking the documented recall-1 pigeonhole guarantee. When 7 does
    * not divide hashBits the top chunk carries hashBits mod 7 real bits
    * (the rest read as zeros) — correctness and recall are unaffected,
    * the top band is just coarser.
    */
  def perceptualNearDupPairs(hashes: DataFrame,
                             maxHamming: Int = 6,
                             hashCol: String = "dhash",
                             hashBits: Int = 56): DataFrame = {
    require(hashBits >= 7 && hashBits <= 63,
      s"hashBits must be in [7, 63] (non-negative long signatures): $hashBits")
    bandedHammingPairs(
      hashes.select(col("doc_id").as("doc"), col(hashCol).as("sig")),
      maxHamming, chunks = 7, bitsPer = (hashBits + 6) / 7)
  }

  // ---------------------------------------------------------- n-gram Jaccard

  /** Word n-gram shingles in document order, repeats kept (n ≥ 2) — the
    * multiset form repetition statistics need.
    */
  def rawWordNgrams(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    // guard: sequence(1, 0) would generate a DESCENDING range, not empty
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word n-gram shingles as an expression (n ≥ 2). */
  def wordNgrams(text: Column, n: Int): Column =
    array_distinct(rawWordNgrams(text, n))

  /** Per-bucket salting fanout `(bucket, f)` for the bucket-scoped pair
    * join: `f = max(ceil(C(count,2) / targetPairsPerTask),
    * ceil(cap / nBuckets))` clamped to [1, min(count, cap)], or the forced
    * constant when `fixed > 0`. One count aggregate over the bucket
    * column — linear, columnar, and broadcast back (the bucket key is
    * low-cardinality by the operator's contract).
    *
    * The `ceil(cap / nBuckets)` term is the PARALLELISM FLOOR: demand-only
    * fanout picks f = 1 for every bucket whose pair count is under target,
    * which at modest scale collapses the whole quadratic pair join onto
    * nBuckets tasks of a cap-wide shuffle. The floor spreads Σf over at
    * least the shuffle width whenever the buckets have the rows for it —
    * the `min(count, …)` clamp stops a tiny bucket from being replicated
    * into salts that `pmod(id, f)` can never populate on the probe side.
    */
  private[graft] def bucketFanouts(df: DataFrame, bucketCol: String,
                                   fixed: Int, targetPairsPerTask: Long,
                                   cap: Int): DataFrame = {
    val counts = df.groupBy(col(bucketCol).as("bucket"))
      .agg(count(lit(1)).as("bn"))
    if (fixed > 0)
      counts.select(col("bucket"), lit(fixed).cast("int").as("f"))
    else {
      // whole-relation window: counts has one row per bucket (tiny by the
      // operator's contract), so single-partition evaluation is free and
      // saves a second scan of df that a driver-side count() would cost
      val nBuckets = count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy())
      val demand = ceil(col("bn") * (col("bn") - 1) / lit(2.0 * targetPairsPerTask))
      val floor = ceil(lit(cap.max(1).toDouble) / nBuckets)
      val f = least(greatest(demand, floor, lit(1L)), col("bn"), lit(cap.max(1).toLong))
      counts.select(col("bucket"), greatest(f, lit(1L)).cast("int").as("f"))
    }
  }

  /** Exact n-gram Jaccard pairs within an explicit bucket column (e.g. a
    * source/partition key): the cross product is confined to buckets. At
    * 100 TB the bucket column is what bounds the join — callers pick
    * something with bounded cardinality per value, or use minhashPairs
    * for candidate generation instead.
    *
    * The bucket key is usually LOW-cardinality (a handful of sources), which
    * would collapse the equi-join onto that many tasks. The join is salted
    * PER BUCKET: the left leg takes `salt = doc_id mod f(bucket)`, the
    * right leg is replicated across that bucket's `f(bucket)` salts, so each
    * bucket's cross product is spread over `f` independent tasks at the cost
    * of shuffling the (small, gram-hashed) right leg `f` times.
    *
    * `fanout = 0` (the default) derives `f(bucket)` from bucket-size stats:
    * one cheap count pre-agg, then f = ceil(pairs(bucket) /
    * `targetPairsPerTask`), clamped to [1, shuffle width]. A dominant bucket
    * thus gets its quadratic workload cut into target-sized tasks no matter
    * how skewed the bucket histogram is, while small buckets pay zero
    * replication — a FIXED fanout either under-splits the giant bucket or
    * multiplies the small ones' shuffle volume for nothing. Positive
    * `fanout` forces that constant for every bucket.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        bucketCol: String, n: Int = 2,
                        threshold: Double = 0.05, fanout: Int = 0,
                        targetPairsPerTask: Long = 2000000L): DataFrame = {
    // Grams are hashed to sorted longs: Jaccard over 8-byte values is
    // identical (modulo 2^-64 collisions) but the within-bucket cross
    // product compares longs, not strings, and the fused merge-walk
    // SortedSetJaccard replaces hash-set intersect/union per pair.
    val docs = df.select(col(bucketCol).as("bucket"), col(idCol).as("doc"),
      array_sort(transform(wordNgrams(col(textCol), n), g => xxhash64(g))).as("grams"))
    // The join's WORK is quadratic in bucket size while its INPUT is tiny,
    // so the planner (and AQE, which only sees input bytes) happily runs it
    // on however few partitions the scan produced — one small parquet file
    // = one task doing every pairwise Jaccard. Spread the streamed side
    // across the full shuffle width explicitly: (bucket, salt) keys each
    // hold ~targetPairsPerTask of their bucket's cross product.
    val shufflePartitions =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val fanouts = broadcast(
      bucketFanouts(df, bucketCol, fanout, targetPairsPerTask, shufflePartitions))
    val salted = docs.join(fanouts, Seq("bucket"))
    // salt by HASH of the id, not the id itself: pmod(doc, f) assumes a
    // numeric id — a string id would salt to NULL (legacy) or throw
    // (ANSI), and NULL never equals the exploded 0..f−1 salts, so the
    // pair join would silently return zero rows. The salt only spreads
    // work; the pair set is identical under any assignment.
    val l = salted.select(col("bucket"),
      pmod(xxhash64(col("doc")), col("f")).cast("int").as("salt"),
      col("doc").as("doc_a"), col("grams").as("g_a"))
      .repartition(shufflePartitions, col("bucket"), col("salt"))
    val rgt = salted.select(col("bucket"), col("doc").as("doc_b"), col("grams").as("g_b"),
      explode(sequence(lit(0), col("f") - 1)).as("salt"))
    l.join(rgt, Seq("bucket", "salt"))
      .where(col("doc_a") < col("doc_b") &&
        // exact necessary condition of j ≥ t: min size ≥ t · max size
        least(size(col("g_a")), size(col("g_b"))).cast("double") >=
          lit(threshold) * greatest(size(col("g_a")), size(col("g_b"))))
      .select(col("bucket"), col("doc_a"), col("doc_b"),
        graft.functions.SetExpressions
          .sortedSetJaccard(col("g_a"), col("g_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Near-dup clustering end-to-end: n-gram Jaccard pairs as edges →
    * connected components → every document labeled with its cluster
    * representative and whether it is the keeper.
    *
    * Edge generation here is the EXACT bucket-scoped join — O(bucket²)
    * verification work, right when buckets are small or the threshold is
    * too low for LSH banding (candidate recall at j≈0.05 is ~0, so MinHash
    * cannot feed this operator without changing its semantics). For
    * corpus-wide clustering at a real near-dup threshold use
    * [[minhashClusters]], whose candidate stage is linear in collisions.
    */
  def dedupClusters(df: DataFrame, textCol: String, idCol: String,
                    bucketCol: String, n: Int = 2,
                    threshold: Double = 0.05): DataFrame = {
    val edges = ngramJaccardPairs(df, textCol, idCol, bucketCol, n, threshold)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val nodes = df.select(col(idCol).as("id"))
    connectedComponents(nodes, edges)
      .select(col("id").as(idCol), col("comp").as("cluster_rep"),
        (col("id") === col("comp")).cast("int").as("is_keeper"))
  }
}
