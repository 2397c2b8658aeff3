package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Scale design (the point of each shape):
  *  - exact: group on a 256-bit content hash, not the text — the shuffle
  *    moves 32-byte keys instead of documents.
  *  - MinHash+LSH: candidate generation is an equi-join on (band, bandKey),
  *    never an O(n²) cross product; the cross product only happens WITHIN a
  *    bucket, whose expected size is controlled by the banding parameters.
  *  - SimHash: one 64-bit signature per doc via a typed Aggregator with
  *    partial aggregation (map-side combine), then pigeonhole banding for
  *    Hamming-distance candidate pairs.
  *  - n-gram Jaccard: exact verification, run only on candidate pairs (or
  *    small explicit buckets), never the full corpus square.
  */
object Dedup {

  /** Exact dedup: one row per distinct content, keeping the smallest ID.
    * Grouping key is sha2(text) so the shuffle carries 32-byte keys; the
    * aggregate output is identical to grouping on the full text (modulo
    * 2^-128 collision odds).
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    collapseByContentHash(df, col(textCol), idCol)

  /** The shared keeper/count contract of [[exact]] and [[exactNormalized]]:
    * group on sha2(content), keep the smallest id, count the copies.
    */
  private def collapseByContentHash(df: DataFrame, content: Column,
                                    idCol: String): DataFrame =
    df.groupBy(sha2(content, 256).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Text normalization for near-exact dedup: lowercase, collapse
    * whitespace runs to one space, trim. Catches the re-crawl variants
    * exact hashing misses (case changes, reflowed whitespace) while
    * staying a pure expression — the standard cheap pre-pass before
    * [[exact]], and each step is replayable by a SQL oracle.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** [[exact]] over [[normalizeText]]-ed content: one keeper per distinct
    * NORMALIZED content. Same shuffle discipline — the exchange carries
    * the 32-byte hash of the normalized text, never the text.
    */
  def exactNormalized(df: DataFrame, textCol: String, idCol: String): DataFrame =
    collapseByContentHash(df, normalizeText(col(textCol)), idCol)

  /** Incremental-ingestion dedup: of a new batch, keep one representative
    * per content that does NOT already exist in the corpus. The anti-join
    * runs on 32-byte content hashes (the existing side is pre-distinct so
    * its exchange carries one row per distinct content, not per document),
    * then [[exact]] collapses the survivors — the daily-ingest shape of a
    * 100 TB pipeline, where `existing` is yesterday's hash manifest.
    */
  def incrementalNew(newDocs: DataFrame, existing: DataFrame,
                     textCol: String, idCol: String): DataFrame = {
    val known = existing
      .select(sha2(col(textCol), 256).as("content_hash")).distinct()
    val fresh = newDocs
      .withColumn("content_hash", sha2(col(textCol), 256))
      .join(known, Seq("content_hash"), "left_anti")
    fresh.groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"))
  }

  /** [[incrementalNew]] with a Bloom prefilter on the batch side: the
    * existing corpus is first compressed into a Bloom sketch (one
    * distributed pass, map-side partial sketch merge, ~1.2 MB per million
    * manifest entries), and only batch docs the sketch claims to have seen
    * (true dups + the false-positive fraction) enter the anti-join
    * exchange. Bloom filters have no false negatives, so the result is
    * EXACTLY [[incrementalNew]]'s — the sketch moves shuffle volume, not
    * semantics. On the daily-ingest shape where most of a batch is new,
    * the anti-join's probe exchange shrinks from the whole batch to its
    * duplicate fraction; the rest short-circuits map-side.
    *
    * The built sketch is collected to the driver and embedded as a literal
    * (`BloomFilterMightContain` requires a foldable or scalar-subquery
    * filter argument) — a constant-size collect explicitly bounded by
    * `expectedItems`, the same discipline as the planes/centroids collects
    * in [[Similarity]]. Scan accounting, honestly: `existing` is read
    * twice (the eager linear sketch pass — xxhash64 only, no exchange —
    * plus the distinct manifest feeding the confirm join) and `newDocs`
    * twice (definitely-new bypass + candidate confirm). In the production
    * shape both costs collapse: yesterday's hash manifest is a
    * materialized table, so the sketch pass and the join build side read
    * 8/32-byte hash columns, not the corpus. What the sketch buys is the
    * join's PROBE exchange: only the duplicate-ish fraction of the batch
    * shuffles.
    */
  def incrementalNewBloom(newDocs: DataFrame, existing: DataFrame,
                          textCol: String, idCol: String,
                          expectedItems: Long = 1000000L): DataFrame = {
    import graft.functions.BloomFunctions._
    val known = existing
      .select(sha2(col(textCol), 256).as("content_hash")).distinct()
    // sketch membership is keyed on xxhash64 of the raw text (cheaper than
    // sha2 and probed with the same expression batch-side); Bloom insertion
    // is idempotent, so the pre-distinct stream aggregates straight to one
    // row with no exchange of the manifest at all
    // One eager pass over `existing` (a Spark job at operator-construction
    // time, unlike the lazy siblings — deliberate: the sketch must exist
    // before the probe plan can embed it). An HLL distinct-count rides the
    // same aggregate (map-side sketch merge, still no manifest exchange)
    // so undersizing is detected for free: a sketch sized for 1M holding
    // 50M has a false-positive rate near 1 — still correct (the anti-join
    // confirms every candidate) but pure overhead, so warn.
    val sketchRow = existing
      .agg(bloomFilterAgg(xxhash64(col(textCol)), expectedItems).as("bf"),
        approx_count_distinct(xxhash64(col(textCol))).as("n"))
      .head
    val sketch = sketchRow.getAs[Array[Byte]]("bf")
    val actualItems = sketchRow.getAs[Long]("n")
    if (actualItems > 2 * expectedItems)
      System.err.println(s"[graft] incrementalNewBloom: manifest holds " +
        s"$actualItems distinct hashes but the sketch was sized for " +
        s"$expectedItems — false-positive rate degrades toward 1 and the " +
        s"prefilter becomes overhead; raise expectedItems")
    val stamped = newDocs.withColumn("content_hash", sha2(col(textCol), 256))
    // null sketch = empty corpus: nothing can be a duplicate. NULL text
    // does NOT null the probe — xxhash64(NULL) is the SEED constant, so a
    // null-text row may route down either branch (confirm, if any prior
    // null-text row put the seed hash in the sketch). Both branches are
    // correct for it: its content_hash is NULL, the confirm anti-join's
    // null key never matches `known`, and the final groupBy collapses all
    // null-text rows into one NULL-hash keeper group — exactly
    // [[incrementalNew]]'s behavior. The coalesce is belt-and-braces for
    // a future probe expression that CAN return null, not load-bearing
    // for the null-text path.
    val flagged =
      if (sketch == null) stamped.withColumn("maybe_seen", lit(false))
      else stamped.withColumn("maybe_seen",
        coalesce(mightContain(lit(sketch), xxhash64(col(textCol))), lit(false)))
    val definiteNew = flagged.where(!col("maybe_seen"))
    val confirmedNew = flagged.where(col("maybe_seen"))
      .join(known, Seq("content_hash"), "left_anti")
    definiteNew.unionByName(confirmedNew)
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"))
  }

  /** Chunk-level (paragraph-granularity) exact dedup, C4-style: split each
    * document into fixed `chunkTokens`-token windows, keep each distinct
    * chunk's FIRST corpus-wide occurrence (ordered by (doc, position)),
    * and rebuild every document from its surviving chunks in original
    * order. Boilerplate repeated across millions of pages (headers,
    * footers, license blocks) survives only in the first document that
    * carries it; unique content is untouched. Returns one row per input
    * document: (doc_id, n_chunks, n_kept, clean_text) — documents whose
    * every chunk was seen earlier come back with n_kept = 0 and empty
    * text, which is the downstream drop signal.
    *
    * Shuffle discipline: chunk ownership exchanges the 8-byte xxhash64 of
    * the chunk, never its text, and keeper selection is groupBy-min +
    * join-back — NOT a window over partitionBy(hash): a mega-duplicated
    * chunk is one window partition = one task, while the groupBy
    * partial-aggregates map-side and AQE skew-splits the join. The rebuild
    * groups by doc id carrying only surviving chunks.
    */
  def chunkDedup(df: DataFrame, textCol: String, idCol: String,
                 chunkTokens: Int = 20): DataFrame = {
    // the stripFrequentChunks/chunkDedupWithinDoc guard: 0 would yield
    // zero chunks per doc — silent n_kept=0/clean_text="" for the WHOLE
    // corpus (or DivideByZero under ANSI); negative generates descending
    // phantom sequences
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    val toks = split(col(textCol), " ")
    val nChunks = (floor((size(toks) - 1) / lit(chunkTokens)) + 1).cast("int")
    // NULL text contributes no chunks: size(split(NULL)) is -1, and
    // sequence(0, -1) would generate the DESCENDING array [0, -1] — two
    // phantom NULL chunks competing for ownership corpus-wide
    val chunked = df.where(col(textCol).isNotNull).select(
      col(idCol).as("doc"),
      posexplode(transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(toks, i * chunkTokens + 1, lit(chunkTokens)), " ")))
        .as(Seq("idx", "chunk")))
    val hashed = chunked.withColumn("h", xxhash64(col("chunk")))
    val owners = hashed.groupBy("h")
      .agg(min(struct(col("doc"), col("idx"))).as("owner"))
    val kept = hashed.join(owners, Seq("h"))
      .where(col("doc") === col("owner").getField("doc") &&
        col("idx") === col("owner").getField("idx"))
    val rebuilt = kept.groupBy(col("doc"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("idx"), col("chunk")))),
            x => x.getField("chunk")), " ").as("clean_text"))
    df.select(col(idCol).as("doc"),
        when(col(textCol).isNotNull, nChunks).otherwise(lit(0)).as("n_chunks"))
      .join(rebuilt, Seq("doc"), "left")
      .select(col("doc").as("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** INTRA-document chunk dedup — C4's within-document repetition trim,
    * the complement of the cross-corpus [[chunkDedup]]: a document that
    * repeats its own paragraphs (scraper loops, templated sections,
    * chatbot stutter) keeps each distinct `chunkTokens`-token chunk's
    * FIRST occurrence and drops later copies; content repeated only
    * ACROSS documents is untouched (that is [[chunkDedup]]'s job — run
    * both for the full C4 treatment). Same output contract:
    * (doc_id, n_chunks, n_kept, clean_text).
    *
    * Scale shape — the best possible one: a PURE per-row expression.
    * Because the keep decision never looks outside the document, the
    * whole operator is higher-order functions over the row's own chunk
    * array (keep chunk i iff it is absent from chunks 0..i-1) — NO
    * shuffle, NO join, whole-stage codegen end to end, where the
    * cross-corpus variant must exchange chunk hashes. Per-row cost is
    * O(nChunks²) chunk compares, bounded by document length, never by
    * corpus size.
    */
  def chunkDedupWithinDoc(df: DataFrame, textCol: String, idCol: String,
                          chunkTokens: Int = 20): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    // NULL-safe token source: the expression tree is evaluated per row
    // regardless of the output gates, and sequence(0, -1) over NULL
    // text's size -1 would generate a DESCENDING [0, -1] (chunkDedup's
    // phantom-chunk hazard, avoided the expression-local way here)
    val toks = split(coalesce(col(textCol), lit("")), " ")
    val nChunks = (floor((size(toks) - 1) / lit(chunkTokens)) + 1).cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(toks, i * chunkTokens + 1, lit(chunkTokens)), " "))
    val kept = filter(chunks, (c, i) =>
      not(array_contains(slice(chunks, lit(1), i), c)))
    df.select(col(idCol).as("doc_id"),
      when(col(textCol).isNotNull, nChunks).otherwise(lit(0)).as("n_chunks"),
      when(col(textCol).isNotNull, size(kept).cast("long")).otherwise(lit(0L))
        .as("n_kept"),
      when(col(textCol).isNotNull, array_join(kept, " ")).otherwise(lit(""))
        .as("clean_text"))
  }

  /** Boilerplate removal, CCNet-shaped at paragraph granularity: drop every
    * chunk whose content appears in at least `minDocs` DISTINCT documents —
    * from ALL of them, first occurrence included — and rebuild each
    * document from its surviving chunks. Complements [[chunkDedup]]: chunk
    * dedup keeps exactly one copy of repeated content, while this operator
    * decides content crossing the document-frequency threshold is
    * boilerplate (nav bars, cookie banners, license blocks) and keeps zero
    * copies; content repeated in fewer than `minDocs` documents is
    * untouched in every copy.
    *
    * Scale shape: the frequency pass exchanges (8-byte chunk hash, doc id)
    * pairs with map-side partial aggregation, and the anti-join that marks
    * surviving chunk slots carries (hash, doc, int idx) — chunk TEXT never
    * enters a shuffle, because each document's clean text is re-derived
    * from its own `textCol` and the sorted surviving-slot array in a pure
    * per-row expression after one join by document id. The boilerplate
    * relation is an aggregation output, so AQE sizes the anti-join at
    * runtime (broadcast when the threshold keeps it small — the common
    * case — sans OOM-risking hint when an adversarial corpus makes it
    * wide).
    */
  def stripFrequentChunks(df: DataFrame, textCol: String, idCol: String,
                          chunkTokens: Int = 20, minDocs: Int = 3): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    val toks = split(col(textCol), " ")
    val nChunks = (floor((size(toks) - 1) / lit(chunkTokens)) + 1).cast("int")
    // NULL text contributes no chunks (see chunkDedup's sequence(0, -1) note)
    val slots = df.where(col(textCol).isNotNull).select(
      col(idCol).as("doc"),
      posexplode(transform(sequence(lit(0), nChunks - 1),
        i => xxhash64(array_join(slice(toks, i * chunkTokens + 1,
          lit(chunkTokens)), " "))))
        .as(Seq("idx", "h")))
    val boiler = slots.groupBy("h")
      .agg(countDistinct(col("doc")).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .select("h")
    val keptSlots = slots.join(boiler, Seq("h"), "left_anti")
      .groupBy(col("doc"))
      .agg(sort_array(collect_list(col("idx"))).as("keep_idx"))
    df.select(col(idCol).as("doc"), col(textCol).as("bp_text"),
        when(col(textCol).isNotNull, nChunks).otherwise(lit(0)).as("n_chunks"))
      .join(keptSlots, Seq("doc"), "left")
      .select(col("doc").as("doc_id"), col("n_chunks"),
        coalesce(size(col("keep_idx")), lit(0)).cast("long").as("n_kept"),
        coalesce(
          array_join(transform(col("keep_idx"),
            i => array_join(slice(split(col("bp_text"), " "),
              i * chunkTokens + 1, lit(chunkTokens)), " ")), " "),
          lit("")).as("clean_text"))
  }

  /** Exact-substring dedup, the published standard beyond [[chunkDedup]]'s
    * fixed non-overlapping chunks (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better" — which removes every repeated substring
    * of ≥ 50 tokens via a corpus suffix array): any repeated token run of
    * at least `minTokens` is removed from every occurrence except the first
    * corpus-wide one, at ARBITRARY offsets — the header pasted mid-document
    * that chunk alignment misses. The suffix array is replaced by a
    * shuffle-friendly sliding-window formulation with identical coverage
    * for runs ≥ minTokens:
    *
    *  1. every `minTokens`-token window gets an 8-byte rolling hash
    *     ([[graft.functions.TextExpressions.windowHashesBytes]] — O(doc)
    *     per document, computed in the scan stage, window strings never
    *     materialize);
    *  2. per distinct window hash, the first (doc, offset) occurrence owns
    *     it (groupBy-min + join back, the [[chunkDedup]] ownership
    *     machinery — skew-safe under mega-duplicated boilerplate);
    *  3. a token is removed iff some NON-owned window covers it AND no
    *     OWNED DUPLICATED window covers it: a repeated m ≥ minTokens run
    *     has all m−minTokens+1 of its windows non-owned at later
    *     occurrences, so the union of their spans is the whole run —
    *     while a unique token keeps at least one owned window over every
    *     span containing it only if no window covering it is duplicated,
    *     which is the definition of not being inside a ≥ minTokens
    *     repeat. The owned-duplicated protection exists for
    *     SELF-OVERLAPPING (periodic) repeats: in a document of N
    *     identical tokens every window past offset 0 is a non-owned
    *     duplicate of the owner at offset 0, so coverage alone collapsed
    *     the document to ONE token instead of its first minTokens-sized
    *     occurrence (round-14 known limit). Protecting the spans of
    *     windows this document owns corpus-wide AND that are duplicated
    *     restores the invariant "the first corpus-wide occurrence of
    *     every duplicated run survives intact" — and is a no-op on
    *     non-overlapping repeats, because there a later occurrence's
    *     interior windows are covered only by non-owned windows (the
    *     straddle windows into unique context are unique, hence not
    *     duplicated, hence never protect).
    *
    * Returns one row per input document: (doc_id, n_tokens, n_removed,
    * clean_text), clean_text the surviving tokens in original order.
    * Documents shorter than `minTokens` tokens carry no windows and are
    * kept whole.
    *
    * Shuffle discipline: the ownership exchange carries (8-byte hash, doc,
    * int offset) — never text; duplicate-window starts come back to their
    * document as one sorted int array (bounded by the document's own
    * length); the rebuild is a per-row expression over that array, no
    * second explode.
    */
  def substringDedup(df: DataFrame, textCol: String, idCol: String,
                     minTokens: Int = 20): DataFrame = {
    val wins = df.where(col(textCol).isNotNull).select(col(idCol).as("doc"),
      posexplode(graft.functions.TextExpressions.tokenWindowHashes(
        col(textCol), minTokens)).as(Seq("i", "h")))
    val owners = wins.groupBy("h")
      .agg(min(struct(col("doc"), col("i"))).as("owner"),
        count(lit(1)).as("cnt"))
    val dupStarts = wins.join(owners.select("h", "owner"), Seq("h"))
      .where(col("doc") =!= col("owner").getField("doc") ||
        col("i") =!= col("owner").getField("i"))
      .groupBy(col("doc"))
      .agg(sort_array(collect_list(col("i"))).as("starts"))
    // spans this document owns corpus-wide AND that are duplicated — the
    // periodic-repeat protection (scaladoc step 3). Derived straight from
    // the owner aggregate (no join back): the owner struct already names
    // the one (doc, i) whose span is protected.
    val ownStarts = owners.where(col("cnt") > 1)
      .select(col("owner").getField("doc").as("doc"),
        col("owner").getField("i").as("oi"))
      .groupBy(col("doc"))
      .agg(sort_array(collect_list(col("oi"))).as("own_starts"))
    val toks = split(col(textCol), " ")
    def coveredBy(arr: Column, j: Column) = exists(arr,
      s => s <= j && j < s + lit(minTokens))
    val kept = filter(toks, (_, j) =>
      !coveredBy(col("starts"), j) || coveredBy(col("own_starts"), j))
    df.select(col(idCol).as("doc"), col(textCol))
      .join(dupStarts, Seq("doc"), "left")
      .join(ownStarts, Seq("doc"), "left")
      .withColumn("starts",
        coalesce(col("starts"), array().cast("array<int>")))
      .withColumn("own_starts",
        coalesce(col("own_starts"), array().cast("array<int>")))
      .select(col("doc").as("doc_id"),
        when(col(textCol).isNotNull, size(toks)).otherwise(0).as("n_tokens"),
        when(col(textCol).isNotNull, size(toks) - size(kept))
          .otherwise(0).as("n_removed"),
        when(col(textCol).isNotNull, array_join(kept, " "))
          .otherwise("").as("clean_text"))
  }

  // ---------------------------------------------------------------- MinHash

  /** Deterministic affine hash family over xxhash64 token hashes:
    * h_i(x) = (a_i·x + b_i) mod p. Seeds are fixed constants so signatures
    * are stable across runs and cluster sizes.
    */
  private val MinhashP = 2147483647L // 2^31 - 1: keeps a·h + b < 2^62,
  // overflow-free under ANSI mode (Spark 4 default) without try_multiply
  private def hashParams(k: Int): Seq[(Long, Long)] = {
    val rnd = new java.util.Random(42)
    Seq.fill(k)((math.abs(rnd.nextLong()) % (MinhashP - 1) + 1,
      math.abs(rnd.nextLong()) % MinhashP))
  }

  /** Distinct-token set as sorted xxhash64 longs: downstream set arithmetic
    * (Jaccard intersect/union) runs over 8-byte longs instead of strings —
    * smaller shuffle payloads and branch-free comparisons. Collision odds at
    * 64 bits are negligible for document-sized token sets.
    */
  private def tokenHashes(text: Column): Column =
    array_sort(array_distinct(transform(split(text, " "), t => xxhash64(t))))

  /** MinHash signature (k mins over the distinct-token set) as an
    * expression column — no UDF, no extra shuffle; computed in the scan
    * stage. Token hashes go through xxhash64 (codegen'd), folded into
    * [0, p) before the affine family so products stay in range.
    */
  def minhashSignature(text: Column, k: Int = 32): Column =
    minhashFromHashes(tokenHashes(text), k)

  private def minhashFromHashes(hashes: Column, k: Int): Column = {
    val params = hashParams(k)
    graft.functions.SetExpressions.minhashSignature(hashes,
      params.map(_._1).toArray, params.map(_._2).toArray, MinhashP)
  }

  /** Exact-collapse of identical token sets: (seth = xxhash64 of the sorted
    * distinct token-hash array, doc, rep = min doc of the class). The
    * exchange carries only (8-byte seth, doc id) — token arrays never move.
    * Identical sets have identical Jaccard against EVERYTHING, so every
    * pair-level computation downstream only needs one representative per
    * class; real corpora are heavily exact-duplicated, and collision work
    * in a banded self-join is quadratic in class size, so collapsing first
    * is the single biggest lever on a duplicate-dense 100 TB corpus.
    * Null-token docs are excluded (they must never pair).
    */
  private[ext] def exactClasses(docs: DataFrame): DataFrame = {
    val slim = docs.where(col("toks").isNotNull)
      .select(xxhash64(col("toks")).as("seth"), col("doc"))
    // rep via groupBy + join back, NOT a window over partitionBy(seth): a
    // mega-class (1M copies of one boilerplate page) is a single window
    // partition = a single task, while the groupBy partial-aggregates
    // map-side and AQE skew-splits the join's oversized partition
    slim.join(slim.groupBy("seth").agg(min(col("doc")).as("rep")), Seq("seth"))
  }

  /** Verified near-dup pairs among the given (doc, toks) relation: band
    * the signature, equi-join on (band, bandKey) for candidates, verify
    * with exact Jaccard over the distinct-token sets, keep pairs ≥
    * threshold.
    *
    * Banding: k hashes split into `bands` rows of k/bands; a pair collides
    * if ANY band matches — with k=32, bands=8 (r=4) the candidate recall at
    * j=0.9 is 1-(1-0.9⁴)⁸ ≈ 0.9998. At larger scale tighten r to keep
    * bucket sizes bounded and let AQE handle residual skew.
    *
    * Shuffle discipline (this is what survives a dense near-dup cluster —
    * a C-doc bucket emits O(C²) collisions, so per-collision cost must be
    * bytes, not documents):
    *  1. the banding self-join carries only (doc id, token count) — no
    *     token arrays cross the candidate shuffle;
    *  2. a size prefilter (j ≥ t ⇒ min|A|,|B| ≥ t·max|A|,|B|, an exact
    *     necessary condition) drops impossible pairs before dedup;
    *  3. pair dedup is the FIRST-MATCHING-BAND rule, not a distinct(): each
    *     side carries its (small) band-key array, and a collision at band b
    *     survives only if no band before b also collided — pairs are unique
    *     by construction, so the multi-million-row candidate exchange +
    *     hash aggregate disappears into a map-side filter;
    *  4. only then are the token-hash sets joined back (shuffle keyed on
    *     doc id, proportional to surviving candidates) for one exact
    *     Jaccard evaluation per unique pair.
    */
  /** (doc, ntok, keys): per-doc token count and the `bands` LSH band keys
    * (xxhash64 of each signature slice). The signature lives in its own
    * projection: `sig` is referenced by all `bands` slices, and keeping it
    * separate stops CollapseProject from inlining (and so re-computing) the
    * k-hash signature once per band. Shared by the self-join pair finder
    * and the persisted-manifest incremental path, which must band
    * IDENTICALLY for their buckets to be join-compatible.
    */
  /** TRUE when some band BEFORE this collision row's band also matched —
    * the predicate the first-matching-band pair dedup filters on. With a
    * single band there is no earlier band to match (an empty `reduce`
    * would throw at plan construction, which a bands=1 manifest made
    * reachable from persisted state).
    */
  private def firstMatchingBandViolation(bands: Int, keysA: Column,
                                         keysB: Column): Column =
    if (bands <= 1) lit(false)
    else (0 until bands - 1).map(b =>
      (col("band") > b) && (element_at(keysA, b + 1) === element_at(keysB, b + 1)))
      .reduce(_ || _)

  private def keyedSignatures(docs: DataFrame, k: Int, bands: Int,
                              keepToks: Boolean = false): DataFrame = {
    require(k % bands == 0,
      s"bands ($bands) must divide the signature length ($k) — a remainder " +
        "would silently drop the trailing hashes from every band key")
    val r = k / bands
    // keepToks threads the token set through instead of re-joining `docs`
    // later: a streaming caller may reference its source only once
    val extra = if (keepToks) Seq(col("toks")) else Seq.empty
    val sigs = docs.select(Seq(col("doc"), size(col("toks")).as("ntok"),
      minhashFromHashes(col("toks"), k).as("sig")) ++ extra: _*)
    sigs.select(Seq(col("doc"), col("ntok"),
      array((0 until bands).map(b =>
        xxhash64(slice(col("sig"), b * r + 1, r))): _*).as("keys")) ++ extra: _*)
  }

  private def verifiedPairs(docs: DataFrame, threshold: Double,
                            k: Int, bands: Int): DataFrame = {
    val keyed = keyedSignatures(docs, k, bands)
    val banded = keyed.select(col("doc"), col("ntok"), col("keys"),
      posexplode(col("keys")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    // spread the streamed side over the shuffle width: collision work is
    // quadratic in bucket size while input bytes are tiny, so the planner
    // would otherwise run every bucket's cross product in the scan's one task
    val shufflePartitions =
      docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val left = banded.select(col("band"), col("band_key"),
      col("doc").as("doc_a"), col("ntok").as("n_a"), col("keys").as("keys_a"))
      .repartition(shufflePartitions, col("band"), col("band_key"))
    val right = banded.select(col("band"), col("band_key"),
      col("doc").as("doc_b"), col("ntok").as("n_b"), col("keys").as("keys_b"))
    // first-matching-band test, UNROLLED into element_at comparisons: a
    // lambda form (exists/zip_with) would run the interpreted HOF evaluator
    // once per collision row — tens of millions of allocations in a dense
    // cluster. element_at is codegen'd scalar access.
    val earlierBandMatched =
      firstMatchingBandViolation(bands, col("keys_a"), col("keys_b"))
    val candidates = left.join(right, Seq("band", "band_key"))
      .where(col("doc_a") < col("doc_b") &&
        least(col("n_a"), col("n_b")).cast("double") >=
          lit(threshold) * greatest(col("n_a"), col("n_b")) &&
        !earlierBandMatched)
      .select(col("doc_a"), col("doc_b"))
    candidates
      .join(docs.select(col("doc").as("doc_a"), col("toks").as("toks_a")), Seq("doc_a"))
      .join(docs.select(col("doc").as("doc_b"), col("toks").as("toks_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.SetExpressions
          .sortedSetJaccard(col("toks_a"), col("toks_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Class-level near-dup machinery shared by [[minhashPairs]] and
    * [[minhashClusters]]: returns (members, repPairs) where members is
    * (seth, doc, rep) over every non-null doc and repPairs is the verified
    * (doc_a, doc_b, jaccard) relation over class REPRESENTATIVES only.
    */
  private def classPairs(df: DataFrame, textCol: String, idCol: String,
                         threshold: Double, k: Int,
                         bands: Int): (DataFrame, DataFrame) = {
    val docs = df.select(col(idCol).as("doc"), tokenHashes(col(textCol)).as("toks"))
    val members = exactClasses(docs)
    // token arrays stay map-side: the rep filter is a slim semi-join on the
    // doc id, and only representatives enter the banded pipeline
    val repDocs = docs.join(
      members.where(col("doc") === col("rep")).select(col("doc")),
      Seq("doc"), "left_semi")
    (members, verifiedPairs(repDocs, threshold, k, bands))
  }

  /** MinHash+LSH near-dup pairs over ALL documents: exact-collapse first,
    * banded LSH + exact verify over class representatives, then expand —
    * cross-class pairs inherit the class-pair Jaccard (identical sets ⇒
    * identical Jaccard), within-class pairs are 1.0 by construction. The
    * expansion joins carry only ids and one double.
    *
    * The PAIRS contract is inherently quadratic in duplicate-class size
    * (a 1M-copy class owes 5·10¹¹ within-class rows); the expansion only
    * makes that cost explicit and streamable. Callers who need GROUPS
    * rather than pairs use [[minhashClusters]], which stays linear in
    * members via star edges.
    */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
                   threshold: Double = 0.9, k: Int = 32, bands: Int = 8): DataFrame = {
    val (members, repPairs) = classPairs(df, textCol, idCol, threshold, k, bands)
    val memA = members.select(col("rep").as("doc_a"), col("doc").as("m_a"))
    val memB = members.select(col("rep").as("doc_b"), col("doc").as("m_b"))
    val cross = repPairs
      .join(memA, Seq("doc_a")).join(memB, Seq("doc_b"))
      .select(least(col("m_a"), col("m_b")).as("doc_a"),
        greatest(col("m_a"), col("m_b")).as("doc_b"), col("jaccard"))
    val within = members.select(col("seth"), col("doc").as("doc_a"))
      .join(members.select(col("seth"), col("doc").as("doc_b")), Seq("seth"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), lit(1.0).as("jaccard"))
    cross.union(within)
  }

  // ------------------------------------- persisted MinHash manifest (q84)

  /** Build and persist the LSH near-dup manifest for a corpus: the
    * signature/banding work that [[minhashPairs]] recomputes per run, paid
    * ONCE and amortized over every later ingest batch (the dedup analogue
    * of the persisted IVF index, Similarity.saveIvfIndex). Layout under
    * `path`:
    *  - `docs/`   (doc, toks, ntok, keys): one row per EXACT-CLASS
    *    representative — identical token sets have identical Jaccard
    *    against everything, so non-reps add candidates without adding
    *    information; collapsing at build time shrinks the manifest by the
    *    corpus's duplication factor.
    *  - `bands/`  (band, band_key, doc, ntok, keys): the exploded LSH
    *    buckets, ready to equi-join against a probe batch with no
    *    signature recomputation.
    *  - `meta/`   (k, bands, threshold is NOT pinned — it's a probe-time
    *    choice): banding parameters for APPEND paths (which read it
    *    under the root lease, so it cannot race a rebuild). Probes do
    *    NOT read it — they derive (k, bands) from the stamp columns on
    *    the bands rows they actually scan, so a probe racing a rebuild
    *    that changes the parameters can never band with one generation's
    *    meta against the other's buckets (which would produce silent
    *    zero-candidate verdicts).
    */
  def saveMinhashManifest(df: DataFrame, textCol: String, idCol: String,
                          path: String, k: Int = 32, bands: Int = 8): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    // a rebuild starts a fresh streaming lineage: stale exactly-once
    // markers would silently no-op the new stream's first batches; a
    // stale tombstone table would mask re-ingested content
    graft.ops.Stage.clearLedger(spark, path)
    graft.ops.Stage.clearTombstones(spark, path)
    // BORN VERSIONED via publishRebuild, under the root lease — the
    // saveWinnowManifest protocol. The old in-place overwrite of the
    // RESOLVED live directory tore concurrent probes mid-scan, raced
    // unleased appends, and silently re-pointed any snapshot pin of the
    // live version at the new corpus's data.
    graft.ops.Stage.withWriterLease(spark, path) {
      // meta publishes FIRST, versioned, inside the lease: the old
      // unversioned overwrite AFTER the lease released was a non-atomic
      // directory swap a concurrent meta read could transiently fail on,
      // and it let a leased append read the OLD meta while the NEW data
      // was already live
      graft.ops.Stage.publishRebuild(spark, s"$path/meta")(vd =>
        Seq((k, bands)).toDF("k", "bands")
          .repartition(1).write.mode("overwrite").parquet(vd))
      val keyed = manifestKeyed(df, textCol, idCol, k, bands)
      graft.ops.Stage.publishRebuild(spark, s"$path/docs")(vd =>
        keyed.select(col("doc"), col("toks"), col("ntok"), col("keys"))
          .write.mode("overwrite").parquet(vd))
      graft.ops.Stage.publishRebuild(spark, s"$path/bands")(vd =>
        bandsRows(keyed, k, bands).write.mode("overwrite").parquet(vd))
    }
  }

  /** The ONE bands projection shared by build and both appends — the
    * exploded LSH buckets PLUS the (k, bands) stamp columns probes derive
    * their banding parameters from. Stamping the parameters onto the data
    * itself (two RLE-compressed int constants per row) is what makes a
    * probe self-consistent: it bands its batch with exactly the
    * parameters of the bucket rows it joins, whatever meta/ says at that
    * instant. */
  private def bandsRows(keyed: DataFrame, k: Int, bands: Int): DataFrame =
    keyed.select(col("doc"), col("ntok"), col("keys"),
        posexplode(col("keys")))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
      .withColumn("k", lit(k)).withColumn("bands", lit(bands))

  /** The shared docs/bands pipeline of [[saveMinhashManifest]] (overwrite)
    * and [[appendToMinhashManifest]] (append): tokenize, exact-collapse to
    * class representatives, sign and band. ONE implementation on purpose —
    * build and append must stay join-compatible, and a schema or collapse
    * change applied to only one of them would silently corrupt every probe
    * of a mixed manifest.
    */
  /** The shared tokenize → exact-collapse → sign pipeline — build and
    * append MUST derive from this one implementation so a schema or
    * collapse change cannot silently corrupt a mixed manifest. */
  private def manifestKeyed(df: DataFrame, textCol: String, idCol: String,
                            k: Int, bands: Int): DataFrame = {
    val docs = df.select(col(idCol).as("doc"), tokenHashes(col(textCol)).as("toks"))
    val members = exactClasses(docs)
    val reps = docs.join(
      members.where(col("doc") === col("rep")).select(col("doc")),
      Seq("doc"), "left_semi")
    // keepToks threads the token sets through the signature projection —
    // no join-back shuffle to reattach them for the docs table
    keyedSignatures(reps, k, bands, keepToks = true)
  }

  private def writeManifestTables(df: DataFrame, textCol: String,
                                  idCol: String, path: String, k: Int,
                                  bands: Int, mode: String): Unit = {
    val spark = df.sparkSession
    val keyed = manifestKeyed(df, textCol, idCol, k, bands)
    keyed.select(col("doc"), col("toks"), col("ntok"), col("keys"))
      .write.mode(mode).parquet(graft.ops.Stage.resolve(spark, s"$path/docs"))
    bandsRows(keyed, k, bands)
      .write.mode(mode).parquet(graft.ops.Stage.resolve(spark, s"$path/bands"))
  }

  /** Append a batch to a persisted [[saveMinhashManifest]] manifest
    * WITHOUT rebuilding: signatures/bands are computed for the batch
    * against the manifest's own (k, bands) parameters and appended to
    * `docs/` and `bands/`. The intended ingest loop is
    * [[incrementalNearDups]] → filter survivors → append THEM, so the
    * manifest stays near-dup-free by construction; appending an
    * un-probed batch is allowed but duplicates matching content in the
    * manifest (harmless for probe verdicts — identical token sets band
    * identically — but wasted bytes). The batch is exact-collapsed
    * within itself, like the builder. The dedup analogue of
    * Similarity.appendToIvfIndex.
    */
  def appendToMinhashManifest(newDf: DataFrame, textCol: String,
                              idCol: String, path: String): Unit =
    // root lease, like the exactly-once variant: an unleased append
    // racing a [[snapshotMinhashManifest]] pin could hand the pin a
    // torn (partially committed) file list
    graft.ops.Stage.withWriterLease(newDf.sparkSession, path) {
      val meta = newDf.sparkSession.read.parquet(
        graft.ops.Stage.resolve(newDf.sparkSession, s"$path/meta")).head()
      writeManifestTables(newDf, textCol, idCol, path,
        meta.getAs[Int]("k"), meta.getAs[Int]("bands"), "append")
    }

  /** [[appendToMinhashManifest]] with EXACTLY-ONCE semantics for
    * streaming ingest, via the shared ledger protocol
    * ([[graft.ops.Stage.appendExactlyOnce]]): the batch's docs/bands rows
    * are staged against the manifest's own (k, bands) parameters, then
    * published under deterministic `b<batchId>-*` names. A replayed plain
    * append would not change probe VERDICTS (identical token sets band
    * identically), but it doubles the replayed batch's bytes in both
    * tables and its rows in every later candidate join — this keeps a
    * crash-looping ingest from quietly bloating the manifest. Batch ids
    * are only meaningful relative to one durable checkpoint lineage.
    */
  def appendToMinhashManifestExactlyOnce(newDf: DataFrame, textCol: String,
                                         idCol: String, path: String,
                                         batchId: Long): Unit = {
    val spark = newDf.sparkSession
    // replay no-op BEFORE the meta head() job (appendExactlyOnce
    // rechecks — this is the cheap fast exit)
    if (graft.ops.Stage.alreadyPublished(spark, path, batchId)) return
    val meta = spark.read.parquet(
      graft.ops.Stage.resolve(spark, s"$path/meta")).head()
    graft.ops.Stage.appendExactlyOnce(spark, path, batchId,
      Seq("docs", "bands")) { staging =>
      writeManifestTables(newDf, textCol, idCol, staging,
        meta.getAs[Int]("k"), meta.getAs[Int]("bands"), "overwrite")
    }
  }

  /** Delete CONTENT from a persisted manifest — keyed by the documents'
    * distinct-token sets, NOT their ids, and deliberately so: the docs
    * table stores exact-collapse REPRESENTATIVES, so an id-keyed delete
    * would silently forget content that other collapsed-away documents
    * still carry. Content-keyed semantics match what manifest deletion
    * means operationally: this content must no longer be recognized as
    * "known" (new arrivals of it probe as fresh). Every manifest entry
    * whose token set equals a deleted document's token set is dropped
    * from both tables via anti-join + atomic publish
    * ([[graft.ops.Stage.publishRewrite]]; bands first — its removed-id
    * relation derives from the still-live docs table). Probing afterwards
    * equals probing a manifest built without that content (the q108
    * oracle pins it).
    */
  def deleteContentFromMinhashManifest(deleted: DataFrame, textCol: String,
                                       path: String): Unit = {
    val spark = deleted.sparkSession
    graft.ops.Stage.withWriterLease(spark, path) {
    // like every compacting rewrite: a crashed batch's uncommitted
    // b<id>-* files must not fold (the replay would double them)
    graft.ops.Stage.sweepUncommitted(spark, path, Seq("docs", "bands"))
    val delKeys = deleted.where(col(textCol).isNotNull)
      .select(xxhash64(tokenHashes(col(textCol))).as("seth")).distinct()
    import graft.ops.Stage.{publishRewrite, resolve}
    val live = spark.read.parquet(resolve(spark, s"$path/docs"))
      .withColumn("seth", xxhash64(col("toks")))
    val removed = live.join(delKeys, Seq("seth")).select("doc")
    publishRewrite(spark, s"$path/bands",
      spark.read.parquet(resolve(spark, s"$path/bands"))
        .join(removed, Seq("doc"), "left_anti"))
    publishRewrite(spark, s"$path/docs",
      live.join(delKeys, Seq("seth"), "left_anti").drop("seth"))
    }
  }

  /** TOMBSTONE content in a persisted manifest — the batched alternative
    * to [[deleteContentFromMinhashManifest]], whose anti-join rewrite
    * pays manifest-sized work PER CALL: under a drip-feed of daily
    * right-to-be-forgotten requests that is index-sized work every day.
    * This instead appends the deleted content's token-set keys to a
    * `tombstones/` table (batch-sized work), probes consult the pending
    * tombstones (the docs relation is anti-joined on the same key before
    * verification, so tombstoned content probes as fresh — candidates
    * from its still-present bands rows die in the verification join), and
    * [[compactMinhashManifest]] folds the tombstones into a physical
    * delete on the compaction schedule. Verdict-equivalent to the
    * immediate delete at every point (DedupSpec pins it).
    *
    * Contract note: a tombstone masks its content until folded —
    * deliberately including copies APPENDED while it is pending
    * ("forget this content" beats "but it arrived again"); re-admitting
    * content requires compacting first, then appending it.
    */
  def tombstoneContentInMinhashManifest(deleted: DataFrame, textCol: String,
                                        path: String): Unit =
    graft.ops.Stage.appendTombstones(
      deleted.where(col(textCol).isNotNull)
        .select(xxhash64(tokenHashes(col(textCol))).as("seth")), path)

  /** `docs` minus rows whose token-set key is tombstoned (identity when
    * no tombstones exist). The anti-join's right side is the (small)
    * pending-delete set — Spark broadcasts it (PlanAuditSpec pins it).
    * Callers load [[graft.ops.Stage.pendingTombstones]] once per query. */
  private def minusTombstoned(docs: DataFrame,
                              tomb: Option[DataFrame]): DataFrame =
    tomb match {
      case Some(t) => docs.withColumn("seth", xxhash64(col("toks")))
        .join(t, Seq("seth"), "left_anti").drop("seth")
      case None => docs
    }

  /** Compact a [[saveMinhashManifest]] manifest after a run of per-batch
    * appends: every ingest batch leaves its own `b<batchId>-*` (or plain
    * part) files in `docs/` and `bands/`, so after thousands of batches a
    * probe pays file-listing and tiny-row-group overhead proportional to
    * batch count. One manifest-sized rewrite per table coalesces to
    * [[graft.ops.Stage.compactionPartitions]] files (live bytes /
    * `maxPartitionBytes`); bands repartitions on its join key
    * (band, band_key) so each bucket's rows co-locate in one file's row
    * groups. Pending [[tombstoneContentInMinhashManifest]] tombstones are
    * FOLDED by the same pass — matching docs and their bands rows drop,
    * then the tombstone table resets — so the drip-feed of deletes pays
    * index-sized work once per compaction, not once per delete. Probe
    * verdicts are unchanged at every point (DedupSpec pins it; bands
    * rewrites first, like the immediate delete, so its removed-id
    * relation derives from the still-live docs table). Publishes
    * atomically ([[graft.ops.Stage.publishRewrite]]): a crash
    * mid-compaction leaves a fragmented-but-correct manifest serving —
    * tombstones stay pending until the final reset, so a crash between
    * the table rewrites and the reset only re-folds an already-clean
    * manifest next time.
    */
  def compactMinhashManifest(spark: org.apache.spark.sql.SparkSession,
                             path: String): Unit =
      graft.ops.Stage.withWriterLease(spark, path) {
    import graft.ops.Stage.{compactionPartitions, publishRewrite, resolve}
    // crashed-mid-publish batch leavings must not fold (see
    // Stage.sweepUncommitted — the replay would double them)
    graft.ops.Stage.sweepUncommitted(spark, path, Seq("docs", "bands"))
    val snap = graft.ops.Stage.tombstoneSnapshot(spark, path)
    val tomb = snap.map(_._1)
    val removed = tomb match {
      case Some(t) => spark.read.parquet(resolve(spark, s"$path/docs"))
        .withColumn("seth", xxhash64(col("toks")))
        .join(t, Seq("seth")).select("doc")
      // the empty relation derives from the manifest's OWN doc column —
      // spark.range(0)'s LONG would coerce a string-id manifest's
      // anti-join key (ANSI runtime cast error on a routine compaction)
      case None => spark.read.parquet(resolve(spark, s"$path/docs"))
        .select("doc").limit(0)
    }
    val nBands = compactionPartitions(spark, s"$path/bands")
    publishRewrite(spark, s"$path/bands",
      spark.read.parquet(resolve(spark, s"$path/bands"))
        .join(removed, Seq("doc"), "left_anti")
        .repartition(nBands, col("band"), col("band_key")))
    val nDocs = compactionPartitions(spark, s"$path/docs")
    publishRewrite(spark, s"$path/docs",
      minusTombstoned(spark.read.parquet(resolve(spark, s"$path/docs")),
        tomb).repartition(nDocs))
    graft.ops.Stage.resetTombstones(spark, path,
      snap.map(_._2).getOrElse(Nil))
    graft.ops.Stage.compactLedger(spark, path)
  }

  /** [[compactMinhashManifest]] when either table has fragmented past
    * `maxFilesPerComponent` live files ([[graft.ops.Stage.shouldCompact]]);
    * otherwise a metadata-only listing. The self-maintenance hook for
    * streaming ingest sinks. Returns whether a compaction ran. */
  def autoCompactMinhashManifest(spark: org.apache.spark.sql.SparkSession,
                                 path: String,
                                 maxFilesPerComponent: Int = 64): Boolean = {
    val go = graft.ops.Stage.shouldCompact(spark, path, Seq("docs", "bands"),
      maxFilesPerComponent)
    if (go) compactMinhashManifest(spark, path)
    go
  }

  /** Incremental NEAR-dup detection of an ingest batch against a persisted
    * [[saveMinhashManifest]] manifest: per new document, the maximum exact
    * Jaccard against any manifest document among LSH candidates (null when
    * none reaches `threshold`) and the keep/flag verdict — the near-dup
    * generalization of [[incrementalNew]]'s exact-hash anti-join.
    *
    * Scale shape: the manifest is NOT recomputed — its banded buckets load
    * straight into the candidate equi-join, so per-batch cost is
    * signatures over the batch plus a join whose left side is batch-sized.
    * The batch is exact-collapsed first (only class representatives enter
    * the join; verdicts fan back out over ids). Candidate dedup is the
    * same first-matching-band rule as [[minhashPairs]] — no distinct()
    * exchange — and the verification join touches token sets only for
    * surviving candidates. New-vs-new duplication is deliberately out of
    * scope (that is the batch-level [[minhashPairs]]/[[minhashClusters]]
    * pass); this operator answers "is it already in the corpus".
    */
  def incrementalNearDups(newDf: DataFrame, manifestPath: String,
                          textCol: String, idCol: String,
                          threshold: Double = 0.9): DataFrame =
    incrementalNearDupsImpl(newDf, manifestPath, textCol, idCol, threshold,
      previous = false)

  /** [[incrementalNearDups]] against the PREVIOUS manifest snapshot — the
    * state a content delete or compaction superseded, kept one publish
    * cycle by the versioned publish ([[graft.ops.Stage.resolvePrevious]];
    * the text index's `bm25TopKIndexedPrevious` and the IVF's
    * `topKIvfIndexedPrevious` are the same read in their families). The
    * validation use: diff a forget operation's verdict changes before
    * trusting it. Meta (k, bands) is frozen at build, so only docs/bands
    * resolve to their prior versions; pending tombstones still mask the
    * snapshot (right-to-be-forgotten holds for validation reads).
    */
  def incrementalNearDupsPrevious(newDf: DataFrame, manifestPath: String,
                                  textCol: String, idCol: String,
                                  threshold: Double = 0.9): DataFrame =
    incrementalNearDupsImpl(newDf, manifestPath, textCol, idCol, threshold,
      previous = true)

  /** Maintenance DIFF of the manifest's two probeable states: PREVIOUS
    * (the snapshot the last forget/compaction superseded) vs LIVE, one
    * row per probe document with both verdicts and a status —
    * `forgotten` (was a near-dup, no longer: its match was deleted),
    * `appeared` (the reverse — an append's effect), `rematched` (still
    * a near-dup but the best-match Jaccard changed: the TOP match was
    * forgotten, a weaker one remains), `held`. The per-document report
    * an operator reads before trusting a right-to-be-forgotten batch:
    * exactly the documents whose verdicts the op changed, with the
    * evidence. Cost: two probes plus a join of two batch-sized verdict
    * relations. q130 pins every verdict, Jaccard, and label against a
    * DuckDB replay of both manifest states.
    */
  def incrementalNearDupsDiff(newDf: DataFrame, manifestPath: String,
                              textCol: String, idCol: String,
                              threshold: Double = 0.9): DataFrame = {
    val before = incrementalNearDupsPrevious(newDf, manifestPath, textCol,
        idCol, threshold)
      .select(col(idCol), col("near_jaccard").as("jaccard_before"),
        col("is_near_dup").as("dup_before"))
    val after = incrementalNearDups(newDf, manifestPath, textCol, idCol,
        threshold)
      .select(col(idCol), col("near_jaccard").as("jaccard_after"),
        col("is_near_dup").as("dup_after"))
    // both relations emit one row per newDf document (left-join +
    // zero-fill contract), so the inner join is total
    before.join(after, Seq(idCol))
      .withColumn("status",
        when(col("dup_before") && !col("dup_after"), lit("forgotten"))
          .when(!col("dup_before") && col("dup_after"), lit("appeared"))
          .when(col("dup_before") && col("dup_after") &&
            col("jaccard_before") =!= col("jaccard_after"), lit("rematched"))
          .otherwise(lit("held")))
      .orderBy(idCol)
  }

  /** Pin the manifest's current (docs, bands) versions under a NAMED
    * snapshot — retention beyond the one-cycle previous window
    * ([[graft.ops.Stage.snapshot]] per component, one shared name; the
    * text index's `snapshotTextIndex` is the same pin there). Meta is
    * frozen at build. Requires versioned components — any maintenance
    * op (compaction, content delete) migrates a fresh manifest. */
  def snapshotMinhashManifest(spark: org.apache.spark.sql.SparkSession,
                              path: String, name: String): Unit =
    // root lease: both pins must capture ONE maintenance state (see
    // Search.snapshotTextIndex — a concurrent forget landing between
    // them would freeze a mixed docs/bands pair)
    graft.ops.Stage.withWriterLease(spark, path) {
      // a crashed batch's doomed partials must not be pinned (the pin
      // records file lists; a later sweep would dangle them)
      graft.ops.Stage.sweepUncommitted(spark, path, Seq("docs", "bands"))
      Seq("docs", "bands").foreach(c =>
        graft.ops.Stage.snapshot(spark, s"$path/$c", name))
    }

  /** ROLL the live manifest BACK to a [[snapshotMinhashManifest]] pin
    * ([[graft.ops.Stage.restoreSnapshot]] per component, under the root
    * lease so docs and bands flip as ONE maintenance state) — the undo
    * for a forget/ingest campaign [[incrementalNearDupsDiff]] flagged
    * as wrong. Both components are checked for the pin BEFORE either is
    * restored (a typo'd name must not leave a mixed docs/bands pair).
    * The pin survives; see [[Search.restoreTextIndex]] for the shared
    * tombstone/ledger contract — in particular, a content-forget whose
    * tombstone was already compacted away is resurrected by restoring a
    * pre-forget pin and must be re-issued if it is to hold. */
  def restoreMinhashManifest(spark: org.apache.spark.sql.SparkSession,
                             path: String, name: String): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      val comps = Seq("docs", "bands")
      val missing = comps.filter(c =>
        graft.ops.Stage.resolveSnapshot(spark, s"$path/$c", name).isEmpty)
      require(missing.isEmpty,
        s"snapshot '$name' does not pin component(s) " +
          s"${missing.mkString(", ")} of $path — nothing restored")
      comps.foreach(c =>
        graft.ops.Stage.restoreSnapshot(spark, s"$path/$c", name))
    }

  /** Release a [[snapshotMinhashManifest]] pin; the pinned versions
    * become ordinary GC candidates at the next publish — or immediately
    * via [[vacuumMinhashManifest]]. */
  def dropMinhashManifestSnapshot(spark: org.apache.spark.sql.SparkSession,
                                  path: String, name: String): Unit =
    Seq("docs", "bands").foreach(c =>
      graft.ops.Stage.dropSnapshot(spark, s"$path/$c", name))

  /** Reclaim the manifest's stale versions now
    * ([[graft.ops.Stage.vacuum]] per component) — the storage release
    * after dropping a pin, without waiting for the next publish. */
  def vacuumMinhashManifest(spark: org.apache.spark.sql.SparkSession,
                            path: String): Unit =
    Seq("docs", "bands").foreach(c =>
      graft.ops.Stage.vacuum(spark, s"$path/$c"))

  /** [[incrementalNearDups]] probed against a NAMED manifest snapshot —
    * identical verdict contract over the pinned (docs, bands) pair, any
    * number of maintenance ops later. Pending tombstones still mask it;
    * fails loudly on an unknown name. */
  def incrementalNearDupsSnapshot(newDf: DataFrame, manifestPath: String,
                                  name: String, textCol: String,
                                  idCol: String,
                                  threshold: Double = 0.9): DataFrame =
    incrementalNearDupsImpl(newDf, manifestPath, textCol, idCol, threshold,
      previous = false, snapshotName = Some(name))

  private def incrementalNearDupsImpl(newDf: DataFrame, manifestPath: String,
                                      textCol: String, idCol: String,
                                      threshold: Double,
                                      previous: Boolean,
                                      snapshotName: Option[String] = None)
      : DataFrame = {
    val docs = newDf.select(col(idCol).as("doc"), tokenHashes(col(textCol)).as("toks"))
    val members = exactClasses(docs) // null-text docs excluded: never match
    val repDocs = docs.join(
      members.where(col("doc") === col("rep")).select(col("doc")),
      Seq("doc"), "left_semi")
    val verdicts = manifestMatchRows(repDocs, manifestPath, threshold,
        previous = previous, snapshotName = snapshotName)
      .groupBy("doc_n").agg(max(col("jaccard")).as("near_jaccard"))
    // rep verdicts fan out over exact-class members; docs outside `members`
    // (null text) and unmatched reps flag false with a null jaccard
    val flags = members.select(col("doc"), col("rep"))
      .join(verdicts.withColumnRenamed("doc_n", "rep"), Seq("rep"))
      .select(col("doc"), col("near_jaccard"))
    newDf.select(col(idCol).as("doc"))
      .join(flags, Seq("doc"), "left")
      .select(col("doc").as(idCol), col("near_jaccard"),
        col("near_jaccard").isNotNull.as("is_near_dup"))
  }

  /** Verified (doc_n, jaccard) match rows of a probe relation against a
    * persisted manifest — one row per (probe doc, matching manifest doc)
    * pair at `jaccard ≥ threshold`. The shared core of the batch
    * [[incrementalNearDups]] (which exact-collapses, then aggregates to a
    * per-doc verdict) and the STREAMING probe (which cannot pre-aggregate
    * in append mode and instead deduplicates emissions under a watermark).
    * `probe` is (doc, toks) with toks from [[tokenHashes]].
    *
    * `carryTokens` picks who pays for verification's token sets:
    *  - `false` (batch): the candidate exchange carries ids and band keys
    *    only, and token sets join back in afterwards, proportional to
    *    surviving candidates — the cheap shape, but the join-back
    *    references `probe` a second time, which a streaming source cannot
    *    do (it would become a stream-stream self-join).
    *  - `true` (streaming): the probe's token set rides through the
    *    banding explode and candidate join — `bands`× duplication of one
    *    document's token hashes, the price of keeping every stream-side
    *    step a stateless projection or stream-static equi-join.
    */
  private[graft] def manifestMatchRows(probe: DataFrame, manifestPath: String,
                                       threshold: Double,
                                       carryTokens: Boolean = false,
                                       previous: Boolean = false,
                                       snapshotName: Option[String] = None)
      : DataFrame = {
    val spark = probe.sparkSession
    // tombstones BEFORE the data resolves (the linearizable ordering —
    // see Stage.tombstoneSnapshot)
    val tomb = graft.ops.Stage.pendingTombstones(spark, manifestPath)
    // named snapshots read their pinned FILE LISTS, not directories —
    // appends publish into the live version dir (see Stage.snapshot)
    def data(c: String): DataFrame = snapshotName match {
      case Some(name) => graft.ops.Stage
        .readSnapshot(spark, s"$manifestPath/$c", name)
        .getOrElse(throw new IllegalStateException(
          s"$manifestPath/$c has no snapshot named '$name' — pin one " +
            "with snapshotMinhashManifest before probing it"))
      case None if previous => spark.read.parquet(graft.ops.Stage
        .resolvePrevious(spark, s"$manifestPath/$c")
        .getOrElse(throw new IllegalStateException(
          s"$manifestPath/$c has no previous snapshot to probe — " +
            "previous-probing needs at least two publishes")))
      case None => spark.read.parquet(
        graft.ops.Stage.resolve(spark, s"$manifestPath/$c"))
    }
    val manBands = data("bands")
    // banding parameters come from the stamp on the bands rows the probe
    // ACTUALLY READS — never from meta/, whose read could race a rebuild
    // that changes (k, bands): banding the batch with one generation's
    // parameters against the other generation's buckets shares no keys
    // and returns a silent all-fresh verdict. The stamp also makes
    // SNAPSHOT probes self-consistent (pins cover data, not meta). An
    // EMPTY manifest has no stamp row and falls back to meta — any
    // parameters probe an empty bucket relation identically.
    val (k, bands) = manBands.select(col("k"), col("bands"))
      .limit(1).collect().headOption
      .map(r => (r.getInt(0), r.getInt(1)))
      .getOrElse {
        val meta = spark.read.parquet(
          graft.ops.Stage.resolve(spark, s"$manifestPath/meta")).head()
        (meta.getAs[Int]("k"), meta.getAs[Int]("bands"))
      }
    // pending tombstones mask their content here: a tombstoned doc's bands
    // rows may still generate candidates, but those die in the
    // verification join against the filtered docs relation
    val manDocs = minusTombstoned(data("docs"), tomb)
    val keyed = keyedSignatures(probe, k, bands, keepToks = carryTokens)
    val carryIn = if (carryTokens) Seq(col("toks").as("toks_n")) else Seq.empty
    val carryOn = if (carryTokens) Seq(col("toks_n")) else Seq.empty
    val newBands = keyed
      .select(Seq(col("doc"), col("ntok"), col("keys"),
        posexplode(col("keys"))) ++ carryIn: _*)
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      .select(Seq(col("band"), col("band_key"), col("doc").as("doc_n"),
        col("ntok").as("n_n"), col("keys").as("keys_n")) ++ carryOn: _*)
    val right = manBands.select(col("band"), col("band_key"),
      col("doc").as("doc_m"), col("ntok").as("n_m"), col("keys").as("keys_m"))
    // first-matching-band, unrolled (see verifiedPairs for why not a HOF)
    val earlierBandMatched =
      firstMatchingBandViolation(bands, col("keys_n"), col("keys_m"))
    val candidates = newBands.join(right, Seq("band", "band_key"))
      .where(least(col("n_n"), col("n_m")).cast("double") >=
        lit(threshold) * greatest(col("n_n"), col("n_m")) &&
        !earlierBandMatched)
      .select(Seq(col("doc_n"), col("doc_m")) ++ carryOn: _*)
    val paired =
      if (carryTokens) candidates
      else candidates.join(
        probe.select(col("doc").as("doc_n"), col("toks").as("toks_n")),
        Seq("doc_n"))
    paired
      .join(manDocs.select(col("doc").as("doc_m"), col("toks").as("toks_m")),
        Seq("doc_m"))
      .select(col("doc_n"), graft.functions.SetExpressions
        .sortedSetJaccard(col("toks_n"), col("toks_m")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** (doc, toks) probe relation for [[manifestMatchRows]] — public face of
    * the token-set projection so streaming callers band identically.
    */
  private[graft] def tokenSetRelation(df: DataFrame, textCol: String,
                                      idCol: String): DataFrame =
    df.select(col(idCol).as("doc"), tokenHashes(col(textCol)).as("toks"))

  // ------------------------------------------------------------- clustering

  /** Connected components by the alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond"): each round rewires edges toward the smallest node seen in a
    * neighborhood, converging to one star per component rooted at the
    * component's minimum id in O(log²) rounds — versus O(diameter) for
    * plain min-label propagation, the difference between a handful and
    * hundreds of rounds on the chain-shaped clusters near-dup graphs grow
    * at 100 TB. The driver loop iterates over ROUNDS only; every round is
    * two distributed groupBy+join passes over the (shrinking) edge set.
    *
    *  - large-star: for each node u, connect every LARGER neighbor to
    *    m = min(Γ(u) ∪ {u}) — high-degree nodes fan their neighborhoods
    *    out to their local minimum (skew-safe: the groupBy key is the
    *    node, the per-key state one long).
    *  - small-star: each node and its smaller neighbors all re-point at
    *    the smallest of them.
    *
    * Edges stay oriented (larger → smaller) throughout; convergence is one
    * (count, decimal-sum-of-edge-hashes) aggregate per round compared to
    * the previous round's — no driver-side edge diff. Every round ends in
    * an EAGER checkpoint: each iteration stacks two join+agg+distinct
    * layers on the plan, so without per-round lineage truncation Catalyst
    * re-analyzes a tree that grows ~4× per round and the DRIVER (not the
    * cluster) becomes the bottleneck — checkpointing is what keeps round
    * cost flat in the round number. WHICH checkpoint follows the session:
    * when `sparkContext.setCheckpointDir` points at durable storage the
    * loop uses reliable `checkpoint()` (an executor lost mid-run recovers
    * from the checkpoint files — the cluster-production mode); otherwise it
    * falls back to `localCheckpoint()` (blocks on executor local storage,
    * faster, lost blocks are NOT recomputable — the local-mode default).
    * Same plan shape either way.
    *
    * Returns (id, comp) for EVERY node in `nodes`; comp is the cluster's
    * minimum id, so `id === comp` selects one canonical representative per
    * cluster (singletons keep themselves) — the "keep one doc per
    * duplicate cluster" step of a dedup pipeline.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 25): DataFrame = {
    // orient (larger → smaller), drop self-loops, dedup once up front;
    // eager checkpoint so the (possibly expensive) edge-generation plan is
    // computed exactly once and the loop starts from a flat lineage
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = if (debug) {
      System.err.println(f"[cc] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
    }
    // set certificate: (edge count, Σ xxhash64(u,v) as decimal — overflow-
    // free at any edge count). Equal certificates ⇒ the round was a no-op
    // ⇒ stars formed (the star state is the contraction's unique fixpoint).
    // The certificate rides the checkpoint's own materialization job as
    // observe() metrics — no separate per-round aggregate job; the
    // standalone aggregate stays as a fallback if metrics don't surface.
    def certExprs = Seq(count(lit(1)).as("cc_n"),
      sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")).as("cc_s"))
    // `localCheckpoint()` is eager, so by the time it returns the observe()
    // metrics of its materialization job are either set or they will never
    // be; `getRowOrEmpty` does one BOUNDED (~100 ms) wait on this thread —
    // no helper thread to park, nothing leaked when metrics don't surface.
    // If they don't, fall back to a standalone aggregate for this round and
    // skip the Observation path for the rest of the process (detect-once).
    // reliable checkpoint when the session has a durable checkpoint dir,
    // localCheckpoint otherwise (both eager — see the scaladoc)
    def ckpt(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()
    def checkpointWithCert(df: DataFrame): (DataFrame, String) = {
      def aggCert(out: DataFrame): String =
        out.agg(certExprs.head, certExprs.tail: _*).head().mkString("|")
      if (Dedup.observeMetricsBroken) {
        val out = ckpt(df)
        (out, aggCert(out))
      } else {
        val obs = org.apache.spark.sql.Observation()
        val out = ckpt(df.observe(obs, certExprs.head, certExprs.tail: _*))
        // bounded wait on THIS thread (Observation.future is the only
        // public non-blocking-forever accessor); on timeout nothing is
        // parked or abandoned — we just stop asking
        scala.util.Try(scala.concurrent.Await.result(
          obs.future, scala.concurrent.duration.Duration(2, "s"))) match {
          case scala.util.Success(row) => (out, row.mkString("|"))
          case scala.util.Failure(_) =>
            Dedup.observeMetricsBroken = true
            (out, aggCert(out))
        }
      }
    }
    var (e, prev) = checkpointWithCert(edges
      .select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct())
    lap("edges+checkpoint+cert0")
    var converged = false
    var it = 0
    // Both star steps need min-over-neighborhood alongside every edge row.
    // That min comes from a groupBy + join back, NOT a window over
    // partitionBy(u): near-dup graphs GUARANTEE hub nodes (a component
    // root accumulates its whole cluster as neighbors), and a hub's window
    // partition is one task doing the whole cluster, while the groupBy
    // partial-aggregates map-side (one row per key per map task) and the
    // join's oversized hub partition is AQE-skew-splittable. One more
    // exchange per star, but the exchange that skew can't kill.
    while (!converged && it < maxIter) {
      // large-star: m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u.
      // No dedup here — duplicate (v, m) rows pass through to the single
      // distinct below; one fewer exchange beats early dedup at any scale
      // where duplicates are a minority (they are: one per shared-min pair).
      val bidir = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val lsMins = bidir.groupBy("u").agg(min(col("v")).as("mn"))
      val ls = bidir.join(lsMins, Seq("u"))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), least(col("u"), col("mn")).as("v"))
      // small-star: m = min of u's (all smaller) neighbors; u and every
      // neighbor except m re-point at m
      val ssMins = ls.groupBy("u").agg(min(col("v")).as("mn"))
      val withMin = ls.join(ssMins, Seq("u"))
      val ssRaw = withMin.where(col("v") =!= col("mn"))
        .select(col("v").as("u"), col("mn").as("v"))
        .union(withMin.select(col("u"), col("mn").as("v")))
        .distinct()
      // EAGER checkpoint: materializes this round AND truncates lineage;
      // the convergence certificate rides the same job via observe()
      val (ss, cert) = checkpointWithCert(ssRaw)
      converged = cert == prev
      prev = cert
      e.unpersist()
      e = ss
      it += 1
      lap(s"round $it (converged=$converged)")
    }
    // stars point member → root; roots and isolated nodes label themselves
    val members0 = e.select(col("u").as("id"), col("v").as("comp"))
    // If maxIter ended the loop before the certificate stabilized, the edge
    // relation is a PARTIAL contraction, not yet a star forest: a node can
    // still carry several outgoing edges, and a bare left join would emit
    // duplicate (id, comp) rows. Collapse to min-label per node — exactly
    // one row per node, every label a smaller node of the SAME component
    // (contraction never crosses components) — and say so: labels may not
    // be fully collapsed to the component minimum, so `id === comp` keeper
    // selection can over-select until maxIter is raised.
    val members =
      if (converged) members0
      else {
        System.err.println(s"[cc] WARNING: no convergence after $maxIter " +
          "rounds; emitting min-label partial contraction (one row per " +
          "node, labels component-consistent but possibly non-minimal)")
        members0.groupBy("id").agg(min(col("comp")).as("comp"))
      }
    nodes.select(col("id"))
      .join(members, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** Set once when observe() metrics fail to surface after an eager
    * checkpoint's materialization job — later [[connectedComponents]]
    * rounds then go straight to the standalone certificate aggregate
    * instead of re-probing (and re-waiting) every round.
    */
  @volatile private var observeMetricsBroken: Boolean = false

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

  /** Corpus-wide near-dup clustering at scale: [[minhashPairs]] candidates
    * (banded equi-join, never a bucket cross product) verified by exact
    * token-set Jaccard ≥ threshold feed [[connectedComponents]]. The edge
    * relation is exactly "all pairs with Jaccard ≥ threshold" as long as
    * the banding recall at the threshold is 1 − ε with ε ≈ 0: the default
    * k=32, r=2, b=16 puts pair-miss odds at (1−j²)¹⁶ ≈ 3·10⁻¹² for
    * j = 0.9 (measured: 0 of 964 854 true pairs missed at sf0.1), so the
    * output is oracle-checkable against an exact-pair reachability
    * closure. This is the 100 TB shape: candidate work scales with true
    * collisions, not with bucket sizes.
    */
  def minhashClusters(df: DataFrame, textCol: String, idCol: String,
                      threshold: Double = 0.9, bands: Int = 16): DataFrame = {
    // CC runs on the CLASS graph, not the doc graph: rep-level near-dup
    // edges plus one member→rep star edge per duplicate doc. Reachability
    // is identical (members connect through their rep; a doc-level edge
    // has the same Jaccard as its class-level edge) but the edge relation
    // shrinks from Σ|A|·|B| expanded pairs to one row per class pair.
    val (members, repPairs) = classPairs(df, textCol, idCol, threshold,
      k = 32, bands = bands)
    val edges = repPairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(members.where(col("doc") =!= col("rep"))
        .select(col("doc").as("src"), col("rep").as("dst")))
    val nodes = df.select(col(idCol).as("id"))
    connectedComponents(nodes, edges)
      .select(col("id").as(idCol), col("comp").as("cluster_rep"),
        (col("id") === col("comp")).cast("int").as("is_keeper"))
  }

  /** [[minhashClusters]] with QUALITY-RANKED keeper selection: instead of
    * keeping each near-dup cluster's smallest id (an arbitrary choice),
    * keep its best document under `score` (ties broken toward the
    * smallest id, so the output is a pure function of the data). This is
    * the keep-best policy production dedup runs use — when a page exists
    * as both a boilerplate-riddled scrape and a clean mirror, the cluster
    * should surface the clean one.
    *
    * Output: one row per input document — (idCol, cluster_rep, keeper_id,
    * is_keeper). `cluster_rep` stays the component minimum (a stable
    * cluster KEY, independent of the scoring function); `keeper_id` is the
    * quality argmax (the document to RETAIN).
    *
    * Scale shape: inherits [[minhashClusters]]'s candidate discipline; the
    * argmax adds one groupBy over (cluster, score, id) triples — map-side
    * partial max — and one join back by cluster key. The keeper relation
    * has one row per cluster, so the join is AQE-broadcastable exactly
    * when dedup found real collapse; in the no-dup worst case it is a
    * same-cardinality equi-join on the cluster key, never a cross
    * product.
    */
  def minhashClustersKeepBest(df: DataFrame, textCol: String, idCol: String,
                              score: Column, threshold: Double = 0.9,
                              bands: Int = 16): DataFrame = {
    val clusters = minhashClusters(df, textCol, idCol, threshold, bands)
      .select(col(idCol), col("cluster_rep"))
    val scored = clusters.join(
      df.select(col(idCol), score.as("kb_score")), Seq(idCol))
    // argmin of (-score, id): highest score, ties to the SMALLEST id —
    // the id tie-break rides the struct field's own ordering, so STRING
    // ids work too (negating the id — the old encoding — casts strings
    // to null under ANSI and silently elects no keeper; the same hazard
    // probeWinnowImpl documents and avoids). NULL scores negate to NULL,
    // and a null struct field sorts SMALLEST under ascending struct
    // comparison — the bare argmin would elect a null-scored document
    // over every real-scored one. Coalescing the negated score to +Inf
    // makes null-scored rows sort LAST: they can never beat a scored
    // document, yet an all-null cluster still elects its smallest id
    // (an isNotNull pre-filter would instead drop such clusters from the
    // keeper join entirely).
    val keepers = scored.groupBy(col("cluster_rep"))
      .agg(min(struct(
        coalesce(-col("kb_score"), lit(Double.PositiveInfinity))
          .as("kb_neg_score"),
        col(idCol).as("kb_id"))).as("kb"))
      .select(col("cluster_rep"), col("kb").getField("kb_id").as("keeper_id"))
    scored.join(keepers, Seq("cluster_rep"))
      .select(col(idCol), col("cluster_rep"), col("keeper_id"),
        (col(idCol) === col("keeper_id")).cast("int").as("is_keeper"))
  }

  // ---------------------------------------------------------------- SimHash

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

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, found by
    * pigeonhole banding: split the 64-bit signature into `chunks` pieces;
    * any pair within distance < chunks must agree on ≥1 chunk, so an
    * equi-join on (chunkIdx, chunkValue) finds all candidates without a
    * cross product. Requires maxHamming < chunks. Recall is 1 by the
    * pigeonhole theorem (not probabilistic), so the output is EXACTLY
    * "all pairs at Hamming ≤ maxHamming" for whatever `hasher` feeds the
    * votes — with the portable hasher that makes the whole operator
    * replayable by a brute-force oracle join.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
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

  // ------------------------------------------------------------- winnowing

  /** WINNOWING document fingerprints (Schleimer, Wilkerson, Aiken —
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD'03; the MOSS scheme): hash every word n-gram, slide a window
    * of `w` consecutive gram hashes over each document, and in each
    * window select the MINIMUM hash — rightmost position on ties, the
    * paper's rule. The selected positions fingerprint the document with
    * the paper's guarantee: any shared substring of at least n + w − 1
    * words produces at least one IDENTICAL selected fingerprint in both
    * documents (a window of that match lies entirely inside it), while
    * the expected density is only 2/(w+1) of the grams — position-robust
    * partial-overlap detection (plagiarism, quotation, template reuse)
    * that [[ngramJaccardPairs]]' whole-set Jaccard dilutes away and
    * MinHash, which samples the whole document, cannot localize.
    * Documents shorter than one window keep their global minimum — short
    * docs are never unfingerprintable.
    *
    * Gram hash = the portable char-fold over [[rawWordNgrams]]' space-
    * joined shingles, so the oracle replays every window argmin.
    *
    * Scale shape: each gram row fans out to the ≤ w windows that contain
    * it (a bounded explode — w is 4-8, the algorithm's own constant),
    * and the per-window argmin is a groupBy MIN over a lexicographic
    * (h, −pos, pos) struct — partial-aggregated map-side, so the (id,
    * window) exchange carries pre-collapsed minima, not the w× fanout.
    * No window-function sort over the corpus. Output: distinct
    * (id, pos, h) selected fingerprints.
    */
  def winnowFingerprints(df: DataFrame, textCol: String, idCol: String,
                         n: Int = 3, w: Int = 4): DataFrame = {
    require(n >= 2 && n <= 8, s"n in [2,8], got $n")
    require(w >= 2 && w <= 64, s"w in [2,64], got $w")
    import graft.functions.TextExpressions.charFold
    // DUAL-modulus gram hash (~61 bits, the windowHashesBytes/q32 rule):
    // a single mod-1e9+7 fold is ~2^30 values — 50% birthday collision
    // at only ~32k distinct grams, and winnowing's per-window MINIMUM
    // selection concentrates the selected fingerprints at the LOW end of
    // the space, making cross-document false shares (spurious leak-gate
    // pairs) far likelier than uniform; the df cap would then silently
    // drop the hottest collided hashes and destroy recall on real
    // overlaps at corpus scale
    val grams = df
      .select(col(idCol), rawWordNgrams(col(textCol), n).as("grams"))
      .where(size(col("grams")) > 0)
      .select(col(idCol), size(col("grams")).as("m"),
        posexplode(col("grams")).as(Seq("pos", "g")))
      .select(col(idCol), col("m"), col("pos"),
        (charFold(col("g"), 31L, 1000000007L) * lit(2147483648L) +
          charFold(col("g"), 131L, 998244353L)).as("h"))
    // window starts containing pos: [pos−w+1, pos] ∩ [0, max(m−w, 0)] —
    // non-empty for every pos (short docs collapse to the s = 0 window)
    val wins = grams.select(col(idCol), col("pos"), col("h"),
      explode(sequence(
        greatest(col("pos") - (w - 1), lit(0)),
        least(col("pos"), greatest(col("m") - w, lit(0))))).as("s"))
    wins.groupBy(col(idCol), col("s"))
      // lexicographic min: smallest h, then LARGEST pos (rightmost tie)
      .agg(min(struct(col("h"), (-col("pos")).as("np"), col("pos")))
        .as("sel"))
      .select(col(idCol), col("sel.pos").as("pos"), col("sel.h").as("h"))
      .distinct()
  }

  /** Near-duplicate candidate pairs from shared winnowing fingerprints:
    * documents sharing ≥ `minShared` selected hashes, with each side's
    * fingerprint count for containment math downstream. Fingerprints
    * whose document frequency exceeds `maxDf` are dropped FIRST — the
    * boilerplate guard every fingerprint joiner needs: one template
    * fragment selected in 1% of a 100 TB corpus would otherwise
    * contribute quadratic join output; after the cap each hash yields
    * ≤ maxDf² pairs. One hash-equi self-join over the (id, h) relation —
    * document text never travels. Output: (doc_a, doc_b, shared, fp_a,
    * fp_b) with fp counts over the capped fingerprint sets.
    */
  /** Overlap LOCALIZATION from winnowing fingerprints — the step beyond
    * [[winnowNearDupPairs]]' who-matches-whom: WHERE the shared content
    * sits. One row per shared selected fingerprint occurrence across a
    * document pair: (doc_a, doc_b, h, pos_a, pos_b) — pos_* are the
    * 0-based word-gram positions of the shared hash on each side, i.e.
    * alignment anchor points for quotation extraction, plagiarism-span
    * reporting, or containment math (anchors clustered in doc_a but
    * spread in doc_b = a quoted in b). The SIGMOD'03 guarantee makes the
    * anchors dense: every shared run of ≥ n + w − 1 words contributes at
    * least one row.
    *
    * Same boilerplate cap as the pair form: fingerprints with document
    * frequency > `maxDf` are dropped before the self-join, bounding the
    * per-hash output at maxDf² alignment rows. Scale shape: one
    * hash-equi self-join over the selected (id, pos, h) relation —
    * document text never travels.
    */
  def winnowAlignments(df: DataFrame, textCol: String, idCol: String,
                       n: Int = 3, w: Int = 4, maxDf: Int = 20): DataFrame = {
    require(maxDf >= 2, s"maxDf >= 2, got $maxDf")
    val fps = winnowFingerprints(df, textCol, idCol, n, w)
    val dfh = fps.select(col(idCol), col("h")).distinct()
      .groupBy("h").agg(count(lit(1)).as("hdf"))
    val kept = fps.join(dfh.where(col("hdf") <= maxDf).select("h"), Seq("h"))
    kept.as("a")
      .join(kept.as("b"),
        col("a.h") === col("b.h") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        col("a.h").as("h"), col("a.pos").as("pos_a"),
        col("b.pos").as("pos_b"))
  }

  /** The cross-split RELEASE-GATE matrix at winnowed density — the
    * winnow counterpart of [[graft.ext.Corpus.splitLeakageMatrix]]'s
    * full n-gram matrix: pairwise leakage across splits computed over
    * SELECTED fingerprints only (expected 2/(w+1) of the grams — ~28%
    * at w = 4), with the SIGMOD'03 guarantee that any shared run of
    * ≥ n + w − 1 words still registers. The trade the operator states:
    * a leak shorter than n + w − 1 words can slip a winnowed matrix
    * that the full-gram matrix would catch; in exchange the self-join
    * input shrinks by the density factor — the right default for a
    * 100 TB release gate, with the full matrix as the escalation.
    * Same surface: (split_a, split_b, n_leak_pairs, n_docs_a,
    * n_docs_b, n_shared_total), zero rows for clean pairs, document
    * frequency > `maxDf` fingerprints dropped first.
    */
  def winnowLeakageMatrix(df: DataFrame, textCol: String, idCol: String,
                          splitCol: String = "split", n: Int = 3,
                          w: Int = 4, minShared: Int = 1,
                          maxDf: Int = 20): DataFrame = {
    val fps = winnowFingerprints(df, textCol, idCol, n, w)
      .select(col(idCol), col("h")).distinct()
      .join(df.select(col(idCol), col(splitCol).as("split")), Seq(idCol))
      .select(col("split"), col(idCol).as("doc"), col("h"))
    val stop = fps.groupBy("h").agg(count(lit(1)).as("hdf"))
      .where(col("hdf") > maxDf).select("h")
    val kept = fps.join(stop, Seq("h"), "left_anti")
    val lo = kept.select(col("h"), col("split").as("split_a"),
      col("doc").as("doc_a"))
    val hi = kept.select(col("h"), col("split").as("split_b"),
      col("doc").as("doc_b"))
    val pairs = lo.join(hi, Seq("h"))
      .where(col("split_a") < col("split_b"))
      .groupBy("split_a", "doc_a", "split_b", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
    val matrix = pairs.groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_leak_pairs"),
        countDistinct(col("doc_a")).as("n_docs_a"),
        countDistinct(col("doc_b")).as("n_docs_b"),
        sum(col("n_shared")).as("n_shared_total"))
    val splits = df.select(col(splitCol).as("s")).distinct()
    val frame = splits.select(col("s").as("split_a"))
      .crossJoin(splits.select(col("s").as("split_b")))
      .where(col("split_a") < col("split_b"))
    frame.join(matrix, Seq("split_a", "split_b"), "left")
      .select(col("split_a"), col("split_b"),
        coalesce(col("n_leak_pairs"), lit(0L)).as("n_leak_pairs"),
        coalesce(col("n_docs_a"), lit(0L)).as("n_docs_a"),
        coalesce(col("n_docs_b"), lit(0L)).as("n_docs_b"),
        coalesce(col("n_shared_total"), lit(0L)).as("n_shared_total"))
  }

  /** Quotation/plagiarism SPAN reconstruction from alignment anchors —
    * the human-readable form of [[winnowAlignments]]: shared anchors
    * between two documents that sit on one DIAGONAL (pos_a − pos_b
    * constant) and within `maxGap` gram positions of each other are one
    * contiguous shared passage, reported as word-index spans on both
    * sides. A span's end covers its last gram's n words
    * (end = last_pos + n − 1), so `[start_a, end_a]` is the quoted
    * word range in doc_a and `[start_b, end_b]` the matching range in
    * doc_b; `n_anchors` is its evidence weight. The diagonal constraint
    * is what makes this spans and not co-occurrence: a reordered or
    * interleaved match breaks into separate spans, exactly as a
    * plagiarism reviewer would want.
    *
    * Scale shape: [[winnowAlignments]]' bounded self-join, then a
    * window PER (pair, diagonal) — anchor-sized relations throughout,
    * never corpus-sized; the classic sessionize split (lag > maxGap
    * starts a new run) over at most a few anchors per group.
    */
  def winnowSpans(df: DataFrame, textCol: String, idCol: String,
                  n: Int = 3, w: Int = 4, maxDf: Int = 20,
                  maxGap: Int = 8): DataFrame = {
    require(maxGap >= 1, s"maxGap >= 1, got $maxGap")
    import org.apache.spark.sql.expressions.Window
    val al = winnowAlignments(df, textCol, idCol, n, w, maxDf)
      .withColumn("diag", col("pos_a") - col("pos_b"))
    val ord = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    val runBreak = when(lag(col("pos_a"), 1).over(ord).isNull ||
      col("pos_a") - lag(col("pos_a"), 1).over(ord) > maxGap, 1L)
      .otherwise(0L)
    al.withColumn("brk", runBreak)
      .withColumn("run", sum(col("brk")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_a", "doc_b", "diag", "run")
      .agg(min(col("pos_a")).as("start_a"),
        (max(col("pos_a")) + (n - 1)).as("end_a"),
        count(lit(1)).as("n_anchors"))
      .select(col("doc_a"), col("doc_b"),
        col("start_a"), col("end_a"),
        (col("start_a") - col("diag")).as("start_b"),
        (col("end_a") - col("diag")).as("end_b"),
        col("n_anchors"))
  }

  // --------------------------------------- persisted winnow manifest (q180)

  /** Build and persist a WINNOWING manifest for a corpus — the
    * partial-overlap analogue of [[saveMinhashManifest]]: MinHash
    * manifests answer "is this batch document a NEAR-DUP of known
    * content?" (whole-document Jaccard); this one answers "does it
    * CONTAIN or QUOTE known content?" — overlap the whole-set measure
    * dilutes away. Layout under `path`:
    *  - `fps/`  (doc, pos, h): the corpus's selected winnowing
    *    fingerprints ([[winnowFingerprints]]), h-sorted within files so
    *    probe-side slices prune row groups. Positions ride along for
    *    alignment-grade probes.
    *  - `meta/` (n, w): the winnowing parameters for APPEND paths (read
    *    under the root lease, so they cannot race a rebuild). Probes
    *    derive (n, w) from the stamp columns on the fps rows they
    *    actually scan — a probe winnowed with different (n, w) shares no
    *    hashes and would silently miss everything, so the parameters
    *    must travel WITH the data (the saveMinhashManifest rule).
    * `minShared`/`maxDf` are probe-time choices, like the MinHash
    * manifest's threshold.
    */
  def saveWinnowManifest(df: DataFrame, textCol: String, idCol: String,
                         path: String, n: Int = 3, w: Int = 4): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    // a rebuild starts a fresh streaming lineage (the shared rule):
    // stale exactly-once markers would no-op a new stream's batches
    graft.ops.Stage.clearLedger(spark, path)
    graft.ops.Stage.clearTombstones(spark, path)
    // ONE lease over meta + fps: a leased append between the two
    // publishes must not pair one generation's parameters with the
    // other's fingerprints
    graft.ops.Stage.withWriterLease(spark, path) {
      // meta FIRST, versioned (was an unversioned plain-directory
      // overwrite AFTER the data flip — non-atomic for concurrent reads
      // and wrong-ordered for leased appends)
      graft.ops.Stage.publishRebuild(spark, s"$path/meta")(vd =>
        Seq((n, w)).toDF("n", "w")
          .repartition(1).write.mode("overwrite").parquet(vd))
      // BORN VERSIONED (Stage.publishRebuild, like savePositionalIndex):
      // snapshot pins work straight off a fresh build, and a re-build
      // over a maintained manifest preserves the pointer/GC line
      graft.ops.Stage.publishRebuild(spark, s"$path/fps")(versionDir =>
        winnowFps(df, textCol, idCol, n, w)
          .write.mode("overwrite").parquet(versionDir))
    }
  }

  /** The ONE fps pipeline shared by build and both appends, so they
    * stay join-compatible (the [[writeManifestTables]] rule). The (n, w)
    * stamp columns ride on every row (RLE-compressed constants) so
    * probes band with the parameters of the data they read, not with a
    * meta/ read that can race a rebuild. */
  private def winnowFps(df: DataFrame, textCol: String, idCol: String,
                        n: Int, w: Int): DataFrame =
    winnowFingerprints(df, textCol, idCol, n, w)
      .select(col(idCol).as("doc"), col("pos"), col("h"))
      .repartition(col("h")).sortWithinPartitions("h", "doc", "pos")
      .withColumn("n", lit(n)).withColumn("w", lit(w))

  private def writeWinnowTables(df: DataFrame, textCol: String,
                                idCol: String, path: String, n: Int,
                                w: Int, mode: String): Unit =
    winnowFps(df, textCol, idCol, n, w).write.mode(mode)
      .parquet(graft.ops.Stage.resolve(df.sparkSession, s"$path/fps"))

  /** Append a batch's fingerprints to a [[saveWinnowManifest]] manifest
    * without rebuilding — batch-sized work against the manifest's own
    * (n, w); new documents' rows are per-doc disjoint, so they land as
    * new files. Under the root writer lease, like every manifest append. */
  def appendToWinnowManifest(newDf: DataFrame, textCol: String,
                             idCol: String, path: String): Unit =
    graft.ops.Stage.withWriterLease(newDf.sparkSession, path) {
      val meta = newDf.sparkSession.read.parquet(
        graft.ops.Stage.resolve(newDf.sparkSession, s"$path/meta")).head()
      writeWinnowTables(newDf, textCol, idCol, path,
        meta.getAs[Int]("n"), meta.getAs[Int]("w"), "append")
    }

  /** [[appendToWinnowManifest]] with EXACTLY-ONCE semantics for
    * streaming ingest ([[graft.ops.Stage.appendExactlyOnce]] — marker
    * check, staged publish under `b<batchId>-*`): a replayed batch does
    * not double its fingerprint rows (a double would inflate every
    * later probe's shared counts for that content). */
  def appendToWinnowManifestExactlyOnce(newDf: DataFrame, textCol: String,
                                        idCol: String, path: String,
                                        batchId: Long): Unit = {
    val spark = newDf.sparkSession
    if (graft.ops.Stage.alreadyPublished(spark, path, batchId)) return
    graft.ops.Stage.appendExactlyOnce(spark, path, batchId, Seq("fps")) {
      staging =>
        // meta (n, w) is read INSIDE the lease-held stage callback — a
        // concurrent saveWinnowManifest rebuild with different (n, w)
        // must not race the read and land join-incompatible fingerprints
        // (the appendToTextIndexExactlyOnce rule)
        val meta = spark.read.parquet(
          graft.ops.Stage.resolve(spark, s"$path/meta")).head()
        writeWinnowTables(newDf, textCol, idCol, staging,
          meta.getAs[Int]("n"), meta.getAs[Int]("w"), "overwrite")
    }
  }

  /** Delete documents from a [[saveWinnowManifest]] manifest — the
    * right-to-be-forgotten path, ID-keyed (unlike the MinHash
    * manifest's content-keyed delete: that one stores exact-collapse
    * REPRESENTATIVES, so ids under-delete there; winnow fps are plain
    * per-document rows, so the id IS the right key). One anti-join +
    * atomic publish ([[graft.ops.Stage.publishRewrite]] — a crash
    * mid-rewrite leaves the old manifest serving); probing afterwards
    * equals probing a manifest built without those documents. */
  def deleteFromWinnowManifest(spark: org.apache.spark.sql.SparkSession,
                               path: String, ids: DataFrame,
                               idCol: String = "doc_id"): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      graft.ops.Stage.sweepUncommitted(spark, path, Seq("fps"))
      val del = ids.select(col(idCol).as("doc")).distinct()
      graft.ops.Stage.publishRewrite(spark, s"$path/fps",
        spark.read.parquet(graft.ops.Stage.resolve(spark, s"$path/fps"))
          .join(del, Seq("doc"), "left_anti"))
    }

  /** TOMBSTONE documents in the winnow manifest — the batched
    * alternative to [[deleteFromWinnowManifest]]'s per-call
    * manifest-sized rewrite (the drip-feed-of-forgets economics of
    * [[tombstoneContentInMinhashManifest]]): append the doc ids to the
    * shared `tombstones/` table (batch-sized), probes mask pending ids
    * immediately (the fps relation anti-joins before anything else),
    * and [[compactWinnowManifest]] folds them into a physical delete on
    * the compaction schedule. ID-keyed like the family's delete. */
  def tombstoneFromWinnowManifest(spark: org.apache.spark.sql.SparkSession,
                                  path: String, ids: DataFrame,
                                  idCol: String = "doc_id"): Unit =
    graft.ops.Stage.appendTombstones(
      ids.select(col(idCol).as("doc")), path)

  /** Fold the winnow manifest's per-batch file trail into one fresh,
    * h-sorted version ([[graft.ops.Stage.publishRewrite]] — atomic, old
    * version keeps serving through a crash): streaming ingest lands one
    * file set per micro-batch, and probe-side row-group pruning wants
    * the h-sort restored. Pending tombstones fold into the rewrite as a
    * physical delete, then retire with the standard one-cycle reader
    * grace ([[graft.ops.Stage.resetTombstones]]). Manifest-sized work,
    * no corpus re-winnowing. */
  def compactWinnowManifest(spark: org.apache.spark.sql.SparkSession,
                            path: String): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      graft.ops.Stage.sweepUncommitted(spark, path, Seq("fps"))
      val snap = graft.ops.Stage.tombstoneSnapshot(spark, path)
      val fps = spark.read
        .parquet(graft.ops.Stage.resolve(spark, s"$path/fps"))
      val live = snap.map(_._1) match {
        case Some(t) => fps.join(t, Seq("doc"), "left_anti")
        case None    => fps
      }
      graft.ops.Stage.publishRewrite(spark, s"$path/fps",
        live.repartition(col("h")).sortWithinPartitions("h", "doc", "pos"))
      graft.ops.Stage.resetTombstones(spark, path,
        snap.map(_._2).getOrElse(Nil))
      graft.ops.Stage.compactLedger(spark, path)
    }

  /** [[compactWinnowManifest]] when the fps component has fragmented
    * past `maxFiles` live files ([[graft.ops.Stage.shouldCompact]]);
    * otherwise a metadata-only listing — the self-maintenance hook for
    * streaming ingest sinks, like [[autoCompactMinhashManifest]].
    * Returns whether a compaction ran. */
  def autoCompactWinnowManifest(spark: org.apache.spark.sql.SparkSession,
                                path: String,
                                maxFiles: Int = 64): Boolean = {
    val go = graft.ops.Stage.shouldCompact(spark, path, Seq("fps"), maxFiles)
    if (go) compactWinnowManifest(spark, path)
    go
  }

  /** Pin / roll back the winnow manifest's state under a NAMED snapshot
    * ([[graft.ops.Stage.snapshot]] / [[graft.ops.Stage.restoreSnapshot]]
    * on the fps component, under the root lease) — the same
    * campaign-grade undo surface as the other index families. */
  def snapshotWinnowManifest(spark: org.apache.spark.sql.SparkSession,
                             path: String, name: String): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      graft.ops.Stage.sweepUncommitted(spark, path, Seq("fps"))
      graft.ops.Stage.snapshot(spark, s"$path/fps", name)
    }

  /** Restore the [[snapshotWinnowManifest]] pin (atomic pointer flip;
    * the pin survives). */
  def restoreWinnowManifest(spark: org.apache.spark.sql.SparkSession,
                            path: String, name: String): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      graft.ops.Stage.restoreSnapshot(spark, s"$path/fps", name)
    }

  /** Release a [[snapshotWinnowManifest]] pin; the pinned version
    * becomes an ordinary GC candidate at the next publish. */
  def dropWinnowManifestSnapshot(spark: org.apache.spark.sql.SparkSession,
                                 path: String, name: String): Unit =
    graft.ops.Stage.dropSnapshot(spark, s"$path/fps", name)

  /** Reclaim the manifest's stale versions now. */
  def vacuumWinnowManifest(spark: org.apache.spark.sql.SparkSession,
                           path: String): Unit =
    graft.ops.Stage.vacuum(spark, s"$path/fps")

  /** Probe an ingest batch against a persisted [[saveWinnowManifest]]
    * manifest: per batch document, its strongest partial-overlap match
    * in the known corpus — WITHOUT recomputing any corpus fingerprints.
    * Verdict columns per batch doc: `n_fp` (its df-surviving
    * fingerprints), `best_match` (the corpus doc sharing the most, ties
    * to the smallest id; NULL when nothing shares), `shared`,
    * `containment_ppm` (shared·10⁶ div n_fp — "how much of me is
    * already known"), `flagged` (shared ≥ `minShared`).
    *
    * Scale shape: the batch winnows batch-sized; the manifest is sliced
    * to the PROBE'S OWN HASHES first (the posting-list rule), the df cap
    * is computed on that slice (bounded by batch hashes, never a
    * manifest-wide aggregate), and the shared join runs over the
    * ≤ maxDf-per-hash slice, so probe cost is batch-sized at ANY
    * manifest size. No join is hint-forced: AQE broadcasts the batch
    * side when the batch is actually small and shuffles a day-of-crawl
    * batch instead of OOMing it into broadcast memory.
    */
  def probeWinnowOverlap(batch: DataFrame, path: String,
                         idCol: String = "doc_id",
                         textCol: String = "text", minShared: Int = 2,
                         maxDf: Int = 20): DataFrame =
    probeWinnowImpl(batch, path,
      graft.ops.Stage.resolve(batch.sparkSession, s"$path/fps"),
      idCol, textCol, minShared, maxDf)

  /** [[probeWinnowOverlap]] against a [[snapshotWinnowManifest]] pin —
    * the frozen-corpus read (validation probes, reproducible reports)
    * while the live manifest keeps maintaining. */
  def probeWinnowOverlapSnapshot(batch: DataFrame, path: String,
                                 name: String, idCol: String = "doc_id",
                                 textCol: String = "text",
                                 minShared: Int = 2,
                                 maxDf: Int = 20): DataFrame =
    probeWinnowImpl(batch, path,
      graft.ops.Stage.resolveSnapshot(batch.sparkSession, s"$path/fps", name)
        .getOrElse(throw new IllegalStateException(
          s"$path/fps has no snapshot '$name' to probe")),
      idCol, textCol, minShared, maxDf)

  /** [[probeWinnowOverlap]] against the PREVIOUS fps snapshot — the
    * state the last maintenance op superseded, kept for one publish
    * cycle by the versioned publish ([[graft.ops.Stage.resolvePrevious]];
    * the minhash family's [[incrementalNearDupsPrevious]] is the same
    * read) — the time-travel validation probe run before trusting a
    * forget/compaction. Pending tombstones still mask it. */
  def probeWinnowOverlapPrevious(batch: DataFrame, path: String,
                                 idCol: String = "doc_id",
                                 textCol: String = "text",
                                 minShared: Int = 2,
                                 maxDf: Int = 20): DataFrame =
    probeWinnowImpl(batch, path,
      graft.ops.Stage.resolvePrevious(batch.sparkSession, s"$path/fps")
        .getOrElse(throw new IllegalStateException(
          s"$path/fps has no previous snapshot to probe — time travel " +
            "needs at least two publishes")),
      idCol, textCol, minShared, maxDf)

  /** Maintenance DIFF of the winnow manifest's two serveable states —
    * PREVIOUS (what the last forget/compaction superseded) vs LIVE —
    * as one per-probe-document report: both sides' best match and
    * shared count plus a status — `lost` (overlap verdict vanished:
    * its evidence was forgotten), `appeared`, `rematched` (a different
    * corpus doc now wins), `changed` (same match, shared moved),
    * `held`. The validate-before-trust workflow for a forget batch, as
    * a first-class operator (the minhash family's
    * [[incrementalNearDupsDiff]] shape). Cost: two batch-sized probes
    * plus one batch-row join. */
  def winnowMaintenanceDiff(batch: DataFrame, path: String,
                            idCol: String = "doc_id",
                            textCol: String = "text", minShared: Int = 2,
                            maxDf: Int = 20): DataFrame = {
    val prev = probeWinnowOverlapPrevious(batch, path, idCol, textCol,
      minShared, maxDf)
      .select(col(idCol), col("best_match").as("prev_match"),
        col("shared").as("prev_shared"), col("flagged").as("prev_flagged"))
    val live = probeWinnowOverlap(batch, path, idCol, textCol,
      minShared, maxDf)
      .select(col(idCol), col("best_match").as("live_match"),
        col("shared").as("live_shared"), col("flagged").as("live_flagged"))
    prev.join(live, Seq(idCol))
      .select(col(idCol), col("prev_match"), col("prev_shared"),
        col("live_match"), col("live_shared"),
        when(col("prev_flagged") && !col("live_flagged"), lit("lost"))
          .when(!col("prev_flagged") && col("live_flagged"),
            lit("appeared"))
          .when(col("prev_flagged") && col("live_flagged") &&
            !(col("prev_match") <=> col("live_match")), lit("rematched"))
          .when(col("prev_shared") =!= col("live_shared"), lit("changed"))
          .otherwise(lit("held")).as("status"))
  }

  private def probeWinnowImpl(batch: DataFrame, path: String,
                              fpsDir: String, idCol: String,
                              textCol: String, minShared: Int,
                              maxDf: Int): DataFrame = {
    require(minShared >= 1, s"minShared >= 1, got $minShared")
    require(maxDf >= 1, s"maxDf >= 1, got $maxDf")
    val spark = batch.sparkSession
    // (n, w) from the stamp on the fps rows this probe ACTUALLY reads
    // (fpsDir is already resolved — live, snapshot, or previous), never
    // from meta/, whose read could race a rebuild that changes the
    // parameters (silently-empty overlap verdicts). Empty manifest →
    // meta fallback: any parameters probe zero fingerprints identically.
    val (n, w) = spark.read.parquet(fpsDir).select(col("n"), col("w"))
      .limit(1).collect().headOption
      .map(r => (r.getInt(0), r.getInt(1)))
      .getOrElse {
        val meta = spark.read.parquet(
          graft.ops.Stage.resolve(spark, s"$path/meta")).head()
        (meta.getAs[Int]("n"), meta.getAs[Int]("w"))
      }
    val bf = winnowFingerprints(batch, textCol, idCol, n, w)
      .select(col(idCol).as("bdoc"), col("h")).distinct()
    // pending tombstones mask every probe path immediately, snapshot
    // reads included (right-to-be-forgotten holds for validation reads
    // — the family rule)
    val tomb = graft.ops.Stage.pendingTombstones(spark, path)
    val mfAll = spark.read.parquet(fpsDir).select(col("doc"), col("h"))
    // No forced broadcast hints anywhere below: the batch-derived
    // relations (bf, cappedHs, bk) are "batch-sized" by contract but a
    // production ingest batch — a day of crawl — makes its winnowed
    // fingerprint set GBs, where a pinned broadcast OOMs and an
    // un-hinted join gracefully shuffles. AQE broadcasts small batches
    // on its own; PlanAuditSpec pins that the probe plans and answers
    // with broadcast disabled outright.
    val mf = (tomb match {
      case Some(t) => mfAll.join(t, Seq("doc"), "left_anti")
      case None    => mfAll
    }).distinct()
    // slice the manifest to the probe's hashes BEFORE any aggregate:
    // everything downstream is bounded by the batch, not the corpus
    val mfp = mf.join(bf.select("h").distinct(), Seq("h"))
    // boilerplate cap by EXCLUSION: drop hashes the manifest holds in
    // more than maxDf documents — but keep batch hashes the manifest
    // has never seen, so n_fp stays "my fingerprints" (the containment
    // denominator), not "my fingerprints the corpus knows"
    val cappedHs = mfp.groupBy("h").agg(count(lit(1)).as("hdf"))
      .where(col("hdf") > maxDf).select("h")
    val bk = bf.join(cappedHs, Seq("h"), "left_anti")
    val mk = mfp.join(cappedHs, Seq("h"), "left_anti")
    val nfp = bk.groupBy("bdoc").agg(count(lit(1)).as("n_fp"))
    val best = mk.join(bk, Seq("h"))
      .groupBy(col("bdoc"), col("doc"))
      .agg(count(lit(1)).as("shared"))
      .groupBy("bdoc")
      // argmin of (-shared, doc): most shared, then the SMALLEST corpus
      // doc id — `shared` is a count so its negation is exact, and the
      // doc tie-break is the struct field's own ordering, so it holds
      // for STRING ids too (a negated string id would cast to null and
      // silently flip ties to the largest id)
      .agg(min(struct((-col("shared")).as("ns"), col("doc"),
        col("shared"))).as("b"))
      .select(col("bdoc"), col("b.shared").as("shared"),
        col("b.doc").as("best_match"))
    batch.select(col(idCol).as("bdoc"))
      .join(nfp, Seq("bdoc"), "left")
      .join(best, Seq("bdoc"), "left")
      .select(col("bdoc").as(idCol),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        col("best_match"),
        coalesce(col("shared"), lit(0L)).as("shared"),
        when(coalesce(col("n_fp"), lit(0L)) > 0L,
          expr("coalesce(shared, 0L) * 1000000L div n_fp"))
          .otherwise(lit(0L)).as("containment_ppm"),
        (coalesce(col("shared"), lit(0L)) >= minShared).as("flagged"))
  }

  def winnowNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                         n: Int = 3, w: Int = 4, minShared: Int = 2,
                         maxDf: Int = 20): DataFrame = {
    require(minShared >= 1, s"minShared >= 1, got $minShared")
    require(maxDf >= 2, s"maxDf >= 2, got $maxDf")
    val fps = winnowFingerprints(df, textCol, idCol, n, w)
      .select(col(idCol), col("h")).distinct()
    val dfh = fps.groupBy("h").agg(count(lit(1)).as("hdf"))
    val kept = fps
      .join(dfh.where(col("hdf") <= maxDf).select("h"), Seq("h"))
    val cnt = kept.groupBy(col(idCol)).agg(count(lit(1)).as("nfp"))
    val pairs = kept.as("a")
      .join(kept.as("b"),
        col("a.h") === col("b.h") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
    pairs
      .join(cnt.select(col(idCol).as("doc_a"), col("nfp").as("fp_a")),
        Seq("doc_a"))
      .join(cnt.select(col(idCol).as("doc_b"), col("nfp").as("fp_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("shared"), col("fp_a"),
        col("fp_b"))
  }

  /** Prefix-filtered exact set-similarity self-join (the AllPairs / PPJoin
    * family — Bayardo/Ma/Srikant "Scaling Up All Pairs Similarity Search"
    * WWW'07; Xiao et al. "Efficient Similarity Joins for Near Duplicate
    * Detection" WWW'08): every unordered document pair whose DISTINCT
    * word-`shingle`-gram sets have Jaccard ≥ `threshold`, with an EXACT
    * contract (the oracle is the all-pairs self-join) but never an
    * all-pairs plan. This fills the deliberate gap between
    * [[ngramJaccardPairs]] (exact, but needs a caller-supplied blocking
    * bucket) and [[minhashPairs]] (corpus-wide, but probabilistic recall):
    * corpus-wide AND deterministic-recall-1.
    *
    * Candidate generation is the LOSSLESS prefix filter: order the gram
    * vocabulary globally by (document frequency asc, gram asc) — rarest
    * first — and explode only each set's first
    * `p = L − floor(t·L) + 1` grams. Pigeonhole: if two sets share no
    * prefix element, each retains at most `ceil(t·L) − 1 < t·L` elements
    * outside the other's reach, so their Jaccard is < t. Rarest-first makes
    * the candidate join self-limiting at scale: a stop-word-frequency gram
    * enters a prefix only when a document has almost nothing rarer, so
    * candidate-bucket sizes track true-duplicate density, not vocabulary
    * skew. The df table itself is one linear aggregate, joined back by
    * gram — no global rank/row_number bottleneck.
    *
    * Float safety: the prefix length uses `floor(t·L − 1e-9)` and the
    * symmetric size filter `min(L) ≥ t·max(L) − 1e-9`, each relaxed by an
    * epsilon so IEEE rounding can only ADD candidates (the exact
    * [[graft.functions.SetExpressions.sortedSetJaccard]] verification
    * removes them); tightening would silently drop true pairs.
    *
    * Output: (doc_a, doc_b, jaccard), doc_a < doc_b, one row per true
    * pair. Documents with no `shingle`-gram (text NULL or shorter than
    * `shingle` tokens) emit nothing — an empty set has no defined Jaccard.
    */
  def setSimJoinPairs(df: DataFrame, textCol: String, idCol: String,
                      threshold: Double = 0.7,
                      shingle: Int = 3): DataFrame = {
    require(shingle >= 1, s"shingle >= 1, got $shingle")
    setSimJoinOnSets(df.select(col(idCol).as("doc"),
      array_sort(transform(wordNgrams(col(textCol), shingle),
        g => xxhash64(g))).as("grams")), threshold)
  }

  /** The [[setSimJoinPairs]] core over PRE-BUILT element sets: `sets`
    * must carry (`doc`, `grams`) with `grams` a SORTED DISTINCT long
    * array (any hashed element domain — word shingles, frame hashes,
    * feature ids). Same lossless prefix + positional + size filters,
    * same exact merge-walk verification, same (doc_a, doc_b, jaccard)
    * output. Empty sets emit nothing.
    */
  def setSimJoinOnSets(setsIn: DataFrame,
                       threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold in (0, 1], got $threshold")
    def ckpt(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint()
      else df.localCheckpoint()
    // The set relation feeds FOUR consumers (df table, ranking, and both
    // verify sides) and the prefix relation TWO (both candidate sides);
    // without materialization each consumer re-runs the set construction
    // — higher-order-function gram hashing is CodegenFallback, so that
    // pass dominates (measured at sf0.1: 9.1 s → ~4 s with the two
    // checkpoints). One doc-count-sized materialization each, the
    // pageRankInt reuse rule.
    val allSets = ckpt(setsIn
      .where(size(col("grams")) >= 1)
      .withColumn("l", size(col("grams"))))
    // EXACT-COLLAPSE before the expensive machinery (the minhash
    // classPairs rule): identical gram SETS — exact duplicates and
    // re-crawls are the dominant class at corpus scale — collapse to one
    // representative (min doc id), so the df table, the prefix join, and
    // the verification all run on DISTINCT sets; member pairs expand
    // afterward from the verified class pairs (cross-class) and as
    // jaccard-1.0 rows (within-class, always ≥ any legal threshold).
    // Grouping is by the full gram array (exact, no collapse-key
    // collision risk); members join back on the array, a shuffle the
    // class relation already paid.
    val sets = ckpt(allSets.groupBy(col("grams"), col("l"))
      .agg(min(col("doc")).as("doc"))
      .select(col("doc"), col("grams"), col("l")))
    val members = ckpt(allSets.select(col("doc").as("member"), col("grams"))
      .join(sets.select(col("doc").as("rep"), col("grams")), Seq("grams"))
      .select(col("rep"), col("member")))
    // Gram document frequency: the global rarest-first ordering key. One
    // linear explode + count; at corpus scale this relation is
    // vocabulary-sized and hash-joins back by gram.
    val gdf = sets.select(explode(col("grams")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("gdf"))
    // Rank each doc's grams by (df asc, gram asc) WITHOUT a global
    // row_number: the (df, gram) pair is itself a total order, so sorting
    // the per-doc struct array and slicing the first p entries is the
    // prefix. p = l − floor(t·l − ε) + 1 (ε relaxes, see scaladoc).
    val ranked = sets.select(col("doc"), col("l"), explode(col("grams")).as("g"))
      .join(gdf, Seq("g"))
      .groupBy("doc", "l")
      .agg(array_sort(collect_list(struct(col("gdf"), col("g")))).as("ord"))
      .withColumn("p",
        col("l") - floor(lit(threshold) * col("l") - lit(1e-9)).cast("int")
          + lit(1))
    val prefix = ckpt(ranked.select(col("doc"), col("l"),
      posexplode(slice(col("ord"), lit(1), col("p").cast("int"))))
      .select(col("doc"), col("l"), (col("pos") + 1).as("rk"),
        col("col.g").as("g")))
    // Candidate pairs: equi-join on a shared prefix gram + two more
    // lossless prunes, deduplicated before verification so each pair pays
    // one merge-walk:
    //  - size filter: Jaccard ≥ t forces t·max(L) ≤ min(L);
    //  - PPJoin positional filter: Jaccard ≥ t ⟺ overlap o ≥ α =
    //    t/(1+t)·(La+Lb); a match at ordered positions (i, j) bounds the
    //    overlap THROUGH that match by 1 + min(La−i, Lb−j). Lossless
    //    because a true pair survives via its FIRST shared gram in the
    //    global order: that gram lies inside both prefixes (if all shared
    //    grams sat beyond A's prefix then o < t·La, but o ≥ α ≥ t·La
    //    given Lb ≥ t·La from the size filter — contradiction), and at
    //    the first match nothing shared precedes (i, j), so the bound
    //    there is ≥ o ≥ α and the row passes.
    val alpha =
      lit(threshold / (1.0 + threshold)) * (col("a.l") + col("b.l")) -
        lit(1e-9)
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.doc") < col("b.doc") &&
          least(col("a.l"), col("b.l")) >=
            lit(threshold) * greatest(col("a.l"), col("b.l")) - lit(1e-9) &&
          lit(1) + least(col("a.l") - col("a.rk"),
            col("b.l") - col("b.rk")) >= alpha)
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
    val setsA = sets.select(col("doc").as("doc_a"), col("grams").as("g_a"))
    val setsB = sets.select(col("doc").as("doc_b"), col("grams").as("g_b"))
    val classPairs = cand
      .join(setsA, Seq("doc_a")).join(setsB, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.SetExpressions
          .sortedSetJaccard(col("g_a"), col("g_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
    // Expand class pairs to member pairs: cross-class pairs inherit the
    // verified class Jaccard (identical sets ⇒ identical similarity);
    // within-class pairs are exactly 1.0, always ≥ any legal threshold.
    // Orientation re-derives per member pair — reps are ordered, members
    // interleave arbitrarily.
    val cross = classPairs
      .join(members.select(col("rep").as("doc_a"), col("member").as("m_a")),
        Seq("doc_a"))
      .join(members.select(col("rep").as("doc_b"), col("member").as("m_b")),
        Seq("doc_b"))
      .select(least(col("m_a"), col("m_b")).as("doc_a"),
        greatest(col("m_a"), col("m_b")).as("doc_b"), col("jaccard"))
    val within = members.as("x")
      .join(members.as("y"),
        col("x.rep") === col("y.rep") && col("x.member") < col("y.member"))
      .select(col("x.member").as("doc_a"), col("y.member").as("doc_b"),
        lit(1.0).as("jaccard"))
    cross.union(within)
  }

  /** Exact edit-distance self-join over a string VALUE DOMAIN (q-gram
    * count filtering — Gravano et al., "Approximate String Joins in a
    * Database (Almost) for Free", VLDB'01): every unordered pair of
    * DISTINCT non-null `strCol` values within Levenshtein distance
    * `maxDist`, without an all-pairs scan. The record-linkage primitive:
    * production runs it on the deduplicated value domain (|V| distinct
    * names/titles ≪ row count at 100 TB) and equi-joins survivors back to
    * rows.
    *
    * Candidates come from two LOSSLESS branches:
    *  - **q-gram count filter** (the scale path): one edit destroys at
    *    most `q` positional q-grams, so `lev(a,b) ≤ d` forces the
    *    MULTISET q-gram overlap `≥ max(|a|,|b|) − q + 1 − q·d`. Multiset
    *    semantics become an equi-join by keying each gram with its
    *    occurrence index (row_number within (value, gram) by position):
    *    join rows per pair = Σ_g min(cnt_a, cnt_b). Pairs whose bound is
    *    ≥ 1 — i.e. max length ≥ q·(d+1) — are guaranteed caught here.
    *  - **short-value band**: values shorter than `q·(maxDist+1)` can be
    *    inside distance d while sharing zero q-grams; they pair among
    *    themselves through the SAME count filter at gram size 1 (one
    *    edit destroys at most one unigram, so `lev ≤ d` forces a shared-
    *    char multiset overlap ≥ max(|a|,|b|) − d, which is ≥ 1 whenever
    *    the longer side exceeds `d` chars). Only values of length ≤
    *    `maxDist` — a constant alphabet-bounded domain — pair
    *    unconditionally under the length filter. A (short, long) pair is
    *    covered by the q-gram branch: its bound uses max length.
    *
    * Both branches also apply the length filter `||a|−|b|| ≤ d` (an
    * insertion/deletion changes length by one). Verification uses Spark's
    * codegen'd thresholded `levenshtein(a, b, d)` — early-exit at `d`, so
    * verify cost is O(d·len) per candidate, not O(len²).
    *
    * Output: (name_a, name_b, dist), name_a < name_b, dist in [1, maxDist].
    */
  def editDistanceJoin(df: DataFrame, strCol: String,
                       maxDist: Int = 2, q: Int = 2): DataFrame = {
    require(maxDist >= 1, s"maxDist >= 1, got $maxDist")
    require(q >= 1, s"q >= 1, got $q")
    val names = df.select(col(strCol).as("name"))
      .where(col("name").isNotNull).distinct()
      .withColumn("len", length(col("name")))
    // Positional grams with occurrence indices: multiset intersection as
    // an equi-join on (gram, occ). Guard: a name shorter than gq chars
    // has NO grams — sequence(1, 0) would generate a DESCENDING range
    // (the rawWordNgrams rule), manufacturing bogus grams (harmless to
    // the result — verification is exact — but wasted candidate work).
    def gramCand(subset: DataFrame, gq: Int): DataFrame = {
      val grams = subset
        .select(col("name"), col("len"),
          posexplode(when(col("len") >= gq,
            transform(sequence(lit(1), col("len") - (gq - 1)),
              i => col("name").substr(i, lit(gq))))
            .otherwise(array().cast("array<string>"))))
        .withColumn("occ", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("name"), col("col")).orderBy(col("pos"))))
        .select(col("name"), col("len"), col("col").as("g"), col("occ"))
      grams.as("a")
        .join(grams.as("b"),
          col("a.g") === col("b.g") && col("a.occ") === col("b.occ") &&
            col("a.name") < col("b.name") &&
            abs(col("a.len") - col("b.len")) <= maxDist)
        .groupBy(col("a.name").as("name_a"), col("b.name").as("name_b"),
          col("a.len").as("len_a"), col("b.len").as("len_b"))
        .agg(count(lit(1)).as("shared"))
        .where(col("shared") >=
          greatest(col("len_a"), col("len_b")) - (gq - 1) - gq * maxDist)
        .select(col("name_a"), col("name_b"))
    }
    val shortBound = q * (maxDist + 1)
    val shorts = names.where(col("len") < shortBound)
    // values of length ≤ maxDist can share zero characters with a true
    // match — pair that constant alphabet-bounded sliver unconditionally.
    // The predicate is pure inequality, so this plans as a nested-loop
    // join; the broadcast hint pins the build side to the PROVABLY
    // constant-bounded tiny relation (≤ |Σ|^maxDist values) — without it
    // the planner's stats could pick the data-sized side.
    val tiny = broadcast(names.where(col("len") <= maxDist))
    val tinyCand = tiny.as("a")
      .join(names.as("b"),
        col("a.name") < col("b.name") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .union(tiny.as("b").join(names.as("a"),
        col("a.name") < col("b.name") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
        .select(col("a.name").as("name_a"), col("b.name").as("name_b")))
    gramCand(names, q).union(gramCand(shorts, 1)).union(tinyCand)
      .distinct()
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist))
      .where(col("dist") =!= -1)
  }

  /** Persist a DETERMINISTIC-EXACT set-similarity index: the incremental
    * "does this batch near-dup against the corpus?" gate with
    * [[setSimJoinPairs]]' exact contract, where [[saveMinhashManifest]]
    * answers the same question probabilistically. Two components, both
    * versioned under the root lease (the manifest protocol):
    *
    *  - `sets`: (doc, grams, l) — each document's sorted distinct hashed
    *    `shingle`-gram set (the verification side);
    *  - `postings`: (g, doc, l) — the FULL inverted gram postings (the
    *    candidate side).
    *
    * Storing FULL postings (not index-time prefixes) is what makes the
    * index APPEND-STABLE: the probe's candidate filter is the ONE-SIDED
    * prefix theorem — if Jaccard(A, B) ≥ t then A's first
    * `p = L_A − floor(t·L_A) + 1` elements under ANY fixed order must
    * intersect B itself (all-shared-in-the-suffix would force
    * o ≤ ceil(t·L_A) − 1 < t·L_A ≤ o) — which needs NO ordering
    * agreement with the stored side. Document frequency therefore only
    * tunes candidate VOLUME (the probe derives CURRENT df for the
    * batch's grams from the postings), never recall, and appends can't
    * stale anything.
    */
  def saveSetSimIndex(df: DataFrame, textCol: String, idCol: String,
                      path: String, shingle: Int = 3): Unit = {
    val spark = df.sparkSession
    graft.ops.Stage.clearLedger(spark, path)
    graft.ops.Stage.withWriterLease(spark, path) {
      val sets = setSimSets(df, textCol, idCol, shingle)
      graft.ops.Stage.publishRebuild(spark, s"$path/sets")(vd =>
        sets.write.mode("overwrite").parquet(vd))
      graft.ops.Stage.publishRebuild(spark, s"$path/postings")(vd =>
        setSimPostings(sets).write.mode("overwrite").parquet(vd))
    }
  }

  private def setSimSets(df: DataFrame, textCol: String, idCol: String,
                         shingle: Int): DataFrame =
    df.select(col(idCol).as("doc"),
        array_sort(transform(wordNgrams(col(textCol), shingle),
          g => xxhash64(g))).as("grams"))
      .where(size(col("grams")) >= 1)
      .withColumn("l", size(col("grams")))

  private def setSimPostings(sets: DataFrame): DataFrame =
    sets.select(col("doc"), col("l"), explode(col("grams")).as("g"))
      .select(col("g"), col("doc"), col("l"))

  /** Append a batch to a [[saveSetSimIndex]] index (root lease; both
    * components gain the batch's rows — full postings are append-stable,
    * see the save scaladoc). The index's shingle width must match.
    *
    * The append is STAGED, not written in place: a crash between the two
    * components would otherwise leave a doc present in `sets` but absent
    * from `postings` — candidates come only from postings, so such a doc
    * would silently never surface again, a recall hole in an index whose
    * headline contract is deterministic recall 1, and plain in-place
    * appends are invisible to [[graft.ops.Stage.sweepUncommitted]]. Routing
    * through the op-ledgered publish makes a torn append a SWEPT append:
    * both components commit together or the next maintenance sweep reverts
    * both. Pass a stable `opId` to make a caller-side retry idempotent;
    * the default fresh id gives at-least-once (a retry re-appends whole,
    * never torn). */
  def appendToSetSimIndex(newDf: DataFrame, textCol: String, idCol: String,
                          path: String, shingle: Int = 3,
                          opId: String = ""): Unit = {
    val spark = newDf.sparkSession
    val id = if (opId.nonEmpty) opId
      else "ssappend" + java.util.UUID.randomUUID().toString.replace("-", "")
    graft.ops.Stage.publishOnce(spark, path, id,
      Seq("sets", "postings")) { staging =>
      val sets = setSimSets(newDf, textCol, idCol, shingle)
      sets.write.mode("overwrite").parquet(s"$staging/sets")
      setSimPostings(sets).write.mode("overwrite")
        .parquet(s"$staging/postings")
    }
  }

  /** [[appendToSetSimIndex]] with EXACTLY-ONCE semantics for streaming
    * ingest (the shared ledger protocol — a replayed batch would double
    * its rows in both components and every later candidate join). */
  def appendToSetSimIndexExactlyOnce(newDf: DataFrame, textCol: String,
                                     idCol: String, path: String,
                                     batchId: Long,
                                     shingle: Int = 3): Unit = {
    val spark = newDf.sparkSession
    if (graft.ops.Stage.alreadyPublished(spark, path, batchId)) return
    graft.ops.Stage.appendExactlyOnce(spark, path, batchId,
      Seq("sets", "postings")) { staging =>
      val sets = setSimSets(newDf, textCol, idCol, shingle)
      sets.write.mode("overwrite").parquet(s"$staging/sets")
      setSimPostings(sets).write.mode("overwrite")
        .parquet(s"$staging/postings")
    }
  }

  /** Probe a batch against a [[saveSetSimIndex]] index: every
    * (batch doc, corpus doc) pair with gram-set Jaccard ≥ `threshold`,
    * EXACTLY (recall 1 modulo 2⁻⁶⁴ gram-hash collisions). Work shape:
    * the batch's gram df comes from the postings restricted to the
    * batch's grams (posting-list-sized, the BM25 serve rule); the
    * candidate join streams batch PREFIX grams (rarest-first under the
    * derived df) against the full postings with the symmetric size
    * filter; verification joins both sides' stored gram arrays through
    * the merge-walk. Probing is read-only.
    *
    * Output: (doc_batch, doc_corpus, jaccard).
    */
  def probeSetSimOverlap(batch: DataFrame, path: String,
                         threshold: Double = 0.7,
                         textCol: String = "text",
                         idCol: String = "doc_id",
                         shingle: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold in (0, 1], got $threshold")
    val spark = batch.sparkSession
    import graft.ops.Stage.resolve
    // one resolve per component, shared by candidates and verification —
    // the torn-read rule (a concurrent rebuild must not split a probe
    // across generations)
    val postings = spark.read.parquet(resolve(spark, s"$path/postings"))
    val corpusSets = spark.read.parquet(resolve(spark, s"$path/sets"))
    def ckpt(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()
    val bSets = ckpt(setSimSets(batch, textCol, idCol, shingle))
    val bGrams = bSets.select(col("doc"), col("l"),
      explode(col("grams")).as("g"))
    // CURRENT corpus df for the batch's grams only (unseen grams → 0,
    // i.e. rarest — they can't produce candidates anyway)
    val gdf = postings.join(
        bGrams.select(col("g")).distinct(), Seq("g"))
      .groupBy("g").agg(count(lit(1)).as("gdf"))
    val prefix = ckpt(bGrams
      .join(gdf, Seq("g"), "left")
      .na.fill(0L, Seq("gdf"))
      .groupBy("doc", "l")
      .agg(array_sort(collect_list(struct(col("gdf"), col("g")))).as("ord"))
      .withColumn("p",
        col("l") - floor(lit(threshold) * col("l") - lit(1e-9)).cast("int")
          + lit(1))
      .select(col("doc"), col("l"),
        explode(slice(col("ord"), lit(1), col("p").cast("int"))).as("e"))
      .select(col("doc"), col("l"), col("e.g").as("g")))
    val cand = prefix.as("b")
      .join(postings.as("c"),
        col("b.g") === col("c.g") &&
          least(col("b.l"), col("c.l")) >=
            lit(threshold) * greatest(col("b.l"), col("c.l")) - lit(1e-9))
      .select(col("b.doc").as("doc_batch"), col("c.doc").as("doc_corpus"))
      .distinct()
    cand
      .join(bSets.select(col("doc").as("doc_batch"), col("grams").as("g_b")),
        Seq("doc_batch"))
      .join(corpusSets.select(col("doc").as("doc_corpus"),
        col("grams").as("g_c")), Seq("doc_corpus"))
      .select(col("doc_batch"), col("doc_corpus"),
        graft.functions.SetExpressions
          .sortedSetJaccard(col("g_b"), col("g_c")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Delete CONTENT from a [[saveSetSimIndex]] index — keyed by gram-set
    * hash like [[deleteContentFromMinhashManifest]] (this content must
    * no longer be recognized); anti-join rewrite of both components
    * under the root lease, atomic per component. */
  def deleteContentFromSetSimIndex(deleted: DataFrame, textCol: String,
                                   path: String, shingle: Int = 3): Unit = {
    val spark = deleted.sparkSession
    graft.ops.Stage.withWriterLease(spark, path) {
      graft.ops.Stage.sweepUncommitted(spark, path, Seq("sets", "postings"))
      import graft.ops.Stage.{publishRewrite, resolve}
      val delKeys = deleted.where(col(textCol).isNotNull)
        .select(xxhash64(array_sort(transform(
          wordNgrams(col(textCol), shingle), g => xxhash64(g)))).as("seth"))
        .distinct()
      val live = spark.read.parquet(resolve(spark, s"$path/sets"))
        .withColumn("seth", xxhash64(col("grams")))
      val removed = live.join(delKeys, Seq("seth")).select("doc")
      publishRewrite(spark, s"$path/postings",
        spark.read.parquet(resolve(spark, s"$path/postings"))
          .join(removed, Seq("doc"), "left_anti"))
      publishRewrite(spark, s"$path/sets",
        live.join(delKeys, Seq("seth"), "left_anti").drop("seth"))
    }
  }

  /** Canonicalize a noisy string VALUE DOMAIN: connected components over
    * the [[editDistanceJoin]] graph (values within `maxDist` edits are
    * the same entity), each cluster represented by its lexicographically
    * smallest member. Output: one row per DISTINCT non-null `strCol`
    * value — (`strCol`, canonical) — for the caller to equi-join back
    * onto rows (the record-linkage loop closed: candidate → verify →
    * cluster → canonical). Transitive by design: "color" ~ "colour" ~
    * "colouur" collapse together even when the endpoints exceed
    * `maxDist`, which is what entity resolution wants and what a plain
    * pair list cannot give.
    */
  def fuzzyCanonicalize(df: DataFrame, strCol: String,
                        maxDist: Int = 2, q: Int = 2): DataFrame = {
    val nodes = df.select(col(strCol).as("id"))
      .where(col("id").isNotNull).distinct()
    val edges = editDistanceJoin(df, strCol, maxDist, q)
      .select(col("name_a").as("src"), col("name_b").as("dst"))
    connectedComponents(nodes, edges)
      .select(col("id").as(strCol), col("comp").as("canonical"))
  }
}
