package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact / normalized / incremental / chunk-and-substring deduplication.
  * One family of [[Dedup]] — the object is assembled from the
  * per-family traits (graft.ext.Dedup*.scala) so each file stays
  * reviewable; call sites are unchanged.
  */
trait DedupExactOps {

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

}
