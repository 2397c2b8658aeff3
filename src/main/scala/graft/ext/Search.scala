package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus search operators: BM25 ranked retrieval and exact all-pairs
  * cosine similarity with prefix filtering. Both are built from the same
  * inverted-index primitives (token explode → tf/df aggregates) the TF-IDF
  * query (q24) uses, and both keep the corpus un-self-joined: BM25 never
  * pairs documents at all, and APSS pairs them only through the
  * df-ascending prefix index that the Bayardo et al. (WWW'07) bound proves
  * lossless.
  */
object Search {

  /** BM25 top-k ranked retrieval for a fixed term set, rational-idf
    * variant: idf'(t) = (N − df + 0.5)/(df + 0.5), i.e. Robertson idf
    * without the log. The log is omitted DELIBERATELY: ln() is not
    * required to be correctly rounded, so engine/oracle replays could
    * differ in the last ulp; every operation here (integer casts, one
    * division per factor, fixed-order sums) is IEEE-exact-identical in
    * any engine. Documented as a variant — per-term monotone in tf and
    * anti-monotone in df exactly like BM25, but the cross-term weighting
    * is steeper than the logged form.
    *
    * Scale shape: the token explode is filtered to the |terms| query
    * tokens BEFORE any exchange (the post-explode filter runs map-side),
    * so the tf shuffle carries only matching (doc, term) rows — at 100 TB
    * that is the posting list, not the corpus. df (≤ |terms| rows) and
    * the one-row corpus stats enter as broadcasts; N comes from the same
    * job, never a driver-side count(). The per-document score is a pivot
    * over the fixed term set — max(when) per term then a FIXED-ORDER
    * left-assoc sum, so no nondeterministic double accumulation ever
    * happens. Top-k is orderBy+limit → TakeOrderedAndProject (per-partition
    * heap + driver merge of k rows), never a global sort.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               idCol: String = "doc_id", textCol: String = "text",
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // NULL-text documents are not part of the searchable corpus: they
    // can never match a term, and counting them in n_docs/avgdl would
    // shift every surviving document's idf and length normalization
    val live = docs.where(col(textCol).isNotNull)
    val toks = live
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .where(col("token").isInCollection(terms))
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val stats = live.agg(count(lit(1)).as("n_docs"),
      sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("total_tokens"))
    val dl = live.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("dl"))
    scoreBm25(tf, dl, stats, terms, k, idCol, k1, b)
  }

  /** The shared BM25 scoring tail over a (doc, term, tf) relation plus
    * doc lengths and one-row corpus stats — the fresh-compute path
    * ([[bm25TopK]]) and the index-served path ([[bm25TopKIndexed]]) must
    * produce bit-identical scores, so they share this to the letter.
    * df is re-aggregated from tf (one distinct (doc, term) row each) —
    * never a second corpus pass.
    */
  private def scoreBm25(tf: DataFrame, dl: DataFrame, stats: DataFrame,
                        terms: Seq[String], k: Int, idCol: String,
                        k1: Double, b: Double): DataFrame = {
    require(terms.nonEmpty && terms.size == terms.distinct.size,
      "BM25 needs a non-empty, duplicate-free term set")
    // case-INSENSITIVELY distinct too: the per-term pivot columns
    // (c_<term>) resolve case-insensitively under Spark's default
    // spark.sql.caseSensitive=false, so ("Apple", "apple") would die
    // deep in planning with AMBIGUOUS_REFERENCE instead of here
    require(terms.map(_.toLowerCase).distinct.size == terms.size,
      s"terms collide case-insensitively (column resolution is " +
        s"case-insensitive): $terms")
    require(terms.forall(_.matches("[A-Za-z0-9_]+")),
      s"terms become per-term output columns (c_<term>) — identifier-safe " +
        s"tokens only, got $terms")
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(dfreq), Seq("token"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("dl"), col("token"),
        // every paren mirrored verbatim in the oracle SQL — the doubles
        // must come out bit-identical, not just close
        (((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) *
          ((col("tf").cast("double") * lit(k1 + 1.0)) /
            (col("tf").cast("double") + lit(k1) *
              (lit(1.0 - b) + lit(b) *
                (col("dl").cast("double") /
                  (col("total_tokens").cast("double") /
                    col("n_docs").cast("double"))))))).as("c"))
    // pivot over the fixed term set: max(when) per term is order-safe on
    // doubles, and the final sum is a fixed left-assoc expression
    val aggs = terms.map(t =>
      coalesce(max(when(col("token") === t, col("c"))), lit(0.0)).as(s"c_$t"))
    val perDoc = contrib.groupBy(col(idCol), col("dl"))
      .agg(aggs.head, aggs.tail: _*)
    val scored = perDoc.withColumn("score",
      terms.map(t => col(s"c_$t")).reduceLeft(_ + _))
    val top = scored.orderBy(col("score").desc, col(idCol)).limit(k)
    // rank stamped AFTER the limit: the window sees k rows, not the corpus
    val w = Window.orderBy(col("score").desc, col(idCol))
    top.withColumn("rank", row_number().over(w))
      .orderBy("rank")
  }

  /** Persist the retrieval index [[bm25TopKIndexed]] and
    * [[conjunctiveSearch]] serve from, so query batches never re-tokenize
    * the corpus — the build is one corpus pass, amortized over every
    * later query (the q82-IVF / q91-LM "build once, serve many" shape,
    * applied to text retrieval). Layout (all parquet):
    *
    *  - `postings/`: (token, doc_id, tf) sorted by token within files, so
    *    a term-filtered read prunes row groups on the token min/max and
    *    the scan carries only the query terms' posting lists;
    *  - `doclens/`: (doc_id, dl);
    *  - `stats/`: ADDITIVE rows summing to (n_docs, total_tokens) — a
    *    fresh build writes one; each appended batch adds one. Serving
    *    sums them ([[readStats]]), so growing the index never
    *    read-modify-writes a stats file (the step a replayed batch would
    *    double-count).
    *
    * df needs no table of its own: postings rows are distinct (token,
    * doc) pairs, so df(t) is a count over the already-filtered postings.
    */
  /** The index's LIVE component set: the base (postings, doclens, stats)
    * triple, plus `positions` when the positional component
    * ([[savePositionalIndex]]) exists at this path. Every maintenance op
    * — append (plain and exactly-once), delete, tombstone fold, compact,
    * snapshot, restore, vacuum — moves the positional component together
    * with the rest, so an ingest-maintained index phrase-serves the full
    * corpus without a positional rebuild. The existence probe is one
    * metadata call; maintenance ops run it once under the root writer
    * lease they already hold, so the set cannot change mid-op
    * (single-writer contract).
    */
  private[ext] def textComponents(spark: org.apache.spark.sql.SparkSession,
                                  path: String): Seq[String] = {
    val base = Seq("postings", "doclens", "stats")
    val p = new org.apache.hadoop.fs.Path(s"$path/positions")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) base :+ "positions" else base
  }

  /** The positional-posting relation for one document batch — the shape
    * both the fresh build ([[savePositionalIndex]]) and every append
    * path write, so grown and fresh-built components are
    * file-layout-identical: (token, doc_id, sorted 0-based positions),
    * token-sorted within files for row-group pruning. */
  private def positionalPostings(docs: DataFrame, idCol: String,
                                 textCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "token")))
      .groupBy(col("token"), col(idCol))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
      .repartition(col("token")).sortWithinPartitions("token", idCol)

  /** The ONE postings build plan shared by the fresh build and both
    * append paths — the bit-identity contract (grown index ≡ fresh
    * build) lives or dies on these staying literally the same plan.
    * NULL-text rows are excluded throughout the index family: they can
    * never match a query, and counting them in n_docs/avgdl would shift
    * every BM25 score (the [[graft.ext.Corpus.saveLm]] guard). */
  private def postingsOf(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col(idCol)).agg(count(lit(1)).as("tf"))
      .repartition(col("token")).sortWithinPartitions("token", idCol)

  /** The doclens sibling of [[postingsOf]] — same sharing argument,
    * same NULL-text exclusion. */
  private def doclensOf(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("dl"))

  def saveTextIndex(docs: DataFrame, path: String,
                    idCol: String = "doc_id", textCol: String = "text"): Unit = {
    // a rebuild starts a fresh streaming lineage: stale exactly-once
    // markers would silently no-op the new stream's first batches, and a
    // stale tombstone table would mask the new corpus's documents
    graft.ops.Stage.clearLedger(docs.sparkSession, path)
    graft.ops.Stage.clearTombstones(docs.sparkSession, path)
    // the POSITIONAL component is the old corpus's too: left in place it
    // would phrase-serve corpus-A hits for a corpus-B index, and the
    // next append would MIX corpora into it (textComponents would still
    // report it). A rebuild drops it; run savePositionalIndex again to
    // re-enable phrase/proximity serving over the new corpus.
    val posPath = new org.apache.hadoop.fs.Path(s"$path/positions")
    posPath.getFileSystem(docs.sparkSession.sparkContext.hadoopConfiguration)
      .delete(posPath, true)
    // tokenization amplifies each doc row ~|tokens|×; spread a compact
    // scan before it (Tables.spreadAmplified scaladoc — the measured
    // sf1 campaign-build straggler)
    val spread = graft.ops.Tables.spreadAmplified(
      docs.select(col(idCol), col(textCol)), col(idCol))
    postingsOf(spread, idCol, textCol)
      .write.mode("overwrite").parquet(s"$path/postings")
    doclensOf(spread, idCol, textCol)
      .write.mode("overwrite").parquet(s"$path/doclens")
    batchStats(spread, textCol)
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Append a new ingest batch to a [[saveTextIndex]] index without
    * rebuilding: document postings are per-doc disjoint, so the batch's
    * lists land as new files (append mode) and BM25's corpus statistics
    * are plain sums — the grown index serves bit-identically to a fresh
    * build over the union. Batch-sized work only; the one-row stats
    * update is the only driver-side read (constant by construction).
    * Under the ROOT writer lease, like the exactly-once variant: an
    * unleased append racing a [[snapshotTextIndex]] pin could hand the
    * pin a torn (partially committed) file list.
    */
  def appendToTextIndex(batch: DataFrame, path: String,
                        idCol: String = "doc_id",
                        textCol: String = "text"): Unit = {
    val spark = batch.sparkSession
    graft.ops.Stage.withWriterLease(spark, path) {
    val comps = textComponents(spark, path)
    // like the streaming shells, an index CREATED by this append is born
    // versioned, so snapshot pins work from the first batch
    comps.foreach(c =>
      graft.ops.Stage.ensureVersioned(spark, s"$path/$c"))
    postingsOf(batch, idCol, textCol)
      .write.mode("append").parquet(graft.ops.Stage.resolve(spark, s"$path/postings"))
    doclensOf(batch, idCol, textCol)
      .write.mode("append").parquet(graft.ops.Stage.resolve(spark, s"$path/doclens"))
    // stats are ADDITIVE rows: the batch contributes one more, and
    // serving sums ([[readStats]]) — no read-modify-write, no collect.
    // On the FIRST batch of a streaming ingest this append also CREATES
    // the index.
    batchStats(batch, textCol).write.mode("append")
      .parquet(graft.ops.Stage.resolve(spark, s"$path/stats"))
    // positional component, when present: new documents' posting rows
    // are disjoint from existing ones, so the batch lands as new files —
    // the same per-doc-disjoint argument as postings
    if (comps.contains("positions"))
      positionalPostings(batch, idCol, textCol).write.mode("append")
        .parquet(graft.ops.Stage.resolve(spark, s"$path/positions"))
    }
  }

  /** One additive stats row for a batch (coalesce: zero docs must still
    * produce a (0, 0) row, and sum() over nothing is NULL). */
  private def batchStats(batch: DataFrame, textCol: String): DataFrame =
    batch.where(col(textCol).isNotNull)
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(TextAnalysis.tokenCount(col(textCol)).cast("long")), lit(0L))
          .as("total_tokens"))

  /** The index's corpus stats as ONE row. No tombstones pending (None):
    * the sum of the additive stats rows (identity on a fresh single-row
    * build) — never a doclens pass. Tombstones pending: aggregated from
    * the caller's TOMBSTONE-FILTERED doclens relation — the same
    * relation the scorer's dl join uses, so stats and doc lengths derive
    * from ONE consistent source in every compaction crash window (a
    * stats-table subtraction would double- or under-count when a crash
    * lands between the doclens fold and the stats recompute). One extra
    * aggregate over a relation serving already scans, and only while
    * deletes are pending.
    */
  private def readStats(statsRows: DataFrame,
                        filteredDoclens: Option[DataFrame]): DataFrame =
    filteredDoclens match {
      case Some(dl) =>
        dl.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("dl")), lit(0L)).as("total_tokens"))
      case None =>
        statsRows
          .agg(sum(col("n_docs")).as("n_docs"),
            sum(col("total_tokens")).as("total_tokens"))
    }

  /** [[appendToTextIndex]] with EXACTLY-ONCE semantics for streaming
    * ingest, via the shared ledger protocol
    * ([[graft.ops.Stage.appendExactlyOnce]] — marker check, batch-scoped
    * staging, deterministic `b<batchId>-*` publish; every crash window
    * replays safely, see its scaladoc). Like
    * [[graft.ops.Sinks.streamJdbcExactlyOnce]], batch ids are only
    * meaningful relative to ONE durable checkpoint lineage.
    *
    * Scale: identical plan to [[appendToTextIndex]] (batch-sized), plus
    * one file listing + |files| renames per component — metadata work,
    * no second data pass.
    */
  def appendToTextIndexExactlyOnce(batch: DataFrame, path: String,
                                   batchId: Long, idCol: String = "doc_id",
                                   textCol: String = "text"): Unit = {
    // LAZY so the component-existence probe first runs INSIDE the writer
    // lease appendExactlyOnce acquires (its `components` param is by-name)
    // — probing before the lease would let a concurrent
    // enablePositionalIndex race the probe, violating textComponents'
    // documented under-the-lease invariant
    lazy val comps = textComponents(batch.sparkSession, path)
    graft.ops.Stage.appendExactlyOnce(batch.sparkSession, path, batchId,
      comps) { staging =>
      postingsOf(batch, idCol, textCol)
        .write.mode("overwrite").parquet(s"$staging/postings")
      doclensOf(batch, idCol, textCol)
        .write.mode("overwrite").parquet(s"$staging/doclens")
      batchStats(batch, textCol).write.mode("overwrite")
        .parquet(s"$staging/stats")
      if (comps.contains("positions"))
        positionalPostings(batch, idCol, textCol).write.mode("overwrite")
          .parquet(s"$staging/positions")
    }
  }

  /** Delete documents from a [[saveTextIndex]] index — the
    * right-to-be-forgotten path, IMMEDIATE form: the ids land as
    * tombstones first (batch-sized, atomic append) and a compaction
    * fold turns them physical in the same call. The two-step shape is
    * what makes the multi-component delete CRASH-SAFE: the per-component
    * publishes cannot be atomic as a group, and a bare anti-join rewrite
    * that died between the postings publish and the stats publish would
    * serve post-delete postings against pre-delete idf/avgdl — silently
    * wrong scores with nothing demanding a retry. With the tombstone
    * down first, every crash window serves the tombstone-MASKED index
    * (exact — [[readStats]] recomputes from the filtered doclens), and
    * re-running converges. Index-sized work, never a corpus
    * re-tokenization; serving afterwards is bit-identical to a fresh
    * build over the remaining corpus.
    */
  def deleteFromTextIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String, ids: DataFrame,
                          idCol: String = "doc_id"): Unit = {
    tombstoneFromTextIndex(spark, path, ids.select(col(idCol)).distinct(),
      idCol)
    compactTextIndex(spark, path, idCol)
  }

  /** Compact a [[saveTextIndex]] index after a run of per-batch appends.
    * Streaming ingest accumulates one file set per micro-batch
    * (`b<batchId>-*` from the exactly-once publish, plain part files from
    * batch appends): after thousands of micro-batches every query pays
    * file-listing over thousands of entries and reads tiny row groups
    * whose token min/max prune poorly. One index-sized rewrite restores
    * the fresh-build layout:
    *
    *  - postings: re-sorted `repartition(token)` + token-ordered files —
    *    the exact builder shape, so row-group pruning works again; file
    *    count from [[graft.ops.Stage.compactionPartitions]] (live bytes /
    *    `maxPartitionBytes`);
    *  - doclens: coalesced the same way (no sort contract);
    *  - stats: the additive rows FOLD INTO ONE — [[readStats]] sums them,
    *    so the fold is exact (long addition) and serving is unchanged.
    *
    * Each component publishes atomically ([[graft.ops.Stage.publishRewrite]]):
    * a crash mid-compaction leaves the fragmented-but-correct index
    * serving. Serving before and after is bit-identical (per-document
    * scores are fixed-order expressions over per-(doc, term) rows whose
    * multiset the rewrite preserves — SearchSpec pins it).
    */
  def compactTextIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String, idCol: String = "doc_id"): Unit =
      graft.ops.Stage.withWriterLease(spark, path) {
    import graft.ops.Stage.{compactionPartitions, publishRewrite, resolve}
    val comps = textComponents(spark, path)
    // partial leavings of a crashed mid-publish batch must NOT fold —
    // anonymized into part files, the replay's prefix sweep couldn't
    // remove them and the batch would land twice
    graft.ops.Stage.sweepUncommitted(spark, path, comps)
    // pending tombstones FOLD here: postings/doclens drop the tombstoned
    // documents, stats recompute from the surviving doclens (the
    // immediate-delete recipe), then exactly the consumed tombstone
    // files reset (keys appended mid-fold stay pending)
    val snap = graft.ops.Stage.tombstoneSnapshot(spark, path)
    val tomb = snap.map(_._1)
    val nPost = compactionPartitions(spark, s"$path/postings")
    publishRewrite(spark, s"$path/postings") { versionDir =>
      minusTombstoned(spark.read.parquet(resolve(spark, s"$path/postings")),
        tomb, idCol)
        .repartition(nPost, col("token")).sortWithinPartitions("token", idCol)
        .write.mode("overwrite").parquet(versionDir)
    }
    val nLens = compactionPartitions(spark, s"$path/doclens")
    publishRewrite(spark, s"$path/doclens",
      minusTombstoned(spark.read.parquet(resolve(spark, s"$path/doclens")),
        tomb, idCol).repartition(nLens))
    publishRewrite(spark, s"$path/stats",
      spark.read.parquet(resolve(spark, s"$path/doclens")) // post-fold lens
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("dl")), lit(0L)).as("total_tokens"))
        .repartition(1))
    if (comps.contains("positions")) {
      // same fold for the positional lists: tombstones drop, fragments
      // re-sort to the builder's token-ordered layout
      val nPos = compactionPartitions(spark, s"$path/positions")
      publishRewrite(spark, s"$path/positions") { versionDir =>
        minusTombstoned(
          spark.read.parquet(resolve(spark, s"$path/positions")),
          tomb, idCol)
          .repartition(nPos, col("token")).sortWithinPartitions("token", idCol)
          .write.mode("overwrite").parquet(versionDir)
      }
    }
    graft.ops.Stage.resetTombstones(spark, path,
      snap.map(_._2).getOrElse(Nil))
    graft.ops.Stage.compactLedger(spark, path)
  }

  /** [[compactTextIndex]] when the index has fragmented past
    * `maxFilesPerComponent` live files in any component
    * ([[graft.ops.Stage.shouldCompact]]); otherwise a metadata-only
    * listing. The self-maintenance hook for long-running streaming
    * ingest — each exactly-once batch publishes ≥1 file per component,
    * so a `foreachBatch` sink calls this after its append and file
    * counts stay bounded without an operator remembering to compact.
    * Returns whether a compaction ran.
    */
  def autoCompactTextIndex(spark: org.apache.spark.sql.SparkSession,
                           path: String, maxFilesPerComponent: Int = 64,
                           idCol: String = "doc_id"): Boolean = {
    val go = graft.ops.Stage.shouldCompact(spark, path,
      textComponents(spark, path), maxFilesPerComponent)
    if (go) compactTextIndex(spark, path, idCol)
    go
  }

  /** TOMBSTONE documents in a [[saveTextIndex]] index — the batched
    * alternative to [[deleteFromTextIndex]], whose anti-join rewrite pays
    * index-sized work per call (the manifest's pre-tombstone problem,
    * here). The delete appends its id set to `tombstones/` (batch-sized);
    * serving consults the pending ids — postings and doclens anti-join
    * them (broadcast — the filtered posting lists are already
    * query-term-sized), and corpus stats subtract the tombstoned
    * documents' doclens contribution ([[readStats]]), so BM25 idf/avgdl
    * reflect the deletion immediately and exactly. [[compactTextIndex]]
    * folds the tombstones into a physical delete on the compaction
    * schedule. Serve-equivalent to the immediate delete at every point
    * (SearchSpec pins it; q117 pins it against q105's oracle).
    */
  def tombstoneFromTextIndex(spark: org.apache.spark.sql.SparkSession,
                             path: String, ids: DataFrame,
                             idCol: String = "doc_id"): Unit =
    graft.ops.Stage.appendTombstones(ids.select(col(idCol)), path)

  /** `rel` minus tombstoned documents (identity when nothing is
    * pending). Broadcast anti-join — the pending set is small by the
    * drip-feed contract. Callers load [[graft.ops.Stage.pendingTombstones]]
    * ONCE per query and thread it through, so the serve path pays one
    * pointer-resolve + listing, not one per relation. */
  private def minusTombstoned(rel: DataFrame, tomb: Option[DataFrame],
                              idCol: String): DataFrame =
    tomb match {
      case Some(t) =>
        rel.join(t.withColumnRenamed(t.columns.head, idCol),
          Seq(idCol), "left_anti")
      case None => rel
    }

  /** BM25 served from a [[saveTextIndex]] index — bit-identical to
    * [[bm25TopK]] over the same corpus (shared scoring tail), but the
    * per-query cost is the query terms' posting lists plus the doc-length
    * relation, never a corpus tokenization. Pending tombstones are
    * excluded from postings, doclens, and the corpus stats.
    */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                      terms: Seq[String], k: Int, idCol: String = "doc_id",
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // tombstones BEFORE the data resolve (the linearizable ordering —
    // see Stage.tombstoneSnapshot)
    val tomb = graft.ops.Stage.pendingTombstones(spark, path)
    def live(c: String) = graft.ops.Stage.resolve(spark, s"$path/$c")
    serveBm25(spark, live("postings"), live("doclens"), live("stats"),
      tomb, terms, k, idCol, k1, b)
  }

  /** [[bm25TopKIndexed]] from the PREVIOUS index snapshot — the version a
    * maintenance op (delete, compaction) superseded, which the versioned
    * publish keeps for one cycle anyway ([[graft.ops.Stage.resolvePrevious]]).
    * The validation read of the maintenance story: serve the pre-op
    * snapshot next to the live index and diff before trusting the op —
    * at zero extra storage, because the grace version already exists for
    * in-flight readers. Fails loudly when any component lacks a previous
    * version (plain layout, or only one publish so far), and the window
    * is ONE publish cycle — the next maintenance op GCs the snapshot.
    *
    * PENDING tombstones still apply: a right-to-be-forgotten request
    * must hold for snapshot reads too, so the anti-join filters the
    * previous snapshot exactly as it filters the live one (only
    * already-FOLDED deletes are visible again — they are part of the
    * superseded physical state this read exists to inspect).
    */
  def bm25TopKIndexedPrevious(spark: org.apache.spark.sql.SparkSession,
                              path: String, terms: Seq[String], k: Int,
                              idCol: String = "doc_id", k1: Double = 1.2,
                              b: Double = 0.75): DataFrame = {
    val tomb = graft.ops.Stage.pendingTombstones(spark, path)
    def prev(c: String) = graft.ops.Stage
      .resolvePrevious(spark, s"$path/$c")
      .getOrElse(throw new IllegalStateException(
        s"$path/$c has no previous snapshot to serve — previous-serving " +
          "needs at least two publishes (the single-writer maintenance " +
          "history moves all components together)"))
    serveBm25(spark, prev("postings"), prev("doclens"), prev("stats"),
      tomb, terms, k, idCol, k1, b)
  }

  /** Pin the index's current state under a NAMED snapshot — retention
    * beyond [[bm25TopKIndexedPrevious]]'s one-publish-cycle validation
    * window ([[graft.ops.Stage.snapshot]] per component, one shared
    * name). The pinned versions survive every later maintenance op's GC
    * until [[dropTextIndexSnapshot]] releases them, so an operator can
    * hold the pre-campaign state across a whole run of deletes and
    * compactions and keep diffing against it. Components move together
    * under the single-writer contract, so one name pins a CONSISTENT
    * (postings, doclens, stats) triple. Requires a versioned layout —
    * snapshot after the first maintenance op (or compact once first).
    */
  def snapshotTextIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String, name: String): Unit =
    // root lease: the three pins must capture ONE maintenance state — a
    // concurrent delete landing between pins would freeze a mixed
    // (pre-op postings, post-op doclens) triple that scores wrong
    graft.ops.Stage.withWriterLease(spark, path) {
      val comps = textComponents(spark, path)
      // a crashed batch's doomed partials must not be pinned (the pin
      // records file lists; a later sweep would dangle them)
      graft.ops.Stage.sweepUncommitted(spark, path, comps)
      comps.foreach(c =>
        graft.ops.Stage.snapshot(spark, s"$path/$c", name))
    }

  /** ROLL the live index BACK to a [[snapshotTextIndex]] pin
    * ([[graft.ops.Stage.restoreSnapshot]] per component, under the root
    * lease so the three components flip as ONE maintenance state) — the
    * undo for a delete/compaction campaign [[bm25MaintenanceDiff]]
    * flagged as wrong. All three components are checked for the pin
    * BEFORE any is restored, so a typo'd name fails loudly instead of
    * leaving a mixed (restored postings, live doclens) index. The pin
    * survives (restore consumes nothing); pending tombstones keep
    * masking (a post-pin forget still holds), but a forget whose
    * tombstone was already COMPACTED away is resurrected — re-issue it
    * if it must outlive the rollback. A crash mid-restore leaves some
    * components rolled back and others not; rerunning the restore
    * converges (each component restore is an atomic pointer flip).
    */
  def restoreTextIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String, name: String): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      val comps = textComponents(spark, path)
      val missing = comps.filter(c =>
        graft.ops.Stage.resolveSnapshot(spark, s"$path/$c", name).isEmpty)
      require(missing.isEmpty,
        s"snapshot '$name' does not pin component(s) " +
          s"${missing.mkString(", ")} of $path — nothing restored")
      comps.foreach(c =>
        graft.ops.Stage.restoreSnapshot(spark, s"$path/$c", name))
    }

  /** Release a [[snapshotTextIndex]] pin; the pinned versions become
    * ordinary GC candidates at the next publish — or immediately via
    * [[vacuumTextIndex]]. */
  def dropTextIndexSnapshot(spark: org.apache.spark.sql.SparkSession,
                            path: String, name: String): Unit =
    textComponents(spark, path).foreach(c =>
      graft.ops.Stage.dropSnapshot(spark, s"$path/$c", name))

  /** Reclaim the index's stale versions now ([[graft.ops.Stage.vacuum]]
    * per component) — the storage release after dropping a pin, without
    * waiting for the next maintenance op's publish. */
  def vacuumTextIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String): Unit =
    textComponents(spark, path).foreach(c =>
      graft.ops.Stage.vacuum(spark, s"$path/$c"))

  /** Maintenance DIFF of the index's two serveable states: PREVIOUS
    * (the snapshot the last maintenance op superseded) vs LIVE, as one
    * per-document report — the first-class form of the validation
    * workflow the previous-serving exists for ("serve the pre-op
    * snapshot next to the live one and diff before trusting the op").
    * One row per document in either top-k: its score/rank on each side
    * and a status — `dropped` (left the top-k: deleted, or displaced),
    * `entered` (rose into it: the corpus-stats shift can promote),
    * `moved`, `held`. Cost: two top-k serves over posting-list-sized
    * scans plus a full outer join of two k-row relations — the join is
    * broadcast-trivial; the report is what an operator reads BEFORE
    * letting a delete's effect stand (q128 pins it against a DuckDB
    * replay of both rankings).
    */
  def bm25MaintenanceDiff(spark: org.apache.spark.sql.SparkSession,
                          path: String, terms: Seq[String], k: Int,
                          idCol: String = "doc_id", k1: Double = 1.2,
                          b: Double = 0.75): DataFrame = {
    val before = bm25TopKIndexedPrevious(spark, path, terms, k, idCol, k1, b)
      .select(col(idCol), col("score").as("score_before"),
        col("rank").as("rank_before"))
    val after = bm25TopKIndexed(spark, path, terms, k, idCol, k1, b)
      .select(col(idCol), col("score").as("score_after"),
        col("rank").as("rank_after"))
    before.join(after, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("rank_after").isNull, lit("dropped"))
          .when(col("rank_before").isNull, lit("entered"))
          .when(col("rank_before") =!= col("rank_after"), lit("moved"))
          .otherwise(lit("held")))
      .orderBy(idCol)
  }

  /** [[bm25TopKIndexed]] served from a NAMED snapshot — identical scoring
    * over the pinned (postings, doclens, stats) triple, any number of
    * maintenance ops later. Pending tombstones still apply, as in
    * previous-serving: a right-to-be-forgotten request holds for
    * snapshot reads too. Fails loudly on an unknown name.
    */
  def bm25TopKIndexedSnapshot(spark: org.apache.spark.sql.SparkSession,
                              path: String, name: String, terms: Seq[String],
                              k: Int, idCol: String = "doc_id",
                              k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tomb = graft.ops.Stage.pendingTombstones(spark, path)
    // pinned FILE LISTS, not directories: appends publish into the live
    // version dir, so a dir read of a pinned live version would absorb
    // post-pin batches (Stage.snapshot's whole point)
    def snap(c: String) = graft.ops.Stage
      .readSnapshot(spark, s"$path/$c", name)
      .getOrElse(throw new IllegalStateException(
        s"$path/$c has no snapshot named '$name' — pin one with " +
          "snapshotTextIndex before serving it"))
    serveBm25Frames(snap("postings"), snap("doclens"), snap("stats"),
      tomb, terms, k, idCol, k1, b)
  }

  /** The shared indexed-serve body over RESOLVED component directories —
    * live ([[bm25TopKIndexed]]), previous-snapshot
    * ([[bm25TopKIndexedPrevious]]), and named-snapshot
    * ([[bm25TopKIndexedSnapshot]]) serving must score identically, so
    * they share everything after version resolution.
    */
  private def serveBm25(spark: org.apache.spark.sql.SparkSession,
                        postingsDir: String, doclensDir: String,
                        statsDir: String, tomb: Option[DataFrame],
                        terms: Seq[String], k: Int, idCol: String,
                        k1: Double, b: Double): DataFrame =
    serveBm25Frames(spark.read.parquet(postingsDir),
      spark.read.parquet(doclensDir), spark.read.parquet(statsDir),
      tomb, terms, k, idCol, k1, b)

  /** [[serveBm25]] over already-materialized component relations — the
    * layer snapshot serving enters at (pinned FILE LISTS, not
    * directories, carry a snapshot's data — see
    * [[graft.ops.Stage.snapshot]]). */
  private def serveBm25Frames(postings: DataFrame, doclens: DataFrame,
                              statsRows: DataFrame, tomb: Option[DataFrame],
                              terms: Seq[String], k: Int, idCol: String,
                              k1: Double, b: Double): DataFrame = {
    val tf = minusTombstoned(
      postings.where(col("token").isInCollection(terms)), tomb, idCol)
    val dl = minusTombstoned(doclens, tomb, idCol)
    scoreBm25(tf, dl, readStats(statsRows, tomb.map(_ => dl)), terms,
      k, idCol, k1, b)
  }

  /** Conjunctive (AND-semantics) search from the same index: documents
    * containing EVERY query term, with match statistics. Pure posting-
    * list work — the distinct (token, doc) postings make the term count
    * a plain row count per document.
    */
  def conjunctiveSearch(spark: org.apache.spark.sql.SparkSession, path: String,
                        terms: Seq[String], idCol: String = "doc_id"): DataFrame = {
    // tombstones BEFORE the data resolve (the linearizable ordering —
    // see Stage.tombstoneSnapshot)
    val tomb = graft.ops.Stage.pendingTombstones(spark, path)
    serveConjunctive(spark,
      graft.ops.Stage.resolve(spark, s"$path/postings"), tomb, terms, idCol)
  }

  /** [[conjunctiveSearch]] from the PREVIOUS index snapshot — the same
    * validation read as [[bm25TopKIndexedPrevious]], for the index's
    * other serve path (only postings resolve back; pending tombstones
    * still mask the snapshot). */
  def conjunctiveSearchPrevious(spark: org.apache.spark.sql.SparkSession,
                                path: String, terms: Seq[String],
                                idCol: String = "doc_id"): DataFrame = {
    val tomb = graft.ops.Stage.pendingTombstones(spark, path)
    val postingsDir = graft.ops.Stage
      .resolvePrevious(spark, s"$path/postings")
      .getOrElse(throw new IllegalStateException(
        s"$path/postings has no previous snapshot to serve — " +
          "previous-serving needs at least two publishes"))
    serveConjunctive(spark, postingsDir, tomb, terms, idCol)
  }

  /** [[conjunctiveSearch]] from a NAMED snapshot — the same pinned-file
    * read as [[bm25TopKIndexedSnapshot]], for the index's other serve
    * path (only postings pin back; pending tombstones still mask). */
  def conjunctiveSearchSnapshot(spark: org.apache.spark.sql.SparkSession,
                                path: String, name: String,
                                terms: Seq[String],
                                idCol: String = "doc_id"): DataFrame = {
    val tomb = graft.ops.Stage.pendingTombstones(spark, path)
    val postings = graft.ops.Stage
      .readSnapshot(spark, s"$path/postings", name)
      .getOrElse(throw new IllegalStateException(
        s"$path/postings has no snapshot named '$name' — pin one with " +
          "snapshotTextIndex before serving it"))
    serveConjunctiveFrames(postings, tomb, terms, idCol)
  }

  private def serveConjunctive(spark: org.apache.spark.sql.SparkSession,
                               postingsDir: String, tomb: Option[DataFrame],
                               terms: Seq[String], idCol: String): DataFrame =
    serveConjunctiveFrames(spark.read.parquet(postingsDir), tomb, terms,
      idCol)

  private def serveConjunctiveFrames(postings: DataFrame,
                                     tomb: Option[DataFrame],
                                     terms: Seq[String],
                                     idCol: String): DataFrame = {
    require(terms.nonEmpty && terms.size == terms.distinct.size,
      "conjunctiveSearch needs a non-empty, duplicate-free term set")
    minusTombstoned(
      postings.where(col("token").isInCollection(terms)), tomb, idCol)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("n_occurrences"))
      .where(col("n_terms") === terms.size)
      .orderBy(idCol)
  }

  /** POSITIONAL postings for PHRASE queries: (token, doc_id, positions)
    * with each token's 0-based occurrence positions as a sorted array —
    * what [[conjunctiveSearch]]'s bag-of-words postings cannot answer
    * ("table hash" as a phrase, not two co-occurring terms). Written
    * beside the [[saveTextIndex]] components under `positions/`,
    * token-sorted within files for the same row-group pruning: a phrase
    * serve reads only its terms' lists. Positions add one integer per
    * TOKEN OCCURRENCE to the index — the standard positional-index size
    * trade (≈ index bytes ∝ corpus tokens, vs ∝ distinct (token, doc)
    * pairs without them). MAINTAINED component: once it exists, every
    * text-index maintenance op moves it with the rest
    * ([[textComponents]] — appends add the batch's positional rows,
    * deletes anti-join it, compaction folds tombstones and re-sorts,
    * snapshot/restore pin and roll it with the triple), so phrase serves
    * never lag ingest. Call it right after [[saveTextIndex]] in the
    * fresh-build phase. BORN VERSIONED ([[graft.ops.Stage.publishRebuild]],
    * like [[graft.ext.Similarity.saveIvfIndex]] / [[graft.ext.Corpus.saveLm]]):
    * a fresh positional build lands as the next version of `positions/`
    * instead of wiping any existing versioned history, so snapshot pins
    * work from birth and a re-build over an already-maintained component
    * does not destroy the pointer/GC line. As with every rebuild publish,
    * `resolvePrevious` fails loudly afterwards until a post-rebuild
    * maintenance op establishes a same-corpus history.
    *
    * SNAPSHOT-PIN CONSEQUENCE (documented behavior change): enabling the
    * positional component makes [[textComponents]] — and therefore
    * [[restoreTextIndex]]'s all-components-pinned check — include
    * `positions`, so a [[snapshotTextIndex]] pin taken BEFORE the
    * component existed (a triple-only pin) becomes unrestorable once
    * positions exist: restore fails loudly rather than roll back a mixed
    * (pinned triple, live positions) state. Re-pin after enabling
    * positions if rollback coverage must span the transition.
    */
  def savePositionalIndex(docs: DataFrame, path: String,
                          idCol: String = "doc_id",
                          textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    // root lease first (the established root→component nesting order,
    // same as deleteFromTextIndex): a concurrent snapshot/append must
    // not interleave with the component flip
    graft.ops.Stage.withWriterLease(spark, path) {
      // pins deliberately SURVIVE this rebuild (unlike saveLm/savePqIndex,
      // which clear them): positions is a self-contained re-derivation of
      // the same index's corpus, restorable only TOGETHER with the triple
      // through restoreTextIndex — SearchSpec pins the
      // pin→rebuild→restore round trip. The cross-CORPUS stale-pin hazard
      // is closed at the true rebuild boundary instead: saveTextIndex
      // deletes the positional component outright.
      graft.ops.Stage.publishRebuild(spark, s"$path/positions",
        positionalPostings(docs, idCol, textCol))
    }
  }

  /** Opt an index into the positional component BEFORE any document
    * lands — the STREAM-BORN phrase path: creates an empty,
    * born-versioned `positions/`, so [[textComponents]] includes it from
    * the first exactly-once micro-batch and the stream-built index
    * phrase-serves without ever running [[savePositionalIndex]]. A
    * no-op on an index that already has the component. (A batch build
    * doesn't need this — call [[savePositionalIndex]] after
    * [[saveTextIndex]] instead.)
    */
  def enablePositionalIndex(spark: org.apache.spark.sql.SparkSession,
                            path: String): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      graft.ops.Stage.ensureVersioned(spark, s"$path/positions")
    }

  /** PHRASE SEARCH over a [[savePositionalIndex]] component: documents
    * containing the EXACT token sequence `phrase`, with occurrence
    * counts, top-k by (count desc, id). Adjacency is decided on posting
    * lists alone: for each phrase slot i the term's positions shift by
    * −i, and a phrase hit is a position present in EVERY shifted list —
    * computed as a codegen'd filter over the first term's array with
    * `array_contains` probes into the others (lists are occurrence-
    * sized; no token re-scan of any document). Cost: |phrase|
    * term-filtered pruned scans + |phrase|−1 doc_id equi-joins of
    * posting-list-sized relations + the per-row HOF — the classic
    * positional-intersection plan. Duplicate phrase terms are fine
    * (each SLOT joins its own aliased relation). Pending tombstones
    * mask, as on every serve path.
    */
  def phraseSearchIndexed(spark: org.apache.spark.sql.SparkSession,
                          path: String, phrase: Seq[String], k: Int,
                          idCol: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty, "phrase search needs at least one term")
    val tomb = graft.ops.Stage.pendingTombstones(spark, path)
    val positions = spark.read.parquet(
      graft.ops.Stage.resolve(spark, s"$path/positions"))
    // one aliased, term-filtered relation per phrase SLOT (not per
    // distinct term): the pushed filter prunes token-sorted row groups
    val slots = phrase.zipWithIndex.map { case (t, i) =>
      positions.where(col("token") === t)
        .select(col(idCol), col("positions").as(s"p_$i"))
    }
    val joined = slots.reduceLeft(_.join(_, Seq(idCol)))
    val isHit = (start: Column) => phrase.indices.tail
      .map(i => array_contains(col(s"p_$i"), start + lit(i)))
      .foldLeft(lit(true))(_ && _)
    val counted = joined.select(col(idCol),
        size(filter(col("p_0"), isHit)).as("n_occurrences"))
      .where(col("n_occurrences") > 0)
    val masked = minusTombstoned(counted, tomb, idCol)
    val top = masked.orderBy(col("n_occurrences").desc, col(idCol)).limit(k)
    val w = Window.orderBy(col("n_occurrences").desc, col(idCol))
    top.withColumn("rank", row_number().over(w)).orderBy("rank")
  }

  /** PROXIMITY SEARCH over the positional component: documents where
    * `termA` and `termB` co-occur within `maxDist` token positions —
    * the relaxed cousin of [[phraseSearchIndexed]]'s exact adjacency
    * (the "terms NEAR each other" operator of every classic IR engine),
    * which bag-of-words AND-search ([[conjunctiveSearch]]) cannot
    * express. Per qualifying document: the number of (posA, posB) pairs
    * within the window and the closest distance, top-k by
    * (n_pairs DESC, id). Decided on posting lists alone — one
    * term-filtered pruned scan per term (row-group pruned on the
    * token-sorted files), one doc_id equi-join of posting-list-sized
    * relations, and a per-row pair count as a codegen'd HOF over the
    * two position arrays (occurrence-sized per doc — the classic
    * positional-intersection cost); no token re-scan of any document.
    * Pending tombstones mask, as on every serve path.
    *
    * Output: (doc_id, n_pairs, min_dist, rank), rank 1..k.
    */
  def proximitySearchIndexed(spark: org.apache.spark.sql.SparkSession,
                             path: String, termA: String, termB: String,
                             maxDist: Int, k: Int,
                             idCol: String = "doc_id"): DataFrame = {
    require(termA != termB, "proximity needs two distinct terms")
    require(maxDist >= 1, s"maxDist must be positive: $maxDist")
    val tomb = graft.ops.Stage.pendingTombstones(spark, path)
    val positions = spark.read.parquet(
      graft.ops.Stage.resolve(spark, s"$path/positions"))
    def side(t: String, as: String) = positions.where(col("token") === t)
      .select(col(idCol), col("positions").as(as))
    val joined = side(termA, "pa").join(side(termB, "pb"), Seq(idCol))
    val pairs = joined.select(col(idCol),
      aggregate(col("pa"), lit(0L), (acc, a) =>
        acc + size(filter(col("pb"),
          b => abs(b - a) <= maxDist)).cast("long")).as("n_pairs"),
      // running-min fold, NEVER a materialized |pa|×|pb| cross-product
      // array: two 20k-occurrence stop-word-ish terms would otherwise
      // build a 400M-element array inside one row before array_min
      aggregate(col("pa"), lit(Long.MaxValue), (acc, a) =>
        least(acc, aggregate(col("pb"), lit(Long.MaxValue), (acc2, b) =>
          least(acc2, abs(b - a).cast("long"))))).as("min_dist"))
      .where(col("n_pairs") > 0L)
    val masked = minusTombstoned(pairs, tomb, idCol)
    val top = masked.orderBy(col("n_pairs").desc, col(idCol)).limit(k)
    val w = Window.orderBy(col("n_pairs").desc, col(idCol))
    top.withColumn("rank", row_number().over(w)).orderBy("rank")
  }

  /** RECIPROCAL RANK FUSION (Cormack, Clarke, Büttcher, SIGIR'09) — the
    * standard hybrid-retrieval combiner: two rankings of the same id
    * space (say BM25 and embedding cosine — lexical recall meets
    * semantic recall) fuse by score(d) = Σ_systems 1/(kRrf + rank_d),
    * summing only the systems that ranked d. Rank-based on purpose: the
    * systems' raw scores are incommensurable (BM25 sums vs cosines),
    * and RRF needs no calibration — the SIGIR'09 result is that it
    * beats learned score fusion surprisingly often. kRrf = 60 is the
    * paper's constant.
    *
    * Determinism: each fused score is at most two IEEE divisions added
    * in a fixed order, spelled identically in the replay — no float
    * hazard. Absent ranks surface as 0 (not NULL) so the output is
    * integer-exact everywhere.
    *
    * Scale shape: both inputs are top-k relations (k rows each, the
    * producers' scale contracts apply); the fusion is a full outer join
    * of two k-row relations plus one ≤2k-row window — driver-free and
    * broadcast-trivial.
    *
    * Inputs need columns (`idCol`, rank); output: (idCol, rank_a,
    * rank_b, rrf_score, rank), top `k` by (score DESC, id).
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k: Int,
              kRrf: Int = 60): DataFrame = {
    val ra = a.select(col(idCol), col("rank").as("rank_a"))
    val rb = b.select(col(idCol), col("rank").as("rank_b"))
    val fused = ra.join(rb, Seq(idCol), "full_outer")
      .select(col(idCol),
        coalesce(col("rank_a"), lit(0)).cast("long").as("rank_a"),
        coalesce(col("rank_b"), lit(0)).cast("long").as("rank_b"))
      .withColumn("rrf_score",
        when(col("rank_a") > 0, lit(1.0) / (lit(kRrf) + col("rank_a")))
          .otherwise(lit(0.0))
          + when(col("rank_b") > 0, lit(1.0) / (lit(kRrf) + col("rank_b")))
            .otherwise(lit(0.0)))
    val w = Window.orderBy(col("rrf_score").desc, col(idCol))
    fused.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k).orderBy("rank")
  }

  /** [[rrfFuse]] generalized to N rankings: lists join full-outer on id
    * IN THE GIVEN ORDER and each contributes 1/(kRrf + rank_i) (0 when
    * absent), summed left-to-right over the fixed list order — the same
    * fixed-association discipline as [[scoreBm25]]'s pivot sum, so the
    * fused double is bit-stable under any execution plan and replays
    * verbatim in an oracle that spells the additions in list order.
    * Output: (idCol, rank_1..rank_n, rrf_score, rank). Scale: n top-k
    * relations folded through n−1 k-row outer joins — broadcast-trivial.
    */
  def rrfFuseAll(lists: Seq[DataFrame], idCol: String, k: Int,
                 kRrf: Int = 60): DataFrame = {
    require(lists.size >= 2, s"rrfFuseAll needs >= 2 lists, got ${lists.size}")
    val ranked = lists.zipWithIndex.map { case (l, i) =>
      l.select(col(idCol), col("rank").cast("long").as(s"rank_${i + 1}"))
    }
    val joined = ranked.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val filled = lists.indices.foldLeft(joined)((df, i) =>
      df.withColumn(s"rank_${i + 1}",
        coalesce(col(s"rank_${i + 1}"), lit(0L))))
    val contribs = lists.indices.map(i =>
      when(col(s"rank_${i + 1}") > 0,
        lit(1.0) / (lit(kRrf) + col(s"rank_${i + 1}"))).otherwise(lit(0.0)))
    val fused = filled.withColumn("rrf_score", contribs.reduceLeft(_ + _))
    val w = Window.orderBy(col("rrf_score").desc, col(idCol))
    fused.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k).orderBy("rank")
  }

  /** Closest-vocabulary spelling correction for query terms — the
    * serving half of a did-you-mean / typo-tolerant retrieval front end:
    * the corpus vocabulary (with document frequencies — the same distinct
    * (doc, token) roll-up the BM25 df relation pays) is scanned ONCE
    * against the broadcast query terms; candidates within `maxDist`
    * Levenshtein edits rank by (distance, df DESC, term) and the best
    * survives. An in-vocabulary term corrects to itself at distance 0 —
    * nothing beats it. Terms with no candidate inside the budget come
    * back ABSENT (no row), never silently passed through: the caller
    * decides whether a hopeless term drops or fails the query.
    *
    * Scale shape: one corpus tokenize + distinct for the vocabulary
    * (shared with any BM25 build), then a |vocab| × |terms| map stage —
    * terms is a handful, so this is one pass with a broadcast; the
    * window orders |terms|-partitioned candidate slivers, never the
    * vocabulary. Output: (qterm, corrected, dist, df).
    */
  def spellCorrections(docs: DataFrame, queryTerms: Seq[String],
                       maxDist: Int = 2, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty &&
      queryTerms.size == queryTerms.distinct.size,
      "spellCorrections needs a non-empty, duplicate-free term list")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = docs
      .select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val qt = queryTerms.toDF("qterm")
    val cand = vocab.crossJoin(broadcast(qt))
      .withColumn("dist", levenshtein(col("qterm"), col("token")))
      .where(col("dist") <= maxDist)
    val w = Window.partitionBy("qterm")
      .orderBy(col("dist"), col("df").desc, col("token"))
    cand.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("qterm"), col("token").as("corrected"), col("dist"),
        col("df"))
  }

  /** Salient-term extraction for MORE-LIKE-THIS retrieval (the Lucene
    * MLT recipe's selection step): the source document's terms rank by
    * (tf in source DESC, corpus df ASC, term) — frequent HERE, rare
    * EVERYWHERE is exactly tf·idf's order without a float — and the top
    * `m` become the query. Downstream, each term retrieves its own BM25
    * list and [[rrfFuseAll]] fuses them: per-term lists + rank fusion
    * rather than one multi-term score, so every stage stays replayable.
    * Output: (token, tf, df, term_rank), `m` rows.
    *
    * Scale: source tf is one document's terms; corpus df is the shared
    * distinct (doc, token) roll-up; the join broadcasts the source side.
    */
  def moreLikeThisTerms(docs: DataFrame, srcId: Any, m: Int,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    require(m >= 1, s"m >= 1, got $m")
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val dfreq = toks.distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    // lit(srcId) keeps the comparison in the id column's OWN type:
    // every other API here is id-type-generic via idCol, and a
    // hard-typed Long would cast a string id column to bigint —
    // CAST_INVALID_INPUT under ANSI, silent empty-result with ANSI off
    val srcTf = toks.where(col(idCol) === lit(srcId))
      .groupBy("token").agg(count(lit(1)).as("tf"))
    val w = Window.orderBy(col("tf").desc, col("df").asc, col("token"))
    dfreq.join(broadcast(srcTf), Seq("token"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= m)
      .select(col("token"), col("tf"), col("df"),
        col("rn").as("term_rank"))
  }

  /** Exact all-pairs cosine similarity over distinct word n-gram shingle
    * sets at rational threshold tau = tauNum/tauDen, via prefix filtering
    * (Bayardo, Ma, Srikant — "Scaling Up All Pairs Similarity Search",
    * WWW'07): order each document's shingles by ascending global document
    * frequency (rarest first) and index only the first
    * p = n − ceil(tau²·n) + 1 of them. A candidate pair is generated when
    * a full set shares a token with another document's PREFIX; any pair
    * whose shared shingles all hide in both suffixes has
    * dot ≤ min(ceil(tau²·n₁), ceil(tau²·n₂)) − 1 < tau·sqrt(n₁·n₂), so
    * the filter is LOSSLESS — the output equals the brute-force
    * self-join, which is exactly what the DuckDB oracle computes.
    *
    * All threshold math is integer: cos ≥ tauNum/tauDen ⇔
    * tauDen²·dot² ≥ tauNum²·n₁·n₂ (dot ≥ 0), and the prefix bound uses
    * ceil(tauNum²·n/tauDen²) = (tauNum²·n + tauDen² − 1) div tauDen² —
    * no float ever decides membership. The reported cos_sim double is one
    * division of a sqrt of exact integers, bit-identical in any engine.
    *
    * Scale shape: the candidate join is keyed on PREFIX shingles, whose
    * df is small by construction on Zipfian corpora (rarest-first
    * ordering); frequent shingles never enter the index, so the classic
    * stopword-posting blowup cannot happen. The verification join carries
    * (id, shingle) pairs only — never document text — and the per-pair
    * work is one count aggregate. Set sizes and shingle dfs are linear
    * aggregates. On an adversarially DENSE corpus (tiny vocabulary) the
    * true result itself is Θ(n²) pairs and no exact algorithm does
    * better; the threshold is the knob that keeps output sparse.
    */
  def apssCosinePairs(docs: DataFrame, n: Int = 3,
                      tauNum: Int = 4, tauDen: Int = 5,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"need a threshold in (0, 1], got $tauNum/$tauDen")
    // the prefix-bound floor below divides in DOUBLE; exactness needs
    // t2n·sz < 2^53, which tauDen ≤ 1000 guarantees for any sz < 2^31
    // (a finer threshold than 1/1000 distinguishes nothing at realistic
    // shingle-set sizes anyway)
    require(tauDen <= 1000,
      s"tauDen ≤ 1000 keeps the prefix bound exact, got $tauDen")
    val t2n = tauNum.toLong * tauNum; val t2d = tauDen.toLong * tauDen
    // The (id, shingle) relation feeds SIX consumers (sizes, dfreq, the
    // positioned join, the candidate join's full side, and both exact-dot
    // sides); without materialization each consumer re-runs the scan +
    // higher-order-function shingle construction — the setSimJoinOnSets
    // checkpoint rule. One corpus-shingle-sized materialization.
    def ckpt(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint()
      else df.localCheckpoint()
    val sets = ckpt(docs.select(col(idCol).as("id"),
      explode(Dedup.wordNgrams(col(textCol), n)).as("g")))
    val sizes = sets.groupBy("id").agg(count(lit(1)).as("sz"))
    val dfreq = sets.groupBy("g").agg(count(lit(1)).as("gdf"))
    // global rarest-first order; position within each document's set
    val wpos = Window.partitionBy(col("id")).orderBy(col("gdf"), col("g"))
    val positioned = sets.join(dfreq, Seq("g"))
      .withColumn("pos", row_number().over(wpos))
      .join(sizes, Seq("id"))
    // ceil(t2n·sz/t2d) in exact integer arithmetic (sz < 2^31 ⇒ no overflow)
    // allowed suffix length = ceil(tau²·sz) − 1; prefix = the rest.
    // (t2n·sz + t2d − 1) ≤ 10⁶·2³¹ ≪ 2⁵³ (tauDen ≤ 1000 enforced above)
    // so the double division is exact.
    val suffixLen = floor((lit(t2n) * col("sz") + lit(t2d - 1)) / lit(t2d))
      .cast("long") - lit(1L)
    val prefix = positioned.where(col("pos") <= col("sz") - suffixLen)
      .select(col("id").as("id_p"), col("g"))
    val cand = sets.join(prefix, Seq("g"))
      .where(col("id") =!= col("id_p"))
      .select(least(col("id"), col("id_p")).as("id_a"),
        greatest(col("id"), col("id_p")).as("id_b"))
      .distinct()
    // exact dot for candidates only: fan out by id_a's shingles, keep the
    // ones id_b shares, count — (id, shingle) rows, never text
    val dots = cand
      .join(sets.select(col("id").as("id_a"), col("g")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("g")), Seq("id_b", "g"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("dot"))
    dots
      .join(sizes.select(col("id").as("id_a"), col("sz").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("n_b")), Seq("id_b"))
      // DECIMAL(38,0) comparison: t2d·dot² on a million-shingle document
      // overflows a long (ANSI would throw; non-ANSI would wrap into
      // wrong verdicts) — decimal keeps the integer-exactness claim at
      // any document size, and only candidate pairs pay it
      .where(lit(t2d).cast("decimal(38,0)") * col("dot") * col("dot") >=
        lit(t2n).cast("decimal(38,0)") * col("n_a") * col("n_b"))
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"), col("dot"),
        (col("dot").cast("double") /
          sqrt((col("n_a") * col("n_b")).cast("double"))).as("cos_sim"))
      .orderBy("id_a", "id_b")
  }
}
