package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling, splits, packing, decontamination, drift, corpus stats, sketches (CMS/HLL/KMV), and budgeted selection.
  * One family of [[Corpus]] — the object is assembled from the
  * per-family traits (graft.ext.Corpus*.scala) so each file stays
  * reviewable; call sites are unchanged.
  */
trait CorpusOps {

  /** Deterministic content-keyed split assignment: bucket = rolling-hash
    * fingerprint of the text mod 100 (always in [0,100) — the fingerprint
    * is non-negative by construction), label by cumulative percentage
    * (train < trainPct ≤ val < trainPct+valPct ≤ test). Pure expression,
    * no shuffle, no RNG: the same document lands in the same split on any
    * cluster, any partitioning, any run.
    */
  def splitAssign(df: DataFrame, textCol: String,
                  trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = pmod(TextAnalysis.fingerprint(col(textCol)), lit(100L))
    df.withColumn("bucket", bucket.cast("int"))
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }

  /** Deterministic source-mixture sampling: keep each document with its
    * source's configured rate, decided by content fingerprint bucket (no
    * RNG, no global coordination, stable under re-partitioning — the same
    * guarantees as [[splitAssign]]). This is how a training mix
    * downweights a crawl and upweights curated sources; rates are exact
    * per-mille fractions so the decision is integer arithmetic. Sources
    * absent from `ratesPerMille` keep `defaultPerMille`. Zero shuffle: a
    * broadcast map lookup plus a comparison per row.
    */
  def mixtureSample(df: DataFrame, textCol: String, sourceCol: String,
                    ratesPerMille: Map[String, Int],
                    defaultPerMille: Int = 1000): DataFrame = {
    (ratesPerMille.values.toSeq :+ defaultPerMille).foreach(r =>
      require(r >= 0 && r <= 1000, s"per-mille rate out of [0,1000]: $r"))
    val rate = ratesPerMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (src, r)) => when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    df.where(pmod(TextAnalysis.fingerprint(col(textCol)), lit(1000L)) < rate)
  }

  /** TEMPERATURE-FLATTENED mixture resampling at α = 1/2 — the
    * multilingual/multi-source rebalancing practice: sampling
    * probability ∝ n_source^α flattens the source distribution, so a
    * per-document keep rate ∝ n^(α−1) = 1/√n downweights dominant
    * sources toward the √-scaled mix while the SMALLEST source anchors
    * at 1000‰ (kept whole — rare sources are the ones temperature
    * sampling exists to protect). α is fixed at 1/2 because the rate
    * must replay bit-identically in the oracle: `sqrt` is
    * IEEE-exact in any engine where a general `pow` is not, and the
    * rate is computed as the single expression
    * floor((1000·√n_min)/√n_s) — one multiply, one divide, one floor,
    * in a spelled order both engines share. The keep decision is the
    * same content-fingerprint bucket as [[mixtureSample]]: no RNG,
    * stable under re-partitioning.
    *
    * Scale: one tiny per-source count aggregation (|sources| rows), the
    * 1-row min broadcast onto it, and the rate table broadcast onto the
    * corpus — the corpus itself is never shuffled; the filter is
    * map-side. Output keeps `n_source` and `rate_pm` so the mix report
    * rides along with the sample.
    */
  def temperatureResample(df: DataFrame, textCol: String,
                          sourceCol: String): DataFrame =
    temperatureResampleByKey(
      df.withColumn("__fpm",
        pmod(TextAnalysis.fingerprint(col(textCol)), lit(1000L))),
      "__fpm", sourceCol).drop("__fpm")

  /** [[temperatureResample]] over a PRECOMPUTED per-mille sampling key
    * (`fpmCol` = `pmod(fingerprint(text), 1000)`): `df` is consumed
    * twice below (the rate table's groupBy and the admission join), so a
    * caller with an expensive lineage — the prep funnel, whose input
    * carries the whole quality/dedup/decontam chain — precomputes the
    * key once in its materialized base instead of re-running the
    * rolling-hash fingerprint (and everything under it) per consumer. */
  private[ext] def temperatureResampleByKey(df: DataFrame, fpmCol: String,
                                            sourceCol: String): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_source"))
    val minN = counts.agg(min(col("n_source")).as("n_min"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col(sourceCol), col("n_source"),
        floor((lit(1000) * sqrt(col("n_min"))) / sqrt(col("n_source")))
          .cast("long").as("rate_pm"))
    df.join(broadcast(rates), Seq(sourceCol))
      .where(col(fpmCol) < col("rate_pm"))
  }

  /** DETERMINISTIC EPOCH SHUFFLE: per (epoch, id), a shard assignment
    * and an intra-shard sort key — the reproducible training-order
    * primitive. Training wants a different document order every epoch,
    * the SAME order for the same epoch on every rerun (resume-from-step,
    * loss-spike forensics, data-order ablations), and it wants the
    * order WITHOUT a global sort: shard = seeded-hash mod `nShards` is
    * a map-only label, so the writer can `partitionBy(shard)` and sort
    * WITHIN shards — each a bounded, parallel sort; readers stream
    * shards in id order and rows in key order, a total order no single
    * node ever materializes. No RNG anywhere: the key is
    * md5(epoch ":" id), so the permutation is a pure function of the
    * epoch number — any worker, any partitioning, any restart agrees.
    * (md5 over the epoch-salted id, not a cheaper non-crypto hash,
    * because the ORACLE must replay it: both engines spell md5
    * identically, and at one hash per row per epoch the cost is noise
    * next to reading the row.) Shard uniformity comes from the first
    * two hex nibbles (256 cells folded mod nShards, ≤256 enforced so
    * the fold stays balanced).
    */
  def epochShards(df: DataFrame, idCol: String, epoch: Int,
                  nShards: Int): DataFrame = {
    require(nShards >= 1 && nShards <= 256,
      s"nShards must be in [1,256], got $nShards (shards fold from two " +
        "hex nibbles = 256 cells; more shards would be non-uniform)")
    require(epoch >= 0, s"epoch must be non-negative, got $epoch")
    df.select(col(idCol), lit(epoch).as("epoch"),
        md5(concat_ws(":", lit(epoch), col(idCol).cast("string")))
          .as("sort_key"))
      // nibble positions via locate over the hex alphabet — spelled the
      // same way in the DuckDB oracle (strpos), unlike a hex→int conv
      // which DuckDB lacks
      .withColumn("shard", pmod(
        (expr("locate(substring(sort_key, 1, 1), '0123456789abcdef')") * 16
          + expr("locate(substring(sort_key, 2, 1), '0123456789abcdef')"))
          .cast("int"),
        lit(nShards)))
  }

  /** Sequence packing: assign each document a pack id such that packs are
    * filled to `budget` tokens in doc-id order WITHIN each shard column
    * (source, split, …). pack = floor(tokens-before-this-doc / budget) —
    * the deterministic streaming-friendly packing a training-data writer
    * uses to emit fixed-budget sequences. Partitioned by the shard column
    * on purpose: packing is per-output-shard by design (shards are
    * independent training files), so the window parallelizes across
    * shards instead of serializing the corpus through one task. A doc
    * longer than the budget still gets its own pack(s) — the assignment
    * is by preceding-token count, never by truncation.
    *
    * `idCol` breaks `orderCol` ties: a running sum over an order with
    * duplicates is only defined up to the arbitrary physical order of the
    * tied rows, so without the tiebreak two runs of the same corpus under
    * different partitioning can emit DIFFERENT pack assignments. With a
    * unique id in the sort key the packing is a pure function of the data.
    */
  def packSequences(df: DataFrame, textCol: String, shardCol: String,
                    orderCol: String, budget: Long,
                    idCol: String = null): DataFrame = {
    val order = if (idCol == null || idCol == orderCol) Seq(col(orderCol))
      else Seq(col(orderCol), col(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy(order: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val before = coalesce(sum(TextAnalysis.tokenCount(col(textCol))).over(w), lit(0L))
    df.withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))
      .withColumn("pack_id", floor(before / lit(budget)).cast("long"))
  }

  /** [[packSequences]] generalized to a PRECOMPUTED length column — the
    * production form: models consume BPE tokens, not whitespace words,
    * so the packer a training-file writer actually runs budgets on the
    * tokenizer's own counts ([[bpeSegmentCounts]]'s `n_bpe_tokens`).
    * Same shard-partitioned prefix-sum window, same deterministic
    * `orderCol` assignment — including the same tie hazard: a running
    * sum over an order with duplicates is only defined up to the tied
    * rows' physical order, so pass `idCol` (a unique id) whenever
    * `orderCol` can repeat within a shard, exactly as [[packSequences]]
    * documents. */
  def packSequencesBy(df: DataFrame, lenCol: String, shardCol: String,
                      orderCol: String, budget: Long,
                      idCol: String = null): DataFrame = {
    require(budget >= 1, s"budget must be positive: $budget")
    val order = if (idCol == null || idCol == orderCol) Seq(col(orderCol))
      else Seq(col(orderCol), col(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy(order: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val before = coalesce(sum(col(lenCol)).over(w), lit(0L))
    df.withColumn("pack_id", floor(before / lit(budget)).cast("long"))
  }

  /** Deterministic stratified sample: exactly `k` documents per stratum
    * (source, language, …), chosen by smallest content fingerprint with an
    * id tiebreak — the eval-set builder. Content-keyed like [[splitAssign]]
    * and [[mixtureSample]]: no RNG, identical selection on any cluster,
    * partitioning, or re-ingestion, and balanced across strata no matter
    * how skewed the corpus histogram is (where rate-based sampling keeps a
    * stratum's share of the skew).
    *
    * Scale shape: declared as rank-over-window + `rank <= k`, which Spark
    * plans with a map-side WindowGroupLimit — each input partition forwards
    * at most k rows per stratum into the exchange, so the shuffle carries
    * O(k · strata · partitions) rows, never the corpus. (Asserted in
    * PlanAuditSpec; this is why the declarative form beats a hand-rolled
    * two-phase top-k.)
    */
  def stratifiedSample(df: DataFrame, textCol: String, stratumCol: String,
                       idCol: String, k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(col("sample_fp"), col(idCol))
    // NULL content never enters an eval sample: its fingerprint is NULL,
    // which Spark ranks FIRST ascending (oracle engines rank it last) —
    // without the filter every null-text row would win rank 1
    df.where(col(textCol).isNotNull)
      .withColumn("sample_fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= k)
      .drop("sample_fp")
  }

  /** Distinct word n-gram hashes per document (xxhash64 of the gram text:
    * the downstream join only needs gram EQUALITY, and 8-byte keys beat
    * ~9-token strings through a 100 TB shuffle; collision odds 2⁻⁶⁴ per
    * gram pair).
    */
  private def gramHashes(text: Column, n: Int): Column =
    transform(Dedup.wordNgrams(text, n), g => xxhash64(g))

  /** Cross-split contamination: for every (eval doc, train doc) pair
    * sharing ≥ minShared distinct n-grams, emit the pair and its shared
    * count — the "is my test set leaking from my training set" report.
    *
    * Plan shape: explode each side to (gram_hash, doc), drop grams with
    * train-side document frequency > maxDf (stop-gram cap), equi-join on
    * the hash, count per pair. The only shuffles are the two explode-side
    * exchanges on gram_hash and the final pair aggregation.
    *
    * The train corpus is deliberately exploded TWICE (once under the df
    * aggregate, once as the anti-join probe): the two subtrees' exchanges
    * differ structurally (partial-agg vs raw gram stream), so Spark's
    * ReusedExchange can never dedup them, and persisting the gram table
    * instead would materialize ~(tokens−n+1) rows per document — order 10×
    * the corpus, infeasible at 100 TB. Recompute costs one extra scan +
    * explode, and Catalyst prunes that scan to the text column alone.
    * PlanAuditSpec pins all of this: broadcast anti-join, text-only
    * recompute scan, and exactly three explodes.
    */
  def decontaminate(train: DataFrame, eval_ : DataFrame, textCol: String,
                    idCol: String, n: Int = 5, minShared: Int = 1,
                    maxDf: Long = 10000L): DataFrame = {
    def grams(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as(side),
          explode(gramHashes(col(textCol), n)).as("g"))
    val trainGrams = grams(train, "train_id")
    // stop-gram cap via the HEAVY-HITTER list: df per gram is a skew-safe
    // partial-agged groupBy (a window over partitionBy(g) would funnel the
    // exact mega-df gram the cap targets into one task), and only grams
    // ABOVE the cap survive the filter. The exclusion anti-join carries NO
    // broadcast hint on purpose: the stop-gram count is usually tiny but is
    // bounded only by total_grams/maxDf, so an unconditional broadcast can
    // exceed driver memory on a pathological corpus — AQE sees the built
    // side's ACTUAL size at runtime and picks broadcast when it fits,
    // shuffle when it doesn't
    val stopGrams = trainGrams.groupBy("g")
      .agg(count(lit(1)).as("df")).where(col("df") > maxDf)
      .select(col("g"))
    val keptTrain = trainGrams
      .join(stopGrams, Seq("g"), "left_anti")
    keptTrain.join(grams(eval_, "eval_id"), Seq("g"))
      .groupBy("eval_id", "train_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Release-gate LEAKAGE MATRIX across data splits: for every ordered
    * pair of split values, the number of leaking (doc, doc) pairs
    * (sharing ≥ `minShared` distinct n-grams after the stop-gram cap)
    * plus the distinct leaking-document count on each side and the
    * total shared-gram mass — the one-table split-integrity gate a
    * training run reads before writing shards. [[decontaminate]] gives
    * the per-pair evidence for ONE directed split pair; this rolls
    * EVERY pair up to release granularity, including explicit zero rows
    * for clean pairs (a gate must distinguish "clean" from "not
    * checked"). The stop-gram cap here is CORPUS-wide document
    * frequency (all splits), where decontaminate's is train-side —
    * symmetric by construction, since no split is "the train side" yet.
    *
    * Scale shape: grams explode ONCE with the split carried; the pair
    * join is the same capped 8-byte-hash equi-join as decontaminate
    * (candidate fanout bounded by the cap), `split_a < split_b` keeps
    * each unordered pair once; the matrix rollup aggregates the pair
    * relation, and the zero-fill joins a (#splits)²-row frame —
    * trivially broadcast. No text ever enters a shuffle.
    */
  def splitLeakageMatrix(df: DataFrame, textCol: String, idCol: String,
                         splitCol: String = "split", n: Int = 5,
                         minShared: Int = 1,
                         maxDf: Long = 10000L): DataFrame = {
    val grams = df.select(col(splitCol).as("split"), col(idCol).as("doc"),
      explode(gramHashes(col(textCol), n)).as("g"))
    val stop = grams.groupBy("g").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select("g")
    val kept = grams.join(stop, Seq("g"), "left_anti")
    val lo = kept.select(col("g"), col("split").as("split_a"),
      col("doc").as("doc_a"))
    val hi = kept.select(col("g"), col("split").as("split_b"),
      col("doc").as("doc_b"))
    val pairs = lo.join(hi, Seq("g"))
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

  /** Per-eval-document n-gram contamination OVERLAP: the fraction of each
    * eval doc's distinct n-grams that appear anywhere in the train corpus
    * — the corpus-level overlap statistic reported alongside benchmark
    * results (GPT-3 appendix C's dirtiness measure), complementing
    * [[decontaminate]]'s per-pair report (WHICH train doc leaked) and
    * [[decontaminateSentences]]' verbatim-sentence count.
    *
    * Plan shape: the train side collapses to DISTINCT gram hashes before
    * the join (presence is all that matters — document frequency and the
    * per-pair blowup never enter), then one semi-join keyed on 8-byte
    * hashes and one per-doc count. Both shuffles carry (hash) or
    * (eval_id, hash) — never text. Eval docs shorter than n tokens have
    * no grams and report 0 overlap; NULL-text eval docs carry no grams at
    * all and are EXCLUDED (no row), as in [[corpusStats]].
    */
  def contaminationOverlap(train: DataFrame, eval_ : DataFrame,
                           textCol: String, idCol: String,
                           n: Int = 5): DataFrame = {
    val evalDocs = eval_.where(col(textCol).isNotNull)
    val trainGrams = train
      .select(explode(gramHashes(col(textCol), n)).as("g")).distinct()
    val evalGrams = evalDocs.select(col(idCol).as("eval_id"),
      explode(gramHashes(col(textCol), n)).as("g"))
    val seen = evalGrams.join(trainGrams, Seq("g"), "left_semi")
      .groupBy("eval_id").agg(count(lit(1)).as("n_seen"))
    val totals = evalDocs.select(col(idCol).as("eval_id"),
      size(gramHashes(col(textCol), n)).cast("long").as("n_grams"))
    totals.join(seen, Seq("eval_id"), "left")
      .select(col("eval_id"), col("n_grams"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"))
      .withColumn("overlap_frac",
        when(col("n_grams") > 0,
          col("n_seen").cast("double") / col("n_grams"))
          .otherwise(lit(0.0)))
  }

  /** Distribution DRIFT between two corpus snapshots (yesterday's crawl
    * vs today's): per token-length bucket, each snapshot's share in ppm
    * and the absolute share difference — the per-bucket terms of the
    * total-variation distance (TVD = Σ delta_ppm / 2), the
    * data-quality regression check a pipeline owner runs before letting
    * a new crawl into the mixture. Shares are INTEGER ppm
    * (n·1 000 000 div N), so every value replays exactly in any engine —
    * no float division ever decides a drift number (the engine-portable
    * stand-in for PSI/KL, whose logs are not exactly replayable; TVD is
    * a bounded metric in its own right).
    *
    * Scale shape: two histogram aggregations (map-side partial, output
    * = distinct buckets — corpus-size-invariant, the [[corpusStats]]
    * argument), a full outer join of two bucket-sized relations, and
    * two one-row totals entering as broadcasts. NULL-text documents are
    * excluded on both sides, as in [[corpusStats]]; a bucket absent
    * from one side contributes its full other-side share to the drift.
    *
    * `bucketWidth` lower bound, practical: the totals window serializes
    * ALL bucket rows through one task (deliberate — see
    * [[driftFromHistograms]]), so bucket cardinality ≈ max-token-count /
    * bucketWidth must stay in the thousands-to-millions range, not
    * beyond. The default 8 gives ~10⁵ buckets even for 10⁶-token
    * documents; a bucketWidth of 1 against book-length outliers is the
    * one way to make this window a bottleneck — keep
    * max-token-count / bucketWidth ≲ 10⁷.
    */
  def histogramDrift(a: DataFrame, b: DataFrame, textCol: String,
                     bucketWidth: Int = 8): DataFrame =
    driftFromHistograms(
      lengthBucketHistogram(a, textCol, bucketWidth, "n_a"),
      lengthBucketHistogram(b, textCol, bucketWidth, "n_b"))

  /** One snapshot's (bucket, count) token-length histogram — the
    * mergeable drift state. Public because the STREAMING drift monitor
    * maintains exactly this relation as complete-mode aggregation state
    * (corpus-size-invariant, the [[tokenHistogram]] argument) and both
    * sides of a drift comparison must bucket identically. floor of a
    * double division is exact here (token counts ≪ 2^53).
    */
  def lengthBucketHistogram(df: DataFrame, textCol: String,
                            bucketWidth: Int, countName: String): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    df.where(col(textCol).isNotNull)
      .select(floor(TextAnalysis.tokenCount(col(textCol)).cast("long")
        / lit(bucketWidth)).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(countName))
  }

  /** [[histogramDrift]]'s comparison half over two prebuilt
    * (bucket, n_a) / (bucket, n_b) histograms — the ppm shares stay in
    * `div` (n·10⁶ can pass 2^53 at scale, where `/` would round).
    * Totals come from a WINDOW over the joined histogram (the q74 rule:
    * window the histogram, never the corpus) — separate `.agg` totals
    * would repeat each histogram subtree and depend on ReuseExchange to
    * avoid a second corpus scan; the window states the one-pass shape
    * structurally. Its single partition holds only bucket rows, bounded
    * by max-doc-length / bucketWidth.
    */
  def driftFromHistograms(ha: DataFrame, hb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    ha.join(hb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .withColumn("tot_a", sum(col("n_a")).over(all))
      .withColumn("tot_b", sum(col("n_b")).over(all))
      .select(col("bucket"), col("n_a"), col("n_b"),
        when(col("tot_a") > 0, expr("n_a * 1000000 div tot_a"))
          .otherwise(lit(0L)).as("share_a_ppm"),
        when(col("tot_b") > 0, expr("n_b * 1000000 div tot_b"))
          .otherwise(lit(0L)).as("share_b_ppm"))
      .withColumn("delta_ppm",
        abs(col("share_a_ppm") - col("share_b_ppm")))
  }

  /** Per-document NOVELTY within one corpus: the fraction of each
    * document's distinct n-grams that appear in at least one OTHER
    * document — the corpus-internal dual of [[contaminationOverlap]]
    * (there: "seen in train?"; here: "seen anywhere else?"). High
    * shared_frac = boilerplate-heavy/templated content; low = novel
    * prose — the uniqueness signal data-curation pipelines rank or gate
    * on next to the intra-document repetition metrics (q61), which see
    * only WITHIN-document repeats and miss cross-document template mass.
    *
    * A gram's document frequency counts DISTINCT documents (each doc
    * contributes its gram set once), so df > 1 is exactly "some other
    * document also has it" for every contributing document.
    *
    * Plan shape: the gram stream — (doc, gram_hash), 8-byte keys, never
    * text — is deliberately exploded TWICE (once under the skew-safe df
    * groupBy, once as the join probe; the [[decontaminate]] recompute
    * argument — persisting it would materialize ~tokens-per-doc rows per
    * document), then one equi-join of the stream back to the df relation
    * (q24's tf⋈df shape; hot grams are AQE-skew-splittable) and a
    * per-doc count. shared_frac is one IEEE division of exact integers —
    * bit-identical in any engine. Documents with no grams (< n tokens or
    * NULL text) report (0, 0, 0.0).
    */
  def docNovelty(docs: DataFrame, textCol: String, idCol: String,
                 n: Int = 3): DataFrame = {
    val grams = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc"),
        explode(gramHashes(col(textCol), n)).as("g"))
    val dfreq = grams.groupBy("g").agg(count(lit(1)).as("df"))
    val perDoc = grams.join(dfreq, Seq("g"))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") > 1, lit(1L)).otherwise(lit(0L))).as("n_shared"))
    docs.select(col(idCol).as("doc"))
      .join(perDoc, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          col("n_shared").cast("double") / col("n_grams"))
          .otherwise(lit(0.0)).as("shared_frac"))
  }

  /** Enforcement form of [[decontaminate]]: the TRAIN corpus with every
    * document that leaks into the eval set removed (shares ≥ minShared
    * distinct n-grams with ANY eval doc). [[decontaminate]] is the report;
    * this is what the training-file writer actually consumes. One extra
    * anti-join over the report's distinct train ids — a relation bounded
    * by the contamination rate, so AQE broadcasts it in the common case
    * where leaks are rare.
    */
  def decontaminateFilter(train: DataFrame, eval_ : DataFrame,
                          textCol: String, idCol: String, n: Int = 5,
                          minShared: Int = 1,
                          maxDf: Long = 10000L): DataFrame = {
    val leaked = decontaminate(train, eval_, textCol, idCol, n, minShared, maxDf)
      .select(col("train_id").as(idCol)).distinct()
    train.join(leaked, Seq(idCol), "left_anti")
  }

  /** Per-group corpus report card with EXACT token-length quantiles — the
    * curation dashboard a training-mix owner reads before weighting
    * sources. Output per group: n_docs, mean_tokens, p50/p90/p99_tokens.
    *
    * Exactness without the usual scale trap: a window over
    * partitionBy(group) on the raw corpus funnels each giant group into
    * one sort task, and approx_percentile trades the exactness away. Token
    * counts are small discrete ints, so the quantiles come from a VALUE
    * HISTOGRAM instead — groupBy(group, n_toks) partial-aggregates
    * map-side to a |groups|·|distinct lengths| relation, and the
    * cumulative window runs over that, never the corpus. Ranks use the
    * discrete-quantile definition (element at floor(p·(n−1)) + 1, ranks
    * 1-based), all integer arithmetic; the mean's single division of
    * exact integers is the only double.
    */
  def corpusStats(df: DataFrame, groupCols: Seq[String], textCol: String,
                  quantiles: Seq[Int] = Seq(50, 90, 99)): DataFrame =
    statsFromHistogram(tokenHistogram(df, groupCols, textCol), groupCols,
      quantiles)

  /** The token-length histogram [[corpusStats]] derives everything from —
    * exposed because it is the report card's MERGEABLE STATE: histograms
    * of disjoint corpus parts sum ([[mergeHistograms]]) to the histogram
    * of the union, so a daily pipeline persists yesterday's tiny
    * (group × distinct-length) relation and folds in only today's batch,
    * never re-scanning the accumulated corpus. NULL text would put a NULL
    * n_toks row into the histogram, and the cumulative window would order
    * it differently across engines (Spark sorts NULLS FIRST, most SQL
    * engines NULLS LAST) — shifting every rank. NULL-text documents carry
    * no length, so they are excluded; n_docs counts documents WITH text.
    */
  def tokenHistogram(df: DataFrame, groupCols: Seq[String],
                     textCol: String): DataFrame = {
    val gcols = groupCols.map(col)
    df.where(col(textCol).isNotNull)
      .select(gcols :+ TextAnalysis.tokenCount(col(textCol)).as("n_toks"): _*)
      .groupBy(gcols :+ col("n_toks"): _*).agg(count(lit(1)).as("c"))
  }

  /** Sum per-part token histograms into the union's histogram — count
    * vectors over the same (group, n_toks) key space add componentwise.
    * The shuffle is histogram-sized on both ends.
    */
  def mergeHistograms(parts: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(parts.nonEmpty, "mergeHistograms needs at least one part")
    val gcols = groupCols.map(col)
    parts.reduce(_.unionByName(_))
      .groupBy(gcols :+ col("n_toks"): _*).agg(sum(col("c")).as("c"))
  }

  /** Finalize a (merged) [[tokenHistogram]] into the report card. */
  def statsFromHistogram(hist: DataFrame, groupCols: Seq[String],
                         quantiles: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quantiles.forall(p => p >= 0 && p <= 100),
      s"quantiles must be percentages in [0,100], got $quantiles")
    // duplicates would emit two identically-named p<N>_tokens columns and
    // break any by-name select far from this call site
    require(quantiles.distinct.size == quantiles.size,
      s"quantiles must be distinct, got $quantiles")
    val gcols = groupCols.map(col)
    val byToks = Window.partitionBy(gcols: _*).orderBy("n_toks")
    val whole = Window.partitionBy(gcols: _*)
    val cum = hist
      .withColumn("hi", sum(col("c")).over(byToks))
      .withColumn("lo", col("hi") - col("c") + 1)
      .withColumn("cnt", sum(col("c")).over(whole))
    def q(p: Int) = max(when(
      expr(s"(cnt - 1) * $p div 100 + 1").between(col("lo"), col("hi")),
      col("n_toks"))).cast("long").as(s"p${p}_tokens")
    val aggs = Seq(
      max(col("cnt")).as("n_docs"),
      (sum(col("n_toks").cast("long") * col("c")).cast("double") /
        max(col("cnt"))).as("mean_tokens")) ++ quantiles.map(q)
    cum.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** COUNT–MIN SKETCH of the token stream (Cormode & Muthukrishnan,
    * J.Algorithms'05) — the fixed-size MERGEABLE frequency summary: a
    * depth × width grid of counters where every token occurrence
    * increments one counter per row, and a token's estimate is the MIN
    * over its depth counters (never an underestimate; collisions only
    * inflate). Like [[tokenHistogram]], the sketch is the incremental
    * report-card state — sketches of disjoint corpus parts SUM
    * componentwise ([[cmsMerge]]) to the union's sketch, so a daily
    * pipeline folds today's batch into a 4×1024-cell relation and never
    * re-scans the accumulated corpus; unlike the histogram, the state
    * size is a CONSTANT (depth·width cells) no matter how large the
    * vocabulary grows — the 100 TB crawl regime where even the distinct-
    * token relation is too big to ship to a dashboard.
    *
    * The depth hash family is Kirsch–Mitzenmacher double hashing over
    * the two portable char-folds the SimHash oracle already replays
    * (h1 = fold(31, 1e9+7), h2 = fold(131, 998244353)):
    * bucket_i = (h1 + i·h2) mod width — pure integer arithmetic, so an
    * oracle engine replays the sketch CELL FOR CELL (Spark's own
    * CountMinSketch agg exists but its hash is not replayable outside
    * the JVM — same trade as hashEmbedding vs portableHashEmbedding).
    *
    * Output: (d, bucket, c) cell rows. Scale shape: one explode over
    * the token stream × depth, map-side partial agg into depth·width
    * cells, exchange of cell-sized partials only.
    */
  def cmsTokenSketch(df: DataFrame, textCol: String,
                     depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth in [1,8], got $depth")
    require(width >= 2, s"width >= 2, got $width")
    cmsBuckets(
      df.where(col(textCol).isNotNull)
        .select(explode(split(col(textCol), " ")).as("tok")),
      depth, width)
      .groupBy("d", "bucket").agg(count(lit(1)).as("c"))
  }

  /** The (d, bucket) cell coordinates of each input token — shared by
    * sketch construction and estimation, which must hash identically. */
  private def cmsBuckets(toks: DataFrame, depth: Int,
                         width: Int): DataFrame = {
    import graft.functions.TextExpressions.charFold
    toks
      .select(col("tok"),
        charFold(col("tok"), 31L, 1000000007L).as("h1"),
        charFold(col("tok"), 131L, 998244353L).as("h2"))
      .select(col("tok"),
        explode(sequence(lit(0L), lit(depth - 1L))).as("d"),
        col("h1"), col("h2"))
      // h1 + d·h2 < 1e9+7 + 7·998244353 < 2^33 — no overflow
      .select(col("tok"), col("d"),
        pmod(col("h1") + col("d") * col("h2"), lit(width.toLong))
          .as("bucket"))
  }

  /** Sum per-part sketches into the union's sketch — counter grids over
    * the same (d, bucket) cells add componentwise; the exchange is
    * cell-count-sized on both ends. Parts must share depth/width (cells
    * outside a common grid would silently mis-merge; the caller owns
    * that contract, as with [[mergeHistograms]]' key space). */
  def cmsMerge(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "cmsMerge needs at least one part")
    parts.reduce(_.unionByName(_))
      .groupBy("d", "bucket").agg(sum(col("c")).as("c"))
  }

  /** Point-estimate each candidate token against a [[cmsTokenSketch]]:
    * est(tok) = min over depth of its cells — ≥ the true count always,
    * within εN with probability 1−δ for depth = ln(1/δ), width = e/ε.
    * The sketch rides as a broadcast (depth·width cells); the candidate
    * relation is the only scan. */
  def cmsEstimates(sketch: DataFrame, candidates: DataFrame, depth: Int,
                   width: Int): DataFrame =
    cmsBuckets(candidates, depth, width)
      .join(broadcast(sketch), Seq("d", "bucket"), "left")
      .groupBy("tok")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))

  /** HYPERLOGLOG registers of the token stream (Flajolet et al.,
    * AofA'07) — the fixed-size mergeable DISTINCT-count summary:
    * bucket = hash mod m, register = max over the bucket's tokens of
    * ρ(hash div m) (leading-zero rank of the remaining hash bits).
    * Registers of disjoint parts MAX componentwise ([[hllMerge]]) to
    * the union's registers — the cross-day vocabulary-growth monitor
    * that never re-scans: m rows of state forever, vs countDistinct's
    * full-vocabulary exchange. Spark's approx_count_distinct is this
    * same structure tuned harder (HLL++); production callers should
    * use it — this construction exists because every register and the
    * estimate replay EXACTLY in an oracle engine (integer-only):
    * the fold hash is < 1e9+7, so y = h div m fits W = 24 bits at
    * m = 64, ρ(y) = 25 − length(bin(y)) for y ≥ 1 (25 for y = 0), and
    * the harmonic sum scales to the exact integer S = Σ 2^(25−r)
    * (empty registers r = 0 contribute 2^25). Output: (bucket, r).
    */
  def hllTokenRegisters(df: DataFrame, textCol: String,
                        m: Int = 64): DataFrame = {
    require(m == 64, s"m = 64 is the replayable register count, got $m")
    import graft.functions.TextExpressions.charFold
    df.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("tok"))
      .select(charFold(col("tok"), 31L, 1000000007L).as("h"))
      .select(pmod(col("h"), lit(m.toLong)).as("bucket"),
        (col("h") / lit(m.toLong)).cast("long").as("y"))
      .select(col("bucket"),
        when(col("y") === 0L, lit(25L))
          .otherwise(lit(25L) - (length(bin(col("y")))))
          .as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("r"))
  }

  /** Max per-part registers into the union's registers. */
  def hllMerge(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "hllMerge needs at least one part")
    parts.reduce(_.unionByName(_))
      .groupBy("bucket").agg(max(col("r")).as("r"))
  }

  /** Finalize [[hllTokenRegisters]] into the one-row estimate report —
    * all-integer: S = Σ_buckets 2^(25−r) with absent buckets at r = 0,
    * est = (709·m²·2^25) div (1000·S) (α₆₄ = 0.709 as the exact
    * rational 709/1000; numerator ≈ 9.7e13, no overflow). The
    * small-range linear-counting correction (est < 5m/2 with zero
    * registers present) needs a float ln — deliberately NOT applied
    * here; `zero_registers` is reported so the serving layer
    * ([[hllServedEstimate]]) can apply it.
    * Output: (m, zero_registers, s, est_distinct).
    */
  def hllEstimate(registers: DataFrame, m: Int = 64): DataFrame = {
    require(m == 64, s"m = 64 is the replayable register count, got $m")
    registers
      .agg(count(lit(1)).as("filled"),
        // coalesce: an EMPTY register relation (empty/all-null corpus)
        // must yield the well-defined all-zero-registers report
        // (zero_registers = m, S = m·2^25), not NULL-propagated columns
        coalesce(sum(expr("shiftleft(1L, cast(25 - r as int))")), lit(0L))
          .as("s_filled"))
      .select(lit(m.toLong).as("m"),
        (lit(m.toLong) - col("filled")).as("zero_registers"),
        (col("s_filled")
          + (lit(m.toLong) - col("filled")) * lit(1L << 25)).as("s"))
      .select(col("m"), col("zero_registers"), col("s"),
        // the numerator precomputed in Scala — spelled as int literals
        // in SQL it would overflow Int silently in non-ANSI mode
        expr(s"${709L * m * m * (1L << 25)}L div (1000L * s)")
          .as("est_distinct"))
  }

  /** SERVING-LAYER small-range correction over a [[hllEstimate]] report
    * (Flajolet et al., AofA'07 §4): when the raw estimate sits under
    * 5m/2 AND zero registers remain, the harmonic estimator biases high
    * and LINEAR COUNTING — m·ln(m/V) with V = zero_registers — is the
    * better cardinality estimate. The float `ln` is exactly why this
    * lives OUTSIDE the oracle-replayed [[hllEstimate]] (its contract is
    * integer-only); serving applies it on the one-row report, driver- or
    * executor-side — a constant-size projection either way. No
    * large-range correction: it exists for 32-bit-hash saturation
    * (E > 2³²/30) and the portable fold hash's value space (< 1e9+7)
    * cannot reach it. Output: the report plus `served_estimate`
    * (corrected when eligible, `est_distinct` otherwise, rounded long).
    */
  def hllServedEstimate(report: DataFrame): DataFrame =
    report.select(col("m"), col("zero_registers"), col("s"),
      col("est_distinct"),
      when(col("est_distinct") <= lit(5L) * col("m") / lit(2L) &&
          col("zero_registers") > 0L,
        round(col("m").cast("double") *
          log(col("m").cast("double") / col("zero_registers"))).cast("long"))
        .otherwise(col("est_distinct")).as("served_estimate"))

  /** K-MINIMUM-VALUES distinct sketch of the word n-gram stream
    * (Bar-Yossef et al., RANDOM'02; Beyer et al., SIGMOD'07 — the
    * "KMV synopsis") — the third fixed-size mergeable summary next to
    * [[cmsTokenSketch]] (frequencies) and [[hllTokenRegisters]] (distinct
    * count): keep the k SMALLEST distinct hash values of the stream. The
    * k-th smallest pins the distinct count — k uniform minima on [0, P)
    * sit near i·P/D, so D̂ = (k−1)·P div h_(k) ([[kmvEstimate]], integer
    * division only). Unlike HLL registers the state is a set of REAL
    * hash values, so two corpora's sketches support set operations —
    * [[kmvPairOverlap]] estimates cross-corpus Jaccard from sketches
    * alone, which registers cannot do; that is the reason this third
    * sketch earns its place.
    *
    * Grams are space-joined word n-grams (the q33 oracle's shingle
    * spelling) hashed with the portable char-fold (31, 1e9+7), so an
    * oracle engine replays every retained hash value for value.
    *
    * Scale shape: a bounded per-partition fold (a TreeSet capped at k —
    * the DataSketches theta-sketch update loop) emits ≤ k values per
    * partition; the exchange is k·partitions rows into one k-row
    * TakeOrdered — CONSTANT state like CMS/HLL, never the distinct-gram
    * exchange `countDistinct` pays. `mapPartitions` is justified exactly
    * as the theta sketch justifies it: the fold's state is bounded and
    * its result (the k smallest distinct values of a partition) is
    * independent of row order, so determinism survives any partitioning.
    */
  def kmvShingleMins(df: DataFrame, textCol: String, n: Int = 3,
                     k: Int = 256): DataFrame =
    kmvMins(shingleHashes(df, textCol, n), k)

  /** The k smallest distinct values of a one-column `h` relation — the
    * shared tail of [[kmvShingleMins]] and the per-key variant. */
  private def kmvMins(hashes: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"k >= 2, got $k")
    val spark = hashes.sparkSession
    import spark.implicits._
    val partials = hashes.as[Long].mapPartitions { it =>
      val mins = new java.util.TreeSet[java.lang.Long]()
      it.foreach { h =>
        if (mins.size < k) mins.add(h)
        else if (h < mins.last) { if (mins.add(h)) mins.pollLast() }
      }
      scala.jdk.CollectionConverters.IteratorHasAsScala(mins.iterator())
        .asScala.map(_.longValue())
    }
    partials.toDF("h").distinct().orderBy("h").limit(k)
  }

  /** Portable hashes of the space-joined word n-grams of each document,
    * repeats kept — one `h` column. */
  private def shingleHashes(df: DataFrame, textCol: String,
                            n: Int): DataFrame = {
    require(n >= 1 && n <= 8, s"n in [1,8], got $n")
    import graft.functions.TextExpressions.charFold
    val gramExpr =
      if (n == 1) "toks"
      else {
        val parts = (0 until n).map(j =>
          if (j == 0) "element_at(toks, i)"
          else s"element_at(toks, i + $j)").mkString(", ' ', ")
        s"transform(sequence(1, size(toks) - ${n - 1}), i -> concat($parts))"
      }
    df.where(col(textCol).isNotNull)
      .select(split(col(textCol), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(explode(expr(gramExpr)).as("g"))
      .select(charFold(col("g"), 31L, 1000000007L).as("h"))
  }

  /** Union per-part KMV sketches into the union corpus's sketch: the k
    * smallest of a union are among each part's k smallest, so
    * union-then-retake-k is EXACTLY the sketch a single pass over the
    * union would build — the mergeability the oracle checks by computing
    * the union's sketch directly. Sketch-sized compute on both ends. */
  def kmvMerge(parts: Seq[DataFrame], k: Int = 256): DataFrame = {
    require(parts.nonEmpty, "kmvMerge needs at least one part")
    parts.reduce(_.unionByName(_)).distinct().orderBy("h").limit(k)
  }

  /** Finalize a KMV sketch into the one-row estimate report — integer
    * only: with the sketch saturated (filled = k), est = (k−1)·P div
    * h_(k); below saturation the sketch holds EVERY distinct hash and the
    * count is exact. Output: (k, filled, hk, est_distinct). */
  def kmvEstimate(mins: DataFrame, k: Int = 256): DataFrame =
    mins.agg(count(lit(1)).as("filled"), max(col("h")).as("hk"))
      .select(lit(k.toLong).as("k"), col("filled"), col("hk"),
        when(col("filled") < k, col("filled"))
          // (k−1)·P ≤ 255·(1e9+7) < 2^38 — no overflow
          .otherwise(expr(s"(${(k - 1).toLong}L * 1000000007L) div hk"))
          .as("est_distinct"))

  /** Per-key KMV sketches — one bounded TreeSet per key inside the
    * partition fold. Contract: the key is a LOW-CARDINALITY grouping
    * (languages, sources — the 64-row DSIR bucket-model class), so the
    * fold's state is keys·k values; a high-cardinality key would belong
    * to the ungrouped sketch applied per partition of a partitioned
    * write instead. Output: (key, h), ≤ k rows per key. */
  def kmvGroupedShingleMins(df: DataFrame, keyCol: String,
                            textCol: String, n: Int = 3,
                            k: Int = 256): DataFrame = {
    require(k >= 2, s"k >= 2, got $k")
    import graft.functions.TextExpressions.charFold
    val spark = df.sparkSession
    import spark.implicits._
    val gramRel = df
      .where(col(textCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"),
        split(col(textCol), " ").as("toks"))
      .where(size(col("toks")) >= n)
    val parts = (0 until n).map(j =>
      if (j == 0) "element_at(toks, i)"
      else s"element_at(toks, i + $j)").mkString(", ' ', ")
    val gramExpr =
      if (n == 1) "toks"
      else s"transform(sequence(1, size(toks) - ${n - 1}), i -> concat($parts))"
    val hashed = gramRel
      .select(col("key"), explode(expr(gramExpr)).as("g"))
      .select(col("key"), charFold(col("g"), 31L, 1000000007L).as("h"))
      .as[(String, Long)]
    val partials = hashed.mapPartitions { it =>
      val sets = scala.collection.mutable.Map
        .empty[String, java.util.TreeSet[java.lang.Long]]
      it.foreach { case (key, h) =>
        val mins = sets.getOrElseUpdate(key,
          new java.util.TreeSet[java.lang.Long]())
        if (mins.size < k) mins.add(h)
        else if (h < mins.last) { if (mins.add(h)) mins.pollLast() }
      }
      sets.iterator.flatMap { case (key, mins) =>
        scala.jdk.CollectionConverters.IteratorHasAsScala(mins.iterator())
          .asScala.map(h => (key, h.longValue())).toList
      }
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy("h")
    partials.toDF("key", "h").distinct()
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k).drop("rn")
  }

  /** Cross-key set overlap estimated from [[kmvGroupedShingleMins]]
    * sketches ALONE (Beyer et al. SIGMOD'07 §5 — the multi-set KMV
    * estimator at K = 2): for each key pair, the k smallest of the two
    * sketches' union is itself the UNION's KMV synopsis; the fraction of
    * those values present in BOTH input sketches estimates Jaccard.
    * Everything after the sketches is sketch-sized — pairs·k rows — no
    * matter the corpus size; the exact intersection/union rider a caller
    * joins alongside (q172) is the verification cost, not the
    * estimator's. Output per pair: (key_a, key_b, k_used, matched,
    * jacc_est_pm) with jacc_est_pm = 1000·matched div k_used. */
  def kmvPairOverlap(mins: DataFrame, k: Int = 256): DataFrame = {
    require(k >= 2, s"k >= 2, got $k")
    val keys = mins.select(col("key")).distinct()
    val pairs = keys.select(col("key").as("key_a"))
      .crossJoin(keys.select(col("key").as("key_b")))
      .where(col("key_a") < col("key_b"))
    val members = broadcast(pairs)
      .join(mins,
        mins("key") === col("key_a") || mins("key") === col("key_b"))
      .groupBy("key_a", "key_b", "h")
      .agg(max(when(col("key") === col("key_a"), 1).otherwise(0)).as("in_a"),
        max(when(col("key") === col("key_b"), 1).otherwise(0)).as("in_b"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key_a", "key_b").orderBy("h")
    members.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .groupBy("key_a", "key_b")
      .agg(count(lit(1)).as("k_used"),
        sum(when(col("in_a") + col("in_b") === 2, 1L).otherwise(0L))
          .as("matched"))
      .withColumn("jacc_est_pm", expr("(1000 * matched) div k_used"))
  }

  /** Token-budget corpus selection: keep the best documents by `score`
    * until the running token total reaches `budgetPerMille`/1000 of the
    * corpus's tokens — the data-selection step that turns a quality signal
    * (q73's learned score, q81's perplexity, q83's rules) into a training
    * set of a target size. Selection order is (score DESC, id ASC) with
    * the PREFIX rule: a document is kept iff the cumulative token count
    * up to and including it fits the budget.
    *
    * Scale shape — the naive formulation is a TOTAL sort of the corpus
    * under one cumulative window (single reduce task at 100 TB). This one
    * never sorts the corpus: like [[corpusStats]], it windows the SCORE
    * HISTOGRAM (one row per distinct score value — bounded by the score's
    * resolution, NOT the corpus size; quantize continuous scores first).
    * Entire score classes are then admitted or rejected map-side against
    * the histogram's running totals, and only the single class straddling
    * the budget line needs per-document resolution — a window over that
    * one tie class (its size is the documented scale caveat: an
    * all-one-score corpus degenerates to the total sort, exactly when the
    * score carries no information). NULL-text documents carry no tokens
    * and are excluded, as in [[corpusStats]].
    *
    * `score` must be deterministic and exactly representable (integer
    * counts, or integer-valued model scores like q73's) for the selection
    * boundary to replay identically across engines.
    */
  def budgetSelect(df: DataFrame, textCol: String, idCol: String,
                   score: Column, budgetPerMille: Int = 500): DataFrame =
    budgetSelectBy(df, textCol, idCol, score, Nil, budgetPerMille)

  /** Quantize a CONTINUOUS quality score for [[budgetSelectBy]]:
    * `floor(score · resolution)` as a long. The budget selector's scale
    * contract is that its windows run over the score HISTOGRAM, one row
    * per distinct value — a continuous score (a float perplexity, a model
    * logit) makes every class size 1 and the histogram corpus-sized,
    * which is the documented degenerate case. Quantizing first bounds the
    * class count by `resolution × score-range` regardless of corpus size,
    * and bounds the straddle class (the one needing per-document window
    * resolution) to the documents sharing one quantized value — the
    * selector trades ≤ 1/resolution of score discrimination for a
    * corpus-size-invariant plan. floor of an IEEE multiply is
    * deterministic and replays identically in SQL
    * (`floor(score * resolution)`), so the oracle boundary is exact.
    */
  def quantizeScore(score: Column, resolution: Int): Column = {
    require(resolution > 0, s"resolution must be positive: $resolution")
    floor(score * resolution).cast("long")
  }

  /** [[budgetSelect]] partitioned: an independent `budgetPerMille` token
    * budget PER value of `partitionCols` — the per-source cap a mixture
    * designer applies so one crawl cannot spend the whole budget ("at most
    * half of each source's tokens, best-first"). With `partitionCols` empty
    * this is exactly the global selection.
    *
    * Scale shape: identical to the global path, with every histogram,
    * window, and admission decision keyed by the partition columns — the
    * histogram window's partition count is #(partition values), so skew in
    * SOURCE SIZE never serializes the corpus (only the per-(partition,
    * score) straddle class needs per-document resolution, same caveat as
    * the global path). The per-partition budget relation has one row per
    * partition value and joins back to the histogram by key, AQE-broadcast
    * when small.
    */
  def budgetSelectBy(df: DataFrame, textCol: String, idCol: String,
                     score: Column, partitionCols: Seq[String],
                     budgetPerMille: Int = 500): DataFrame = {
    val pcols = partitionCols.map(col)
    val docs = df.where(col(textCol).isNotNull)
      .select(pcols ++ Seq(col(idCol).as("id"), score.as("score"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens")): _*)
    budgetSelectDocs(docs, partitionCols, budgetPerMille)
      .select(Seq(col("id").as(idCol)) ++ pcols ++
        Seq(col("score"), col("n_tokens")): _*)
  }

  /** [[budgetSelectBy]] over an ALREADY-PROJECTED (id, score, n_tokens
    * [, partitionCols]) relation — the entry point for callers (the prep
    * funnels) that have the token counts and scores materialized: `docs`
    * is consumed THREE times below (histogram, interior semi-join,
    * straddle join), so a caller handing in an expensive lineage would
    * re-run it three times through the public wrapper. Output columns
    * (id, partitionCols..., score, n_tokens). */
  private[ext] def budgetSelectDocs(docs: DataFrame,
                                    partitionCols: Seq[String],
                                    budgetPerMille: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetPerMille >= 0 && budgetPerMille <= 1000,
      s"budgetPerMille out of [0,1000]: $budgetPerMille")
    val pcols = partitionCols.map(col)
    val keyCols = partitionCols :+ "score"
    val hist = docs.groupBy(keyCols.map(col): _*)
      .agg(sum(col("n_tokens")).as("tok_sum"))
    // the budget enters the plan as a WINDOW over the histogram, never a
    // collect — and never a separate aggregate of `hist`, which would
    // repeat the corpus-groupBy subtree and depend on ReuseExchange to
    // avoid a second corpus scan (the window states the one-pass shape
    // structurally). Both windows here read one row per distinct
    // (partition, score), never the corpus. Decimal
    // arithmetic: at 100 TB total_tokens · 1000 overflows the
    // double-precision integer range a plain `/` would route through
    val byScore = Window.partitionBy(pcols: _*).orderBy(col("score").desc)
    val byPart = Window.partitionBy(pcols: _*)
    val edges = hist
      .withColumn("cum_incl", sum(col("tok_sum")).over(byScore))
      .withColumn("cum_before", col("cum_incl") - col("tok_sum"))
      .withColumn("budget",
        (sum(col("tok_sum")).over(byPart).cast("decimal(38,0)")
          * budgetPerMille / 1000).cast("long"))
    val interior = docs.join(
      edges.where(col("cum_incl") <= col("budget"))
        .select(keyCols.map(col): _*),
      keyCols, "left_semi")
    // per partition value, exactly one class can straddle the budget line
    // (cum_before is monotone over classes); its members get the
    // per-document prefix rule
    val straddle = edges.where(
      col("cum_before") <= col("budget") && col("cum_incl") > col("budget"))
    val byId = Window.partitionBy(keyCols.map(col): _*).orderBy(col("id"))
    val boundary = docs
      .join(straddle.select(keyCols.map(col) ++
          Seq(col("cum_before"), col("budget")): _*),
        keyCols)
      .withColumn("cum_in", sum(col("n_tokens")).over(byId))
      .where(col("cum_before") + col("cum_in") <= col("budget"))
      .select(keyCols.map(col) :+ col("id") :+ col("n_tokens"): _*)
    interior.select(keyCols.map(col) :+ col("id") :+ col("n_tokens"): _*)
      .union(boundary)
      .select(Seq(col("id")) ++ pcols ++
        Seq(col("score"), col("n_tokens")): _*)
  }

  /** DSIR-style importance weights for domain-targeted data selection
    * (Xie et al., "Data Selection for Language Models via Importance
    * Resampling", NeurIPS 2023): score every raw-corpus document by how
    * much more likely its hashed-n-gram profile is under a TARGET
    * corpus's feature distribution than under the raw corpus's own,
    * log w(x) = Σ_f [log p_target(f) − log p_raw(f)] over the document's
    * feature occurrences — then keep the documents that look most like
    * the target domain. Re-expressed engine-portably:
    *
    *  - features are word BIGRAMS hashed into `buckets` buckets by the
    *    portable char-fold hash (the q32-SimHash hash, SQL-replayable);
    *  - both distributions are add-`1`-smoothed bucket frequencies
    *    (c(b)+1)/(tot+B) — the paper's bag-of-hashed-ngrams model;
    *  - the log-ratio is kept in INTEGER bits via the floor-log₂ trick
    *    the bigram LM uses ([[lmPerplexity]]):
    *    wbits(b) = bitsRaw(b) − bitsTgt(b), where
    *    bitsX(b) = floor(log₂((totX + B) div (cX(b) + 1))) is the
    *    bucket's whole-bit surprisal under distribution X. Positive
    *    wbits = the bucket is more target-like than corpus-average;
    *    per-bucket resolution is whole bits, and the per-document sum
    *    over hundreds of occurrences recovers discrimination (the same
    *    trade [[lmPerplexity]] documents).
    *
    * Output: (doc_id, n_bigrams, dsir_bits, selected) per raw document,
    * selected = dsir_bits > 0 (the deterministic stand-in for the
    * paper's gumbel-noised resampling: thresholding at "more
    * target-like than not", RNG-free so re-ingestion is stable; for a
    * budgeted selection feed `dsir_bits` to [[budgetSelect]] as the
    * score). Documents with no bigrams (<2 tokens or NULL text) come
    * back (0, 0, false).
    *
    * Scale shape: the raw corpus pays TWO bigram explodes (the bucket
    * counts and the per-doc scoring stream — deliberately unshared, the
    * [[decontaminate]] recompute argument: persisting the gram stream
    * would materialize ~tokens-per-doc rows per document), the target
    * one; both count tables have exactly `buckets` rows with totals from
    * a window over them, so the weight table is bucket-sized and
    * BROADCAST into the per-doc scoring join — the only corpus-sized
    * exchange is the groupBy(doc) sum. The target corpus is typically
    * tiny (a curated domain sample); its pass costs target-size. No
    * vocabulary table exists at all — hashing bounds the model at
    * `buckets` rows no matter the corpus (the paper's reason for hashed
    * features).
    *
    * DEGENERATE CASE: an EMPTY target (zero bigrams — a bad filter, not a
    * crash) makes every bucket's target surprisal the same constant
    * floor(log₂(buckets)), so the weights collapse to "rarity under raw
    * minus a constant" — documents full of rare buckets can still come
    * back selected. Deterministic and pinned by EdgeCaseSpec, but it
    * means nothing about any domain: validate the target sample is
    * non-empty before trusting a selection.
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, textCol: String,
                  idCol: String, buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    def bucketed(df: DataFrame): DataFrame =
      bigramStream(df, textCol, idCol).select(col("doc"),
        (graft.functions.TextExpressions.charFold(
          concat_ws(" ", col("p"), col("w")), 31L, 1000000007L)
          % buckets).as("bucket"))
    val rawB = bucketed(raw)
    val tgtB = bucketed(target)
    val cr = rawB.groupBy("bucket").agg(count(lit(1)).as("cr"))
    val ct = tgtB.groupBy("bucket").agg(count(lit(1)).as("ct"))
    // totals via a WINDOW over the full-outer bucket join (the q74 rule:
    // window the histogram, never the corpus): Σ cr == |rawB| exactly.
    // A separate one-row `.agg` of either GRAM STREAM would genuinely
    // recompute its explode (map-only subtree — no exchange for
    // ReuseExchange to dedupe); aggregating cr/ct instead would lean on
    // exchange reuse to avoid the recompute — the window states the
    // one-pass shape structurally rather than trusting the rule. FULL
    // outer, not left: a bucket only the target touches has no cr row
    // but its ct still belongs in tot_t; the perDoc join below only
    // ever reads raw-present buckets. `div` keeps the ratios in
    // integers (q81's discipline — `/` on longs is double division and
    // a 100 TB total would round in it).
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    val weights = cr.join(ct, Seq("bucket"), "full_outer")
      .withColumn("tot_r", sum(coalesce(col("cr"), lit(0L))).over(all))
      .withColumn("tot_t", sum(coalesce(col("ct"), lit(0L))).over(all))
      .select(col("bucket"),
        ((length(bin(expr(
            s"(tot_r + $buckets) div (coalesce(cr, 0) + 1)"))) - 1)
          - (length(bin(expr(
              s"(tot_t + $buckets) div (coalesce(ct, 0) + 1)"))) - 1))
          .cast("long").as("wbits"))
    val perDoc = rawB.join(broadcast(weights), Seq("bucket"))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("wbits")).as("dsir_bits"))
    raw.select(col(idCol).as("doc"))
      .join(perDoc, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("dsir_bits"), lit(0L)).as("dsir_bits"),
        (coalesce(col("dsir_bits"), lit(0L)) > 0).as("selected"))
  }

  /** BPE MERGE TRAINING (Sennrich, Haddow, Birch — "Neural Machine
    * Translation of Rare Words with Subword Units", ACL'16): learn the
    * first `nMerges` byte-pair merges from the corpus — tokenizer
    * TRAINING as an engine operator, not just tokenizer application.
    * The Sennrich insight carries the whole scale story: BPE statistics
    * depend only on the WORD FREQUENCY table, so after one corpus pass
    * (word → freq) every iteration works on the vocabulary-sized symbol
    * table — explode adjacent symbol pairs weighted by freq, count,
    * take the argmax pair (ties (count DESC, left, right) — fully
    * deterministic), and rewrite the symbol sequences with the merge
    * applied. Words start as character sequences with a terminal
    * `</w>` symbol (the classic end-of-word marker).
    *
    * Merge application is the standard LEFT-TO-RIGHT single pass
    * ("a a a" under merge (a,a) → "aa a", the merged symbol does not
    * re-pair within the pass), implemented as a codegen'd `aggregate`
    * fold whose accumulator carries the one pending symbol — no UDF,
    * no driver loop over words. Each generation of the symbol table is
    * persisted and the previous unpersisted, so iteration i never
    * re-derives merges 1..i−1 (at production scale, checkpoint instead:
    * the table is vocabulary-sized either way).
    *
    * Output: (rank, left, right, pair_count) — the ordered merge table,
    * which IS the trained tokenizer. Deterministic end to end, so the
    * DuckDB oracle replays the full training loop (q162). Honest limit:
    * a 30k-merge production vocabulary wants the in-memory pair-count
    * algorithm once counts fit on the driver; this operator is the
    * distributed bootstrap that gets you there, and `nMerges` here is
    * demo-sized.
    */

  /** Token-bigram stream (doc, p, w) — shared by the DSIR
    * selector and the whole LM family. */
  private[ext] def bigramStream(df: DataFrame, textCol: String,
                           idCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    // sequence(1, n-1) would generate DESCENDING [1, 0] for one-token
    // docs — guard to an empty index list instead
    val idxs = when(size(toks) >= 2, sequence(lit(1), size(toks) - 1))
      .otherwise(array().cast("array<int>"))
    df.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc"),
        explode(transform(idxs, i => struct(
          element_at(toks, i).as("p"),
          element_at(toks, i + 1).as("w")))).as("g"))
      .select(col("doc"), col("g.p").as("p"), col("g.w").as("w"))
  }

}
