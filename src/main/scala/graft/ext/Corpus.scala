package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-management operators for training-data pipelines: deterministic
  * train/val/test splitting and cross-split decontamination.
  *
  * Scale design:
  *  - splitting is a pure map stage (a content fingerprint mod 100) — zero
  *    shuffle, stable under re-ingestion and re-partitioning because the
  *    assignment depends on the DOCUMENT, not on row order, file layout, or
  *    a session RNG (`randomSplit` gives none of those guarantees);
  *  - decontamination is an inverted-index equi-join on n-gram hashes,
  *    never a doc×doc product: work scales with Σ_gram df_train(g)·df_eval(g),
  *    the true collision volume. A stop-gram cap (`maxDf`) drops
  *    degenerate grams whose document frequency exceeds the cap BEFORE the
  *    join — at 100 TB one boilerplate sentence shared by 1% of the corpus
  *    would otherwise dominate the join output quadratically.
  */
object Corpus {

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
                          sourceCol: String): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_source"))
    val minN = counts.agg(min(col("n_source")).as("n_min"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col(sourceCol), col("n_source"),
        floor((lit(1000) * sqrt(col("n_min"))) / sqrt(col("n_source")))
          .cast("long").as("rate_pm"))
    df.join(broadcast(rates), Seq(sourceCol))
      .where(pmod(TextAnalysis.fingerprint(col(textCol)), lit(1000L))
        < col("rate_pm"))
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
    import org.apache.spark.sql.expressions.Window
    require(budgetPerMille >= 0 && budgetPerMille <= 1000,
      s"budgetPerMille out of [0,1000]: $budgetPerMille")
    val pcols = partitionCols.map(col)
    val keyCols = partitionCols :+ "score"
    val docs = df.where(col(textCol).isNotNull)
      .select(pcols ++ Seq(col(idCol).as("id"), score.as("score"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens")): _*)
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
      .select(Seq(col("id").as(idCol)) ++ pcols ++
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
  def bpeMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"nMerges=$nMerges must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(concat(split(col("word"), ""), array(lit("</w>"))).as("syms"),
        col("freq"))
      .persist()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var stop = false
    for (i <- 1 to nMerges if !stop) {
      val top = words
        .select(col("freq"),
          explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) stop = true
      else {
        val a = top.head.getString(0)
        val b = top.head.getString(1)
        val n = top.head.getLong(2)
        merges += ((i, a, b, n))
        val next = words
          .select(bpeApplyMerge(col("syms"), a, b).as("syms"), col("freq"))
          .persist()
        next.count() // materialize before releasing the parent lineage
        words.unpersist()
        words = next
      }
    }
    words.unpersist()
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** BPE MERGE TRAINING, PHASE 2 — the PRODUCTION path ([[bpeMerges]]'s
    * scaladoc's "honest limit" closed): Sennrich et al.'s classic
    * in-memory merge loop over the word-frequency table, run on the
    * driver once that table fits there. The split of labor mirrors the
    * reference implementation's own structure: the corpus-sized work
    * (word → freq) is ONE distributed pass — the only part that scales
    * with corpus bytes — and the merge loop is vocabulary-sized, with
    * incremental pair-count maintenance (only words CONTAINING the
    * merged pair are re-counted, via a pair → word index), so 30k
    * merges cost 30k argmax scans plus touched-word rewrites, not 30k
    * corpus passes and not 30k Spark jobs. Identical output contract
    * and determinism to [[bpeMerges]] — same (count DESC, left, right)
    * tie rule, same left-to-right non-overlapping merge application —
    * property-pinned equal on shared fixtures (CorpusSpec) and
    * oracle-replayed at 64 merges (q176).
    *
    * `maxVocab` is the loud guard on the driver-residency assumption: a
    * vocabulary above it (the raw-web-crawl case) fails with
    * instructions rather than OOMing mid-collect — at that size, run
    * [[bpeMerges]]' distributed loop or pre-filter the tail (freq ≥ 2
    * cuts a crawl vocabulary ~in half with no effect on early merges).
    *
    * Output: (rank, left, right, pair_count), rank 1..nMerges (fewer if
    * the table runs out of pairs).
    */
  def bpeMergesInMemory(docs: DataFrame, textCol: String, nMerges: Int,
                        maxVocab: Int = 5000000): DataFrame = {
    require(nMerges >= 1, s"nMerges=$nMerges must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val wfDf = docs.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val nWords = wfDf.count()
    require(nWords <= maxVocab,
      s"vocabulary has $nWords distinct words > maxVocab=$maxVocab — " +
        "the in-memory merge loop assumes the word-frequency table fits " +
        "the driver; use bpeMerges (distributed) or pre-filter the " +
        "frequency tail first")
    // the ONE driver-side collect: vocabulary-sized by the guard above
    val wf = wfDf.as[(String, Long)].collect()
    val words: Array[Array[String]] =
      wf.map { case (w, _) => w.split("").filter(_.nonEmpty) :+ "</w>" }
    val freqs: Array[Long] = wf.map(_._2)
    val counts = scala.collection.mutable.HashMap
      .empty[(String, String), Long]
    val index = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    // LAZY-DELETION max-heap over (count, left, right) with the exact
    // argmax tie rule (count DESC, then lexicographic pair ASC): every
    // count change enqueues the new value; pops that no longer match
    // the live count are discarded. This turns the per-merge argmax
    // from a linear scan over all pairs (the Sennrich reference's
    // behavior — fine at 64 merges, 30k × |pairs| at production) into
    // O(log |pairs|) amortized per count update.
    val ord = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String),
                  y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val a = y._2.compareTo(x._2) // reversed: smaller left wins
          if (a != 0) a else y._3.compareTo(x._3)
        }
      }
    }
    val pq = scala.collection.mutable.PriorityQueue
      .empty[(Long, String, String)](ord)
    def tally(i: Int, sign: Long): Unit = {
      val s = words(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = counts.getOrElse(p, 0L) + sign * freqs(i)
        if (c == 0L) counts.remove(p)
        else { counts(p) = c; pq.enqueue((c, p._1, p._2)) }
        if (sign > 0)
          index.getOrElseUpdate(p,
            scala.collection.mutable.Set.empty[Int]) += i
        j += 1
      }
    }
    words.indices.foreach(tally(_, 1L))
    def applyMerge(s: Array[String], a: String, b: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var j = 0
      while (j < s.length) {
        if (j < s.length - 1 && s(j) == a && s(j + 1) == b) {
          out += a + b; j += 2
        } else { out += s(j); j += 1 }
      }
      out.toArray
    }
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var stop = false
    for (r <- 1 to nMerges if !stop) {
      // pop the heap past stale entries (lazy deletion: an entry is
      // live iff its count still matches); every live count was
      // enqueued at its current value, so the first live pop IS the
      // argmax under the tie rule
      var top: Option[(Long, String, String)] = None
      while (top.isEmpty && pq.nonEmpty) {
        val e = pq.dequeue()
        if (counts.get((e._2, e._3)).contains(e._1)) top = Some(e)
      }
      if (top.isEmpty) stop = true
      else {
        val (n, a, b) = top.get
        merges += ((r, a, b, n))
        // stale-tolerant index walk: entries outlive rewrites; the
        // adjacency re-check is the merge application itself
        index.getOrElse((a, b), scala.collection.mutable.Set.empty)
          .toArray.sorted.foreach { i =>
            val next = applyMerge(words(i), a, b)
            if (!(next sameElements words(i))) {
              tally(i, -1L)
              words(i) = next
              tally(i, 1L)
            }
          }
        // no explicit removal: the tally decrements drain (a, b) to zero
        // exactly (every word holding it is indexed), which deletes it
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** BPE SEGMENTATION with a trained merge table — the apply half of
    * [[bpeMerges]], closing the train → tokenize loop: per document,
    * the whitespace token count next to the BPE token count under the
    * learned merges (the sequence-length accounting every packing /
    * budget decision actually needs — models consume BPE tokens, not
    * words). The production shape: merges apply to the DISTINCT-WORD
    * dictionary (vocabulary-sized, the Sennrich table), never per
    * occurrence; the corpus-sized word stream then equi-joins the
    * finished dictionary and folds per doc. The dictionary join is NOT
    * broadcast-hinted: a web-crawl vocabulary runs to hundreds of
    * millions of distinct words, where a forced broadcast OOMs the
    * driver — Spark's planner (and AQE at runtime) broadcasts it when
    * its measured size is small and falls back to a shuffled join when
    * it is not, which is the contract a 100 TB corpus needs. `merges`
    * ordered as learned; each applies as one [[bpeApplyMerge]]
    * projection layer.
    *
    * Output: (doc_id, n_words, n_bpe_tokens); empty/NULL-text documents
    * come back (0, 0).
    */
  def bpeSegmentCounts(docs: DataFrame, textCol: String, idCol: String,
                       merges: Seq[(String, String)]): DataFrame = {
    var dict = docs.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0).distinct()
      .select(col("word"),
        concat(split(col("word"), ""), array(lit("</w>"))).as("syms"))
    merges.foreach { case (a, b) =>
      dict = dict.select(col("word"),
        bpeApplyMerge(col("syms"), a, b).as("syms"))
    }
    val stream = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc"),
        explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0)
    val perDoc = stream.join(dict, Seq("word"))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("syms"))).cast("long").as("n_bpe_tokens"))
    docs.select(col(idCol).as("doc"))
      .join(perDoc, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }

  /** TOKENIZER FERTILITY report: BPE tokens per word, per group — the
    * metric a tokenizer owner reads per language/source before fixing
    * the vocabulary (a group whose fertility runs high is paying more
    * sequence length per word; the classic multilingual-vocab
    * diagnostic). Integer ppm (tokens·10⁶ div words) in the repo's
    * no-float-ratio discipline. Groups with zero words report 0.
    * Input: [[bpeSegmentCounts]] output joined back to the grouping
    * column — count relations only, one aggregate per group.
    */
  def bpeFertility(docs: DataFrame, textCol: String, idCol: String,
                   groupCol: String,
                   merges: Seq[(String, String)]): DataFrame = {
    val seg = bpeSegmentCounts(docs, textCol, idCol, merges)
    docs.select(col(idCol), col(groupCol))
      .join(seg, Seq(idCol))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
      .select(col(groupCol), col("n_docs"), col("n_words"),
        col("n_bpe_tokens"),
        when(col("n_words") > 0L,
          expr("n_bpe_tokens * 1000000L div n_words"))
          .otherwise(lit(0L)).as("fertility_ppm"))
  }

  /** UNIGRAM-LM TOKENIZER TRAINING (Kudo, ACL'18 — "Subword
    * Regularization": the SentencePiece unigram model) — the OTHER
    * production tokenizer next to BPE, trained by hard-EM over a seed
    * vocabulary. Same split of labor as [[bpeMergesInMemory]]: the
    * corpus-sized work (word → freq) is ONE distributed pass, and the
    * EM loop runs on the driver over the vocabulary-sized table, with
    * the same loud `maxVocab` residency guard.
    *
    * ALL statistics are INTEGER (the q156/q158 trained-model
    * discipline), so the trained vocabulary replays bit-identically in
    * any engine — no float log-likelihoods anywhere:
    *  - seed: every substring of length 1..`maxPieceLen` of every
    *    distinct word, counted weighted by word frequency; the vocab is
    *    all single characters (never prunable, so segmentation is
    *    total) plus the top `seedSize` multi-char pieces by
    *    (count DESC, piece ASC);
    *  - E-step: per distinct word, the VITERBI segmentation under
    *    integer surprisal costs bits(p) = floor(log₂((T + V) div
    *    (c(p) + 1))) (add-one smoothing; T = Σ counts, V = |vocab| —
    *    the corpus's floor-log₂ convention), deterministic tie rule
    *    (total bits ASC, then piece count ASC, then the U+0001-joined
    *    path string ASC — Java UTF-16 order, which equals an oracle
    *    engine's UTF-8 byte order while pieces are ASCII, the corpus
    *    fixture's pinned assumption);
    *  - M-step: c(p) = Σ over words freq · (occurrences of p in the
    *    word's Viterbi path); multi-char pieces whose count falls to 0
    *    prune (the natural SentencePiece shrink), characters never do.
    *
    * Output: (piece, n_uses, cost_bits) — the trained model, cost_bits
    * from the FINAL counts — ordered (n_uses DESC, piece). q197's
    * DuckDB oracle replays the seed, every EM iteration's Viterbi
    * (per-position argmin CTEs), the M-step counts, the pruning, and
    * the final costs; CorpusSpec pins Viterbi optimality against
    * brute-force enumeration of ALL segmentations.
    */
  def unigramTrain(docs: DataFrame, textCol: String, seedSize: Int = 64,
                   maxPieceLen: Int = 3, iters: Int = 2,
                   maxVocab: Int = 5000000): DataFrame = {
    require(seedSize >= 1, s"seedSize must be positive: $seedSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be positive: $maxPieceLen")
    require(iters >= 1, s"iters must be positive: $iters")
    val spark = docs.sparkSession
    import spark.implicits._
    val wfDf = docs.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val nWords = wfDf.count()
    require(nWords <= maxVocab,
      s"vocabulary has $nWords distinct words > maxVocab=$maxVocab — " +
        "the in-memory EM loop assumes the word-frequency table fits " +
        "the driver; pre-filter the frequency tail first (freq >= 2 " +
        "halves a crawl vocabulary with no effect on the learned pieces)")
    // the ONE driver-side collect: vocabulary-sized by the guard above
    val wf = wfDf.as[(String, Long)].collect().sortBy(_._1)
    // the tie rule compares separator-joined path strings; a corpus
    // character equal to the separator would make two different paths
    // compare equal — reject loudly instead of training a silently
    // ambiguous model
    require(!wf.exists(_._1.indexOf(unigramSep.toInt) >= 0),
      s"corpus contains the Viterbi path separator U+0001 — " +
        "strip control characters before training")
    var vocab: Map[String, Long] = unigramSeed(wf, seedSize, maxPieceLen)
    for (_ <- 1 to iters if vocab.nonEmpty) {
      val t = vocab.valuesIterator.sum
      val v = vocab.size.toLong
      val bits = vocab.map { case (p, c) => p -> unigramBits(c, t, v) }
      val newCounts = scala.collection.mutable.HashMap.empty[String, Long]
      for ((w, f) <- wf;
           p <- unigramViterbi(w, bits, maxPieceLen))
        newCounts(p) = newCounts.getOrElse(p, 0L) + f
      vocab = vocab.keysIterator
        .map(p => p -> newCounts.getOrElse(p, 0L))
        .filter { case (p, c) => p.length == 1 || c > 0 }
        .toMap
    }
    val t = vocab.valuesIterator.sum
    val v = vocab.size.toLong
    vocab.toSeq
      .sortBy { case (p, c) => (-c, p) }(
        Ordering.Tuple2(Ordering.Long, Ordering.String))
      .map { case (p, c) => (p, c, unigramBits(c, t, v)) }
      .toDF("piece", "n_uses", "cost_bits")
  }

  /** SOFT-EM unigram training — [[unigramTrain]]'s expected-counts
    * sibling, the full Kudo ACL'18 E-step: instead of crediting only the
    * single Viterbi path, each EM round runs FORWARD–BACKWARD over every
    * word and credits every piece occurrence by its posterior
    * probability under the current model (expected counts). This is
    * what SentencePiece actually trains with; the hard-EM member stays
    * the family's deterministic, integer-statistics, oracle-replayable
    * one (float log-sum-exp cannot replay bit-identically across
    * engines — the documented reason this variant is property-tested
    * against a plain-Scala enumeration reference instead of
    * DuckDB-replayed).
    *
    * Same split of labor and guards as the hard trainer: one
    * distributed word→freq pass, the EM loop driver-side over the
    * `maxVocab`-guarded vocabulary, the same seed
    * ([[unigramSeed]] — shared code, identical starting vocabulary).
    * Probabilities are add-one smoothed, p(piece) = (c + 1) / (T + V),
    * mirroring the hard trainer's integer surprisal; the E-step runs in
    * log space (scaled forward–backward) so long words cannot
    * underflow. Pieces whose expected count falls below `pruneBelow`
    * prune (multi-char only — characters keep segmentation total).
    * Deterministic for a fixed corpus: words iterate in sorted order,
    * so every float reduction has a fixed operation order.
    *
    * Output: (piece, exp_uses DOUBLE, neg_log2p DOUBLE — the final
    * model's −log₂ p(piece)) ordered (exp_uses DESC, piece ASC).
    */
  def unigramTrainSoft(docs: DataFrame, textCol: String, seedSize: Int = 64,
                       maxPieceLen: Int = 3, iters: Int = 2,
                       pruneBelow: Double = 0.5,
                       maxVocab: Int = 5000000): DataFrame = {
    require(seedSize >= 1, s"seedSize must be positive: $seedSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be positive: $maxPieceLen")
    require(iters >= 1, s"iters must be positive: $iters")
    require(pruneBelow >= 0.0, s"pruneBelow must be >= 0: $pruneBelow")
    val spark = docs.sparkSession
    import spark.implicits._
    val wfDf = docs.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val nWords = wfDf.count()
    require(nWords <= maxVocab,
      s"vocabulary has $nWords distinct words > maxVocab=$maxVocab — " +
        "the in-memory EM loop assumes the word-frequency table fits " +
        "the driver; pre-filter the frequency tail first")
    val wf = wfDf.as[(String, Long)].collect().sortBy(_._1)
    var vocab: Map[String, Double] =
      unigramSeed(wf, seedSize, maxPieceLen)
        .map { case (p, c) => p -> c.toDouble }
    for (_ <- 1 to iters if vocab.nonEmpty) {
      val t = vocab.valuesIterator.sum
      val v = vocab.size.toDouble
      val logp = vocab.map { case (p, c) =>
        p -> (math.log(c + 1.0) - math.log(t + v)) }
      val newCounts = scala.collection.mutable.HashMap.empty[String, Double]
      for ((w, f) <- wf;
           (p, e) <- unigramExpectedCounts(w, logp, maxPieceLen))
        newCounts(p) = newCounts.getOrElse(p, 0.0) + f * e
      vocab = vocab.keysIterator
        .map(p => p -> newCounts.getOrElse(p, 0.0))
        .filter { case (p, c) => p.length == 1 || c >= pruneBelow }
        .toMap
    }
    val t = vocab.valuesIterator.sum
    val v = vocab.size.toDouble
    vocab.toSeq
      .sortBy { case (p, c) => (-c, p) }(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.String))
      .map { case (p, c) =>
        (p, c, -(math.log(c + 1.0) - math.log(t + v)) / math.log(2.0)) }
      .toDF("piece", "exp_uses", "neg_log2p")
  }

  /** Posterior expected piece-occurrence counts for ONE word under a
    * unigram model (log-probabilities) — the forward–backward E-step of
    * [[unigramTrainSoft]]:
    *   α(0) = 1, α(k) = Σ_j α(j)·p(w[j:k]);  β(n) = 1 symmetric;
    *   E[count of occurrence (j,k)] = α(j)·p(w[j:k])·β(k) / α(n).
    * Log-space accumulation (log-sum-exp) so a long word of
    * low-probability pieces cannot underflow. Every single character is
    * in the vocabulary, so α(n) > 0 always. */
  private[graft] def unigramExpectedCounts(
      w: String, logp: Map[String, Double], maxPieceLen: Int)
      : Map[String, Double] = {
    val n = w.length
    def lse(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val m = math.max(a, b); m + math.log1p(math.exp(-(a - b).abs)) }
    val la = Array.fill(n + 1)(Double.NegativeInfinity)
    la(0) = 0.0
    for (k <- 1 to n; j <- math.max(0, k - maxPieceLen) until k;
         lp <- logp.get(w.substring(j, k)))
      la(k) = lse(la(k), la(j) + lp)
    val lb = Array.fill(n + 1)(Double.NegativeInfinity)
    lb(n) = 0.0
    for (j <- n - 1 to 0 by -1;
         k <- j + 1 to math.min(n, j + maxPieceLen);
         lp <- logp.get(w.substring(j, k)))
      lb(j) = lse(lb(j), lp + lb(k))
    val e = scala.collection.mutable.HashMap.empty[String, Double]
    for (j <- 0 until n; k <- j + 1 to math.min(n, j + maxPieceLen);
         lp <- logp.get(w.substring(j, k))) {
      val p = w.substring(j, k)
      e(p) = e.getOrElse(p, 0.0) + math.exp(la(j) + lp + lb(k) - la(n))
    }
    e.toMap
  }

  /** [[unigramTrainSoft]] in SHARED FIXED POINT — the determinism upgrade
    * that moves soft-EM from property-tested into the exact-replay oracle
    * set (the float trainer's log-sum-exp chains can never hash-match a
    * SQL replay; see [[graft.ops.Fp]]). Same EM structure — seed, `iters`
    * forward–backward E-steps, expectation-weighted M-step re-count,
    * prune — but every quantity is an integer:
    *
    *  - counts are MICRO-UNITS (2^20 per expected use);
    *  - log-probabilities are fp-bits via [[graft.ops.Fp.log2fp]]
    *    (add-one smoothing becomes `log2fp(c + 2^20) − log2fp(t + v·2^20)`);
    *  - α/β accumulate with the PAIRWISE quantized log-sum-exp
    *    [[graft.ops.Fp.lse2]], legs folded in ascending split order (the
    *    fold order is part of the contract — lse2 is not associative
    *    under quantization, so the oracle folds identically);
    *  - posteriors come from [[graft.ops.Fp.exp2fp30]] with the deficit
    *    clamped at 0 (table rounding can push a path a quantum past its
    *    own total).
    *
    * M-step sums are then plain integer sums — order-free, so a SQL
    * GROUP BY replays them exactly. Driver-side over the collected
    * word-frequency table like the float trainer (same `maxVocab`
    * guard, same justification). Output: (piece, exp_uses_micro,
    * neg_log2p_fp) ordered (exp_uses_micro DESC, piece ASC).
    */
  def unigramTrainSoftFp(docs: DataFrame, textCol: String,
                         seedSize: Int = 64, maxPieceLen: Int = 3,
                         iters: Int = 2,
                         pruneBelowMicro: Long = graft.ops.Fp.B / 2,
                         maxVocab: Int = 5000000): DataFrame = {
    import graft.ops.Fp
    require(seedSize >= 1, s"seedSize must be positive: $seedSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be positive: $maxPieceLen")
    require(iters >= 1, s"iters must be positive: $iters")
    require(pruneBelowMicro >= 0, s"pruneBelowMicro must be >= 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val wfDf = docs.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val nWords = wfDf.count()
    require(nWords <= maxVocab,
      s"vocabulary has $nWords distinct words > maxVocab=$maxVocab — " +
        "the in-memory EM loop assumes the word-frequency table fits " +
        "the driver; pre-filter the frequency tail first")
    val wf = wfDf.as[(String, Long)].collect().sortBy(_._1)
    var vocab: Map[String, Long] =
      unigramSeed(wf, seedSize, maxPieceLen)
        .map { case (p, c) => p -> c * Fp.B }
    for (_ <- 1 to iters if vocab.nonEmpty) {
      val t = vocab.valuesIterator.sum
      val v = vocab.size.toLong
      val denom = Fp.log2fp(t + v * Fp.B)
      val logp = vocab.map { case (p, c) =>
        p -> (Fp.log2fp(c + Fp.B) - denom) }
      val newCounts = scala.collection.mutable.HashMap.empty[String, Long]
      for ((w, f) <- wf;
           (p, e) <- unigramExpectedCountsFp(w, logp, maxPieceLen))
        newCounts(p) = newCounts.getOrElse(p, 0L) + f * e
      vocab = vocab.keysIterator
        .map(p => p -> newCounts.getOrElse(p, 0L))
        .filter { case (p, c) => p.length == 1 || c >= pruneBelowMicro }
        .toMap
    }
    val t = vocab.valuesIterator.sum
    val v = vocab.size.toLong
    val denom = Fp.log2fp(t + v * Fp.B)
    vocab.toSeq
      .sortBy { case (p, c) => (-c, p) }
      .map { case (p, c) => (p, c, denom - Fp.log2fp(c + Fp.B)) }
      .toDF("piece", "exp_uses_micro", "neg_log2p_fp")
  }

  /** Integer forward–backward posteriors for ONE word (fp-bits model) —
    * [[unigramTrainSoftFp]]'s E-step. Returns MICRO-UNIT expected counts
    * per piece. Leg fold order (ascending split index) and the max(0, ·)
    * posterior clamp are contract — the oracle replays both. */
  private[graft] def unigramExpectedCountsFp(
      w: String, logp: Map[String, Long], maxPieceLen: Int)
      : Map[String, Long] = {
    import graft.ops.Fp
    val n = w.length
    val none = Long.MinValue
    def acc(cur: Long, x: Long): Long = if (cur == none) x else Fp.lse2(cur, x)
    val la = Array.fill(n + 1)(none)
    la(0) = 0L
    for (k <- 1 to n; j <- math.max(0, k - maxPieceLen) until k;
         lp <- logp.get(w.substring(j, k)) if la(j) != none)
      la(k) = acc(la(k), la(j) + lp)
    val lb = Array.fill(n + 1)(none)
    lb(n) = 0L
    for (j <- n - 1 to 0 by -1;
         k <- j + 1 to math.min(n, j + maxPieceLen);
         lp <- logp.get(w.substring(j, k)) if lb(k) != none)
      lb(j) = acc(lb(j), lp + lb(k))
    val e = scala.collection.mutable.HashMap.empty[String, Long]
    for (j <- 0 until n; k <- j + 1 to math.min(n, j + maxPieceLen);
         lp <- logp.get(w.substring(j, k))
         if la(j) != none && lb(k) != none) {
      val p = w.substring(j, k)
      val y = math.max(0L, la(n) - (la(j) + lp + lb(k)))
      val micro = Fp.exp2fp30(y) >> (Fp.MantBits - Fp.FracBits)
      e(p) = e.getOrElse(p, 0L) + micro
    }
    e.toMap
  }

  /** The shared unigram SEED: every substring of length 1..maxPieceLen
    * of every distinct word, counted weighted by word frequency; all
    * single characters (never prunable — keeps segmentation total) plus
    * the top `seedSize` multi-char pieces by (count DESC, piece ASC).
    * One implementation for the hard-EM and soft-EM trainers so both
    * start from the identical vocabulary. */
  private def unigramSeed(wf: Array[(String, Long)], seedSize: Int,
                          maxPieceLen: Int): Map[String, Long] = {
    val seedCounts = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, f) <- wf; st <- 0 until w.length;
         pl <- 1 to math.min(maxPieceLen, w.length - st)) {
      val p = w.substring(st, st + pl)
      seedCounts(p) = seedCounts.getOrElse(p, 0L) + f
    }
    val chars = seedCounts.keysIterator.filter(_.length == 1).toSeq
    val multi = seedCounts.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }(
        Ordering.Tuple2(Ordering.Long, Ordering.String))
      .take(seedSize).map(_._1)
    (chars ++ multi).map(p => p -> seedCounts(p)).toMap
  }

  /** floor(log₂((t + v) div (c + 1))) — the integer add-one-smoothed
    * surprisal the whole corpus family uses. */
  private[graft] def unigramBits(c: Long, t: Long, v: Long): Long =
    63L - java.lang.Long.numberOfLeadingZeros((t + v) / (c + 1))

  /** The Viterbi path separator for the TIE RULE's string comparison —
    * U+0001, a character no real token stream carries (and
    * [[unigramTrain]] rejects loudly if one does). The path must NOT be
    * split back into pieces (a piece containing the separator would
    * silently vanish); the DP carries the piece list alongside. */
  private[graft] val unigramSep = '\u0001'

  /** Deterministic Viterbi over one word: minimal (total bits, piece
    * count, separator-joined path string) — the exact tie rule q197's
    * oracle replays (chr(1) joins on the SQL side). The pieces ride the
    * DP as a list, never recovered by re-splitting the path. Every
    * single character is in the training vocabulary, so position k is
    * always reachable from k−1. */
  private[graft] def unigramViterbi(w: String, bits: Map[String, Long],
                                    maxPieceLen: Int): Seq[String] = {
    val dp = new Array[(Long, Int, String, List[String])](w.length + 1)
    dp(0) = (0L, 0, "", Nil)
    var k = 1
    while (k <= w.length) {
      var best: (Long, Int, String, List[String]) = null
      var j = math.max(0, k - maxPieceLen)
      while (j < k) {
        if (dp(j) != null) bits.get(w.substring(j, k)).foreach { b =>
          val piece = w.substring(j, k)
          val cand = (dp(j)._1 + b, dp(j)._2 + 1,
            dp(j)._3 + unigramSep + piece, piece :: dp(j)._4)
          if (best == null ||
              cand._1 < best._1 ||
              (cand._1 == best._1 && (cand._2 < best._2 ||
                (cand._2 == best._2 && cand._3 < best._3))))
            best = cand
        }
        j += 1
      }
      dp(k) = best
      k += 1
    }
    require(dp(w.length) != null,
      s"word '$w' not segmentable — a character is missing from the vocab")
    dp(w.length)._4.reverse
  }

  /** UNIGRAM SEGMENTATION with a trained model — the apply half of
    * [[unigramTrain]], [[bpeSegmentCounts]]'s sibling: per document,
    * whitespace word count, unigram token count, and total model bits
    * under the trained costs. `model` is [[unigramTrain]]'s output
    * (piece, n_uses, cost_bits) — bounded by seedSize + |alphabet| BY
    * CONSTRUCTION, so collecting it is a k-row read, and the costs ride
    * into the plan as one literal map.
    *
    * The per-word Viterbi is a codegen'd `aggregate` HOF over a packed
    * accumulator (bits·2²⁰ + pieces, so minimizing the packed long IS
    * the (bits ASC, pieces ASC) tie rule — exact while words stay under
    * 2²⁰ chars, i.e. always). Characters unseen in training cost
    * unk_bits = floor(log₂(T + V)) (the c = 0 smoothing floor), so the
    * stage is total on any corpus.
    *
    * The distinct-word dictionary is segmented ONCE (vocabulary-sized)
    * and the corpus-sized word stream equi-joins it — NOT
    * broadcast-hinted, the [[bpeSegmentCounts]] rule: a crawl
    * dictionary is hundreds of millions of words; the planner/AQE
    * broadcasts it only when it is actually small.
    *
    * Output: (id, n_words, n_unigram_tokens, n_bits); empty/NULL-text
    * documents come back (0, 0, 0).
    */
  def unigramSegmentCounts(docs: DataFrame, textCol: String, idCol: String,
                           model: DataFrame): DataFrame = {
    val rows = model.select("piece", "n_uses", "cost_bits").collect()
    require(rows.nonEmpty, "empty unigram model")
    val t = rows.iterator.map(_.getLong(1)).sum
    val v = rows.length.toLong
    val unkBits = 63L - java.lang.Long.numberOfLeadingZeros(t + v)
    val vocab = rows.map(r => (r.getString(0), r.getLong(2))).toSeq
      .sortBy(_._1)
    val maxPieceLen = vocab.iterator.map(_._1.length).max
    val vmap = map(vocab.flatMap { case (p, b) =>
      Seq(lit(p), lit(b)) }: _*)
    val packedDp = aggregate(
      sequence(lit(1), length(col("word"))),
      array(lit(0L)),
      (acc, k) => concat(acc, array(array_min(transform(
        sequence(greatest(k - maxPieceLen, lit(0)), k - lit(1)),
        j => {
          val plen = k - j
          val piece = col("word").substr(j + lit(1), plen)
          val b = element_at(vmap, piece)
          val bEff = when(plen === lit(1),
            coalesce(b, lit(unkBits))).otherwise(b)
          element_at(acc, j + lit(1)) + (shiftleft(bEff, 20) + lit(1L))
        })))),
      acc => element_at(acc, -1))
    val dict = docs.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0).distinct()
      .select(col("word"), packedDp.as("pk"))
      .select(col("word"),
        col("pk").bitwiseAND(lit((1L << 20) - 1)).as("n_pieces"),
        shiftrightunsigned(col("pk"), 20).as("seg_bits"))
    val stream = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc"),
        explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0)
    val perDoc = stream.join(dict, Seq("word"))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_unigram_tokens"),
        sum(col("seg_bits")).as("n_bits"))
    docs.select(col(idCol).as("doc"))
      .join(perDoc, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_unigram_tokens"), lit(0L)).as("n_unigram_tokens"),
        coalesce(col("n_bits"), lit(0L)).as("n_bits"))
  }

  /** One left-to-right merge pass over a symbol array: replace every
    * non-overlapping adjacent (a, b) with the concatenated symbol. The
    * accumulator holds (emitted symbols, one pending symbol); the
    * finisher flushes the pending tail. */
  private def bpeApplyMerge(syms: Column, a: String, b: String): Column = {
    val accT = "struct<done:array<string>,prev:string>"
    def flush(acc: Column): Column =
      when(acc.getField("prev").isNull, acc.getField("done"))
        .otherwise(concat(acc.getField("done"), array(acc.getField("prev"))))
    aggregate(syms,
      struct(array().cast("array<string>").as("done"),
        lit(null).cast("string").as("prev")).cast(accT),
      (acc, s) =>
        when(acc.getField("prev") === lit(a) && s === lit(b),
          struct(
            concat(acc.getField("done"), array(lit(a + b))).as("done"),
            lit(null).cast("string").as("prev")).cast(accT))
          .otherwise(struct(flush(acc).as("done"), s.as("prev")).cast(accT)),
      acc => flush(acc))
  }

  /** Naive Bayes reference-class filter — the fastText/CCNet-style
    * "train a cheap classifier on a labeled seed, filter the crawl with
    * it" pipeline stage, as one declarative plan. `labelCol` marks the
    * training rows' reference class (CCNet uses "is Wikipedia"; q157
    * uses `lang = 'en'`); every `score` document gets the multinomial-NB
    * log-odds of that class over its token stream, with add-one
    * smoothing and a uniform class prior.
    *
    * ALL log arithmetic is the corpus's INTEGER floor-log₂ convention
    * ([[lmPerplexity]]'s `length(bin(x)) − 1` trick): per token t and
    * class c the smoothed surprisal is
    * bits_c(t) = floor(log₂((T_c + V) div (n_c(t) + 1))) with T_c the
    * class's token total and V the train vocabulary size, and the
    * per-token evidence is wbits(t) = bits_neg(t) − bits_pos(t)
    * (positive ⇒ the token is cheaper to encode under the reference
    * class). No float log anywhere, so the trained model AND every
    * verdict replay bit-identically in any engine. Tokens unseen in
    * training score the n_c = 0 floor through the same formula (the
    * one-row `unk` fallback); resolution is whole bits per token and a
    * document's margin sums hundreds of them.
    *
    * Output: (id, n_tokens, margin_bits, keep) per score document,
    * keep = margin_bits ≥ 0; empty/NULL-text documents come back
    * (0, 0, true) — a zero-evidence doc is uniform, the caller's
    * threshold decides its fate.
    *
    * Scale shape: training is one labeled-token explode folded to a
    * vocabulary-sized (token, n_pos, n_neg) relation (map-side partial
    * aggs); totals and V are three scalars folded by one aggregate and
    * broadcast as a single row (never a window over the unbounded
    * histogram, never a pass over the corpus). Scoring joins the
    * score corpus's token stream to the weight relation by token —
    * the planner/AQE broadcasts when the vocabulary is actually small
    * and shuffles otherwise (no forced hint: a fastText-scale seed has
    * tens of millions of tokens) — and folds per doc. Nothing collects;
    * at 100 TB
    * persist the count relation like the LM's and rescore incrementally.
    */
  def nbClassBits(train: DataFrame, score: DataFrame, labelCol: Column,
                  textCol: String, idCol: String): DataFrame = {
    val toks = train
      .where(col(textCol).isNotNull)
      .select(labelCol.cast("boolean").as("y"),
        explode(graft.ext.TextAnalysis.tokens(col(textCol))).as("tok"))
    val counts = toks.groupBy("tok")
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("np"),
        sum(when(!col("y"), 1L).otherwise(0L)).as("nn"))
    // Class totals and V are three scalars: one map-side-partial agg,
    // broadcast as a single row into everything that needs them. (An
    // unpartitioned window here would funnel the whole vocabulary
    // relation through one partition — the histogram is crawl-vocabulary
    // sized, not bounded.)
    val totals = counts
      .agg(sum("np").as("tp"), sum("nn").as("tn"), count(lit(1)).as("v"))
    val weighted = counts
      .crossJoin(broadcast(totals))
      .select(col("tok"),
        ((length(bin(expr("(tn + v) div (nn + 1)"))) - 1)
          - (length(bin(expr("(tp + v) div (np + 1)"))) - 1))
          .cast("long").as("wbits"))
    // the unseen-token fallback: the same formula at n_c = 0, one row
    val unk = totals
      .select(((length(bin(expr("(tn + v) div 1"))) - 1)
        - (length(bin(expr("(tp + v) div 1"))) - 1))
        .cast("long").as("unk_wbits"))
    val stream = score
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("doc"),
        explode(graft.ext.TextAnalysis.tokens(col(textCol))).as("tok"))
    // No broadcast hint on the vocabulary join: `weighted` is one row per
    // distinct seed-set token, unbounded for a fastText-scale labeled
    // seed. The planner/AQE broadcasts it when it is actually small and
    // shuffles otherwise (PlanAuditSpec pins the broadcast-disabled plan).
    val perDoc = stream
      .join(weighted, Seq("tok"), "left")
      .crossJoin(broadcast(unk))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("wbits"), col("unk_wbits"))).as("margin_bits"))
    score.select(col(idCol).as("doc"))
      .join(perDoc, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("margin_bits"), lit(0L)).as("margin_bits"),
        (coalesce(col("margin_bits"), lit(0L)) >= 0).as("keep"))
  }

  /** KenLM-shaped n-gram LM quality score: per-document surprisal under a
    * bigram model with add-one smoothing, trained on the corpus itself
    * (the CCNet recipe scores against a reference-corpus LM — pass that
    * corpus as `train` — and keeps the low-perplexity tail). Per bigram
    * (p, w) the smoothed probability is (c(p,w) + 1) / (c(p) + V); the
    * reported surprisal is its INTEGER log₂ floor:
    *
    *   bits(p, w) = floor(log₂((c(p) + V) div (c(p,w) + 1)))
    *
    * computed as `length(bin(ratio)) − 1` — pure integer arithmetic, no
    * float log anywhere, so the score replays bit-identically in any
    * engine (float ln/log2 differ across libm implementations in the last
    * ulp, which an exact-equality oracle cannot tolerate). Resolution is
    * whole bits at the per-bigram level; per document the mean over
    * hundreds of bigrams recovers fractional precision — bits_x100 is the
    * per-bigram mean in centibits, again by integer division.
    *
    * Output: (doc_id, n_bigrams, total_bits, bits_x100) per input
    * document; documents with fewer than two tokens (or NULL text) have no
    * bigrams and come back 0/0/0. High bits_x100 = surprising = low
    * quality under the model.
    *
    * Scale shape: the model is the (bigram count, prefix count) pair of
    * aggregate relations — partial-agged map-side; scoring joins the
    * exploded bigram stream to them by key (the prefix join's hot keys —
    * "the", "of" — are AQE-skew-splittable; no window anywhere). The
    * vocabulary size rides as a one-row broadcast. When scoring against a
    * FIXED reference LM at 100 TB, persist the two count relations and
    * broadcast them if the vocabulary is bounded.
    */
  def lmPerplexity(train: DataFrame, score: DataFrame, textCol: String,
                   idCol: String): DataFrame = {
    val (cb, cu, v) = trainLmCounts(train, textCol, idCol)
    scoreAgainstLm(score, cb, cu, v, textCol, idCol)
  }

  /** The (doc, p, w) bigram stream of a corpus — shared by LM training
    * and scoring, which must tokenize identically.
    */
  /** PMI COLLOCATION MINING (Church & Hanks, CL'90): the top-k adjacent
    * word pairs by pointwise mutual information — the collocation table
    * tokenizer-vocabulary and phrase-mining decisions read. In the
    * floor-log₂-bits discipline of [[lmPerplexity]]: lift =
    * (c(w1,w2)·N) div (c(w1)·c(w2)) as pure integers, pmi_bits =
    * length(bin(lift)) − 1, keep lift ≥ `minLift` (default 2 = PMI ≥ 1
    * bit, the standard positive-PMI cut; 1 = "at least independence",
    * the right floor for near-uniform corpora where nothing clears a
    * full bit) and pair count ≥ `minCount` (the classic
    * low-frequency PMI-inflation guard: a hapax pair has sky-high PMI
    * and zero evidence). The products run in DECIMAL(38,0): at a 100 TB
    * corpus c·N overflows a long (~10¹³ · 10¹³), while the DIV result
    * is ≤ N and always fits.
    *
    * Total order (lift DESC, n_pair DESC, w1, w2) → fully deterministic
    * top-k. Scale shape: the pair and unigram count relations are the
    * only corpus-sized passes (partial-agged map-side); the joins are
    * vocabulary-sized (planner-decided, no forced broadcast — the crawl
    * vocabulary rule from bpeSegmentCounts); N rides as a one-row
    * broadcast; the top-k is TakeOrderedAndProject, never a global sort.
    * Output: (w1, w2, n_pair, n_l, n_r, lift, pmi_bits).
    */
  def pmiCollocations(docs: DataFrame, textCol: String, idCol: String,
                      k: Int = 50, minCount: Long = 5L,
                      minLift: Long = 2L): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    require(minCount >= 1, s"minCount must be positive: $minCount")
    require(minLift >= 1, s"minLift must be positive: $minLift")
    val cb = bigramStream(docs, textCol, idCol)
      .groupBy(col("p").as("w1"), col("w").as("w2"))
      .agg(count(lit(1)).as("n_pair"))
    val cw = docs.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n_tok"))
    val n = cw.agg(sum(col("n_tok")).as("n"))
    cb.where(col("n_pair") >= minCount)
      .join(cw.select(col("tok").as("w1"), col("n_tok").as("n_l")), Seq("w1"))
      .join(cw.select(col("tok").as("w2"), col("n_tok").as("n_r")), Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("n_pair"), col("n_l"), col("n_r"),
        expr("(CAST(n_pair AS DECIMAL(38,0)) * n) div " +
          "(CAST(n_l AS DECIMAL(38,0)) * n_r)").as("lift"))
      .where(col("lift") >= minLift)
      .select(col("w1"), col("w2"), col("n_pair"), col("n_l"), col("n_r"),
        col("lift"),
        (length(bin(col("lift"))) - 1).cast("long").as("pmi_bits"))
      .orderBy(col("lift").desc, col("n_pair").desc, col("w1"), col("w2"))
      .limit(k)
  }

  private def bigramStream(df: DataFrame, textCol: String,
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

  /** (bigram counts, prefix counts, vocab size) — the entire model. */
  private def trainLmCounts(train: DataFrame, textCol: String,
                            idCol: String): (DataFrame, DataFrame, DataFrame) = {
    val cb = bigramStream(train, textCol, idCol)
      .groupBy("p", "w").agg(count(lit(1)).as("cb"))
    // c(p) = Σ_w c(p,w) exactly (every bigram occurrence carries prefix
    // p), so the prefix counts REAGGREGATE the much smaller bigram-count
    // relation instead of a second explode pass over the corpus — q24's
    // tf→df shape. The vocab scan stays its own pass: a token appearing
    // only in one-token documents forms no bigram, so V is not derivable
    // from the gram stream.
    val cu = cb.groupBy("p").agg(sum(col("cb")).as("cu"))
    val v = train.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    (cb, cu, v)
  }

  private def scoreAgainstLm(score: DataFrame, cb: DataFrame, cu: DataFrame,
                             v: DataFrame, textCol: String,
                             idCol: String): DataFrame = {
    // unseen bigrams/prefixes score against zero counts (left joins):
    // bits = floor(log2((c(p) + V) div (c(p,w) + 1))) in pure integers
    val scored = bigramStream(score, textCol, idCol)
      .join(cb, Seq("p", "w"), "left")
      .join(cu, Seq("p"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc"),
        (length(bin(expr("(coalesce(cu, 0) + v) div (coalesce(cb, 0) + 1)")))
          - 1).cast("long").as("bits"))
    val perDoc = scored.groupBy("doc")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("total_bits"))
    score.select(col(idCol).as("doc"))
      .join(perDoc, Seq("doc"), "left")
      .select(col("doc").as("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("total_bits"), lit(0L)).as("total_bits"),
        coalesce(expr("total_bits * 100 div n_bigrams"), lit(0L))
          .as("bits_x100"))
  }

  /** STUPID BACKOFF scoring (Brants, Popat, Xu, Och, Dean — "Large
    * Language Models in Machine Translation", EMNLP'07): the
    * web-scale LM recipe that skips discounting entirely — score an
    * n-gram by its relative frequency when seen and recursively back
    * off with a constant penalty when not. Trigram model, per
    * test-corpus trigram (a, p, w), in the integer floor-log₂ bits of
    * [[lmPerplexity]] (no float log anywhere — the trained model and
    * every score replay exactly):
    *
    *   seen trigram:      bits = floor(log₂(c(a,p) div c(a,p,w)))
    *   else seen bigram:  bits = floor(log₂(c(p) div c(p,w))) + 1
    *   else:              bits = floor(log₂((N + V) div (c(w) + 1))) + 2
    *
    * with N the train corpus's token total, V its vocabulary size, and
    * add-one smoothing only where a count can be zero. The +1 bit per
    * backoff LEVEL is the backoff constant: α = 1/2 exactly, chosen
    * integral by design (Brants et al.'s α = 0.4 ≈ 1.32 bits — the
    * paper notes the value barely matters, and a whole bit keeps every
    * score integer).
    *
    * Versus [[lmPerplexity]]'s add-one bigram model: seen n-grams are
    * not dragged toward the vocabulary floor (c(p) + V inflates every
    * denominator there), and unseen ones fall back on real
    * lower-order evidence instead of a uniform V-sized guess — the
    * standard reason backoff dominates plain add-one at web scale.
    * The per-document backoff counts are reported too (the OOV-gram
    * rate is a quality signal in its own right).
    *
    * Output: (doc_id, n_trigrams, n_backoffs, n_unigram_backoffs,
    * total_bits, bits_x100) per score document — n_backoffs counts
    * trigram misses (either level), n_unigram_backoffs the full
    * two-level falls; documents with fewer than three tokens come back
    * all-zero.
    *
    * Scale shape: [[lmPerplexity]]'s counts-relation joins, one per
    * model order (trigram-, bigram-, unigram-count relations — each
    * partial-agged map-side, the lower orders vocabulary-sized and
    * broadcastable); the (N, V) pair rides as a one-row broadcast. Hot
    * contexts AQE-skew-split like the base model's.
    */
  def stupidBackoffBits(train: DataFrame, score: DataFrame,
                        textCol: String, idCol: String): DataFrame = {
    val c3 = trigramStream(train, textCol, idCol)
      .groupBy("a", "p", "w").agg(count(lit(1)).as("c3"))
    // context counts reaggregate the gram-count relation (the
    // trainLmCounts shape), never a second corpus pass
    val c3p = c3.groupBy("a", "p").agg(sum(col("c3")).as("c3p"))
    val cb = bigramStream(train, textCol, idCol)
      .groupBy("p", "w").agg(count(lit(1)).as("cb"))
    val cu = cb.groupBy("p").agg(sum(col("cb")).as("cu"))
    val cw = train.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val nv = cw.agg(sum(col("cw")).as("n"), count(lit(1)).as("v"))
    val scored = trigramStream(score, textCol, idCol)
      .join(c3, Seq("a", "p", "w"), "left")
      .join(c3p, Seq("a", "p"), "left")
      .join(cb, Seq("p", "w"), "left")
      .join(cu, Seq("p"), "left")
      .join(cw, Seq("w"), "left")
      .crossJoin(broadcast(nv))
      .select(col("doc"),
        when(col("c3").isNotNull,
          (length(bin(expr("c3p div c3"))) - 1).cast("long"))
          .when(col("cb").isNotNull,
            (length(bin(expr("cu div cb"))) - 1 + 1).cast("long"))
          .otherwise(
            (length(bin(expr("(n + v) div (coalesce(cw, 0) + 1)")))
              - 1 + 2).cast("long"))
          .as("bits"),
        when(col("c3").isNotNull, 0L)
          .when(col("cb").isNotNull, 1L).otherwise(2L).as("level"))
    val perDoc = scored.groupBy("doc")
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("level") >= 1, 1L).otherwise(0L)).as("n_backoffs"),
        sum(when(col("level") === 2, 1L).otherwise(0L))
          .as("n_unigram_backoffs"),
        sum(col("bits")).as("total_bits"))
    score.select(col(idCol).as("doc"))
      .join(perDoc, Seq("doc"), "left")
      .select(col("doc").as("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("n_backoffs"), lit(0L)).as("n_backoffs"),
        coalesce(col("n_unigram_backoffs"), lit(0L))
          .as("n_unigram_backoffs"),
        coalesce(col("total_bits"), lit(0L)).as("total_bits"),
        coalesce(expr("total_bits * 100 div n_trigrams"), lit(0L))
          .as("bits_x100"))
  }

  /** The (doc, a, p, w) trigram stream — [[bigramStream]]'s shape one
    * order up, tokenizing identically. */
  private def trigramStream(df: DataFrame, textCol: String,
                            idCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val idxs = when(size(toks) >= 3, sequence(lit(1), size(toks) - 2))
      .otherwise(array().cast("array<int>"))
    df.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc"),
        explode(transform(idxs, i => struct(
          element_at(toks, i).as("a"),
          element_at(toks, i + 1).as("p"),
          element_at(toks, i + 2).as("w")))).as("g"))
      .select(col("doc"), col("g.a").as("a"), col("g.p").as("p"),
        col("g.w").as("w"))
  }

  /** Interpolated KNESER–NEY bigram scoring (Kneser & Ney, ICASSP'95;
    * Chen & Goodman's interpolated form, TR-10-98) — the smoothing the
    * KenLM/CCNet quality-filter stack actually ships, in the exact
    * integer floor-log₂-bits discipline of [[lmPerplexity]] and
    * [[stupidBackoffBits]] so the DuckDB oracle replays every score.
    *
    * The model, with absolute discount D = 3/4 (integral-rational by
    * design) and the continuation distribution add-one smoothed over
    * the vocabulary:
    *
    *   P(w|p) = (max(c(p,w) − D, 0) + D·N1+(p·)·Pc(w)) / c(p)
    *   Pc(w)  = (N1+(·w) + 1) / (B + V)
    *
    * where N1+(p·) = distinct continuations of prefix p, N1+(·w) =
    * distinct contexts preceding w (the "how novel is this word"
    * statistic that makes KN KN — a word seen often but only in one
    * collocation gets a LOW continuation weight), B = distinct bigram
    * types, V = vocab size. Multiplying through by 4·(B + V) makes both
    * sides of the ratio pure integers:
    *
    *   num = max(4·c(p,w) − 3, 0)·(B + V) + 3·N1+(p·)·(N1+(·w) + 1)
    *   den = 4·c(p)·(B + V)
    *   bits = floor(log₂(den / num)) — num/den in DECIMAL(38,0) (the
    *   long products overflow at 100 TB counts — the pmiCollocations
    *   class), the floor-log₂ via a two-step quotient (q div 2^30
    *   first) because q itself can pass a long and bin() takes longs
    *
    * Σ_w num = den EXACTLY (the discount mass D·N1+(p·) re-spreads over
    * Pc, which itself sums to one: Σ N1+(·w) = B, Σ 1 = V), so this is
    * a proper distribution and `den div num ≥ 1` for every gram — no
    * float anywhere, no clamping. An unseen PREFIX (c(p) = 0, so there
    * is no discount mass to interpolate) falls back to Pc alone:
    * bits = floor(log₂((B + V) div (N1+(·w) + 1))), counted per doc as
    * `n_unseen_prefix`.
    *
    * Output: (doc_id, n_bigrams, n_unseen_prefix, total_bits, bits_x100)
    * per score document — [[lmPerplexity]]'s surface plus the
    * prefix-miss rate; sub-two-token documents come back all-zero.
    *
    * Scale shape: identical to [[lmPerplexity]] — the model is three
    * count relations (bigram-sized cb; vocabulary-sized cu/n1p per
    * prefix and n1p per word, derived by REAGGREGATING cb, never a
    * second corpus pass) joined onto the score gram stream, plus a
    * one-row (B, V) broadcast. Hot prefixes AQE-skew-split like the
    * base model's.
    */
  def kneserNeyBits(train: DataFrame, score: DataFrame, textCol: String,
                    idCol: String): DataFrame = {
    val cb = bigramStream(train, textCol, idCol)
      .groupBy("p", "w").agg(count(lit(1)).as("cb"))
    // c(p) and N1+(p·) in one reaggregation of the bigram-count relation
    val cu = cb.groupBy("p")
      .agg(sum(col("cb")).as("cu"), count(lit(1)).as("n1p_p"))
    val cwn = cb.groupBy("w").agg(count(lit(1)).as("n1p_w"))
    val bv = cb.agg(count(lit(1)).as("b")).crossJoin(
      train.where(col(textCol).isNotNull)
        .select(explode(split(col(textCol), " ")).as("tok"))
        .agg(countDistinct(col("tok")).as("v")))
    // den = 4·c(p)·(B+V) and num both run in DECIMAL(38,0): at 100 TB
    // counts (c(p) ~ 1e13 for a stop-word prefix, B+V ~ 1e12) the long
    // products overflow — under ANSI that is a runtime crash on the
    // first hot prefix, the pmiCollocations overflow class. The
    // floor-log₂ then needs the quotient q = den div num, which itself
    // can exceed a long (bin() takes longs), so it is taken in two
    // steps: h1 = den div (num·2^30) is q div 2^30 exactly — if zero,
    // q < 2^30 and the direct div fits a long; otherwise
    // bits = 30 + floor(log₂(h1)), with h1 ≤ ~1e16 long-safe. Headroom:
    // den ≤ 4e25, num·2^30 ≤ 4.3e34 — both inside DECIMAL(38,0).
    val seenBits =
      """CASE WHEN h1 = 0
              THEN length(bin(kn_den div kn_num)) - 1
              ELSE 30 + length(bin(h1)) - 1 END"""
    val scored = bigramStream(score, textCol, idCol)
      .join(cb, Seq("p", "w"), "left")
      .join(cu, Seq("p"), "left")
      .join(cwn, Seq("w"), "left")
      .crossJoin(broadcast(bv))
      .withColumn("kn_den",
        expr("4 * CAST(cu AS DECIMAL(38,0)) * (b + v)"))
      .withColumn("kn_num",
        expr("""greatest(4 * CAST(coalesce(cb, 0) AS DECIMAL(38,0)) - 3, 0)
                  * (b + v)
                + 3 * CAST(n1p_p AS DECIMAL(38,0))
                  * (coalesce(n1p_w, 0) + 1)"""))
      .withColumn("h1", expr("kn_den div (kn_num * 1073741824)"))
      .select(col("doc"),
        when(col("cu").isNotNull, expr(seenBits).cast("long"))
          .otherwise(
            (length(bin(expr("(b + v) div (coalesce(n1p_w, 0) + 1)")))
              - 1).cast("long"))
          .as("bits"),
        when(col("cu").isNull, 1L).otherwise(0L).as("miss"))
    val perDoc = scored.groupBy("doc")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("miss")).as("n_unseen_prefix"),
        sum(col("bits")).as("total_bits"))
    score.select(col(idCol).as("doc"))
      .join(perDoc, Seq("doc"), "left")
      .select(col("doc").as("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_unseen_prefix"), lit(0L)).as("n_unseen_prefix"),
        coalesce(col("total_bits"), lit(0L)).as("total_bits"),
        coalesce(expr("total_bits * 100 div n_bigrams"), lit(0L))
          .as("bits_x100"))
  }

  /** Persist the bigram LM to `path` — the CCNet deployment shape: train
    * the reference LM once, score every later crawl batch from the loaded
    * counts ([[lmPerplexityIndexed]]) without touching the reference
    * corpus again. Layout (the ADDITIVE-counts design the text index's
    * stats rows use, which is what makes the LM maintainable):
    *
    *  - `bigrams/`: (p, w, cb) DELTA rows — a fresh build writes one row
    *    per bigram; [[appendToLm]] appends a batch's positive counts;
    *    [[deleteFromLm]] appends NEGATIVE counts. The model's count is
    *    the SUM per (p, w), positive-only.
    *  - `vocab/`: (tok, c) delta rows, same discipline. Scoring only
    *    needs the vocab SIZE, but size is not maintainable under deletion
    *    without per-token counts (a deleted document's tokens may survive
    *    in other documents; only a count can tell).
    *
    * Prefix counts and the vocab size are DERIVED at load ([[loadLm]]) —
    * c(p) = Σ_w c(p,w) exactly as training derives it, V = tokens with a
    * positive summed count — so growing or shrinking the model never
    * read-modify-writes an aggregate row. [[compactLm]] folds the delta
    * trail on the maintenance schedule.
    *
    * TIME TRAVEL: the version-flip previous-serve the text and IVF
    * indexes offer (`bm25TopKIndexedPrevious` / `topKIvfIndexedPrevious`)
    * deliberately has no LM counterpart. Those families maintain by
    * REWRITE (each op publishes a full new version, so "the state the op
    * superseded" is a directory that already exists); the LM maintains
    * by DELTA — an append/delete lands rows, and only [[compactLm]]
    * publishes a version, so the pre-op state is not a version but "the
    * trail minus the op's rows". Reverting an op here is the delta
    * design's native move instead: publish the op's deltas negated
    * (same staging machinery, batch-sized), rather than serving an
    * old directory.
    */
  def saveLm(train: DataFrame, textCol: String, idCol: String,
             path: String): Unit = {
    val spark = train.sparkSession
    // a rebuild starts a fresh streaming lineage: stale exactly-once
    // markers would silently no-op the new stream's first batches, and
    // stale snapshot pins would keep serving the OLD corpus's counts
    // (publishRewrite preserves pinned versions by design)
    graft.ops.Stage.clearLedger(spark, path)
    graft.ops.Stage.clearSnapshots(spark, s"$path/bigrams")
    graft.ops.Stage.clearSnapshots(spark, s"$path/vocab")
    // ONE root lease over both component rebuilds (the
    // saveMinhashManifest protocol): a leased delta publish landing
    // BETWEEN the two flips would pair the new corpus's bigrams with
    // the old corpus's vocab — V wrong for every unseen-bigram score
    graft.ops.Stage.withWriterLease(spark, path) {
      // BORN VERSIONED (like the IVF lists): [[snapshotLm]] pins need a
      // version from the first build. publishREBUILD, not publishRewrite:
      // rebuilding over an existing model must give the OLD corpus's
      // counts no previous-version grace — the rebuild boundary resets
      // the whole history (ledger/snapshots above, previous pointer here),
      // so nothing can serve cross-corpus state under this path.
      graft.ops.Stage.publishRebuild(spark, s"$path/bigrams",
        bigramStream(train, textCol, idCol)
          .groupBy("p", "w").agg(count(lit(1)).as("cb")))
      graft.ops.Stage.publishRebuild(spark, s"$path/vocab",
        train.where(col(textCol).isNotNull)
          .select(explode(split(col(textCol), " ")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c")))
    }
  }

  /** The model relations of a persisted LM: summed positive bigram
    * counts, prefix counts derived from them, and the one-row vocab size.
    * ONE loader so every consumer agrees on the fold. The groupBy's
    * exchange doubles as the scoring join's (p, w) partitioning, so
    * folding deltas at load adds no extra shuffle over pre-aggregated
    * tables.
    */
  private def loadLm(spark: org.apache.spark.sql.SparkSession,
                     path: String): (DataFrame, DataFrame, DataFrame) = {
    import graft.ops.Stage.resolve
    // enforce publishOnce's retry contract at the one place every LM
    // consumer passes through: a crashed-unretried delete/append is
    // SERVING but not durable — the next compaction reverts it. Surface
    // the pending op ids loudly so the operator retries (same id) first;
    // metadata-only (one ledger + two component listings).
    val pending = graft.ops.Stage.pendingOps(spark, path,
      Seq("bigrams", "vocab"))
    if (pending.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"LM at $path has UNCOMMITTED maintenance ops " +
          s"[${pending.mkString(", ")}]: their deltas serve now but are " +
          "not durable — retry each op with its original id BEFORE any " +
          "compaction, or the compaction will revert it")
    loadLmFrames(spark.read.parquet(resolve(spark, s"$path/bigrams")),
      spark.read.parquet(resolve(spark, s"$path/vocab")))
  }

  /** [[loadLm]]'s fold over already-materialized delta relations — the
    * layer snapshot scoring enters at (pinned FILE LISTS, not
    * directories — see [[graft.ops.Stage.snapshot]]). */
  private def loadLmFrames(bigrams: DataFrame, vocab: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val cb = bigrams
      .groupBy("p", "w").agg(sum(col("cb")).as("cb"))
      .where(col("cb") > 0)
    val cu = cb.groupBy("p").agg(sum(col("cb")).as("cu"))
    val v = vocab
      .groupBy("tok").agg(sum(col("c")).as("c"))
      .agg(count(when(col("c") > 0, lit(1))).as("v"))
    (cb, cu, v)
  }

  /** The additive (bigrams, vocab) delta pair of a batch, shared by every
    * maintenance path so build, append, and delete agree on tokenization
    * to the letter. `sign` is +1 (ingest) or -1 (delete). */
  private def lmDeltas(batch: DataFrame, textCol: String, idCol: String,
                       sign: Int): (DataFrame, DataFrame) = (
    bigramStream(batch, textCol, idCol)
      .groupBy("p", "w").agg((count(lit(1)) * sign).as("cb")),
    batch.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy("tok").agg((count(lit(1)) * sign).as("c")))

  /** Grow a [[saveLm]] model with a new training batch WITHOUT retraining:
    * every model statistic is a count, so ingest is exact addition — the
    * batch's bigram/token counts land as new delta rows, batch-sized work
    * only. Scoring afterwards equals a fresh train over the union
    * (CorpusSpec pins it).
    */
  def appendToLm(batch: DataFrame, path: String, textCol: String,
                 idCol: String, opId: String): Unit = {
    val (cbD, vD) = lmDeltas(batch, textCol, idCol, sign = 1)
    stageLmDeltas(batch.sparkSession, path, s"add_$opId", cbD, vD)
  }

  /** [[appendToLm]] with EXACTLY-ONCE semantics for streaming ingest, via
    * the shared ledger protocol ([[graft.ops.Stage.appendExactlyOnce]]).
    * A replayed plain append would double the batch's counts and CHANGE
    * every later score — counts are the model, so the LM is as exposed to
    * at-least-once replay as the IVF lists. Batch ids are only meaningful
    * relative to one durable checkpoint lineage.
    */
  def appendToLmExactlyOnce(batch: DataFrame, path: String, textCol: String,
                            idCol: String, batchId: Long): Unit = {
    val (cbD, vD) = lmDeltas(batch, textCol, idCol, sign = 1)
    graft.ops.Stage.appendExactlyOnce(batch.sparkSession, path, batchId,
      Seq("bigrams", "vocab"))(writeLmDeltas(cbD, vD))
  }

  /** Delete documents from a [[saveLm]] model — exact subtraction, now as
    * NEGATIVE delta rows (their text must be supplied; the contract is
    * `deleted` ⊆ the trained corpus, each document passed exactly once).
    * BATCH-sized work: where the earlier design anti-join-rewrote every
    * count table per delete (index-sized — the manifest's pre-tombstone
    * problem), the delta append defers the physical fold to [[compactLm]]
    * while [[loadLm]]'s positive-sum fold makes scoring reflect the
    * deletion immediately. Scoring afterwards is bit-identical to a fresh
    * train over the survivors (the q107 oracle and CorpusSpec pin it):
    * counts sum to exactly the survivor counts, zeroed bigrams drop from
    * the model, V counts only tokens with surviving occurrences.
    */
  def deleteFromLm(deleted: DataFrame, path: String, textCol: String,
                   idCol: String, opId: String): Unit = {
    val (cbD, vD) = lmDeltas(deleted, textCol, idCol, sign = -1)
    stageLmDeltas(deleted.sparkSession, path, s"del_$opId", cbD, vD)
  }

  /** One atomic, retry-idempotent publish of a paired (bigrams, vocab)
    * delta — [[graft.ops.Stage.publishOnce]] under the caller's op id.
    * The counts ARE the model, so the two tables must move together: a
    * crash between two plain appends left vocab counting tokens whose
    * bigrams were already subtracted (V too high, every unseen-bigram
    * score off), and a retry would double-apply the half that landed.
    * Staged + marker-protected, a retry with the same op id republishes
    * exactly once or no-ops. */
  private def stageLmDeltas(spark: org.apache.spark.sql.SparkSession,
                            path: String, opId: String,
                            cbD: DataFrame, vD: DataFrame): Unit =
    graft.ops.Stage.publishOnce(spark, path, opId,
      Seq("bigrams", "vocab"))(writeLmDeltas(cbD, vD))

  /** The ONE staged layout for a paired (bigrams, vocab) delta, shared
    * by the streaming and maintenance publish paths so their on-disk
    * formats can never diverge. */
  private def writeLmDeltas(cbD: DataFrame, vD: DataFrame)
                           (staging: String): Unit = {
    cbD.write.mode("overwrite").parquet(s"$staging/bigrams")
    vD.write.mode("overwrite").parquet(s"$staging/vocab")
  }

  /** Compact a [[saveLm]] model's delta trail: fold the additive rows to
    * one positive row per key (dropping zeroed bigrams/tokens — folded
    * deletes physically disappear here), coalesced to
    * [[graft.ops.Stage.compactionPartitions]] files. Scoring before and
    * after is identical ([[loadLm]] sums either representation to the
    * same counts); publish is atomic, so a crash mid-compaction leaves
    * the delta trail serving.
    */
  def compactLm(spark: org.apache.spark.sql.SparkSession,
                path: String): Unit =
      graft.ops.Stage.withWriterLease(spark, path) {
    import graft.ops.Stage.{compactionPartitions, publishRewrite, resolve}
    // crashed-mid-publish batch leavings must not fold (see
    // Stage.sweepUncommitted — the replay would double their counts)
    graft.ops.Stage.sweepUncommitted(spark, path, Seq("bigrams", "vocab"))
    val nB = compactionPartitions(spark, s"$path/bigrams")
    publishRewrite(spark, s"$path/bigrams",
      spark.read.parquet(resolve(spark, s"$path/bigrams"))
        .groupBy("p", "w").agg(sum(col("cb")).as("cb"))
        .where(col("cb") > 0).repartition(nB))
    val nV = compactionPartitions(spark, s"$path/vocab")
    publishRewrite(spark, s"$path/vocab",
      spark.read.parquet(resolve(spark, s"$path/vocab"))
        .groupBy("tok").agg(sum(col("c")).as("c"))
        .where(col("c") > 0).repartition(nV))
    graft.ops.Stage.compactLedger(spark, path)
  }

  /** [[compactLm]] when the delta trail has fragmented past
    * `maxFilesPerComponent` live files ([[graft.ops.Stage.shouldCompact]]);
    * otherwise a metadata-only listing. The self-maintenance hook for
    * streaming ingest sinks. Returns whether a compaction ran. */
  def autoCompactLm(spark: org.apache.spark.sql.SparkSession, path: String,
                    maxFilesPerComponent: Int = 64): Boolean = {
    val go = graft.ops.Stage.shouldCompact(spark, path,
      Seq("bigrams", "vocab"), maxFilesPerComponent)
    if (go) compactLm(spark, path)
    go
  }

  /** [[lmPerplexity]] scoring against a [[saveLm]] model on disk: the
    * training pass is skipped entirely — per-batch cost is the batch's
    * bigram explode plus the count-relation joins over the loaded model.
    */
  def lmPerplexityIndexed(score: DataFrame, path: String, textCol: String,
                          idCol: String): DataFrame = {
    val (cb, cu, v) = loadLm(score.sparkSession, path)
    scoreAgainstLm(score, cb, cu, v, textCol, idCol)
  }

  /** CCNet-style PERPLEXITY BUCKETING (Wenzek et al., LREC'20): split a
    * corpus into `nBuckets` fluency tiers — head/middle/tail at the
    * default 3 — by LM score against a persisted reference model
    * ([[lmPerplexityIndexed]]'s integer bits_x100, ascending = more
    * fluent), the partition CCNet trains on head+middle and discards or
    * down-weights tail from. Bucketing is SCORE-CLASS GRANULAR: every
    * document sharing one bits_x100 value lands in one bucket —
    * `bucket = min(cum_docs_before · nBuckets div N + 1, nBuckets)`, all
    * integer arithmetic, so the boundary replays identically in any
    * engine (a per-document NTILE would need a global corpus sort AND
    * tie-break semantics; the class rule needs neither). Granularity
    * cost: one straddling class can overfill its bucket by its class
    * size — bounded by the docs sharing one 0.01-bit score value.
    *
    * Scale shape: the scoring pass is [[lmPerplexityIndexed]]; the
    * bucket rule rides windows over the SCORE HISTOGRAM (one row per
    * distinct bits_x100 — bounded by the score RANGE, not the corpus;
    * the [[budgetSelectBy]] discipline), and the class→bucket map joins
    * back AQE-broadcast. No corpus-sized sort, no collect.
    */
  def perplexityBuckets(score: DataFrame, lmPath: String, textCol: String,
                        idCol: String, nBuckets: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val scored = lmPerplexityIndexed(score, lmPath, textCol, idCol)
      .select(col(idCol), col("n_bigrams"), col("total_bits"),
        col("bits_x100"))
    val hist = scored.groupBy("bits_x100").agg(count(lit(1)).as("n_docs"))
    // both windows read one row per distinct score class — the single
    // partition holds the bounded histogram, never the corpus
    val byScore = Window.orderBy(col("bits_x100"))
    val all = Window.partitionBy()
    val classes = hist
      .withColumn("cum_before",
        sum(col("n_docs")).over(byScore) - col("n_docs"))
      .withColumn("n_total", sum(col("n_docs")).over(all))
      .select(col("bits_x100"),
        least(expr(s"cum_before * $nBuckets div n_total") + 1,
          lit(nBuckets.toLong)).as("ppl_bucket"))
    scored.join(classes, Seq("bits_x100"))
      .select(col(idCol), col("n_bigrams"), col("total_bits"),
        col("bits_x100"), col("ppl_bucket"))
  }

  /** FREEZE the model under a named snapshot ([[graft.ops.Stage.snapshot]]
    * on both count components, under the root lease so the pair captures
    * one state). Because the pin records FILE LISTS and the LM maintains
    * by additive delta — appends/deletes land new delta files, never
    * rewrite old ones — a pinned model stays scoreable bit-identically
    * while ingest continues: the frozen-model contract an eval pipeline
    * needs (today's quality scores must not drift because tonight's
    * crawl landed). This is NOT version time-travel (the LM deliberately
    * has none — reverting an op is a negated-delta publish, see
    * [[saveLm]]); it is a reproducibility pin. [[compactLm]] REWRITES the
    * components, after which the pin keeps serving the pre-compaction
    * state it captured (the pinned version survives GC until dropped).
    */
  def snapshotLm(spark: org.apache.spark.sql.SparkSession,
                 path: String, name: String): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      // a crashed batch's doomed partials must not be pinned (the pin
      // records file lists; a later sweep would dangle them)
      graft.ops.Stage.sweepUncommitted(spark, path, Seq("bigrams", "vocab"))
      Seq("bigrams", "vocab").foreach(c =>
        graft.ops.Stage.snapshot(spark, s"$path/$c", name))
    }

  /** ROLL the live LM BACK to a [[snapshotLm]] pin
    * ([[graft.ops.Stage.restoreSnapshot]] per component, under the root
    * lease so bigrams and vocab flip as ONE state) — the undo for an
    * ingest the scores say was poison. Where reverting ONE op is a
    * negated-delta publish (see [[saveLm]]), restore undoes a whole
    * campaign of deltas in one bytes-of-the-pin copy. Both components
    * are checked for the pin BEFORE either is restored. The ledger is
    * kept, so replays of rolled-back ingest batches stay no-ops —
    * re-ingesting that content needs new batch/op ids (see
    * [[Search.restoreTextIndex]] for the shared contract). */
  def restoreLm(spark: org.apache.spark.sql.SparkSession,
                path: String, name: String): Unit =
    graft.ops.Stage.withWriterLease(spark, path) {
      val comps = Seq("bigrams", "vocab")
      val missing = comps.filter(c =>
        graft.ops.Stage.resolveSnapshot(spark, s"$path/$c", name).isEmpty)
      require(missing.isEmpty,
        s"snapshot '$name' does not pin component(s) " +
          s"${missing.mkString(", ")} of $path — nothing restored")
      comps.foreach(c =>
        graft.ops.Stage.restoreSnapshot(spark, s"$path/$c", name))
    }

  /** Release a [[snapshotLm]] pin; its versions become ordinary GC
    * candidates at the next publish — or immediately via [[vacuumLm]]. */
  def dropLmSnapshot(spark: org.apache.spark.sql.SparkSession,
                     path: String, name: String): Unit =
    Seq("bigrams", "vocab").foreach(c =>
      graft.ops.Stage.dropSnapshot(spark, s"$path/$c", name))

  /** Reclaim the model's stale count versions now
    * ([[graft.ops.Stage.vacuum]] per component) — the storage release
    * after dropping a pin, without waiting for the next compaction. */
  def vacuumLm(spark: org.apache.spark.sql.SparkSession,
               path: String): Unit =
    Seq("bigrams", "vocab").foreach(c =>
      graft.ops.Stage.vacuum(spark, s"$path/$c"))

  /** [[lmPerplexityIndexed]] against a [[snapshotLm]] pin — the frozen
    * model's counts, whatever has been appended or deleted since.
    * Fails loudly on an unknown name. */
  def lmPerplexityIndexedSnapshot(score: DataFrame, path: String,
                                  name: String, textCol: String,
                                  idCol: String): DataFrame = {
    val spark = score.sparkSession
    def pinned(c: String) = graft.ops.Stage
      .readSnapshot(spark, s"$path/$c", name)
      .getOrElse(throw new IllegalStateException(
        s"$path/$c has no snapshot named '$name' — pin one with " +
          "snapshotLm before scoring against it"))
    val (cb, cu, v) = loadLmFrames(pinned("bigrams"), pinned("vocab"))
    scoreAgainstLm(score, cb, cu, v, textCol, idCol)
  }

  /** Sentence-level decontamination: per eval document, how many of its
    * distinct sentences (split on `[.!?]+` runs, trimmed, at least
    * `minChars` chars — the floor drops "Yes"-style stop sentences) appear
    * VERBATIM anywhere in the train corpus. The sentence is the
    * granularity eval-benchmark leaks actually happen at: a test question
    * pasted into a training document survives [[decontaminate]]'s
    * document-pair threshold only if enough other grams co-occur, but is
    * caught here sentence by sentence. Output: one row per eval document
    * — (eval_id, n_sentences, n_leaked), zero-filled so clean documents
    * are visible as 0/0 rather than absent.
    *
    * Same exchange discipline as [[graft.ext.Dedup.chunkDedup]]'s
    * ownership pass: sentences cross the wire as 8-byte xxhash64 values,
    * never text. The train side is pre-distinct (one row per distinct
    * sentence corpus-wide), so the probe join's fanout is exactly 1 and a
    * boilerplate sentence repeated in millions of train docs costs one
    * hash, not millions — no stop-sentence cap needed where [[decontaminate]]
    * needs its maxDf.
    */
  def decontaminateSentences(train: DataFrame, eval_ : DataFrame,
                             textCol: String, idCol: String,
                             minChars: Int = 20): DataFrame = {
    def sentences(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as(side),
          explode(split(col(textCol), "[.!?]+")).as("raw"))
        .select(col(side), trim(col("raw")).as("sent"))
        .where(length(col("sent")) >= minChars)
    val trainSet = sentences(train, "train_id")
      .select(xxhash64(col("sent")).as("h")).distinct()
      .withColumn("leaked", lit(1L))
    val evalSent = sentences(eval_, "eval_id")
      .select(col("eval_id"), xxhash64(col("sent")).as("h")).distinct()
    val agged = evalSent.join(trainSet, Seq("h"), "left")
      .groupBy("eval_id")
      .agg(count(lit(1)).as("n_sentences"),
        sum(coalesce(col("leaked"), lit(0L))).as("n_leaked"))
    eval_.select(col(idCol).as("eval_id")).distinct()
      .join(agged, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_sentences"), lit(0L)).as("n_sentences"),
        coalesce(col("n_leaked"), lit(0L)).as("n_leaked"))
  }

  /** Composed cleaning pipeline with a per-stage attrition report — the
    * funnel a corpus owner reads before a training run: ingest → quality
    * gate → normalized exact dedup → token-budget selection, each stage
    * consuming the previous stage's survivors. One row per stage with the
    * surviving document and token counts.
    *
    * Stage semantics (each an operator this library ships standalone):
    *  - `quality`: [[TextAnalysis.qualityScore]] ≥ `qualityMin`;
    *  - `dedup`: one keeper (min id) per distinct [[Dedup.normalizeText]]-ed
    *    content AMONG the quality survivors — gate order matters: a
    *    low-quality copy must not become the keeper of a class whose other
    *    copies pass;
    *  - `budget`: [[budgetSelectBy]] over the dedup survivors, best
    *    quality first, `budgetPerMille` of the surviving tokens.
    *
    * Scale shape: the report is four aggregate rows. Stage membership is
    * decided by the operators' own plans (hash-groupBy dedup on 32-byte
    * normalized-content hashes, histogram-windowed budget admission — see
    * their docs); the funnel adds only id-only semi-joins and count/sum
    * aggregates, never a second pass over text. The four stage aggregates
    * share their deepest subplans via Spark's ReuseExchange; a pipeline
    * that has already MATERIALIZED per-stage outputs should aggregate
    * those instead of re-deriving them here.
    */
  /** [[pipelineFunnel]] extended to the FULL training-data-prep shape —
    * the round-12 capstone composition: ingest → quality gate →
    * normalized exact dedup → SEMANTIC DECONTAMINATION (drop survivors
    * whose embedding sits within `decontamThreshold` of the held-out
    * probe set — [[graft.ext.Similarity.semanticDecontamScores]]'s
    * broadcast fold; documents WITHOUT an embedding pass through: there
    * is nothing to judge, and silently dropping them would make missing
    * metadata a deletion) → TEMPERATURE MIXTURE ([[temperatureResample]]
    * at α=1/2 over the decontaminated survivors — rates computed on the
    * SURVIVOR counts, gate order again: upstream attrition reshapes the
    * source distribution the flattening must correct). One row per
    * stage with surviving doc/token counts.
    *
    * Scale shape: the per-stage gates are the standalone operators'
    * own plans (map-only scoring, hash-groupBy dedup, broadcast probe
    * fold, broadcast rate table); the funnel adds id-only anti/semi
    * joins and five aggregate rows. Contamination verdicts are computed
    * over the full non-probe embedding side, not the joined survivors —
    * the verdict is a property of the id, so the result is identical
    * and the plan skips a join in the hot path.
    */
  def trainingPrepFunnel(docs: DataFrame, emb: DataFrame,
                         textCol: String, idCol: String,
                         stopwords: Seq[String], qualityMin: Double,
                         probeFilter: Column, decontamThreshold: Double,
                         sourceCol: String,
                         vecIdCol: String = "vec_id"): DataFrame = {
    val base = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(sourceCol).as("src"),
        col(textCol).as("text"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        TextAnalysis.qualityScore(col(textCol), stopwords).as("quality"))
    val gated = base.where(col("quality") >= qualityMin)
    val keepers = gated
      .groupBy(sha2(Dedup.normalizeText(col("text")), 256).as("h"))
      .agg(min(col("id")).as("id"))
      .select("id")
    val deduped = gated.join(keepers, Seq("id"), "left_semi")
    val contaminated = graft.ext.Similarity.semanticDecontamScores(
        emb.where(!probeFilter), emb.where(probeFilter),
        decontamThreshold, idCol = vecIdCol)
      .where(col("is_contaminated"))
      .select(col(vecIdCol).as("id"))
    val decon = deduped.join(contaminated, Seq("id"), "left_anti")
    val mixed = temperatureResample(decon, "text", "src")
    def stageRow(i: Int, name: String, stage: DataFrame) =
      stage.agg(count(lit(1)).as("docs_kept"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("tokens_kept"))
        .select(lit(i).as("stage_idx"), lit(name).as("stage"),
          col("docs_kept"), col("tokens_kept"))
    stageRow(0, "ingest", base)
      .unionAll(stageRow(1, "quality", gated))
      .unionAll(stageRow(2, "dedup", deduped))
      .unionAll(stageRow(3, "decontam", decon))
      .unionAll(stageRow(4, "mixture", mixed))
  }

  def pipelineFunnel(df: DataFrame, textCol: String, idCol: String,
                     stopwords: Seq[String], qualityMin: Double = 0.5,
                     budgetPerMille: Int = 500): DataFrame = {
    val base = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).as("text"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        TextAnalysis.qualityScore(col(textCol), stopwords).as("quality"))
    val gated = base.where(col("quality") >= qualityMin)
    val keepers = gated
      .groupBy(sha2(Dedup.normalizeText(col("text")), 256).as("h"))
      .agg(min(col("id")).as("id"))
      .select("id")
    val deduped = gated.join(keepers, Seq("id"), "left_semi")
    val selected = budgetSelectBy(deduped, "text", "id", col("quality"),
      Nil, budgetPerMille)
    def stageRow(i: Int, name: String, stage: DataFrame) =
      stage.agg(count(lit(1)).as("docs_kept"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("tokens_kept"))
        .select(lit(i).as("stage_idx"), lit(name).as("stage"),
          col("docs_kept"), col("tokens_kept"))
    stageRow(0, "ingest", base)
      .unionAll(stageRow(1, "quality", gated))
      .unionAll(stageRow(2, "dedup", deduped))
      .unionAll(stageRow(3, "budget", selected))
  }
}
