package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer training: distributed and in-memory BPE, hard-EM and fixed-point soft-EM unigram-LM, segmentation and fertility.
  * One family of [[Corpus]] — the object is assembled from the
  * per-family traits (graft.ext.Corpus*.scala) so each file stays
  * reviewable; call sites are unchanged.
  */
trait CorpusTokenizers extends CorpusOps {
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
    // zero non-empty words → empty seed → the EM loop never runs and
    // t = v = 0 would feed Fp.log2fp(0) below; return the empty model
    // frame instead (the float twin's behavior on the same corpus)
    if (vocab.isEmpty)
      return Seq.empty[(String, Long, Long)]
        .toDF("piece", "exp_uses_micro", "neg_log2p_fp")
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
}
