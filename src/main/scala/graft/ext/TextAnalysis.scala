package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization stats, quality scoring, language ID, fingerprinting.
  *
  * Everything here is pure Catalyst expressions (no UDFs): the per-row work
  * stays inside whole-stage codegen / vectorized evaluation and needs no
  * shuffle at all — at 100 TB these are embarrassingly parallel map stages
  * whose cost is the parquet scan itself.
  *
  * Determinism: token counts and ratios are integer arithmetic followed by
  * a single double division, which is bit-identical across engines — these
  * operators are all DuckDB-oracle-checkable.
  */
object TextAnalysis {

  /** Whitespace tokenizer (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword count upper bound: splits on non-alphanumerics AND
    * letter/digit boundaries, the usual pre-tokenization pass.
    */
  def roughTokenCount(text: Column): Column =
    size(split(text, "[^A-Za-z0-9]+|(?<=[A-Za-z])(?=[0-9])|(?<=[0-9])(?=[A-Za-z])"))

  /** Count of maximal letter-runs and digit-runs — the same BPE-ish
    * pre-tokenization segments as [[roughTokenCount]], but formulated as an
    * extraction (`[A-Za-z]+|[0-9]+`) instead of lookaround splits, so it
    * stays in the RE2-compatible subset an oracle engine can replay, and
    * never counts the empty leading segment the split form emits on texts
    * starting with a separator.
    */
  def tokenSegments(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+"), lit(0)))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Type-token ratio: distinct tokens / tokens — a repetition signal. */
  def typeTokenRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") / size(tokens(text))

  /** Occurrences of any of `words` among the tokens. A lambda
    * `filter(toks, _.isInCollection(words))` computes the same count but
    * as a CodegenFallback HOF it would break whole-stage codegen for the
    * entire projection (PlanAuditSpec caught exactly that); per-word
    * `array_remove` size deltas keep the stage fully codegen'd.
    */
  private def hitCount(text: Column, words: Seq[String]): Column =
    words.map(w => size(tokens(text)) - size(array_remove(tokens(text), w)))
      .reduce(_ + _)

  /** Total stopword occurrences among the tokens (public face of
    * [[hitCount]], needed by threshold rules that gate on an absolute
    * count rather than a ratio).
    */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    hitCount(text, stopwords)

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    hitCount(text, stopwords).cast("double") / size(tokens(text))

  /** Mean token length (separator-aware integer arithmetic: chars minus the
    * n-1 separators, divided by n — avoids a second pass over the tokens).
    */
  def meanTokenLen(text: Column): Column =
    (length(text) - (size(tokens(text)) - 1)).cast("double") / size(tokens(text))

  /** Fraction of word n-gram slots occupied by a repeat of an earlier gram
    * (1 − distinct/total) — the standard repetition filter for boilerplate
    * and looping generations: natural text sits near 0, templated spam near
    * 1. Docs shorter than n tokens score 0. Gram construction shares the
    * dedup operators' HOF build ([[Dedup.rawWordNgrams]]), so unlike the
    * q20-q22 metrics this projection is interpreted rather than
    * whole-stage-codegen'd — still a shuffle-free map stage whose 100 TB
    * cost is the scan itself.
    */
  def duplicateGramRatio(text: Column, n: Int = 2): Column = {
    val g = Dedup.rawWordNgrams(text, n)
    when(size(g) > 0,
      lit(1.0) - size(array_distinct(g)).cast("double") / size(g))
      .otherwise(lit(0.0))
  }

  /** Fraction of n-gram slots taken by the single most frequent gram — the
    * companion repetition signal (catches one boilerplate sentence pasted
    * between otherwise-distinct content, which dilutes
    * [[duplicateGramRatio]]). 1/total when all grams are unique; 0 for docs
    * shorter than n tokens.
    */
  def topGramRatio(text: Column, n: Int = 2): Column = {
    val g = Dedup.rawWordNgrams(text, n)
    // max gram frequency == longest equal run in the SORTED gram array:
    // sort, mark adjacent-equal pairs, take the longest TRUE run + 1 in
    // one linear aggregate pass. The composable distinct×refilter form
    // (count each distinct gram by refiltering the slot array) is
    // O(distinct·m) per document — quadratic exactly on the long spammy
    // documents this metric exists to catch. Evaluation discipline: the
    // sorted array is referenced only as a DIRECT child of zip_with/slice
    // (evaluated once per row); referencing it from INSIDE an interpreted
    // HOF lambda would re-evaluate the sort per element (O(m² log m) —
    // measured 40× slower on the docs table)
    val s = array_sort(g)
    val n1 = greatest(size(s) - 1, lit(0))
    val eqs = zip_with(slice(s, lit(1), n1), slice(s, lit(2), n1),
      (a, b) => a === b)
    val best = aggregate(eqs,
      struct(lit(1).as("run"), lit(1).as("best")),
      (acc, eq) => {
        val run = when(eq, acc.getField("run") + 1).otherwise(lit(1))
        struct(run.as("run"), greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(size(g) > 0, best.cast("double") / size(g)).otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: rewards lexical diversity, penalizes
    * stopword stuffing, rewards mid-length tokens. Deterministic double
    * arithmetic (fixed operation order).
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val ttr = typeTokenRatio(text)
    val stop = stopwordRatio(text, stopwords)
    val lenOk = when(meanTokenLen(text).between(3.0, 8.0), lit(1.0)).otherwise(lit(0.5))
    ttr * lit(0.5) + (lit(1.0) - stop) * lit(0.3) + lenOk * lit(0.2)
  }

  /** The Gopher rules' 8-word English stop list (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training Gopher",
    * table A1): a kept document must contain at least two of these.
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Symbol-to-word ratio, the Gopher boilerplate signal: occurrences of
    * `#` or `...` per word. Codegen'd regexp counts over the raw text — no
    * token array is materialized.
    */
  def symbolWordRatio(text: Column): Column =
    (regexp_count(text, lit("#")) + regexp_count(text, lit("\\.\\.\\.")))
      .cast("double") / size(tokens(text))

  /** Fraction of words containing at least one alphabetic character. The
    * per-token lambda form (`filter(toks, …)`) is a CodegenFallback HOF;
    * counting matches of a token-shaped pattern on the raw single-space
    * text keeps the stage codegen'd and is RE2-safe for oracle replay:
    * each match consumes its leading separator (or string start), so
    * adjacent qualifying words cannot overlap.
    */
  def alphaWordFrac(text: Column): Column =
    regexp_count(text, lit("(^| )[^ ]*[A-Za-z]")).cast("double") /
      size(tokens(text))

  /** Per-language stopword marker sets for the n-gram/marker heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des"))

  /** Marker-hit language ID: score = marker hits per language, predict the
    * argmax (ties break by the declared language order). A real system
    * would use char n-gram profiles; the decision structure — per-language
    * score then argmax, all expression-level — is the same.
    */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> hitCount(text, markers)
    }
    // argmax with order-stable tie-breaking: fold keeping (bestLang, bestScore)
    scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }._1
  }

  /** Feature-hashed bag-of-words embedding: dimension i counts the tokens
    * whose xxhash64 lands in slot i ("hashing trick"). Deterministic, pure
    * expression, and near-duplicate documents map to near-identical vectors
    * — the cheap on-ramp into the embedding-cosine dedup/ANN operators when
    * no model embeddings exist. Float output matches the embeddings table's
    * column type.
    */
  def hashEmbedding(text: Column, dim: Int = 64): Column =
    graft.functions.SetExpressions.featureHashCounts(
      transform(tokens(text), t => xxhash64(t)), dim)

  /** SQL-portable token hash: fold (acc·31 + codepoint) mod p over the
    * token's characters, p = 1e9+7 — the same rolling structure as
    * [[fingerprint]], kept in [0, p) so acc·31 + cp never overflows a
    * long. Computed by the codegen'd CharFold expression; oracle engines
    * replay it as a per-character `ascii(substr(...))` fold.
    */
  def portableTokenHash(tok: Column): Column =
    graft.functions.TextExpressions.charFold(tok, 31L, 1000000007L)

  /** [[hashEmbedding]] over [[portableTokenHash]] instead of xxhash64:
    * identical vector semantics (slot = hash mod dim, value = token count),
    * but every step is plain integer arithmetic an oracle engine can
    * replay — this is the variant the correctness harness cross-checks
    * end-to-end (xxhash64 exists nowhere outside Spark). Production
    * callers keep [[hashEmbedding]]; its xxhash64 slots mix better and
    * cost one codegen'd hash per token instead of a per-char fold.
    */
  def portableHashEmbedding(text: Column, dim: Int = 64): Column =
    graft.functions.SetExpressions.featureHashCounts(
      transform(tokens(text), portableTokenHash _), dim)

  /** Model-based quality gate, fastText-shaped: a LINEAR classifier over
    * the hashed bag-of-words — score = bias + w · hashEmbedding(text, |w|).
    * `weights` are the fixed coefficients of a trained model, supplied as
    * plan literals (TextQueries carries a deterministic fixture; a real
    * model's coefficients drop straight in). Pure codegen'd expressions
    * (FeatureHashCounts + DotProduct) — no UDF, no shuffle, evaluated in
    * the scan stage at any scale.
    *
    * No sigmoid on purpose: it is monotone, so gating on the linear score
    * is the SAME decision as gating on the calibrated probability, and
    * with integer-valued weights the score is exact integer arithmetic
    * carried in doubles — deterministic and (with `portable = true`)
    * replayable by a SQL oracle. Production callers keep the default
    * xxhash64 slots, which mix better.
    */
  def modelQualityScore(text: Column, weights: Seq[Double], bias: Double,
                        portable: Boolean = false): Column = {
    val emb =
      if (portable) portableHashEmbedding(text, weights.size)
      else hashEmbedding(text, weights.size)
    graft.functions.VectorExpressions.dot(
      emb.cast("array<double>"), array(weights.map(lit): _*)) + lit(bias)
  }

  /** SQL-portable 64-bit token hash: two INDEPENDENT char folds — base 31
    * mod 1e9+7 and base 131 mod 998244353 — packed as h1·2³¹ + h2 (< 2⁶¹,
    * overflow-free). Bits 61-63 are always zero; bit-consumers (SimHash
    * votes) see a constant there on every token, which cancels out of any
    * distance. This is the oracle-replayable stand-in for xxhash64 where a
    * full 64-bit surface is needed; same tradeoff as
    * [[portableHashEmbedding]] — production callers keep xxhash64.
    */
  def portableTokenHash64(tok: Column): Column =
    portableTokenHash(tok) * lit(2147483648L) +
      graft.functions.TextExpressions.charFold(tok, 131L, 998244353L)

  /** Rolling-hash document fingerprint: fold (acc*31 + termHash) mod p over
    * tokens, where termHash = ascii(first char)*100 + len. Order-sensitive
    * (a permuted document fingerprints differently), overflow-free
    * (acc < p=1e9+7, so acc*31+term < 2^63), and SQL-expressible for the
    * oracle. For collision-grade fingerprints compose with xxhash64; this
    * keeps the rolling structure portable.
    *
    * Computed by the codegen'd [[graft.functions.TextExpressions]]
    * expression (one pass over the UTF-8 bytes): the composable
    * `aggregate(transform(split(...)))` form is a CodegenFallback HOF
    * chain costing two interpreted lambdas per token per row, and this
    * fingerprint keys split/sampling decisions over the whole corpus.
    */
  def fingerprint(text: Column): Column =
    graft.functions.TextExpressions.rollingFingerprint(text)

  /** Per-document DEFLATE compression ratio (compressed/raw bytes over
    * UTF-8), the classic cheap repetition/junk signal (low ratio =
    * templated or repeated content; natural prose sits near the top of
    * the range): used as a quality gate alongside the n-gram repetition
    * metrics, which it complements by catching long-range repetition that
    * fixed-n grams miss. Implemented over `mapPartitions` with the JDK's
    * own Deflater at a FIXED level — java.util.zip wraps zlib with
    * deterministic output for a given (input, level), so the score is
    * reproducible across runs and executors. Compressed output at
    * levels >= 1 is NOT expressible in SQL (the spec pins hand-computed
    * level-6 values); level 0 IS — zlib stored framing is
    * `raw + 6 + 5·ceil(raw/65535)` bytes at EVERY document size (the
    * deflater gets full output space in one call, so stored blocks are
    * maximal — boundary-pinned in TextAnalysisSpec), which is how the
    * q90 harness query gets a full DuckDB oracle over the identical
    * codec stage. Assumes zlib >= 1.2.9 stored-block behavior (older
    * zlib capped stored blocks at 65531 bytes under memLevel 8) — a
    * one-time probe asserts it per JVM rather than letting the oracle
    * mismatch mysteriously on an exotic JDK. Shuffle-free map stage; one
    * Deflater and one output buffer (grown to the partition's largest
    * document) are reused across each partition's rows, and the Deflater
    * releases its native buffers at partition end. Empty and NULL text
    * score 1.0 (nothing to compress — never "maximally repetitive").
    */
  /** One-time zlib behavior probe (per JVM): level-0 DEFLATE of 65535
    * bytes with full output space must come out as ONE maximal stored
    * block (raw + 11) — true for zlib >= 1.2.9, which every current JDK
    * bundles or links; ancient zlib capped stored blocks at 65531 bytes
    * under memLevel 8, which would silently break the q90 closed form.
    * Failing loudly here beats a mysterious oracle hash mismatch. */
  private lazy val storedBlocksAreMaximal: Unit = {
    val d = new java.util.zip.Deflater(0)
    try {
      d.setInput(new Array[Byte](65535))
      d.finish()
      val out = new Array[Byte](65535 + 64)
      var n = 0L
      while (!d.finished()) n += d.deflate(out)
      require(n == 65535L + 11,
        s"zlib stored-block probe: got $n bytes for a 65535-byte level-0 " +
          "input, expected 65546 — this zlib does not emit maximal stored " +
          "blocks, so the closed-form level-0 contract (q90) does not hold")
    } finally d.end()
  }

  def compressionRatios(df: org.apache.spark.sql.DataFrame, textCol: String,
                        idCol: String, level: Int = 6): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol), col(textCol)).rdd.mapPartitions { it =>
      storedBlocksAreMaximal // once per JVM: fail loudly on exotic zlib
      val deflater = new java.util.zip.Deflater(level)
      var out = new Array[Byte](64 * 1024) // grown to the partition max
      val rows = it.map { r =>
        val id = r.getLong(0)
        val text = if (r.isNullAt(1)) null else r.getString(1)
        if (text == null || text.isEmpty) {
          org.apache.spark.sql.Row(id, 0L, 0L, 1.0)
        } else {
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          // ONE deflate call with full output space: zlib then emits
          // MAXIMAL stored blocks (65535 bytes) at level 0, making the
          // output size a pure function of the input — the closed form
          // the q90 oracle replays. A fixed-buffer loop instead splits
          // stored blocks at the buffer remainder, so documents within
          // 6 bytes under a 65535 multiple gained an extra 5-byte block
          // header per buffer cycle (measured; boundary-pinned in
          // TextAnalysisSpec). The bound covers zlib's worst case at
          // every level (stored framing needs raw/13107; level-6
          // incompressible needs ~raw/3277 + 10); Long math + cap so a
          // near-2 GiB document degrades to the loop instead of
          // overflowing the allocation size negative.
          val bound = math.min(
            raw.length.toLong + (raw.length >>> 10) + 128L,
            Int.MaxValue.toLong - 8).toInt
          if (out.length < bound) out = new Array[Byte](bound)
          var compressed = deflater.deflate(out).toLong
          while (!deflater.finished()) // only reachable near the Int cap
            compressed += deflater.deflate(out)
          org.apache.spark.sql.Row(id, raw.length.toLong, compressed,
            compressed.toDouble / raw.length)
        }
      }
      // release native zlib buffers at partition end (hasNext is called
      // again after exhaustion by Spark's pipeline; end() is idempotent)
      new Iterator[org.apache.spark.sql.Row] {
        def hasNext: Boolean = {
          val h = rows.hasNext
          if (!h) deflater.end()
          h
        }
        def next(): org.apache.spark.sql.Row = rows.next()
      }
    }
    spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(idCol,
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("raw_bytes",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("deflate_bytes",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("compression_ratio",
        org.apache.spark.sql.types.DoubleType, nullable = false))))
  }

  /** PII surface patterns (emails, IPv4 addresses, NANP-shaped phone
    * numbers), deliberately kept in the RE2-compatible subset of Java
    * regex — no backreferences, no lookaround — so oracle engines replay
    * them byte-identically. Redaction order matters and is fixed by this
    * sequence: emails first, so a phone-shaped email local part is
    * consumed by `<EMAIL>` and never double-redacted.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "EMAIL" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "IP" -> "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b",
    // the \b after the optional '+' blocks matches starting mid-digit-run
    // ("ref 91555 123 4567" must not half-redact) while still admitting a
    // leading '+' (non-word char, so the boundary sits between it and the
    // first digit)
    "PHONE" -> "\\+?\\b[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\\b")

  /** Redact every [[piiPatterns]] occurrence with a `<KIND>` placeholder
    * token: a chain of codegen'd regexp_replace calls, shuffle-free — the
    * standard pre-training scrub pass, whose 100 TB cost is the scan.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (kind, pat)) =>
      regexp_replace(c, pat, s"<$kind>")
    }

  /** Occurrences of one [[piiPatterns]] kind in the ORIGINAL text (counts
    * are per-kind independent, unlike the sequential redaction chain).
    */
  def piiCount(text: Column, kind: String): Column =
    regexp_count(text, lit(piiPatterns.toMap.apply(kind)))

  /** INTEGERIZED Flesch reading ease, in milli-points (Flesch 1948;
    * Kincaid et al. 1975 recalibration uses the same three statistics) —
    * the classic pre-training readability gate next to [[qualityScore]].
    * Definitions are pinned so any engine replays them exactly:
    * words = non-empty space-split tokens; sentences =
    * max(1, occurrences of [.!?]); syllables = maximal lowercase vowel
    * runs `[aeiou]+`. The two ratio terms integerize through Catalyst
    * `div` in milli-units — 1.015·(W/S) → `(1015·W) div S`, 84.6·(Syl/W)
    * → `(84600·Syl) div W` — so the score is a pure integer function of
    * (W, S, Syl): hash-identical in any engine, where the float formula
    * would drift on division rounding.
    * Returns NULL on NULL text and on zero-word text (no defined score).
    */
  def fleschMilli(text: Column): Column = {
    def div(a: Column, b: Column): Column =
      org.apache.spark.sql.GraftSqlBridge.column(
        new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.GraftSqlBridge.expression(a),
          org.apache.spark.sql.GraftSqlBridge.expression(b)))
    val w = size(filter(tokens(text), t => length(t) > 0)).cast("long")
    val s = greatest(regexp_count(text, lit("[.!?]")), lit(1)).cast("long")
    val syl = regexp_count(lower(text), lit("[aeiou]+")).cast("long")
    when(w >= 1L,
      lit(206835L) - div(lit(1015L) * w, s) - div(lit(84600L) * syl, w))
  }
}
