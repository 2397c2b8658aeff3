package graft.queries

import graft.ext.TextAnalysis
import graft.ops.Tables.t
import org.apache.spark.sql.functions._

/** Text-analysis operator queries over the documents table, all
  * DuckDB-oracle-checkable (integer arithmetic + single double divisions).
  */
object TextQueries {
  import ParityQueries.Q

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")
  private val stopListSql = stopwords.map(s => s"'$s'").mkString(", ")

  /** Fixture coefficients for the model-based quality gate: 64 integer
    * weights in [-1000, 1000], deterministically derived from the slot
    * index by a Knuth-multiplicative scatter so the oracle can rebuild
    * them with the same arithmetic (i·2654435761 stays < 2⁶³ for i < 64).
    * Integer-valued so the linear score is exact in double arithmetic.
    */
  val fixtureWeights: Seq[Double] =
    (0 until 64).map(i => ((i * 2654435761L) % 2001L - 1000L).toDouble)

  val queries: Map[String, Q] = Map(
    "q20_text_tokens" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("n_chars"),
        TextAnalysis.meanTokenLen(col("text")).as("mean_token_len"))
        .orderBy("doc_id")),

    "q220_readability" -> ((s, d) =>
      // integerized Flesch reading ease (milli-points): the classic
      // pre-training readability gate, a pure integer function of
      // (words, sentences, vowel-run syllables) so it hash-matches
      t(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.fleschMilli(col("text")).as("flesch_milli"))
        .where(col("flesch_milli").isNotNull)
        .orderBy("doc_id")),

    "q21_text_quality" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.typeTokenRatio(col("text")).as("ttr"),
        TextAnalysis.stopwordRatio(col("text"), stopwords).as("stop_ratio"),
        TextAnalysis.qualityScore(col("text"), stopwords).as("quality"))
        .orderBy("doc_id")),

    "q22_text_langid" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"), col("lang").as("declared_lang"),
        TextAnalysis.langId(col("text")).as("predicted_lang"))
        .orderBy("doc_id")),

    "q191_langid_confusion" -> ((s, d) => {
      // the classifier-quality rollup of q22: the (declared, predicted)
      // CONFUSION MATRIX with per-declared-language shares in integer
      // ppm — what a pipeline owner reads before trusting the lang-ID
      // gate on a new crawl. The per-language total comes from a window
      // over the MATRIX (languages² rows), never a second corpus pass.
      val m = t(s, d, "documents").select(
          col("lang").as("declared_lang"),
          TextAnalysis.langId(col("text")).as("predicted_lang"))
        .groupBy("declared_lang", "predicted_lang")
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("declared_lang")
      m.withColumn("total", sum(col("n")).over(w))
        .select(col("declared_lang"), col("predicted_lang"), col("n"),
          expr("n * 1000000L div total").as("share_ppm"))
        .orderBy("declared_lang", "predicted_lang")
    }),

    "q23_text_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")),

    "q61_text_repetition" -> ((s, d) =>
      // Gopher-style repetition filter inputs: duplicate-bigram fraction
      // and most-frequent-bigram fraction per document
      t(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.duplicateGramRatio(col("text"), 2).as("dup_gram_ratio"),
        TextAnalysis.topGramRatio(col("text"), 2).as("top_gram_ratio"))
        .orderBy("doc_id")),

    "q69_token_segments" -> ((s, d) =>
      // BPE-ish pre-tokenization count (maximal letter/digit runs) next to
      // the whitespace count — the two standard budget estimators, both
      // codegen'd in the scan stage
      t(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenSegments(col("text")).as("n_segments"),
        TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"))
        .orderBy("doc_id")),

    "q64_vocab_top_ngrams" -> ((s, d) =>
      // corpus-wide vocabulary statistic for tokenizer training: the 50
      // most frequent bigrams. Plan shape: explode → partial-agged groupBy
      // → TakeOrderedAndProject (never a full sort of the gram table);
      // count-desc-then-gram ordering makes the boundary set deterministic
      t(s, d, "documents")
        .select(explode(graft.ext.Dedup.rawWordNgrams(col("text"), 2)).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("gram"))
        .limit(50)),

    "q65_pii_redact" -> ((s, d) =>
      // pre-training PII scrub: per-kind counts on the original text +
      // the redacted text, all codegen'd regex work in the scan stage
      t(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.piiCount(col("text"), "EMAIL").as("n_emails"),
        TextAnalysis.piiCount(col("text"), "IP").as("n_ips"),
        TextAnalysis.piiCount(col("text"), "PHONE").as("n_phones"),
        TextAnalysis.redactPii(col("text")).as("redacted"))
        .orderBy("doc_id")),

    "q24_tfidf_top_terms" -> ((s, d) => {
      // corpus-level statistic (tf · N / df, unlogged idf so the only
      // floating-point op is one division of exact integers — identical in
      // any IEEE engine): top-3 terms per document. Shuffle shape: one
      // explode + two aggs + a broadcast-sized df join; the corpus is never
      // paired with itself. N enters the plan as a broadcast 1-row cross
      // join, not a driver-side count() — one job, no extra corpus pass.
      val docs = t(s, d, "documents")
      val toks = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      // tf already holds one row per distinct (doc, token): df is a
      // reaggregation of it — no second explode + distinct pass over the
      // corpus, and the agg input is already exchange-partitioned
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("token"))
      tf.join(dfreq, Seq("token"))
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("token"),
          ((col("tf") * col("n_docs")).cast("double") / col("df")).as("tfidf"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .orderBy("doc_id", "rn")
    }),

    "q74_corpus_stats" -> ((s, d) =>
      // per-(source, lang) corpus report card with EXACT length quantiles
      // via the value-histogram formulation (see Corpus.corpusStats —
      // never a per-group sort of the raw corpus)
      graft.ext.Corpus.corpusStats(t(s, d, "documents"),
        Seq("source", "lang"), "text")
        .orderBy("source", "lang")),

    "q73_quality_model" -> ((s, d) =>
      // model-based quality gate: fixed-coefficient linear classifier over
      // the hashed bag-of-words (the fastText-classifier shape), gating at
      // score >= 0. Portable slots so DuckDB replays the vector exactly;
      // integer weights x integer counts keep the score exact.
      t(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.modelQualityScore(col("text"), fixtureWeights,
          bias = 0.0, portable = true).as("score"))
        .withColumn("keep", col("score") >= 0)
        .orderBy("doc_id")),

    "q90_compression_ratio" -> ((s, d) =>
      // DEFLATE-codec plumbing, oracle-checked end-to-end: the harness
      // query runs the REAL java.util.zip.Deflater mapPartitions stage at
      // level 0, the one level where DEFLATE's output is closed-form
      // (zlib stored framing: 2-byte header + 4-byte adler32 + a 5-byte
      // header per stored block, ceil(raw/65535) blocks), so DuckDB
      // recomputes the exact byte counts at any document size and the
      // hash compare proves the codec stage ran correctly. The
      // level-6 repetition/junk SIGNAL (RefinedWeb-style) is the same
      // code path at its default level, pinned by TextAnalysisSpec's
      // hand-computed values — levels differ only in the zlib parameter.
      TextAnalysis.compressionRatios(t(s, d, "documents"), "text", "doc_id",
        level = 0)
        .orderBy("doc_id")),

    "q83_gopher_rules" -> ((s, d) =>
      // the published Gopher heuristic-rules filter (Rae et al. 2021,
      // table A1), word-level subset: word-count bounds, mean-word-length
      // bounds, symbol-to-word ratio, alphabetic-word fraction, minimum
      // stopword count. Complements q73's learned gate and q61's
      // repetition signals. Entirely codegen'd expressions over the scan —
      // a shuffle-free map stage whose 100 TB cost is the scan itself.
      // Metrics are emitted alongside the verdict so a pipeline can audit
      // WHICH rule rejected a document.
      t(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_words"),
        TextAnalysis.meanTokenLen(col("text")).as("mean_word_len"),
        TextAnalysis.symbolWordRatio(col("text")).as("symbol_ratio"),
        TextAnalysis.alphaWordFrac(col("text")).as("alpha_frac"),
        TextAnalysis.stopwordCount(col("text"), TextAnalysis.gopherStopwords)
          .as("n_stop"))
        .withColumn("keep",
          col("n_words").between(50, 100000) &&
            col("mean_word_len").between(3.0, 10.0) &&
            col("symbol_ratio") <= 0.1 &&
            col("alpha_frac") >= 0.8 &&
            col("n_stop") >= 2)
        .orderBy("doc_id")),

    "q97_oov_rate" -> ((s, d) => {
      // vocabulary-coverage gate: per-document out-of-vocabulary token
      // fraction against the corpus's own top-k unigram vocabulary (the
      // tokenizer-fit signal a mix owner checks before training a BPE).
      // Shuffle shape: one explode feeds BOTH the vocab top-k (partial
      // agg → TakeOrderedAndProject) and the per-doc counts; the ≤k-row
      // vocab joins back as a BROADCAST, so the corpus is never paired
      // or re-shuffled by token. The boundary is the deterministic
      // (cnt DESC, token) total order (q64's convention). k=16 here —
      // the fixture vocabulary has 31 distinct tokens, so coverage is
      // genuinely partial.
      val toks = t(s, d, "documents").select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
      val vocab = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(16)
        .select(col("token"), lit(1).as("in_vocab"))
      toks.join(broadcast(vocab), Seq("token"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), count(col("in_vocab")).as("n_known"))
        .select(col("doc_id"), col("n_tokens"), col("n_known"),
          ((col("n_tokens") - col("n_known")).cast("double") /
            col("n_tokens").cast("double")).as("oov_rate"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    // level-0 DEFLATE is zlib stored framing: raw + 2 (header) + 4
    // (adler32) + 5 per stored block, ceil(raw/65535) blocks — exact at
    // EVERY document size, not just under the 64 KiB single-block limit
    // (TextAnalysisSpec pins a 3-block input against the JDK Deflater).
    // The ratio is ONE double division on both sides — bit-identical.
    "q90_compression_ratio" ->
      """SELECT doc_id,
                CASE WHEN text IS NULL THEN 0
                     ELSE octet_length(encode(text)) END AS raw_bytes,
                CASE WHEN text IS NULL OR text = '' THEN 0
                     ELSE octet_length(encode(text)) + 6
                          + 5 * CAST(ceil(octet_length(encode(text))
                                          / 65535.0) AS BIGINT)
                END AS deflate_bytes,
                CASE WHEN text IS NULL OR text = '' THEN 1.0
                     ELSE (octet_length(encode(text)) + 6
                           + 5 * CAST(ceil(octet_length(encode(text))
                                           / 65535.0) AS BIGINT))::DOUBLE
                          / octet_length(encode(text))::DOUBLE
                END AS compression_ratio
         FROM documents ORDER BY doc_id""",

    "q20_text_tokens" ->
      """SELECT doc_id,
                len(string_split(text, ' ')) AS n_tokens,
                length(text) AS n_chars,
                CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                  / len(string_split(text, ' ')) AS mean_token_len
         FROM documents ORDER BY doc_id""",

    // q220: the identical integer recurrence — W/S/Syl definitions pinned
    // in TextAnalysis.fleschMilli's scaladoc, both divisions `//`
    "q220_readability" ->
      """SELECT doc_id,
                CAST(206835 - (1015 * w) // s - (84600 * syl) // w
                     AS BIGINT) AS flesch_milli
         FROM (SELECT doc_id,
                      len(list_filter(string_split(text, ' '),
                        t -> len(t) > 0)) AS w,
                      greatest(len(regexp_extract_all(text, '[.!?]')), 1) AS s,
                      len(regexp_extract_all(lower(text), '[aeiou]+')) AS syl
               FROM documents WHERE text IS NOT NULL)
         WHERE w >= 1
         ORDER BY doc_id""",

    "q21_text_quality" ->
      s"""WITH b AS (
            SELECT doc_id,
                   string_split(text, ' ') AS toks,
                   length(text) AS n_chars
            FROM documents),
          m AS (
            SELECT doc_id,
                   CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
                   CAST(len(list_filter(toks, x -> x IN ($stopListSql))) AS DOUBLE)
                     / len(toks) AS stop_ratio,
                   CAST(n_chars - (len(toks) - 1) AS DOUBLE) / len(toks) AS mtl
            FROM b)
          SELECT doc_id, ttr, stop_ratio,
                 ttr * 0.5 + (1.0 - stop_ratio) * 0.3 +
                 (CASE WHEN mtl BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END) * 0.2 AS quality
          FROM m ORDER BY doc_id""",

    "q22_text_langid" ->
      { val scores = TextAnalysis.langMarkers.map { case (lang, markers) =>
          val list = markers.map(m => s"'$m'").mkString(", ")
          s"len(list_filter(toks, x -> x IN ($list))) AS s_$lang"
        }.mkString(", ")
        // argmax with the same left-to-right tie-breaking as langId's fold
        s"""WITH b AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
            m AS (SELECT doc_id, lang, $scores FROM b)
            SELECT doc_id, lang AS declared_lang,
                   CASE WHEN s_fr > (CASE WHEN s_es > s_en THEN s_es ELSE s_en END)
                        THEN 'fr'
                        WHEN s_es > s_en THEN 'es' ELSE 'en' END AS predicted_lang
            FROM m ORDER BY doc_id""" },

    // q191: q22's per-doc replay rolled up to the confusion matrix with
    // integer-ppm per-declared shares
    "q191_langid_confusion" ->
      { val scores = TextAnalysis.langMarkers.map { case (lang, markers) =>
          val list = markers.map(m => s"'$m'").mkString(", ")
          s"len(list_filter(toks, x -> x IN ($list))) AS s_$lang"
        }.mkString(", ")
        s"""WITH b AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
            m AS (SELECT doc_id, lang, $scores FROM b),
            p AS (SELECT lang AS declared_lang,
                         CASE WHEN s_fr > (CASE WHEN s_es > s_en THEN s_es ELSE s_en END)
                              THEN 'fr'
                              WHEN s_es > s_en THEN 'es' ELSE 'en'
                         END AS predicted_lang
                  FROM m),
            c AS (SELECT declared_lang, predicted_lang,
                         CAST(count(*) AS BIGINT) AS n
                  FROM p GROUP BY 1, 2)
            SELECT declared_lang, predicted_lang, n,
                   CAST(n * 1000000 // sum(n) OVER (PARTITION BY declared_lang)
                        AS BIGINT) AS share_ppm
            FROM c ORDER BY declared_lang, predicted_lang""" },

    "q23_text_fingerprint" ->
      """SELECT doc_id,
                list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(string_split(text, ' '),
                      t -> CAST(ascii(substr(t, 1, 1)) AS BIGINT) * 100 + length(t))),
                  (acc, h) -> (acc * 31 + h) % 1000000007) AS fingerprint
         FROM documents ORDER BY doc_id""",

    // bigrams in document order with repeats kept, exactly the engine's
    // rawWordNgrams multiset (range(1,1) is empty, matching the <n-token
    // guard); ratios are integer counts through one double division each
    "q61_text_repetition" ->
      """WITH b AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         g AS (SELECT doc_id,
                      list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i + 1]) AS grams
               FROM b)
         SELECT doc_id,
                CASE WHEN len(grams) > 0
                     THEN CAST(1.0 AS DOUBLE)
                          - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
                     ELSE CAST(0.0 AS DOUBLE) END AS dup_gram_ratio,
                CASE WHEN len(grams) > 0
                     THEN CAST(list_max(list_transform(list_distinct(grams),
                            x -> len(list_filter(grams, y -> y = x)))) AS DOUBLE)
                          / len(grams)
                     ELSE CAST(0.0 AS DOUBLE) END AS top_gram_ratio
         FROM g ORDER BY doc_id""",

    "q69_token_segments" ->
      """SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+')) AS INTEGER)
                  AS n_segments,
                len(string_split(text, ' ')) AS n_ws_tokens
         FROM documents ORDER BY doc_id""",

    // same gram expansion as q61 (repeats kept, document order), then a
    // plain group-count with the deterministic (cnt DESC, gram) boundary
    "q64_vocab_top_ngrams" ->
      """WITH b AS (SELECT string_split(text, ' ') AS toks FROM documents),
         g AS (SELECT unnest(list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i + 1])) AS gram
               FROM b)
         SELECT gram, count(*) AS cnt FROM g GROUP BY gram
         ORDER BY cnt DESC, gram LIMIT 50""",

    // patterns shared verbatim with TextAnalysis.piiPatterns (RE2-safe
    // subset); counts on the original text, redaction chained in the same
    // fixed order as the engine
    "q65_pii_redact" -> {
      val pats = TextAnalysis.piiPatterns.toMap
      val redacted = TextAnalysis.piiPatterns.foldLeft("text") {
        case (acc, (kind, pat)) =>
          s"regexp_replace($acc, '$pat', '<$kind>', 'g')"
      }
      s"""SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '${pats("EMAIL")}')) AS INTEGER) AS n_emails,
                 CAST(len(regexp_extract_all(text, '${pats("IP")}')) AS INTEGER) AS n_ips,
                 CAST(len(regexp_extract_all(text, '${pats("PHONE")}')) AS INTEGER) AS n_phones,
                 $redacted AS redacted
          FROM documents ORDER BY doc_id"""
    },

    "q24_tfidf_top_terms" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         tf AS (
           SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
         dfreq AS (
           SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token),
         n AS (SELECT count(*) AS n FROM documents),
         scored AS (
           SELECT tf.doc_id, tf.token,
                  CAST(tf.tf * n.n AS DOUBLE) / dfreq.df AS tfidf
           FROM tf JOIN dfreq USING (token) CROSS JOIN n),
         ranked AS (
           SELECT doc_id, token, tfidf,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, token) AS rn
           FROM scored)
         SELECT doc_id, token, tfidf, rn FROM ranked
         WHERE rn <= 3 ORDER BY doc_id, rn""",

    // same histogram + integer-rank formulation; the only double is the
    // mean's single division of exact integers
    "q74_corpus_stats" ->
      """WITH h AS (
           SELECT source, lang, len(string_split(text, ' ')) AS n_toks,
                  count(*) AS c
           FROM documents WHERE text IS NOT NULL GROUP BY 1, 2, 3),
         cum AS (
           SELECT source, lang, n_toks, c,
                  sum(c) OVER (PARTITION BY source, lang
                               ORDER BY n_toks) AS hi,
                  sum(c) OVER (PARTITION BY source, lang) AS cnt
           FROM h),
         b AS (SELECT *, hi - c + 1 AS lo FROM cum)
         SELECT source, lang,
                CAST(max(cnt) AS BIGINT) AS n_docs,
                CAST(sum(n_toks * c) AS DOUBLE) / max(cnt) AS mean_tokens,
                CAST(max(CASE WHEN (cnt-1)*50//100+1 BETWEEN lo AND hi
                              THEN n_toks END) AS BIGINT) AS p50_tokens,
                CAST(max(CASE WHEN (cnt-1)*90//100+1 BETWEEN lo AND hi
                              THEN n_toks END) AS BIGINT) AS p90_tokens,
                CAST(max(CASE WHEN (cnt-1)*99//100+1 BETWEEN lo AND hi
                              THEN n_toks END) AS BIGINT) AS p99_tokens
         FROM b GROUP BY source, lang ORDER BY source, lang""",

    // vector = portableHashEmbedding replay (char-fold slots, as in q38's
    // oracle); weights = the same Knuth-multiplicative scatter the engine
    // fixture uses; all-integer values make the double dot product exact
    "q73_quality_model" ->
      """WITH v AS (
           SELECT doc_id, list_transform(range(0, 64),
             s -> CAST(len(list_filter(slots, x -> x = s)) AS DOUBLE)) AS vec
           FROM (
             SELECT doc_id, list_transform(string_split(text, ' '),
               t -> list_reduce(
                      list_prepend(CAST(0 AS BIGINT),
                        list_transform(range(1, length(t) + 1),
                          i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),
                      (acc, c) -> (acc * 31 + c) % 1000000007) % 64) AS slots
             FROM documents)),
         w AS (SELECT list_transform(range(0, 64),
                 i -> CAST((i * 2654435761) % 2001 - 1000 AS DOUBLE)) AS wt),
         scored AS (
           SELECT doc_id,
                  list_reduce(list_prepend(0.0,
                    list_transform(range(1, 65), i -> vec[i] * wt[i])),
                    (x, y) -> x + y) AS score
           FROM v CROSS JOIN w)
         SELECT doc_id, score, score >= 0 AS keep
         FROM scored ORDER BY doc_id""",

    // every metric is integer counts through one double division; the
    // alpha-word pattern is shared verbatim with alphaWordFrac (RE2-safe)
    "q83_gopher_rules" -> {
      val stopList = TextAnalysis.gopherStopwords.map(s => s"'$s'").mkString(", ")
      s"""WITH b AS (SELECT doc_id, text, string_split(text, ' ') AS toks
                     FROM documents),
          m AS (SELECT doc_id,
                  len(toks) AS n_words,
                  CAST(length(text) - (len(toks) - 1) AS DOUBLE) / len(toks)
                    AS mean_word_len,
                  CAST(len(regexp_extract_all(text, '#'))
                       + len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
                    / len(toks) AS symbol_ratio,
                  CAST(len(regexp_extract_all(text, '(^| )[^ ]*[A-Za-z]'))
                       AS DOUBLE) / len(toks) AS alpha_frac,
                  len(list_filter(toks, x -> x IN ($stopList))) AS n_stop
                FROM b)
          SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
                 n_stop,
                 (n_words BETWEEN 50 AND 100000)
                   AND (mean_word_len BETWEEN 3.0 AND 10.0)
                   AND symbol_ratio <= 0.1
                   AND alpha_frac >= 0.8
                   AND n_stop >= 2 AS keep
          FROM m ORDER BY doc_id"""
    },

    // vocab boundary = the deterministic (cnt DESC, token) total order;
    // the OOV fraction is one division of exact integers
    "q97_oov_rate" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
         v AS (SELECT token FROM (
                 SELECT token, count(*) AS cnt FROM toks GROUP BY token
                 ORDER BY cnt DESC, token LIMIT 16)),
         j AS (SELECT t.doc_id, v.token AS vt
               FROM toks t LEFT JOIN v ON t.token = v.token)
         SELECT doc_id, count(*) AS n_tokens, count(vt) AS n_known,
                CAST(count(*) - count(vt) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) AS oov_rate
         FROM j GROUP BY doc_id ORDER BY doc_id"""
  )
}
