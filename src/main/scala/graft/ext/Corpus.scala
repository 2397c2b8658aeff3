package graft.ext

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
object Corpus extends CorpusLm
