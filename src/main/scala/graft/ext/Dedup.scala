package graft.ext

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
object Dedup extends DedupSetSim
