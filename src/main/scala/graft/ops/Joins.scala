package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-shape levers that don't change join semantics. */
object Joins {

  /** Salted equi-join — the a-priori skew lever. A hot probe key funnels
    * its entire row population through one reducer of a plain shuffle
    * join; salting splits it `salts` ways by widening the join key with a
    * salt column: the probe side gets a deterministic salt in
    * [0, salts), the build side is replicated once per salt value, and
    * the join runs on (key, salt). The result is EXACTLY the plain
    * equi-join — every probe row still meets every matching build row,
    * exactly once — which is what the oracle checks.
    *
    * Cost model: build-side bytes ×salts (bounded — this lever is for a
    * SMALL-but-unbroadcastable build side against a skewed probe), in
    * exchange for the hot key's probe rows spreading across `salts`
    * reducers. AQE's skew-join split is the post-hoc alternative and the
    * default answer; explicit salting is for keys KNOWN to be
    * pathological (the null-key pile, the empty-document hash, the
    * one-customer-is-half-the-table tenant) where a fixed spread beats
    * re-planning, and for sort-merge paths AQE won't split (e.g. under
    * requiredChildDistribution pins).
    *
    * `probeSalt` must be DETERMINISTIC per row (content-derived, e.g.
    * `xxhash64` of a stable column — never rand()): task retries must
    * re-salt identically or rows duplicate/vanish under failure replay.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String,
                 salts: Int, probeSalt: Column): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val p = probe.withColumn("_g_salt_p",
      pmod(probeSalt, lit(salts.toLong)).cast("int"))
    val b = build.withColumn("_g_salt_b",
      explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, col(probeKey) === col(buildKey) &&
        col("_g_salt_p") === col("_g_salt_b"))
      .drop("_g_salt_p", "_g_salt_b")
  }
}
