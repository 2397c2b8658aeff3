package graft.ops

/** Shared FIXED-POINT transcendental primitives — the determinism layer
  * that lets soft (expectation-weighted) algorithms join the exact-replay
  * oracle set. The problem with float soft-EM is not correctness but
  * REPLAYABILITY: `exp`/`log1p` chains accumulate in an order a SQL
  * engine's aggregates do not promise to reproduce, so the results can
  * never hash-match an oracle. The fix is the same one the k-means
  * family uses for its training stats (Similarity.scala fixed-point
  * integer stats): make every transcendental a DEFINED integer function
  * — quantized, table-driven, overflow-checked — and share the ONE table
  * source between the engine and the generated DuckDB SQL, so both sides
  * compute bit-identical Longs and plain integer SUMs (order-free) do
  * the rest.
  *
  * Representation: log-domain values are Longs in "fp-bits" — log₂
  * scaled by B = 2^20. Linear-domain intermediates use a 2^30 mantissa
  * scale. Precision is ~2⁻⁷ bits through the pairwise log-sum-exp table
  * — plenty for expectation counts, and PRECISION IS NOT THE CONTRACT:
  * the contract is that the quantized function is exactly reproducible
  * anywhere integers work.
  */
object Fp {
  /** Fractional bits of the log-domain fixed point (B = 2^20). */
  val FracBits = 20
  val B: Long = 1L << FracBits

  /** Mantissa scale for linear-domain intermediates (2^30). */
  val MantBits = 30

  /** floor-quantized fixed-point log₂ of a positive integer, by exact
    * MANTISSA SQUARING: normalize x to a 30-bit mantissa m ∈ [2^30,
    * 2^31) (truncating division — defined), then 20 rounds of m ← m²/2^30
    * emit one fraction bit each (m² < 2^62, no overflow). Every step is
    * integer floor arithmetic, so any engine replays it exactly; the
    * oracle SQL runs the same 20 rounds as a recursive CTE.
    */
  def log2fp(x: Long): Long = {
    require(x >= 1, s"log2fp needs x >= 1, got $x")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (e <= MantBits) x << (MantBits - e) else x >> (e - MantBits)
    var frac = 0L
    var i = 0
    while (i < FracBits) {
      m = (m * m) >> MantBits
      frac <<= 1
      if (m >= (1L << (MantBits + 1))) { m >>= 1; frac |= 1L }
      i += 1
    }
    (e.toLong << FracBits) | frac
  }

  /** 2^(−i/64) on the 2^30 mantissa scale, i = 0..1023 — the shared
    * fraction table behind [[exp2fp30]] and [[lse2]]. Generated ONCE
    * here; the oracle SQL embeds these exact integers as literals, so
    * float rounding in table GENERATION can never split the two sides.
    */
  val exp2Tab: Array[Long] = Array.tabulate(1024)(i =>
    math.round((1L << MantBits).toDouble * math.pow(2.0, -i / 64.0)))

  /** Quantization shift from fp-bits to [[exp2Tab]] index resolution
    * (1/64 bit): idx = d >> Exp2Shift. */
  val Exp2Shift: Int = FracBits - 6

  /** Round-down 2^30 · 2^(−d/B) for d ≥ 0 fp-bits, fraction quantized to
    * 1/64 bit via [[exp2Tab]]; 0 once the integer part exceeds the
    * mantissa width. */
  def exp2fp30(d: Long): Long = {
    require(d >= 0, s"exp2fp30 needs d >= 0, got $d")
    val q = d >> FracBits
    if (q > MantBits) 0L
    else exp2Tab(((d & (B - 1)) >> Exp2Shift).toInt) >> q.toInt
  }

  /** log₂(1 + 2^(−i/64)) in fp-bits, i = 0..1023 — the pairwise
    * log-sum-exp table. Beyond the table (Δ ≥ 16 bits) the correction
    * is < 2⁻¹⁶ bits ≈ 0 at this resolution. */
  val lseTab: Array[Long] = Array.tabulate(1024)(i =>
    math.round(B.toDouble *
      math.log1p(math.pow(2.0, -i / 64.0)) / math.log(2.0)))

  /** Pairwise log-sum-exp in fp-bits: max + lseTab[Δ quantized]. NOT
    * associative under quantization — callers must fold legs in a FIXED,
    * documented order (ascending split index), mirrored by the oracle
    * generation. */
  def lse2(a: Long, b: Long): Long = {
    val hi = math.max(a, b)
    val d = hi - math.min(a, b)
    val idx = d >> Exp2Shift
    if (idx >= lseTab.length) hi else hi + lseTab(idx.toInt)
  }

  /** SQL fragments for the oracle generators — same tables, same
    * quantization, emitted as integer literals. */
  object Sql {
    /** One row per table entry: `(i, v)`. */
    def tableCte(name: String, tab: Array[Long]): String =
      s"$name(i, v) AS (SELECT UNNEST(range(${tab.length})), " +
        s"UNNEST([${tab.mkString(", ")}]))"

    /** The 20-round mantissa-squaring log2fp over a keyed relation, as a
      * recursive CTE. `src` must expose (`key`, `x`); the result CTE
      * `outName` exposes (`key`, `l2` — the fp-bits log₂). */
    def log2fpCte(outName: String, src: String, key: String): String = {
      val rec = s"${outName}_rec"
      s"""$rec($key, step, e, m, frac) AS (
            SELECT $key, 0, e,
                   CASE WHEN e <= $MantBits
                        THEN x * (1::BIGINT << ($MantBits - e))
                        ELSE x // (1::BIGINT << (e - $MantBits)) END,
                   CAST(0 AS BIGINT)
            FROM (SELECT $key, x, length(bin(x)) - 1 AS e FROM $src)
            UNION ALL
            SELECT $key, step + 1, e,
                   CASE WHEN m2 >= ${1L << (MantBits + 1)} THEN m2 // 2
                        ELSE m2 END,
                   CASE WHEN m2 >= ${1L << (MantBits + 1)} THEN frac * 2 + 1
                        ELSE frac * 2 END
            FROM (SELECT $key, step, e, frac,
                         m * m // ${1L << MantBits} AS m2
                  FROM $rec WHERE step < $FracBits)),
          $outName AS (
            SELECT $key, e * ${B} + frac AS l2
            FROM $rec WHERE step = $FracBits)"""
    }

    /** Scalar pairwise lse (fp-bits) as an expression over `a`, `b`,
      * reading the lse table CTE emitted by [[tableCte]] via a scalar
      * subquery. */
    def lse2Expr(a: String, b: String, lseTabName: String): String =
      s"""(greatest($a, $b) + coalesce(
            (SELECT v FROM $lseTabName
             WHERE i = (greatest($a, $b) - least($a, $b)) >> $Exp2Shift),
            0))"""

    /** Scalar exp2fp30 (2^30 scale) as an expression over `d` ≥ 0,
      * reading the exp2 table CTE. */
    def exp2Expr(d: String, exp2TabName: String): String =
      s"""(CASE WHEN ($d) >> $FracBits > $MantBits THEN 0
           ELSE (SELECT v FROM $exp2TabName
                 WHERE i = (($d) & ${B - 1}) >> $Exp2Shift)
                // (1::BIGINT << least(($d) >> $FracBits, 62))
           END)"""
  }
}
