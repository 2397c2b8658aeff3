package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions.
  *
  * The rolling document fingerprint — fold (acc·31 + firstCodepoint·100 +
  * tokenLen) mod 1e9+7 over space-split tokens — is the decision key for
  * split assignment, mixture sampling, and fingerprint reporting, so it
  * runs once per document per query over the whole corpus. The composable
  * form (`aggregate(transform(split(...)))`) evaluates two interpreted
  * higher-order lambdas per token per row; this expression computes the
  * identical value in ONE codegen'd pass over the UTF-8 bytes: tokens
  * split on the 0x20 byte (unambiguous in UTF-8 — continuation bytes are
  * ≥ 0x80), first codepoint decoded in place, codepoint count from
  * non-continuation bytes.
  *
  * Exact-equality contract with the composable form (and the DuckDB
  * oracles): `split(s, " ")` keeps empty tokens (consecutive/trailing
  * spaces), `ascii('')` is 0, lengths count codepoints.
  */
object TextExpressions {

  /** One-pass fingerprint over raw UTF-8 bytes; static so generated code
    * can call it directly.
    */
  def fingerprintBytes(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    val p = 1000000007L
    var acc = 0L
    var tokStart = 0
    var i = 0
    while (true) {
      if (i == n || bytes(i) == 0x20) {
        var term = 0L
        if (i > tokStart) {
          term = firstCodePoint(bytes, tokStart, i) * 100L
          var j = tokStart
          while (j < i) {
            if ((bytes(j) & 0xC0) != 0x80) term += 1L
            j += 1
          }
        }
        acc = (acc * 31L + term) % p
        if (i == n) return acc
        tokStart = i + 1
      }
      i += 1
    }
    acc // unreachable
  }

  private def firstCodePoint(b: Array[Byte], at: Int, end: Int): Long = {
    val b0 = b(at) & 0xff
    if (b0 < 0x80) b0
    else if ((b0 & 0xe0) == 0xc0 && at + 1 < end)
      ((b0 & 0x1f) << 6) | (b(at + 1) & 0x3f)
    else if ((b0 & 0xf0) == 0xe0 && at + 2 < end)
      ((b0 & 0x0f) << 12) | ((b(at + 1) & 0x3f) << 6) | (b(at + 2) & 0x3f)
    else if ((b0 & 0xf8) == 0xf0 && at + 3 < end)
      ((b0 & 0x07) << 18) | ((b(at + 1) & 0x3f) << 12) |
        ((b(at + 2) & 0x3f) << 6) | (b(at + 3) & 0x3f)
    else b0 // malformed input: fall back to the lead byte
  }

  def rollingFingerprint(text: Column): Column =
    GraftSqlBridge.column(RollingFingerprint(GraftSqlBridge.expression(text)))

  /** One-pass polynomial char fold (acc·base + codepoint) mod p; static so
    * generated code calls it directly. Matches the composable
    * `aggregate(transform(sequence…, ascii(substring…)))` form exactly,
    * including the empty-string → 0 case.
    */
  def charFoldBytes(s: UTF8String, base: Long, mod: Long): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    var acc = 0L
    var i = 0
    while (i < n) {
      val b0 = bytes(i) & 0xff
      var cp = b0
      var step = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xe0) == 0xc0 && i + 1 < n) {
          cp = ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f); step = 2
        } else if ((b0 & 0xf0) == 0xe0 && i + 2 < n) {
          cp = ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
            (bytes(i + 2) & 0x3f); step = 3
        } else if ((b0 & 0xf8) == 0xf0 && i + 3 < n) {
          cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
            ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f); step = 4
        }
      }
      acc = (acc * base + cp) % mod
      i += step
    }
    acc
  }

  def charFold(tok: Column, base: Long, mod: Long): Column =
    GraftSqlBridge.column(CharFold(GraftSqlBridge.expression(tok), base, mod))

  /** Per-position hashes of every `l`-token window of `s`, O(|s|) total via
    * a rolling double-modulus polynomial — the anchor stage of
    * exact-substring dedup ([[graft.ext.Dedup.substringDedup]]). Window
    * value = nested fold (window fold of per-token [[charFoldBytes]] char
    * folds) under two coprime moduli combined into one long (~61 bits:
    * collision odds at a billion windows ≈ 10⁻³ corpus-wide, and any
    * collision only over-merges one window pair). The naive per-window
    * fold is O(|s|·l) — 50× the corpus bytes hashed at the published l=50
    * — which is exactly what the rolling subtraction removes; static so
    * generated code calls it directly. Tokens split on the 0x20 byte
    * (unambiguous in UTF-8), matching `split(text, ' ')` with its empty
    * tokens. Returns max(0, nTokens − l + 1) hashes.
    */
  def windowHashesBytes(s: UTF8String, l: Int): Array[Long] = {
    val P1 = 1000000007L; val B1 = 31L
    val P2 = 998244353L; val B2 = 131L
    val bytes = s.getBytes
    val n = bytes.length
    var nTok = 1
    var i = 0
    while (i < n) { if (bytes(i) == 0x20) nTok += 1; i += 1 }
    if (nTok < l) return Array.emptyLongArray
    // pass 1: per-token char folds under both moduli, one byte scan
    val tv1 = new Array[Long](nTok)
    val tv2 = new Array[Long](nTok)
    var t = 0; var a1 = 0L; var a2 = 0L
    i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        tv1(t) = a1; tv2(t) = a2; t += 1; a1 = 0L; a2 = 0L
        i += 1
      } else {
        val b0 = bytes(i) & 0xff
        var cp = b0
        var step = 1
        if (b0 >= 0x80) {
          if ((b0 & 0xe0) == 0xc0 && i + 1 < n) {
            cp = ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f); step = 2
          } else if ((b0 & 0xf0) == 0xe0 && i + 2 < n) {
            cp = ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
              (bytes(i + 2) & 0x3f); step = 3
          } else if ((b0 & 0xf8) == 0xf0 && i + 3 < n) {
            cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
              ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f); step = 4
          }
        }
        a1 = (a1 * B1 + cp) % P1
        a2 = (a2 * B2 + cp) % P2
        i += step
      }
    }
    // pass 2: roll the window folds — drop the outgoing token's B^(l-1)
    // term, shift, add the incoming token
    var pow1 = 1L; var pow2 = 1L
    var k = 0
    while (k < l - 1) { pow1 = pow1 * B1 % P1; pow2 = pow2 * B2 % P2; k += 1 }
    val out = new Array[Long](nTok - l + 1)
    var h1 = 0L; var h2 = 0L
    k = 0
    while (k < l) { h1 = (h1 * B1 + tv1(k)) % P1; h2 = (h2 * B2 + tv2(k)) % P2; k += 1 }
    out(0) = h1 * 2147483648L + h2
    var w = 1
    while (w < out.length) {
      h1 = (((h1 + P1 - tv1(w - 1) * pow1 % P1) % P1) * B1 + tv1(w + l - 1)) % P1
      h2 = (((h2 + P2 - tv2(w - 1) * pow2 % P2) % P2) * B2 + tv2(w + l - 1)) % P2
      out(w) = h1 * 2147483648L + h2
      w += 1
    }
    out
  }

  def tokenWindowHashes(text: Column, windowTokens: Int): Column =
    GraftSqlBridge.column(
      TokenWindowHash(GraftSqlBridge.expression(text), windowTokens))
}

/** Codegen'd polynomial char fold over a string's codepoints. */
case class CharFold(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_char_fold"

  override def nullSafeEval(input: Any): Any =
    TextExpressions.charFoldBytes(input.asInstanceOf[UTF8String], base, mod)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextExpressions.charFoldBytes($c, ${base}L, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd rolling window-hash array (see
  * [[TextExpressions.windowHashesBytes]]): one long per `windowTokens`-token
  * window, computed in the scan stage — no explode of window STRINGS ever
  * materializes.
  */
case class TokenWindowHash(child: Expression, windowTokens: Int)
    extends UnaryExpression {
  require(windowTokens >= 1, s"windowTokens must be >= 1, got $windowTokens")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_window_hash"

  override def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      TextExpressions.windowHashesBytes(input.asInstanceOf[UTF8String], windowTokens))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.TextExpressions.windowHashesBytes($c, $windowTokens));
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(input: Any): Any =
    TextExpressions.fingerprintBytes(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextExpressions.fingerprintBytes($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
