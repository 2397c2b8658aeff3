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
