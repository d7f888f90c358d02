package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprinting as native Catalyst expressions with
  * `doGenCode` — they stay inside whole-stage codegen (a Scala UDF
  * here would break the codegen span and pay ser/de per row on the
  * 100 TB hot path).
  *
  * [[TextFingerprint]]: polynomial rolling hash over the UTF-8 bytes
  * (base 1000003, wrapping 64-bit) — one stable 64-bit id per text.
  *
  * [[WinnowFingerprint]]: the minimum k-byte-window rolling hash —
  * the winnowing scheme's document-level fingerprint. Equal texts
  * always agree; texts sharing long runs usually agree, so it doubles
  * as a cheap near-dup blocking key.
  */
case class TextFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = h * 1000003L + bytes(i); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      byte[] graftFpBytes = $c.getBytes();
      long graftFpH = 1125899906842597L;
      for (int graftFpI = 0; graftFpI < graftFpBytes.length; graftFpI++) {
        graftFpH = graftFpH * 1000003L + graftFpBytes[graftFpI];
      }
      ${ev.value} = graftFpH;""")

  override protected def withNewChildInternal(newChild: Expression): TextFingerprint =
    copy(child = newChild)
}

case class WinnowFingerprint(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.length < k) {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = h * 1000003L + bytes(i); i += 1 }
      h
    } else {
      var min = Long.MaxValue
      var start = 0
      while (start + k <= bytes.length) {
        var h = 1125899906842597L
        var i = start
        while (i < start + k) { h = h * 1000003L + bytes(i); i += 1 }
        if (h < min) min = h
        start += 1
      }
      min
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      byte[] graftWBytes = $c.getBytes();
      long graftWOut;
      if (graftWBytes.length < $k) {
        long graftWH = 1125899906842597L;
        for (int graftWI = 0; graftWI < graftWBytes.length; graftWI++) {
          graftWH = graftWH * 1000003L + graftWBytes[graftWI];
        }
        graftWOut = graftWH;
      } else {
        long graftWMin = Long.MAX_VALUE;
        for (int graftWS = 0; graftWS + $k <= graftWBytes.length; graftWS++) {
          long graftWH = 1125899906842597L;
          for (int graftWI = graftWS; graftWI < graftWS + $k; graftWI++) {
            graftWH = graftWH * 1000003L + graftWBytes[graftWI];
          }
          if (graftWH < graftWMin) graftWMin = graftWH;
        }
        graftWOut = graftWMin;
      }
      ${ev.value} = graftWOut;""")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object Fingerprints {
  def text_fingerprint(c: Column): Column =
    GraftColumnShim.column(TextFingerprint(GraftColumnShim.expression(c)))
  def winnow_fingerprint(c: Column, k: Int): Column =
    GraftColumnShim.column(WinnowFingerprint(GraftColumnShim.expression(c), k))
}
