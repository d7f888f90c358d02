package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, BoundReference, Cast, EvalMode, Expression, GenericInternalRow, Multiply, NumericEvalContext, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** `CAST(double AS DECIMAL(p,s))` with the BigDecimal detour removed
  * from the hot path (guide §4: hot-path expression cost; §1.2 step 2).
  *
  * Spark's cast computes `BigDecimal(Double.toString(d)).setScale(s,
  * HALF_UP)` — on JDK 17 `Double.toString` alone is ~150 ns/value, and
  * the money-determinism macros ([[graft.Dsl.dec]]/[[graft.Dsl.frac]])
  * run it once per row per column in every aggregate query (measured
  * 0.10 s per column per 600k-row pass, ~60% of q_tpch_q1's task time).
  *
  * Fast path: the exact value of `d * 10^s` is obtained as `hi + lo`
  * (Dekker product via FMA — 10^s is exact in double for s ≤ 22), its
  * integer part `n = rint(hi)` and exact fraction `fr = (hi - n) + lo`
  * (hi − n is exact by Sterbenz). HALF_UP of the row value then equals
  * `n` whenever |fr| is clearly away from 0.5 — "clearly" meaning by
  * more than the gap between the double's exact binary value and ANY
  * decimal string that re-parses to it (≤ half an ulp of d, i.e.
  * ≤ ulp(hi) after scaling — toString's repr is within that bound by
  * its round-trip contract, shortest or not).
  *
  * Everything else — NaN/±Inf, |d| > 1e9, |fr| within ulp(hi)+1e-9 of
  * 0.5, precision overflow, non-double child — is delegated to an
  * embedded real [[Cast]] with the session's eval mode, so the result
  * is bit-identical to `.cast("decimal(p,s)")` BY CONSTRUCTION on every
  * input, not just the fixtures (FastDecSpec fuzzes the equivalence).
  */
final class FastDecKernel(precision: Int, scale: Int,
    evalModeName: String, childType: DataType) extends Serializable {
  require(scale >= 0 && scale <= 18 && precision <= 18 && precision >= scale)
  private val pow: Double = math.pow(10d, scale)
  private val maxUnscaled: Long = {
    var m = 1L; var i = 0; while (i < precision) { m *= 10; i += 1 }; m - 1
  }
  @transient private lazy val slowCast: Cast =
    Cast(BoundReference(0, childType, nullable = false),
      DecimalType(precision, scale), None, EvalMode.withName(evalModeName))

  def castDouble(d: Double): Decimal = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return castAny(d)
    if (d > 1e9 || d < -1e9) return castAny(d)
    val hi = d * pow
    val lo = java.lang.Math.fma(d, pow, -hi)
    val n = java.lang.Math.rint(hi)
    val fr = (hi - n) + lo
    val afr = java.lang.Math.abs(fr)
    // margin: scaled half-ulp of d (≥ toString-repr divergence) plus
    // absolute slack for the fr additions' own rounding
    if (java.lang.Math.abs(afr - 0.5d) <= java.lang.Math.ulp(hi) + 1e-9) return castAny(d)
    var r = n.toLong
    if (fr > 0.5d) r += 1 else if (fr < -0.5d) r -= 1
    if (r > maxUnscaled || r < -maxUnscaled) return castAny(d)
    Decimal(r, precision, scale)
  }

  /** exact Spark cast — rare path, and the only path for non-double children */
  def castAny(v: Any): Decimal = {
    val row = new GenericInternalRow(1)
    row.update(0, v)
    slowCast.eval(row).asInstanceOf[Decimal]
  }
}

case class FastCastDec(child: Expression, precision: Int, scale: Int,
    evalModeName: String) extends UnaryExpression {

  override def dataType: DataType = DecimalType(precision, scale)
  override def nullable: Boolean = true
  override def toString: String = s"fastcastdec($child as decimal($precision,$scale))"

  @transient private lazy val kernel =
    new FastDecKernel(precision, scale, evalModeName, child.dataType)

  protected override def nullSafeEval(input: Any): Any =
    if (child.dataType == DoubleType) kernel.castDouble(input.asInstanceOf[Double])
    else kernel.castAny(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("fastDecKernel", kernel, classOf[FastDecKernel].getName)
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    val call =
      if (child.dataType == DoubleType) s"$k.castDouble(${childGen.value})"
      else s"$k.castAny(${childGen.value})"
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      $javaType ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = $call;
        ${ev.isNull} = (${ev.value} == null);
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): FastCastDec =
    copy(child = newChild)
}

/** `a * b` for decimal columns with the BigDecimal multiply removed
  * from the hot path. Spark's decimal [[Multiply]] always routes
  * through `toJavaBigDecimal.multiply` (~200 ns/row plus allocs); when
  * both inputs are ≤18-digit decimals their unscaled values fit in
  * longs, and whenever the exact product also fits in a long the
  * result — same scale s1+s2, no rounding since the result type
  * decimal(p1+p2+1, s1+s2) holds every product exactly — is one long
  * multiply. Everything else (wider inputs, long overflow, a result
  * type showing precision-loss rounding was applied) delegates to an
  * embedded real [[Multiply]] built with the session's
  * [[NumericEvalContext]], so results are bit-identical to `a * b` by
  * construction (FastDecSpec fuzzes the equivalence).
  */
final class FastDecMulKernel(lt: DecimalType, rt: DecimalType,
    evalModeName: String, allowPrecisionLoss: Boolean) extends Serializable {
  @transient lazy val inner: Multiply =
    Multiply(BoundReference(0, lt, nullable = false),
      BoundReference(1, rt, nullable = false),
      NumericEvalContext(EvalMode.withName(evalModeName), allowPrecisionLoss))
  val resultType: DecimalType = inner.dataType.asInstanceOf[DecimalType]
  // fast only when the result type proves no precision-loss rounding:
  // exact-product scale and room for every p1+p2-digit product
  val fastOk: Boolean = lt.precision <= 18 && rt.precision <= 18 &&
    resultType == DecimalType(
      math.min(38, lt.precision + rt.precision + 1), lt.scale + rt.scale) &&
    lt.precision + rt.precision + 1 <= 38

  def mul(a: Decimal, b: Decimal): Decimal = {
    if (fastOk) {
      val ua = a.toUnscaledLong
      val ub = b.toUnscaledLong
      if (ua == 0L || ub == 0L) return Decimal(0L, resultType.precision, resultType.scale)
      val aa = java.lang.Math.abs(ua)
      val ab = java.lang.Math.abs(ub)
      if (aa <= java.lang.Long.MAX_VALUE / ab)
        return Decimal(ua * ub, resultType.precision, resultType.scale)
    }
    slow(a, b)
  }

  private def slow(a: Decimal, b: Decimal): Decimal = {
    val row = new GenericInternalRow(2)
    row.update(0, a); row.update(1, b)
    inner.eval(row).asInstanceOf[Decimal]
  }
}

case class FastDecMul(left: Expression, right: Expression,
    evalModeName: String, allowPrecisionLoss: Boolean) extends BinaryExpression {

  @transient private lazy val kernel = new FastDecMulKernel(
    left.dataType.asInstanceOf[DecimalType], right.dataType.asInstanceOf[DecimalType],
    evalModeName, allowPrecisionLoss)

  override def dataType: DataType = kernel.resultType
  override def nullable: Boolean = true
  override def toString: String = s"fastdecmul($left, $right)"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType.isInstanceOf[DecimalType] && right.dataType.isInstanceOf[DecimalType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"FastDecMul needs two decimals, got ${left.dataType} and ${right.dataType}")

  protected override def nullSafeEval(a: Any, b: Any): Any =
    kernel.mul(a.asInstanceOf[Decimal], b.asInstanceOf[Decimal])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("fastDecMulKernel", kernel, classOf[FastDecMulKernel].getName)
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${lGen.code}
      boolean ${ev.isNull} = true;
      $javaType ${ev.value} = null;
      if (!${lGen.isNull}) {
        ${rGen.code}
        if (!${rGen.isNull}) {
          ${ev.value} = $k.mul(${lGen.value}, ${rGen.value});
          ${ev.isNull} = (${ev.value} == null);
        }
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FastDecMul =
    copy(left = newLeft, right = newRight)
}
