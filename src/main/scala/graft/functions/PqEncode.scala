package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encode as a native Catalyst expression with
  * `doGenCode`: for each of the `m` subspaces, the nearest of `k`
  * codebook centroids (ties to the smallest code), plus the total
  * squared reconstruction error.
  *
  * Why an expression and not a join: coding one vector is m·k·sub
  * multiply-adds over a codebook CONSTANT — as a broadcast join it
  * blows every vector into m·k candidate rows plus two keyed aggs
  * (measured 7 s for 2 000 vectors); as generated code it is one
  * tight loop per row inside whole-stage codegen, no shuffle at all
  * (same call as the reference's native scan kernels,
  * e.g. /root/reference/README.md:89 scan-side compute).
  *
  * Input: `array<double>` of length m·sub. Output:
  * `struct<codes array<int>, err2 double>`.
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = books.length
  private val k = books(0).length
  private val sub = books(0)(0).length

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("err2", DoubleType, nullable = false)))

  /** codebook flattened [(s·k + c)·sub + i] — one cache-friendly
    * reference object shared by interpreted and generated paths */
  @transient private lazy val flat: Array[Double] = PqEncode.flatten(books)

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    require(arr.numElements() == m * sub,
      s"PqEncode expects ${m * sub}-dim vectors, got ${arr.numElements()}")
    val codes = new Array[Int](m)
    var err2 = 0.0
    val f = flat
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = (s * k + c) * sub
        var d = 0.0
        var i = 0
        while (i < sub) {
          val t = arr.getDouble(s * sub + i) - f(base + i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      err2 += bestD
      s += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(codes), err2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("pqBooks", flat, "double[]")
    val codes = ctx.freshName("pqCodes")
    val err2 = ctx.freshName("pqErr2")
    val s = ctx.freshName("pqS")
    val c = ctx.freshName("pqC")
    val i = ctx.freshName("pqI")
    val base = ctx.freshName("pqBase")
    val d = ctx.freshName("pqD")
    val t = ctx.freshName("pqT")
    val best = ctx.freshName("pqBest")
    val bestD = ctx.freshName("pqBestD")
    nullSafeCodeGen(ctx, ev, in => s"""
      if ($in.numElements() != ${m * sub}) {
        throw new IllegalArgumentException(
          "PqEncode expects ${m * sub}-dim vectors, got " + $in.numElements());
      }
      int[] $codes = new int[$m];
      double $err2 = 0.0;
      for (int $s = 0; $s < $m; $s++) {
        int $best = 0;
        double $bestD = Double.MAX_VALUE;
        for (int $c = 0; $c < $k; $c++) {
          int $base = ($s * $k + $c) * $sub;
          double $d = 0.0;
          for (int $i = 0; $i < $sub; $i++) {
            double $t = $in.getDouble($s * $sub + $i) - $f[$base + $i];
            $d += $t * $t;
          }
          if ($d < $bestD) { $bestD = $d; $best = $c; }
        }
        $codes[$s] = $best;
        $err2 += $bestD;
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        new Object[]{
          new org.apache.spark.sql.catalyst.util.GenericArrayData($codes),
          $err2});""")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  private[functions] def flatten(books: Array[Array[Array[Double]]]): Array[Double] = {
    val m = books.length
    val k = books(0).length
    val sub = books(0)(0).length
    val f = new Array[Double](m * k * sub)
    var i = 0
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        var d = 0
        while (d < sub) { f(i) = books(s)(c)(d); i += 1; d += 1 }
        c += 1
      }
      s += 1
    }
    f
  }
}
