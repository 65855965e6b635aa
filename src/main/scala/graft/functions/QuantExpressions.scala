package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Int8 scalar quantization for embedding columns — the storage tier of
  * the int8 IVF index ([[graft.operators.Similarity.ivfTopKInt8]]).
  *
  * The quantization grid is the per-dimension corpus (min, max) that
  * q_sim4 ([[graft.analytics.ExtensionQueries.quantizationError]])
  * audits: 256 uniform levels per dimension,
  *
  *   code_d  = clamp(floor((x_d - lo_d) / (hi_d - lo_d) * 255), 0, 255)
  *   recon_d = lo_d + (code_d + 0.5) * (hi_d - lo_d) / 256      (midpoint)
  *
  * [[QuantizeInt8]] packs the codes into a BINARY value — ONE byte per
  * dimension, the 4×-smaller index payload (64 B/vector vs 256 B of
  * float32) — and [[Int8Recon]] rebuilds the midpoint doubles from the
  * bytes for ranking. Both take the (lo, hi) grids as array<double>
  * COLUMNS (broadcast from a 1-row corpus-stats aggregate) rather than
  * plan-time literals: the grid is data-dependent and collecting it to
  * the driver would serialize plan construction on a corpus scan.
  *
  * Every arithmetic step is plain double IEEE ops in dimension order, so
  * the DuckDB oracle (q_sim5) replays it exactly: floor/clamp on both
  * engines see identical inputs and produce identical codes, and the
  * reconstruction expression is evaluated with the same associativity
  * (`(code + 0.5) * (hi - lo) / 256.0` groups as `((code+0.5)*(hi-lo))/256`
  * in both Java and SQL).
  *
  * Null/size semantics (identical in eval and codegen): any NULL input
  * array or NULL element ⇒ NULL result; a (vec, lo, hi) length mismatch
  * throws — a silent prefix-quantization would corrupt the index.
  */
case class QuantizeInt8(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, array<double>, array<double>), " +
          s"got ($a, $b, $c)")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "quantize_int8"
  override def nullable: Boolean = true

  private def vecIsDouble: Boolean = first.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private[graft] def sizeCheck(nv: Int, nl: Int, nh: Int): Unit =
    if (nl != nv || nh != nv) throw new IllegalStateException(
      s"quantize_int8: grid length must match vector dim (vec=$nv lo=$nl hi=$nh)")

  override protected def nullSafeEval(v: Any, l: Any, h: Any): Any = {
    val va = v.asInstanceOf[ArrayData]
    val la = l.asInstanceOf[ArrayData]
    val ha = h.asInstanceOf[ArrayData]
    val n = va.numElements()
    sizeCheck(n, la.numElements(), ha.numElements())
    val out = new Array[Byte](n)
    var d = 0
    while (d < n) {
      if (va.isNullAt(d) || la.isNullAt(d) || ha.isNullAt(d)) return null
      val x = if (vecIsDouble) va.getDouble(d) else va.getFloat(d).toDouble
      val lo = la.getDouble(d)
      val hi = ha.getDouble(d)
      var q = 0.0
      if (hi > lo) {
        q = math.floor((x - lo) / (hi - lo) * 255.0)
        if (q < 0.0) q = 0.0
        if (q > 255.0) q = 255.0
      }
      out(d) = q.toInt.toByte
      d += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("qi8Self", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, (v, l, h) => {
      val n = ctx.freshName("qi8N")
      val out = ctx.freshName("qi8Out")
      val d = ctx.freshName("qi8D")
      val x = ctx.freshName("qi8X")
      val lo = ctx.freshName("qi8Lo")
      val hi = ctx.freshName("qi8Hi")
      val q = ctx.freshName("qi8Q")
      val getX = if (vecIsDouble) s"$v.getDouble($d)" else s"(double) $v.getFloat($d)"
      s"""
         |$self.sizeCheck($v.numElements(), $l.numElements(), $h.numElements());
         |int $n = $v.numElements();
         |byte[] $out = new byte[$n];
         |for (int $d = 0; $d < $n; $d++) {
         |  if ($v.isNullAt($d) || $l.isNullAt($d) || $h.isNullAt($d)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  double $x = $getX;
         |  double $lo = $l.getDouble($d);
         |  double $hi = $h.getDouble($d);
         |  double $q = 0.0;
         |  if ($hi > $lo) {
         |    $q = Math.floor(($x - $lo) / ($hi - $lo) * 255.0);
         |    if ($q < 0.0) $q = 0.0;
         |    if ($q > 255.0) $q = 255.0;
         |  }
         |  $out[$d] = (byte) (int) $q;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Midpoint reconstruction of an int8-coded vector (see [[QuantizeInt8]]):
  * binary codes + (lo, hi) grids → array<double> of level midpoints,
  * ready for [[FloatVectorDot]] ranking. A degenerate dimension
  * (hi == lo, all corpus values equal) reconstructs to `lo` exactly —
  * the same convention q_sim4 audits (error 0 for that dimension).
  */
case class Int8Recon(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, array<double>, array<double>), got ($a, $b, $c)")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "int8_recon"
  override def nullable: Boolean = true

  private[graft] def sizeCheck(nc: Int, nl: Int, nh: Int): Unit =
    if (nl != nc || nh != nc) throw new IllegalStateException(
      s"int8_recon: grid length must match code length (codes=$nc lo=$nl hi=$nh)")

  override protected def nullSafeEval(c: Any, l: Any, h: Any): Any = {
    val cb = c.asInstanceOf[Array[Byte]]
    val la = l.asInstanceOf[ArrayData]
    val ha = h.asInstanceOf[ArrayData]
    val n = cb.length
    sizeCheck(n, la.numElements(), ha.numElements())
    val out = new Array[Double](n)
    var d = 0
    while (d < n) {
      if (la.isNullAt(d) || ha.isNullAt(d)) return null
      val code = cb(d) & 0xff
      val lo = la.getDouble(d)
      val hi = ha.getDouble(d)
      out(d) = if (hi > lo) lo + (code.toDouble + 0.5) * (hi - lo) / 256.0 else lo
      d += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("i8rSelf", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, (c, l, h) => {
      val n = ctx.freshName("i8rN")
      val out = ctx.freshName("i8rOut")
      val d = ctx.freshName("i8rD")
      val code = ctx.freshName("i8rCode")
      val lo = ctx.freshName("i8rLo")
      val hi = ctx.freshName("i8rHi")
      s"""
         |$self.sizeCheck($c.length, $l.numElements(), $h.numElements());
         |int $n = $c.length;
         |double[] $out = new double[$n];
         |for (int $d = 0; $d < $n; $d++) {
         |  if ($l.isNullAt($d) || $h.isNullAt($d)) { ${ev.isNull} = true; break; }
         |  int $code = $c[$d] & 0xff;
         |  double $lo = $l.getDouble($d);
         |  double $hi = $h.getDouble($d);
         |  $out[$d] = ($hi > $lo)
         |    ? $lo + ((double) $code + 0.5) * ($hi - $lo) / 256.0 : $lo;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object QuantExpressions {
  /** Column entry: int8 codes (binary, one byte per dimension). */
  def quantizeInt8(vec: Column, lo: Column, hi: Column): Column =
    GraftColumnBridge.column(QuantizeInt8(
      GraftColumnBridge.expression(vec),
      GraftColumnBridge.expression(lo), GraftColumnBridge.expression(hi)))

  /** Column entry: midpoint reconstruction (array<double>). */
  def int8Recon(codes: Column, lo: Column, hi: Column): Column =
    GraftColumnBridge.column(Int8Recon(
      GraftColumnBridge.expression(codes),
      GraftColumnBridge.expression(lo), GraftColumnBridge.expression(hi)))
}
