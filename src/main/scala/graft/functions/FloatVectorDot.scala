package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-vector dot product — the
  * SURVEY.md §4.3 "custom Expression with codegen" fast path for SIM
  * operators: participates in whole-stage codegen (a tight primitive
  * loop over the Tungsten array representation), unlike higher-order
  * function folds (interpreted, boxed) or Scala UDFs (boxed + no
  * codegen).
  *
  * Arithmetic is identical to the `zip_with`+`aggregate` fold it
  * replaces: left-to-right accumulation in double of float·float
  * products — so DuckDB-oracle results are unchanged bit-for-bit.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got $l and $r")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_vector_dot"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // Match the zip_with+aggregate fold (and SQL) semantics exactly:
    // length mismatch or any null element ⇒ NULL, not a partial sum.
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName for every local: multiple dot expressions can land in
      // ONE codegen scope (e.g. dot(a,b) and the two norms in a cosine
      // projection) and fixed names would fail janino compilation —
      // which silently falls back to interpreted eval.
      val n = ctx.freshName("fvdN")
      val s = ctx.freshName("fvdS")
      val i = ctx.freshName("fvdI")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatVectorDot {
  /** Column-level entry point. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatVectorDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
