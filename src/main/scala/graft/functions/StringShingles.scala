package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression producing contiguous n-token shingles of a
  * single-space-tokenized string (SURVEY.md §4.3 custom-Expression tier;
  * semantics identical to the HOF form
  * `transform(sequence(...), i -> concat_ws(" ", slice(tokens, i, n)))`
  * with whole-text fallback for docs shorter than n tokens).
  *
  * Why native: the HOF form is interpreted per element (no whole-stage
  * codegen) and measured ~1.4 s just to shingle 5k docs / 260k shingles at
  * sf0.1 — the dominant cost of MinHash dedup. This expression stays
  * inside the codegen span and builds each shingle as a zero-copy byte
  * slice of the original text (tokens joined by single spaces reconstruct
  * the source bytes exactly, so a shingle IS a substring).
  */
case class StringShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "string_shingles"

  override protected def nullSafeEval(input: Any): Any =
    StringShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StringShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringShingles {

  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var numToks = 1
    var i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) numToks += 1
      i += 1
    }
    if (numToks < n) return new GenericArrayData(Array[Any](s))
    // Token boundaries as byte offsets; space bytes never occur inside a
    // multi-byte UTF-8 sequence, so byte scanning is encoding-safe.
    val starts = new Array[Int](numToks)
    val ends = new Array[Int](numToks)
    starts(0) = 0
    var tok = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) {
        ends(tok) = i
        tok += 1
        starts(tok) = i + 1
      }
      i += 1
    }
    ends(tok) = len
    val out = new Array[Any](numToks - n + 1)
    var j = 0
    while (j <= numToks - n) {
      out(j) = UTF8String.fromBytes(bytes, starts(j), ends(j + n - 1) - starts(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point. */
  def shingles(text: Column, n: Int): Column =
    GraftColumnBridge.column(StringShingles(GraftColumnBridge.expression(text), n))
}
