package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The learned-BPE token meter as ONE native expression (round 21,
  * VERDICT #8) — the whole-document fold that
  * [[graft.operators.Bpe.textCount]] previously assembled from
  * higher-order functions (`aggregate`/`filter` lambdas), which are
  * CodegenFallback in Spark: every word of every document walked an
  * INTERPRETED expression tree (6 chained `replace`s + split/concat
  * allocations per step). This table performs the IDENTICAL operation
  * sequence through the same UTF8String methods the built-in
  * expressions call — `split(pattern, -1)` (StringSplit), `concatWs`/
  * `concat` (ConcatWs/Concat), `replace` (StringReplace),
  * `substringSQL` (Substring) — in a tight JVM loop, one virtual call
  * per document. Because each step is the same method on the same
  * inputs in the same order, the count is equal BY CONSTRUCTION to the
  * column fold (BpeSpec pins the equivalence on the corpus plus
  * adversarial strings); the merges still apply sequentially in
  * learning order — that sequencing IS the BPE semantics and is not
  * fusable.
  */
final class BpeMergeTable(merges: Array[(String, String)]) extends Serializable {
  @transient private lazy val searches: Array[UTF8String] =
    merges.map { case (l, r) => UTF8String.fromString(s" $l $r") }
  @transient private lazy val replaces: Array[UTF8String] =
    merges.map { case (l, r) => UTF8String.fromString(s" $l$r") }
  @transient private lazy val space = UTF8String.fromString(" ")
  @transient private lazy val empty = UTF8String.fromString("")

  /** Σ over non-empty whitespace-split words of the post-merge symbol
    * count — [[graft.operators.Bpe.textCount]]'s fold, natively.
    */
  def count(text: UTF8String): Long = {
    val words = text.split(space, -1)
    var total = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.numBytes() > 0) {
        // st0 = " " + concat_ws(" ", split(w, "")) — the space-prefixed
        // per-character symbol state.
        var st = UTF8String.concat(space,
          UTF8String.concatWs(space, w.split(empty, -1): _*))
        var j = 0
        while (j < searches.length) {
          st = st.replace(searches(j), replaces(j))
          j += 1
        }
        total += st.substringSQL(2, Integer.MAX_VALUE).split(space, -1).length
      }
      i += 1
    }
    total
  }
}

/** Whole-document token count under a plan-time merge list — native and
  * codegen'd (the table rides the references array, never the generated
  * source). NULL text yields NULL, matching the column fold.
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val table = new BpeMergeTable(merges.toArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override protected def nullSafeEval(input: Any): Any =
    table.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tableRef =
      ctx.addReferenceObj("bpeTable", table, "graft.functions.BpeMergeTable")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $tableRef.count($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokenCount {
  /** Column form over a whole document. */
  def textCount(merges: Seq[(String, String)])(text: Column): Column =
    GraftColumnBridge.column(BpeTokenCount(
      GraftColumnBridge.expression(text), merges))
}
