package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Subword (BPE-style merge-table) tokenization — the token accounting
  * real pretraining pipelines run: a word is consumed left to right,
  * each step taking the LONGEST vocabulary entry that prefixes the
  * remainder (greedy longest-match — the deterministic apply of a
  * trained merge table, WordPiece-style), with an unmatched leading
  * character consuming itself as one token (the byte-fallback posture:
  * no input fails to tokenize).
  *
  * The vocabulary is a plain broadcast-sized string set fixed at plan
  * time (merge tables are trained OFFLINE; applying one is the
  * per-row hot path this expression owns). Greedy longest-match is
  * deterministic, so the DuckDB oracle replays the identical walk as a
  * recursive CTE over distinct words and the counts agree exactly.
  *
  * Semantics are per java.lang.String UTF-16 unit, which equals DuckDB's
  * per-character semantics for ASCII and all BMP text; supplementary
  * characters would count 2 fallback units here vs 1 character there —
  * acceptable for the corpus contract (ASCII), documented rather than
  * hidden.
  */
final class SubwordTable(val tokens: Array[String]) extends Serializable {
  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](tokens.length * 2)
    tokens.foreach(s.add)
    s
  }
  @transient private lazy val maxLen: Int =
    if (tokens.isEmpty) 0 else tokens.iterator.map(_.length).max

  /** Greedy longest-match token count of one word. */
  def count(u: UTF8String): Int = {
    val w = u.toString
    var p = 0
    var n = 0
    while (p < w.length) {
      var l = math.min(maxLen, w.length - p)
      var step = 1
      while (l >= 2 && step == 1) {
        if (set.contains(w.substring(p, p + l))) step = l
        l -= 1
      }
      // l == 1: a single-char vocab entry and the fallback both
      // consume 1 — no lookup needed.
      p += step
      n += 1
    }
    n
  }
}

/** Per-word greedy longest-match token count against a plan-time
  * vocabulary — native and codegen'd (one virtual call per row into
  * [[SubwordTable.count]]; the table rides the references array, never
  * the generated source).
  */
case class SubwordTokenCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  @transient private lazy val table = new SubwordTable(vocab.toArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "subword_token_count"

  override protected def nullSafeEval(input: Any): Any =
    table.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tableRef =
      ctx.addReferenceObj("swTable", table, "graft.functions.SubwordTable")
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $tableRef.count($w);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Subword {

  /** Column form of [[SubwordTokenCount]] over one word. */
  def wordCount(word: Column, vocab: Seq[String]): Column =
    GraftColumnBridge.column(SubwordTokenCount(
      GraftColumnBridge.expression(word), vocab))

  /** Subword token count of a whole whitespace-separated text: the sum
    * of per-word counts, as one map-side `aggregate` over the split
    * array (empty words from repeated spaces contribute nothing) —
    * drop-in for the packing family's `tokenCount` parameter.
    */
  def textCount(text: Column, vocab: Seq[String]): Column =
    aggregate(
      filter(split(text, " "), w => w =!= ""),
      lit(0L),
      (acc, w) => acc + wordCount(w, vocab).cast("long"))
}
