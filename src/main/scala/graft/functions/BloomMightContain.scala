package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Bloom membership test against a PACKED m-bit bitmap — the
  * SURVEY §4.3 "custom Expression" tier, and the probe-driven endpoint
  * of the [[graft.operators.Bloom]] packed path: the declarative
  * attempt (hash columns + shift/mask Filter over a bitmap literal)
  * re-derived the two md5 draws per bit test, because predicate
  * pushdown substitutes aliased expressions into Filter conditions and
  * FilterExec has no common-subexpression elimination — SketchProbe
  * measured it ~8× slower than the join form it meant to beat. Here
  * the whole test is ONE expression: two md5-parity draws
  * (Kirsch–Mitzelmacher h1/h2, identical arithmetic to
  * [[graft.operators.Bloom.bits]] — the salts "b1:"/"b2:" and the
  * odd-forcing `| 1` included), then k shift-and-mask probes of a
  * bitmap held as a codegen reference object (shared across rows, no
  * per-row copy, no join). Differential-pinned row-for-row against
  * the broadcast-join form in BloomSpec.
  */
object BloomHash {
  /** KM draw: [[SignatureHash.md5ParityBytes]] ([[TextFunctions
    * .hexHash60]] semantics) of salt+item, reduced mod m.
    */
  def draw(salt: Array[Byte], item: UTF8String, m: Int): Long = {
    val ib = item.getBytes
    val b = new Array[Byte](salt.length + ib.length)
    System.arraycopy(salt, 0, b, 0, salt.length)
    System.arraycopy(ib, 0, b, salt.length, ib.length)
    SignatureHash.md5ParityBytes(b) % m
  }

  val Salt1: Array[Byte] = "b1:".getBytes("UTF-8")
  val Salt2: Array[Byte] = "b2:".getBytes("UTF-8")

  /** Interpreted-mode core: all k KM bits set in `words`? */
  def mightContain(item: UTF8String, words: Array[Long], k: Int,
      m: Int): Boolean = {
    val h1 = draw(Salt1, item, m)
    val h2 = draw(Salt2, item, m) | 1L
    var i = 0
    while (i < k) {
      val bit = (h1 + i * h2) % m
      if (((words((bit >>> 6).toInt) >>> (bit & 63L)) & 1L) == 0L)
        return false
      i += 1
    }
    true
  }
}

case class BloomMightContain(child: Expression, words: Array[Long],
    k: Int, m: Int) extends UnaryExpression {
  require(k > 0 && m > 0 && m % 64 == 0 && words.length == m / 64,
    s"bloom geometry mismatch: k=$k m=$m words=${words.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    BloomHash.mightContain(input.asInstanceOf[UTF8String], words, k, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    val cls = "graft.functions.BloomHash"
    nullSafeCodeGen(ctx, ev, a => {
      val h1 = ctx.freshName("bfH1")
      val h2 = ctx.freshName("bfH2")
      val i = ctx.freshName("bfI")
      val bit = ctx.freshName("bfBit")
      val ok = ctx.freshName("bfOk")
      s"""
         |long $h1 = $cls.draw($cls.Salt1(), $a, $m);
         |long $h2 = $cls.draw($cls.Salt2(), $a, $m) | 1L;
         |boolean $ok = true;
         |for (int $i = 0; $i < $k; $i++) {
         |  long $bit = ($h1 + $i * $h2) % $m;
         |  if ((($wordsRef[(int) ($bit >>> 6)] >>> ($bit & 63L)) & 1L) == 0L) {
         |    $ok = false; break;
         |  }
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column-level entry point. */
  def apply(item: Column, words: Array[Long], k: Int, m: Int): Column =
    GraftColumnBridge.column(new BloomMightContain(
      GraftColumnBridge.expression(item), words, k, m))
}
