package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{FloatVectorDot, StringShingles}

/** Config-driven library entry point: add
  * `spark.sql.extensions=graft.GraftExtensions` and the native
  * expressions become SQL-callable in every session — no imperative
  * registration call needed (the Spark extension mechanism; the
  * imperative per-session path [[graft.functions.Udx.register]] stays
  * for notebook use).
  *
  * {{{
  *   SELECT float_vector_dot(a.embedding, b.embedding) FROM ...
  *   SELECT explode(string_shingles(text, 3)) FROM documents
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_vector_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "float_vector_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "float_vector_dot(arrayFloat, arrayFloat)")
        FloatVectorDot(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("string_shingles"),
      new ExpressionInfo(classOf[StringShingles].getName, "string_shingles"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "string_shingles(text, n)")
        val n = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"string_shingles: n must be an integer literal, got $other")
        }
        StringShingles(exprs.head, n)
      }))
  }
}
