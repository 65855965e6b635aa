package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf

/** The engine's user-extension surface (SURVEY.md §2.6 UDx-1/2/3).
  *
  * Design stance: built-ins first — every hot-path operator in this
  * library is expressed with codegen'd `org.apache.spark.sql.functions`
  * (UDx-3, the UDTF surface, is covered by the built-in generators
  * `explode`/`posexplode` used throughout). The UDF/UDAF surface below
  * exists for semantics built-ins can't express; keep it off hot paths
  * (Scala UDFs break whole-stage codegen and evaluate boxed).
  */
object Udx {

  /** UDx-1: example scalar UDF — dew-point approximation
    * (Magnus formula) from the sensor's temperature/humidity pair; a
    * domain formula with no Spark built-in. Registered for SQL use via
    * [[register]].
    */
  val dewPointC: (Double, Double) => Double = (tempC: Double, rh: Double) => {
    val a = 17.27; val b = 237.7
    val gamma = a * tempC / (b + tempC) + math.log(math.max(rh, 0.1) / 100.0)
    b * gamma / (a - gamma)
  }
  val dewPointUdf = udf(dewPointC)

  /** UDx-2: example typed Aggregator — numerically stable (Welford)
    * mean/variance in one pass. A `TypedImperativeAggregate`-style buffer
    * without the boilerplate; usable over Datasets or registered for SQL.
    */
  case class MeanVarBuf(n: Long, mean: Double, m2: Double)
  case class MeanVar(mean: Double, variance: Double, n: Long)

  object WelfordMeanVar extends Aggregator[Double, MeanVarBuf, MeanVar] {
    def zero: MeanVarBuf = MeanVarBuf(0L, 0.0, 0.0)
    def reduce(b: MeanVarBuf, x: Double): MeanVarBuf = {
      val n = b.n + 1
      val d = x - b.mean
      val mean = b.mean + d / n
      MeanVarBuf(n, mean, b.m2 + d * (x - mean))
    }
    def merge(a: MeanVarBuf, b: MeanVarBuf): MeanVarBuf = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        MeanVarBuf(n, a.mean + d * b.n / n, a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
    }
    def finish(b: MeanVarBuf): MeanVar =
      MeanVar(b.mean, if (b.n > 1) b.m2 / (b.n - 1) else 0.0, b.n)
    def bufferEncoder: Encoder[MeanVarBuf] = Encoders.product[MeanVarBuf]
    def outputEncoder: Encoder[MeanVar] = Encoders.product[MeanVar]
  }

  /** Register the UDx surface for `spark.sql` use (plus the native
    * [[FloatVectorDot]] expression — SQL-callable codegen'd vector math).
    */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("dew_point_c", dewPointUdf)
    spark.udf.register("welford_mean_var",
      org.apache.spark.sql.functions.udaf(WelfordMeanVar))
    org.apache.spark.sql.GraftColumnBridge.registerFunction(
      spark, "float_vector_dot", exprs => FloatVectorDot(exprs(0), exprs(1)))
  }
}
