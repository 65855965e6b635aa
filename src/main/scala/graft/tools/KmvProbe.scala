package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Kmv

/** Decade probe for the KMV set-algebra tier (SCALE.md evidence):
  * per corpus decade (distinct keys ×10 each step, delivered with 3×
  * duplication so the distinct stage works), and per k ∈ {128, 512,
  * 2048}:
  *
  *  - signature build wall time (distinct aggregate + ranked prefix —
  *    the md5 pass dominates; the synopsis itself is k rows whatever
  *    the corpus);
  *  - distinct-estimate relative error (the O(1/√k) law, measured);
  *  - set-algebra intersection error on a planted 50%-overlap pair
  *    (error is union-scaled — the property that beats HLL
  *    inclusion–exclusion);
  *  - the DataSketches HLL row (lgK 12) as the engine-native
  *    comparison: faster build (no 60-bit md5 discipline), similar
  *    error, but engine-specific estimates (the q_rel10b carve-out)
  *    and no native intersection.
  *
  * Run: `runMain graft.tools.KmvProbe`. Diagnostic main, not an
  * operator.
  */
object KmvProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def keys(n: Long, tag: String): DataFrame =
      spark.range(3 * n).select(
        concat(lit(tag), (col("id") % n).cast("string")).as("id"))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val v = f
      (v, (System.nanoTime() - t0) / 1e9)
    }

    println("corpus\tk\tbuild_s\test\terr_pct")
    for (n <- Seq(10000L, 100000L, 1000000L)) {
      val corpus = keys(n, "k").cache(); corpus.count()
      for (k <- Seq(128, 512, 2048)) {
        val (est, t) = timed {
          Kmv.distinctEstimate(Kmv.signature(corpus, "id", k), k)
            .head().getDouble(1)
        }
        println(f"$n\t$k\t$t%.2f\t$est%.0f\t${100 * (est - n) / n}%.2f")
      }
      // HLL comparison row (engine-native DataSketches, lgK 12).
      val (hll, tH) = timed {
        corpus.agg(hll_sketch_estimate(
          hll_sketch_agg(col("id"), lit(12))).as("e")).head().getLong(0)
      }
      println(f"$n\thll12\t$tH%.2f\t$hll%d\t${100.0 * (hll - n) / n}%.2f")
      // Set algebra at k=512: A = [0, 2n/3), B = [n/3, n) over the
      // same key space — true overlap n/3, union n.
      val a = keys(2 * n / 3, "k")
      val b = spark.range(3 * n).select(
        concat(lit("k"), (col("id") % n).cast("string")).as("id"))
        .where(expr(s"cast(substring(id, 2) as bigint) >= ${n / 3}"))
      val (row, tS) = timed {
        Kmv.setAlgebra(Kmv.signature(a, "id", 512),
          Kmv.signature(b, "id", 512), 512).head()
      }
      val estI = row.getAs[Double]("est_inter")
      val trueI = n / 3.0
      println(f"$n\talg512\t$tS%.2f\t$estI%.0f\t${100 * (estI - trueI) / trueI}%.2f")
      corpus.unpersist()
    }
    spark.stop()
  }
}
