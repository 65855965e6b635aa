package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Decade probe for the prefix-filter similarity join (SCALE.md
  * evidence): candidate volume and wall time for BOTH candidate
  * generators as the corpus grows, on (a) the real documents tables
  * (sf0.001/0.01/0.1 — duplicate mass grows with the corpus but stays
  * a small fraction) and (b) replicated corpora (×4/×16 copies of
  * sf0.01 with shifted doc_ids — the adversarial case where EVERY doc
  * gains k−1 exact copies, so true-pair mass grows ~k² and any sound
  * candidate generator must follow it).
  *
  * The claim under test: prefix-filter candidates track rare-shingle
  * collisions ≈ true-duplicate mass (like MinHash-LSH's
  * collision-bound volume), NOT n² — the corpus axis alone must not
  * blow the join up; only genuine duplicate mass may.
  *
  * Diagnostic main: `runMain graft.tools.PrefixJoinProbe`.
  */
object PrefixJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def probe(name: String, docs: org.apache.spark.sql.DataFrame): Unit = {
      val nd = docs.count()
      def best(f: => Long): (Double, Long) =
        (1 to 3).map { _ =>
          val t0 = System.nanoTime(); val n = f
          ((System.nanoTime() - t0) / 1e9, n)
        }.minBy(_._1)
      val (tp, np) = best(Dedup.prefixCandidates(docs, 4, 5).count())
      val (tj, nj) = best(Dedup.prefixJaccardJoin(docs, 4, 5).count())
      val (tm, nm) = best(Dedup.minhashCandidates(docs).count())
      println(f"[prefix-probe] $name%-10s docs=$nd%6d  prefix_cand=$np%8d " +
        f"($tp%5.2f s)  true_pairs=$nj%8d ($tj%5.2f s)  mh_cand=$nm%8d ($tm%5.2f s)")
    }
    for (sf <- Seq("0.001", "0.01", "0.1"))
      probe(s"sf$sf", Tables.documents(spark, s"/root/testdata/sf$sf"))
    val base = Tables.documents(spark, "/root/testdata/sf0.01")
      .select("doc_id", "text")
    for (k <- Seq(4, 16)) {
      val rep = (0 until k).map(i =>
          base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
            col("text")))
        .reduce(_ unionAll _)
      probe(s"x$k-dups", rep)
    }
    spark.stop()
  }
}
