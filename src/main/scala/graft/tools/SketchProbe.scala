package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Bloom, CountMin}
import graft.sources.Tables

/** Decade probe for the round-14 sketch family (SCALE.md evidence):
  *
  *  1. Bloom decontamination pre-filter (q_ml21's shape): per corpus
  *     decade, the distinct (doc, 8-gram) pair volume the EXACT
  *     q_ml7 join must shuffle vs the occurrence volume surviving the
  *     broadcast Bloom probe — the pre-filter's shuffle cut — plus
  *     end-to-end times for both paths.
  *  2. Count-Min build: one-pass sketch time and materialized cell
  *     count per decade — the state stays ≤ d·w while the stream
  *     grows 100×, the property that makes the sketch the point-query
  *     plan at 100 TB (a wordcount's state is vocabulary-sized).
  *
  * Corpora: real sf0.1 (5k docs) plus [[ScalingProbe.synthDocs]] at
  * 50k and 500k (the synthetic generator validated against the real
  * corpus in ScalingProbe's control row). Benchmark slice is the
  * query's doc_id % 10 rule. Run: `runMain graft.tools.SketchProbe`.
  *
  * Diagnostic main, not an operator: the vocabulary collect builds
  * generator literals — the operators themselves never collect.
  */
object SketchProbe {
  import graft.functions.{TextFunctions => TF}

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val real = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text", "lang")
    val vocab = real.select(explode(split(col("text"), " ")).as("t"))
      .distinct().orderBy("t").collect().map(_.getString(0)).toSeq
    val corpora = Seq(
      "real-5k" -> real,
      "synth-50k" -> ScalingProbe.synthDocs(spark, 50000, vocab),
      "synth-500k" -> ScalingProbe.synthDocs(spark, 500000, vocab))
    val (k, m) = (4, 131072)
    val (d, w) = (4, 512)
    for ((name, docsRaw) <- corpora) {
      val docs = docsRaw.select("doc_id", "text").cache(); docs.count()
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val v = f; (v, (System.nanoTime() - t0) / 1e9)
      }
      val bench = docs.where(col("doc_id") % 10 === 0)
        .select(explode(TF.shingles(col("text"), 8)).as("item")).distinct()
      val corpusOcc = docs.where(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), explode(TF.shingles(col("text"), 8)).as("item"))
      // Exact path: what q_ml7 shuffles (per-doc distinct) + its join.
      val (exactShape, tExact) = timed {
        val pairs = corpusOcc.dropDuplicates("doc_id", "item")
        val hits = pairs.join(broadcast(bench), "item")
          .groupBy("doc_id").agg(count(lit(1))).count()
        (pairs.count(), hits)
      }
      // Bloom path: probe per occurrence BEFORE the dedup exchange.
      def bloomLeg(mUse: Int,
          probe: (org.apache.spark.sql.DataFrame, String,
            org.apache.spark.sql.DataFrame, Int, Int)
            => org.apache.spark.sql.DataFrame) = timed {
        val bloom = Bloom.build(bench, k, mUse)
        val cand = probe(corpusOcc, "item", bloom, k, mUse)
          .dropDuplicates("doc_id", "item")
        val candN = cand.count()
        val hits = cand.join(broadcast(bench), "item")
          .groupBy("doc_id").agg(count(lit(1))).count()
        (candN, hits)
      }
      // Fixed q_ml21 geometry (shows saturation when n outgrows m) and
      // the sized geometry m ~ 2kn (FP ~ 2.4% at k=4) — the m-scales-
      // with-n law a production run applies.
      val benchN = bench.count()
      val mScaled = math.max(m.toLong,
        java.lang.Long.highestOneBit(8L * benchN) * 2).toInt
      val (bloomShape, tBloom) = bloomLeg(m, Bloom.filterMembers)
      val (bloomScaled, tBloomS) = bloomLeg(mScaled, Bloom.filterMembers)
      // The packed-bitmap probe at the SAME scaled geometry: one 1-row
      // m/64-word broadcast instead of the <= k*n-row bit table.
      val (bloomPacked, tBloomP) = bloomLeg(mScaled, Bloom.filterMembersPacked)
      val (occN, _) = timed(corpusOcc.count())
      // Count-Min build: one pass, <= d*w cells whatever the corpus.
      val toks = docs.select(explode(TF.tokens(col("text"))).as("item"))
      val (cmsCells, tCms) = timed(CountMin.sketch(toks, d, w).count())
      scala.Console.out.println(
        f"$name%-11s occ=$occN%9d bench_n=$benchN%7d " +
        f"exact_pairs=${exactShape._1}%9d " +
        f"cand_fixed=${bloomShape._1}%9d cand_scaled(m=$mScaled%8d)=" +
        f"${bloomScaled._1}%7d hits=${exactShape._2}%5d/" +
        f"${bloomShape._2}%5d/${bloomScaled._2}%5d " +
        f"t_exact=$tExact%7.2fs t_fixed=$tBloom%7.2fs t_scaled=$tBloomS%7.2fs " +
        f"t_packed=$tBloomP%7.2fs (cand=${bloomPacked._1}%7d) " +
        f"cms_cells=$cmsCells%5d t_cms=$tCms%6.2fs")
      docs.unpersist()
    }
    spark.stop()
  }
}
