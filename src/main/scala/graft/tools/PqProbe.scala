package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Diagnostic main for the PQ family. Default mode measures, at the
  * given SF:
  *  - ADC recall@10 vs exact cosine for the q_sim3-style query set
  *    (vec_id < 5) across (m, ksub) settings, i.e. what ranking quality
  *    each bytes-per-vector budget buys;
  *  - the per-vector residual (sum of subspace d²) per setting.
  * `runMain graft.tools.PqProbe decade` instead times the pipeline
  * stages on synthetic 5k vs 50k corpora (SimScalingProbe's generator):
  * training must stay ~flat (trainN-bounded), encode ~linear, and the
  * ADC query cost ~linear in corpus size (flat PQ scans all codes; the
  * IVF composition bounds it by cells probed).
  * Feeds SCALE.md's PQ tables. Usage: runMain graft.tools.PqProbe [sfDir|decade]
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (dir == "decade") { decade(spark); spark.stop(); return }
    val embs = Tables.embeddings(spark, dir)
    val queries = embs.where(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(queries, embs, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((m, ksub) <- Seq((4, 16), (4, 64), (8, 16), (8, 64), (16, 16))) {
      val cb = Similarity.trainPqCodebooks(embs, m = m, ksub = ksub,
        iters = 2, trainN = 1024, dim = 64)
      val codes = Similarity.pqEncode(embs, cb, m = m, dim = 64)
      val adc50 = Similarity.pqAdcTopK(queries, codes, cb, k = 50, m = m, dim = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      val approx = adc50.map(t => (t._1, t._2)).toSet // depth-50 candidate set
      val top10 = adc50.filter(_._3 <= 10).map(t => (t._1, t._2)).toSet
      val recall = (exact intersect top10).size.toDouble / exact.size
      // Candidate recall: how much of the exact top-10 survives in the
      // ADC top-50 — the number that matters for the ADC + exact-re-rank
      // serving path (re-rank recovers exactly this fraction).
      val candRecall = (exact intersect approx).size.toDouble / exact.size
      val avgErr = codes.groupBy("vec_id").agg(sum("err").as("e"))
        .agg(avg("e")).head().getDouble(0)
      // The composed index at the same PQ budget: nProbe of 16 cells +
      // ADC within them + exact re-rank of 50 — recall vs the SAME
      // exact-cosine truth shows what the cell restriction costs/buys.
      val ivfpq = Similarity.ivfPqTopK(queries, embs, k = 10,
          rerankDepth = 50, nCentroids = 16, nProbe = 4, m = m, ksub = ksub,
          trainN = 1024, dim = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivfpqRecall = (exact intersect ivfpq).size.toDouble / exact.size
      println(f"PROBE pq m=$m%2d ksub=$ksub%3d bytes/vec=$m%2d  recall@10=$recall%.3f  cand-recall@50=$candRecall%.3f  ivfpq-recall@10=$ivfpqRecall%.3f  avg_resid=$avgErr%.4f  ($dir)")
      Similarity.releaseCaches() // each setting trains fresh; don't thrash the slot LRU
    }
    spark.stop()
  }

  private def decade(spark: SparkSession): Unit = {
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val v = f; (v, (System.nanoTime() - t0) / 1e9)
    }
    for (n <- Seq(5000L, 50000L); rep <- 1 to 2) {
      val corpus = SimScalingProbe.synthVecs(spark, n).cache()
      corpus.count()
      val queries = corpus.where(col("vec_id") < 20)
      Similarity.releaseCaches()
      val (cb, tTrain) = timed {
        val c = Similarity.trainPqCodebooks(corpus, m = 8, ksub = 64,
          iters = 2, trainN = 1024, dim = 64)
        c.count(); c
      }
      val (codes, tEnc) = timed {
        val k = Similarity.pqEncode(corpus, cb, m = 8, dim = 64)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        k.count(); k
      }
      val (_, tAdc) = timed {
        Similarity.pqAdcTopK(queries, codes, cb, k = 10, m = 8, dim = 64).count()
      }
      println(f"PROBE pq-decade n=$n%6d rep$rep  train=$tTrain%6.2f s  encode=$tEnc%6.2f s  adc20q=$tAdc%6.2f s")
      codes.unpersist(); corpus.unpersist()
    }
  }
}
