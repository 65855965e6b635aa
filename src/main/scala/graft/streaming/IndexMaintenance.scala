package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}

import graft.operators.Similarity

/** Index maintenance as a STREAM — both serving tiers' drift operators
  * ([[Similarity.pqDrift]] / [[Similarity.indexDrift]]) driven per
  * micro-batch, so a production index ingests new vectors continuously
  * and the retrain trigger is a LIVE signal instead of a nightly audit.
  *
  * Shape: drift against a FIXED artifact is per-batch arithmetic with
  * no streaming state at all, so it composes as `foreachBatch`. The
  * indexed side's histogram is constant across batches — aggregated
  * ONCE at monitor construction and persisted — so each micro-batch
  * costs one encode pass over the batch plus an m·ksub-row broadcast
  * join, never a re-scan of the stored code table
  * ([[Similarity.pqDriftVsHistogram]]).
  */
object IndexMaintenance {

  /** One monitoring row (batch_id, n_rows, tv_max, retrain) appended to
    * the parquet `sinkDir` per non-empty micro-batch of embedding
    * arrivals. `codes`/`codebooks` are the persisted PQ artifact
    * (q_sim8/q_sim9 shapes). `onBatch` receives each row as it lands —
    * wire it to alerting or a retrain queue. Returns the function to
    * attach via `writeStream.foreachBatch(...)`.
    */
  /** The int8 tier's monitor — same shape as [[pqDriftMonitor]] with
    * the index-side baseline ([[Similarity.indexedFit]], a full scan of
    * the stored codes) computed ONCE at monitor start; each micro-batch
    * then pays one encode+recon pass against the broadcast centroids
    * ([[Similarity.indexDriftVsBaseline]]). One (batch_id, n_rows,
    * fit_new, drift, retrain) row per non-empty batch.
    */
  def int8DriftMonitor(index: DataFrame, grid: DataFrame,
      centroids: DataFrame, sinkDir: String, retrainRatio: Double = 0.9,
      onBatch: (Long, Row) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = {
    import org.apache.spark.storage.StorageLevel
    val baseline = Similarity.indexedFit(index, grid, centroids)
      .persist(StorageLevel.MEMORY_AND_DISK)
    baseline.count()
    (batch: DataFrame, batchId: Long) => {
      val n = batch.count()
      if (n > 0) {
        val spark = batch.sparkSession
        import spark.implicits._
        val d = Similarity.indexDriftVsBaseline(batch, grid, centroids,
          baseline, retrainRatio).head()
        val row = (batchId, n, d.getAs[Double]("fit_new"),
          d.getAs[Double]("drift"), d.getAs[Long]("retrain"))
        onBatch(batchId, Row(row._1, row._2, row._3, row._4, row._5))
        Seq(row).toDF("batch_id", "n_rows", "fit_new", "drift", "retrain")
          .write.mode("append").parquet(sinkDir)
      }
    }
  }

  def pqDriftMonitor(codes: DataFrame, codebooks: DataFrame,
      sinkDir: String, m: Int = 4, dim: Int = 64, maxTv: Double = 0.2,
      onBatch: (Long, Row) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.storage.StorageLevel
    // The index-side inputs, aggregated once and pinned for the life of
    // the monitor (m·ksub + 1 rows — broadcast-sized by construction).
    val hIdx = codes.groupBy("sub", "code").agg(count(lit(1)).as("n_idx"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tIdx = codes.agg(countDistinct("vec_id").cast("double").as("t_idx"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    hIdx.count(); tIdx.count()
    (batch: DataFrame, batchId: Long) => {
      val n = batch.count()
      if (n > 0) {
        val spark = batch.sparkSession
        import spark.implicits._
        val d = Similarity.pqDriftVsHistogram(batch, hIdx, tIdx, codebooks,
          m, dim, maxTv).head()
        val row = (batchId, n, d.getAs[Double]("tv_max"), d.getAs[Long]("retrain"))
        onBatch(batchId, Row(row._1, row._2, row._3, row._4))
        Seq(row).toDF("batch_id", "n_rows", "tv_max", "retrain")
          .write.mode("append").parquet(sinkDir)
      }
    }
  }
}
