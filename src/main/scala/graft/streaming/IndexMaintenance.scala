package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

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
  *
  * Two tiers of composition:
  *  - the *DriftMonitor pair: WATCH-only — drift rows land per batch,
  *    the stored artifact is untouched;
  *  - the *AppendPipeline pair: the CLOSED production loop — each
  *    micro-batch is encoded ONCE on the pinned quantizer, the encoded
  *    rows are appended to the stored parquet artifact, and the SAME
  *    rows feed the drift row against the PRE-APPEND baseline (ingest →
  *    append → drift → retrain signal, one foreachBatch). Because the
  *    quantizer is fixed and the encode is per-row deterministic, the
  *    artifact after N batches is exactly what one batch
  *    [[Similarity.appendToInt8Index]]/[[Similarity.appendToPqIndex]]
  *    over the union of the arrivals would produce — StreamingSpec pins
  *    the equivalence cross-batch with a late arrival.
  */
object IndexMaintenance {

  // ------------------------------------------------------------------
  // Structural-parameter manifests ([[StoreManifest]]): the generation
  // store roots persist the artifact SHAPE (`dim`/`nCentroids` for
  // int8, `dim`/`m`/`ksub` for PQ — written at init, checked at every
  // rebuilding-pipeline construction), so reconstructing a pipeline
  // over an existing store with different values refuses loudly
  // instead of silently mis-encoding future generations. Training
  // knobs (`lloydIters`/`iters`/`trainN`/`seedPlanes`) are SEMANTIC —
  // retuning them between runs is legal — and stay out.
  //
  // The append tiers take a bare, already-written code artifact (no
  // init call), so their gate is [[StoreManifest.sealOrCheck]] with an
  // in-dir `_MANIFEST`: first construction seals, later constructions
  // verify. Because an append artifact's contract is "the quantizer is
  // FIXED for the life of the store", the seal also carries a VALUE
  // digest of the pinned quantizer — a same-shaped but different-valued
  // grid/centroids/codebooks (the mismatch shape params cannot see)
  // refuses too.
  // ------------------------------------------------------------------

  // `codesLayout` is STRUCTURAL, not a tuning knob: the generation
  // stores whose code tables are cell-partitioned on disk (int8,
  // ivf-pq — [[writeCellPartitioned]]) must never be appended to by a
  // writer that would lay files out flat, and vice versa — Spark's
  // partition discovery rejects a mixed flat+partitioned directory
  // ("conflicting directory structures"), and the failure would be
  // silent at write time and surface only at the next read. Recording
  // the layout in the manifest makes every pipeline construction over
  // a store with a different (or absent — i.e. pre-layout) marker
  // refuse loudly before a single mixed file is written.
  private def int8StoreEntries(dim: Int, nCentroids: Int) = Seq(
    "kind" -> "int8-vector-store", "dim" -> dim.toString,
    "nCentroids" -> nCentroids.toString,
    "codesLayout" -> "cell-partitioned")

  private def pqStoreEntries(dim: Int, m: Int, ksub: Int) = Seq(
    "kind" -> "pq-vector-store", "dim" -> dim.toString,
    "m" -> m.toString, "ksub" -> ksub.toString,
    "codesLayout" -> "flat")

  private def ivfPqStoreEntries(dim: Int, m: Int, ksub: Int,
      nCentroids: Int) = Seq(
    "kind" -> "ivfpq-vector-store", "dim" -> dim.toString,
    "m" -> m.toString, "ksub" -> ksub.toString,
    "nCentroids" -> nCentroids.toString,
    "codesLayout" -> "cell-partitioned")

  /** Cell-usage total variation of one batch's coarse assignments
    * against the pinned index-side histogram: ½·Σ|p_new − p_idx| over
    * the full-outer cell join (absent cells on either side contribute
    * their whole mass). `cells` is the batch's (vec_id, cell) table —
    * caller persists it; ≤ nCentroids + 1 rows move after the groupBy.
    */
  private def cellTv(cells: DataFrame, hIdx: DataFrame,
      tIdx: Double): Double = {
    import org.apache.spark.sql.functions._
    val nNew = cells.count().toDouble
    cells.groupBy("cell").agg(count(lit(1)).as("n_new"))
      .join(hIdx, Seq("cell"), "full_outer")
      .na.fill(0L, Seq("n_new", "n_idx"))
      .agg((sum(abs(col("n_new") / lit(nNew)
        - col("n_idx") / lit(tIdx))) / 2.0).as("tv"))
      .head().getDouble(0)
  }

  /** MD5 over the sorted canonical rows of bounded quantizer tables
    * (a 1-row grid, nCentroids centroids, m·ksub codebook rows — all
    * construction-bounded). Row order and column order are canonicalized
    * so the digest identifies the quantizer's VALUES, not the plan that
    * produced them. Operates on ALREADY-COLLECTED rows: the append
    * pipelines pin their quantizer once ([[pinWithRows]]) and the digest
    * reuses those rows — an arbitrary caller plan (e.g. a training DAG)
    * is never re-executed just to seal the store.
    */
  private def quantizerDigest(
      parts: Seq[(org.apache.spark.sql.types.StructType, Array[Row])])
      : String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    parts.foreach { case (schema, rows) =>
      val order = schema.fieldNames.zipWithIndex.sortBy(_._1).map(_._2)
      rows
        .map(row => order.map { i =>
          row.get(i) match {
            case s: scala.collection.Seq[_] => s.mkString("[", ",", "]")
            case x => String.valueOf(x)
          }
        }.mkString("|"))
        .sorted
        .foreach(r => md.update((r + "\n").getBytes("UTF-8")))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** [[pinLocal]] that also hands back the collected rows, so a caller
    * needing both the pinned relation and driver-side access (dim /
    * row-count / digest derivation) pays exactly ONE execution of the
    * source plan.
    */
  private def pinWithRows(df: DataFrame): (DataFrame, Array[Row]) = {
    import scala.jdk.CollectionConverters._
    val rows = df.collect()
    (df.sparkSession.createDataFrame(rows.toSeq.asJava, df.schema), rows)
  }

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

  /** One monitoring row (batch_id, n_rows, tv_max, retrain) appended to
    * the parquet `sinkDir` per non-empty micro-batch of embedding
    * arrivals. `codes`/`codebooks` are the persisted PQ artifact
    * (q_sim8/q_sim9 shapes). `onBatch` receives each row as it lands —
    * wire it to alerting or a retrain queue. Returns the function to
    * attach via `writeStream.foreachBatch(...)`.
    */
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

  /** The int8 tier's CLOSED loop: per non-empty micro-batch of
    * embedding arrivals, encode on the pinned quantizer
    * ([[Similarity.int8Encode]] — grid + centroids fixed, no
    * retraining), append the encoded rows to the stored parquet
    * artifact at `indexDir`, and emit one (batch_id, n_rows, fit_new,
    * drift, retrain) row to `sinkDir` against the PRE-APPEND baseline
    * ([[Similarity.indexedFit]] over `indexDir` as of pipeline start,
    * computed once and persisted — appends never shift the yardstick
    * they are measured against; retrain = 1 is the signal to rebuild
    * both artifact and baseline). ONE encode pass per batch: the same
    * persisted encoded rows feed the append write and the drift
    * ([[Similarity.indexDriftFromCodes]]).
    *
    * At scale each batch costs O(batch) encode + an append write of the
    * batch's own rows; the stored index is scanned exactly once, at
    * start. `onBatch` receives each drift row — wire it to a retrain
    * queue.
    */
  def int8AppendPipeline(indexDir: String, grid: DataFrame,
      centroids: DataFrame, sinkDir: String, retrainRatio: Double = 0.9,
      onBatch: (Long, Row) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = {
    val spark = grid.sparkSession
    import spark.implicits._
    // Pin the quantizer ONCE (a 1-row grid + nCentroids centroids —
    // bounded by construction). The pinned rows drive the seal-or-check
    // below with no further jobs, and every per-batch encode runs on
    // the LOCAL relations — an expensive caller plan (a training DAG
    // handed in as `centroids`) executes exactly once per pipeline
    // construction, never once per seal field plus once per batch.
    val (gridL, gridRows) = pinWithRows(grid)
    val (centsL, centRows) = pinWithRows(centroids)
    // Seal-or-check the artifact against the pinned quantizer: shape
    // (dim from the grid row, centroid count) plus the value digest —
    // a reconstruction with ANY different quantizer over these codes
    // would silently mis-encode every future append.
    val dim = gridRows(0).getAs[scala.collection.Seq[Double]]("lo").size
    StoreManifest.sealOrCheck(spark, indexDir, Seq(
        "kind" -> "int8-codes", "dim" -> dim.toString,
        "nCentroids" -> centRows.length.toString,
        "quantizerDigest" -> quantizerDigest(Seq(
          (grid.schema, gridRows), (centroids.schema, centRows)))),
      "int8 code artifact", StoreManifest.InlineFileName)
    // The baseline is COLLECTED into a local one-row relation, not
    // persisted over the parquet scan: each append write triggers
    // Spark's refreshByPath on `indexDir`, which RE-CACHES any cached
    // plan scanning that path — a persisted baseline would silently
    // recompute over the grown artifact and measure every batch against
    // a yardstick its own appends keep moving. A pinned scalar is also
    // the production posture (calibration from a reference snapshot,
    // refreshed on retrain — the curation funnel's qMin/qMax pattern).
    val baseline = Seq(Similarity.indexedFit(spark.read.parquet(indexDir),
        gridL, centsL).head().getDouble(0))
      .toDF("fit_indexed")
    (batch: DataFrame, batchId: Long) => {
      val n = batch.count()
      if (n > 0) {
        import spark.implicits._
        val encoded = Similarity.int8Encode(batch, gridL, centsL)
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          encoded.write.mode("append").parquet(indexDir)
          val d = Similarity.indexDriftFromCodes(encoded, gridL, centsL,
            baseline, retrainRatio).head()
          val row = (batchId, n, d.getAs[Double]("fit_new"),
            d.getAs[Double]("drift"), d.getAs[Long]("retrain"))
          onBatch(batchId, Row(row._1, row._2, row._3, row._4, row._5))
          Seq(row).toDF("batch_id", "n_rows", "fit_new", "drift", "retrain")
            .write.mode("append").parquet(sinkDir)
        } finally encoded.unpersist(blocking = false)
      }
    }
  }

  /** The PQ tier's CLOSED loop — [[int8AppendPipeline]]'s shape over
    * the (vec_id, sub, code) artifact at `codesDir`: encode each batch
    * once on the pinned `codebooks` ([[Similarity.pqEncode]]), append
    * the codes to the stored table, and emit one (batch_id, n_rows,
    * tv_max, retrain) row against the PRE-APPEND code-usage histogram
    * (aggregated once at start; appends never shift the yardstick —
    * retrain = 1 says rebuild codebooks, artifact, and histogram).
    */
  def pqAppendPipeline(codesDir: String, codebooks: DataFrame,
      sinkDir: String, m: Int = 4, dim: Int = 64, maxTv: Double = 0.2,
      onBatch: (Long, Row) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = {
    import org.apache.spark.sql.functions._
    val spark = codebooks.sparkSession
    import spark.implicits._
    // Pin the codebooks ONCE (m·ksub rows — bounded by construction);
    // int8AppendPipeline's rationale: the pinned rows drive the seal
    // with no further jobs and the per-batch encodes run on the local
    // relation, so a training DAG handed in as `codebooks` executes
    // exactly once per pipeline construction.
    val (cbL, cbRows) = pinWithRows(codebooks)
    // Seal-or-check against the pinned codebooks — int8AppendPipeline's
    // gate for the PQ tier (ksub derived from the trained table, which
    // may legitimately hold fewer codewords than requested).
    StoreManifest.sealOrCheck(spark, codesDir, Seq(
        "kind" -> "pq-codes", "dim" -> dim.toString, "m" -> m.toString,
        "ksub" -> (cbRows.length / m).toString,
        "quantizerDigest" -> quantizerDigest(Seq((codebooks.schema, cbRows)))),
      "pq code artifact", StoreManifest.InlineFileName)
    // Pinned as LOCAL relations, not persisted over the parquet scan —
    // int8AppendPipeline's refreshByPath rationale: an append write
    // re-caches any cached plan scanning `codesDir`, so a persisted
    // histogram would recompute over the grown artifact. m·ksub + 1
    // rows — driver-collectable by construction.
    val codes0 = spark.read.parquet(codesDir)
    val hIdx = codes0.groupBy("sub", "code").agg(count(lit(1)).as("n_idx"))
      .select(col("sub").cast("int"), col("code").cast("int"), col("n_idx"))
      .collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .toDF("sub", "code", "n_idx")
    val tIdx = Seq(codes0.agg(countDistinct("vec_id").cast("double"))
      .head().getDouble(0)).toDF("t_idx")
    (batch: DataFrame, batchId: Long) => {
      val n = batch.count()
      if (n > 0) {
        import spark.implicits._
        val encoded = Similarity.pqEncode(batch, cbL, m, dim)
          .select("vec_id", "sub", "code")
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          encoded.write.mode("append").parquet(codesDir)
          val d = Similarity.pqDriftFromCodes(encoded, hIdx, tIdx,
            cbL, maxTv).head()
          val row = (batchId, n, d.getAs[Double]("tv_max"), d.getAs[Long]("retrain"))
          onBatch(batchId, Row(row._1, row._2, row._3, row._4))
          Seq(row).toDF("batch_id", "n_rows", "tv_max", "retrain")
            .write.mode("append").parquet(sinkDir)
        } finally encoded.unpersist(blocking = false)
      }
    }
  }

  /** The IVF-PQ serving tier's CLOSED loop — [[pqAppendPipeline]]'s
    * shape over q_sim10's composite artifact, a (vec_id, sub, code,
    * cell) table at `codesDir`: per non-empty micro-batch, assign
    * coarse cells on the pinned centroids
    * ([[Similarity.ivfCellAssign]] — broadcast argmax, one map-side
    * pass), PQ-encode on the pinned codebooks, join, append — and emit
    * one (batch_id, n_rows, tv_cell, retrain) drift row against the
    * PRE-APPEND cell-usage histogram.
    *
    * The drift signal is the IVF analog of the PQ tier's code-usage
    * total variation: tv_cell = ½·Σ|p_batch(cell) − p_index(cell)|.
    * A coarse partition whose arrival mix diverges from the indexed
    * mix is the serving-tier failure mode — probes concentrate on hot
    * cells and the bounded-candidate guarantee erodes — and that is
    * precisely a distribution distance on the cell id, computable from
    * the batch's own assignments with no corpus access. The histogram
    * is aggregated ONCE at construction (nCentroids rows, pinned
    * local; the refreshByPath rationale of the flat tiers), so appends
    * never move the yardstick they are measured against; retrain = 1
    * says rebuild centroids + codebooks + artifact — the corpus-scale
    * job [[ivfPqRebuildingPipeline]] closes over a generation store
    * (inline or off-path), for callers owning a bare code artifact
    * rather than a store to act on themselves.
    *
    * At scale each batch costs O(batch): one broadcast argmax pass,
    * one broadcast-LUT encode pass, one append of the batch's own
    * rows, one nCentroids-row drift join. The stored artifact is read
    * exactly once, at construction.
    */
  def ivfPqAppendPipeline(codesDir: String, centroids: DataFrame,
      codebooks: DataFrame, sinkDir: String, m: Int = 4, dim: Int = 64,
      maxTv: Double = 0.2,
      onBatch: (Long, Row) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = {
    import org.apache.spark.sql.functions._
    val spark = codebooks.sparkSession
    import spark.implicits._
    // Pin BOTH quantizer tables once ([[pqAppendPipeline]]'s posture):
    // the pinned rows drive the seal, and per-batch assign/encode run
    // on the local relations.
    val (centsL, centRows) = pinWithRows(centroids)
    val (cbL, cbRows) = pinWithRows(codebooks)
    StoreManifest.sealOrCheck(spark, codesDir, Seq(
        "kind" -> "ivfpq-codes", "dim" -> dim.toString, "m" -> m.toString,
        "ksub" -> (cbRows.length / m).toString,
        "nCentroids" -> centRows.length.toString,
        "quantizerDigest" -> quantizerDigest(Seq(
          (centroids.schema, centRows), (codebooks.schema, cbRows)))),
      "ivf-pq code artifact", StoreManifest.InlineFileName)
    // Pre-append cell-usage histogram, pinned local (≤ nCentroids + 1
    // rows — the artifact carries `cell` on every (vec, sub) row, so
    // distinct vec first).
    val codes0 = spark.read.parquet(codesDir)
    val hIdx = pinLocal(codes0.select("vec_id", "cell").distinct()
      .groupBy("cell").agg(count(lit(1)).as("n_idx")))
    val tIdx = codes0.agg(countDistinct("vec_id").cast("double"))
      .head().getDouble(0)
    // Fail-loudly posture of latestGen: an empty seed artifact would
    // make every per-batch tv division NaN — drift silently disabled.
    require(tIdx > 0,
      s"ivf-pq code artifact at $codesDir holds no vectors — " +
        "seed the index before constructing the append pipeline")
    (batch: DataFrame, batchId: Long) => {
      val n = batch.count()
      if (n > 0) {
        import spark.implicits._
        val cells = Similarity.ivfCellAssign(batch, centsL)
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val encoded = Similarity.pqEncode(batch, cbL, m, dim)
            .select("vec_id", "sub", "code")
            .join(cells, "vec_id")
          encoded.write.mode("append").parquet(codesDir)
          val tv = cellTv(cells, hIdx, tIdx)
          val row = (batchId, n, tv, if (tv > maxTv) 1L else 0L)
          onBatch(batchId, Row(row._1, row._2, row._3, row._4))
          Seq(row).toDF("batch_id", "n_rows", "tv_cell", "retrain")
            .write.mode("append").parquet(sinkDir)
        } finally cells.unpersist(blocking = false)
      }
    }
  }

  // ------------------------------------------------------------------
  // The RETRAIN leg — rebuild-and-swap, closing the loop the append
  // pipelines open. The *AppendPipeline pair detects drift and emits
  // retrain = 1; the *RebuildingPipeline pair ACTS on it: retrain the
  // quantizer on the full vector log, rewrite the artifact, re-pin the
  // baseline, resume appends on the new generation — all inside the
  // same foreachBatch, so the loop is ingest → append → drift →
  // rebuild → quiet with no operator runbook in between.
  //
  // Store layout (self-contained under one root):
  //   root/vectors/            raw (vec_id, embedding) log — the
  //                            corpus seed + every arrival; the
  //                            authoritative retrain input (a rebuild
  //                            is a corpus-scale job BY DESIGN — rare
  //                            and signal-driven, it re-reads this log
  //                            once; appends never do)
  //   root/gen-N/...           one directory per quantizer GENERATION:
  //                            int8 → grid/ centroids/ codes/;
  //                            PQ   → codebooks/ codes/
  //   root/gen-N/COMMITTED     marker written LAST — the swap's commit
  //                            point. A crash mid-rebuild leaves an
  //                            uncommitted gen dir that every reader
  //                            ignores; the drift signal re-fires on
  //                            the next batch and the retry overwrites
  //                            the orphan. Readers always resolve
  //                            [[latestGen]] = max committed N.
  //
  // Replay honesty: the vectors/codes appends stay at-least-once (the
  // parquet-append caveat), so a replayed batch can duplicate rows in
  // BOTH logs. Rebuilds neutralize what they can: training and
  // re-encoding run over vectors deduped by vec_id, so each rebuild
  // starts from a clean corpus and only inter-rebuild appends can carry
  // duplicates.
  // ------------------------------------------------------------------

  private def genDir(root: String, gen: Long) = GenStore.dir(root, gen)

  /** Generation-store code tables are CELL-PARTITIONED on disk: the
    * partition column (`pcid` int8 / `pcell` ivf-pq) DUPLICATES the
    * in-row cell column, so every existing reader (pins, histograms,
    * catch-up anti-joins, spec differentials) sees the same data
    * columns it always did, while a pruning reader filters on the
    * partition column and scans only the probed cells' files. The
    * round-13 ServingProbe measured why: at n=500k the ivf-pq serve
    * paid 20 s/batch scanning all n·m code rows before the cell join
    * pruned — the probed-cells arithmetic held for the JOIN, not the
    * I/O. With `pcell=` dirs the scan itself becomes
    * O(n·m·nProbe/nCentroids).
    *
    * `compact = true` (full-GENERATION writes: init and rebuild)
    * clusters rows by the partition column before the write, so each
    * cell lands as ONE file instead of one file per (cell × writing
    * task) — without it a w-task writer fragments every cell w ways,
    * and the per-file open/footer overhead multiplies exactly where
    * the bulk-serve regime scans everything (round-14 ServingProbe
    * measures the two layouts side by side; SCALE.md). Appends keep
    * `compact = false`: a micro-batch is small, and paying a shuffle
    * per batch to co-locate a handful of rows per cell buys nothing —
    * file-count hygiene for the append tail is the REBUILD's job
    * (which rewrites the codes table compacted). Skew stance: one
    * task writes a whole cell, so a pathological giant cell serializes
    * through one writer — at the 3 GB/cell production target that is
    * the standard partitionBy-compaction tradeoff; cells beyond
    * task-sized want a salt column splitting them into bounded file
    * chunks, which readers ignore (partition pruning keys only on
    * `partCol`).
    */
  private def writeCellPartitioned(df: DataFrame, cellCol: String,
      partCol: String, dir: String, mode: String,
      compact: Boolean = false): Unit = {
    val tagged = df.withColumn(partCol, df(cellCol))
    val out = if (compact) tagged.repartition(col(partCol)) else tagged
    out.write.partitionBy(partCol).mode(mode).parquet(dir)
  }

  /** Prune a cell-partitioned code table to `cells`, dropping the
    * partition column; a FLAT table (pre-partitioning layout, or an
    * artifact written by the standalone append pipelines) is returned
    * unpruned — layout is an optimization, never a correctness gate.
    *
    * The prune is CONDITIONAL on selectivity: when the batch's probed
    * union covers half the cells or more (a large random query batch —
    * the bulk-mining regime), filtering buys nothing the scan wouldn't
    * read anyway and the per-partition file overhead costs (round-13
    * ServingProbe: int8 n=500k, batch=64·nProbe=8 probes 512/707 cells
    * — the "pruned" serve measured 2.8× the flat one). Below half —
    * the latency regime (small batches) and clustered workloads — the
    * filter skips whole partitions at scan time.
    */
  private def pruneCells(codes: DataFrame, partCol: String,
      cells: Seq[Long], nCentroids: Int): DataFrame =
    if (codes.columns.contains(partCol)) {
      if (cells.size * 2 <= nCentroids)
        codes.where(col(partCol).isin(cells: _*)).drop(partCol)
      else codes.drop(partCol)
    } else codes

  /** Raw-arrival staging for an in-flight OFF-PATH rebuild (`async =
    * true`): while generation `gen` is being built from a frozen
    * snapshot, each batch's arrivals are also parked here so the swap
    * can encode exactly the build-window rows on the new quantizer.
    * Lives UNDER the generation dir, so a crashed build's staging is
    * reaped with its orphan by the next submission's delete.
    */
  private def stagingDir(root: String, gen: Long) =
    s"${genDir(root, gen)}/pending-vectors"

  /** The vector log's data-file list at this instant. Taken in the
    * STREAM thread at rebuild submission — the single writer — so the
    * listing cannot race an append; the builder thread then reads
    * exactly these files for every pass. A plain directory read would
    * re-list per action and see different corpora between Lloyd
    * iterations (and between training and encode), silently desyncing
    * quantizer and codes.
    */
  private def vectorSnapshot(spark: SparkSession, root: String): Seq[String] = {
    val hfs = GenStore.fs(spark, s"$root/vectors")
    hfs.listStatus(new Path(s"$root/vectors")).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.toString)
  }

  private def deleteQuiet(spark: SparkSession, path: String): Unit =
    GenStore.deleteQuiet(spark, path)

  /** Highest COMMITTED generation under `root` — the one readers and
    * appenders use. Fails loudly on a store with no committed
    * generation (init first; an uncommitted orphan alone means a
    * rebuild died before its commit point). [[GenStore]]'s protocol.
    */
  def latestGen(spark: SparkSession, root: String): Long =
    GenStore.latest(spark, root)

  private def commitGen(spark: SparkSession, root: String, gen: Long): Unit =
    GenStore.commit(spark, root, gen)

  /** Bounded driver pin: collect `df` (caller guarantees a small,
    * construction-bounded row count — a 1-row grid, nCentroids
    * centroids, m·ksub codebook rows) into a LOCAL relation, immune to
    * the refreshByPath re-cache the append writes fire on the store
    * paths ([[int8AppendPipeline]]'s rationale, SCALE.md's trap).
    */
  private def pinLocal(df: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    df.sparkSession.createDataFrame(df.collect().toSeq.asJava, df.schema)
  }

  /** Refuse to init over a LIVE store (any committed generation):
    * re-initing would overwrite the manifest and the vector log while
    * the highest committed generation — laid out under the OLD
    * parameters — stays the one readers resolve, exactly the silent
    * divergence the manifest exists to prevent. A manifest with no
    * committed generation is a crashed init: completing it is legal iff
    * the parameters match what the first attempt recorded.
    */
  private def guardInit(spark: SparkSession, root: String,
      entries: Seq[(String, String)], store: String): Unit = {
    val gens = GenStore.committed(spark, root)
    if (gens.nonEmpty) throw new IllegalStateException(
      s"$store at $root already has committed generation(s) " +
        s"${gens.mkString(", ")} — refusing to re-init over live data " +
        "(point at a fresh root, or construct the pipeline instead)")
    if (StoreManifest.read(spark, root).isDefined)
      StoreManifest.check(spark, root, entries, store)
    else StoreManifest.write(spark, root, entries)
    // A root that passed the fresh-init guard may still have trained
    // artifacts cached from a PREVIOUS store at the same path (wiped
    // externally, re-inited in one JVM): artifact keys here are (root,
    // gen) identities, not content plans, so drop them before seeding
    // (round 20, ADVICE).
    graft.operators.Similarity.invalidateArtifacts(root)
  }

  /** Create an int8 generation store: persist the MANIFEST (shape
    * parameters every later pipeline construction is checked against),
    * seed the vector log with `corpus`, train generation 0
    * (grid + centroids), encode, commit. Refuses a root that already
    * holds a committed generation (see [[guardInit]]).
    */
  def initInt8Store(spark: SparkSession, root: String, corpus: DataFrame,
      nCentroids: Int = 16, lloydIters: Int = 2, trainN: Int = 4096,
      seedPlanes: Int = 6, dim: Int = 64): Unit = {
    guardInit(spark, root, int8StoreEntries(dim, nCentroids), "int8 store")
    corpus.select("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$root/vectors")
    val vecs = spark.read.parquet(s"$root/vectors")
    val grid = Similarity.int8Stats(vecs, dim)
    val cents = Similarity.trainCentroids(vecs, nCentroids, lloydIters,
      trainN, seedPlanes, dim,
      // generation-addressed artifact id: the plan-keyed cache would
      // alias rebuilds (same $root/vectors path, grown content)
      artifactKey = Some(Seq(root, 0L)))
    writeInt8Gen(spark, root, 0L, vecs, grid, cents)
  }

  /** Write one full int8 generation (centroids → grid → codes →
    * COMMITTED — the marker last, so a partial write is never
    * resolvable) and return nothing; `vecs` is the deduped retrain
    * input. The codes are encoded on the WRITTEN centroids/grid read
    * back from parquet, not on the training plans: each training plan
    * executes exactly once (its own write), and codes ≡ committed
    * quantizer holds by construction instead of resting on the plans
    * re-executing deterministically.
    */
  private def writeInt8Gen(spark: SparkSession, root: String, gen: Long,
      vecs: DataFrame, grid: DataFrame, cents: DataFrame,
      commit: Boolean = true): Unit = {
    val d = genDir(root, gen)
    cents.write.mode("overwrite").parquet(s"$d/centroids")
    grid.write.mode("overwrite").parquet(s"$d/grid")
    writeCellPartitioned(Similarity.int8Encode(vecs,
        spark.read.parquet(s"$d/grid"), spark.read.parquet(s"$d/centroids")),
      "cid", "pcid", s"$d/codes", "overwrite", compact = true)
    if (commit) commitGen(spark, root, gen)
  }

  /** [[int8AppendPipeline]] WITH the retrain leg: per batch, log the
    * raw arrivals, encode on the CURRENT generation's pinned quantizer,
    * append the codes, emit the drift row (now carrying `gen`) — and
    * when it says retrain, rebuild generation N+1 from the full vector
    * log (dedup → retrain grid + centroids → re-encode → commit),
    * re-pin quantizer + baseline, and resume appends on the new
    * generation. StreamingSpec drives a planted shift through the whole
    * loop: quiet → retrain trips → rebuild → the next batches measure
    * quiet against the NEW baseline.
    *
    * At scale: appends stay O(batch); a rebuild is one corpus-scale
    * training + encode pass, paid only when the signal fires. The
    * quantizer and baseline live as driver-local pins (grid 1 row,
    * centroids nCentroids rows, fit 1 double — bounded by
    * construction), re-pinned only on swap.
    *
    * `async = true` moves the corpus-scale rebuild OFF the batch path
    * (the 100 TB availability stance — inline, a rebuild stalls
    * ingestion for the full train+encode; see SCALE.md). The retrain
    * signal SUBMITS a build of generation N+1 to a daemon thread over a
    * file-list snapshot of the vector log (taken in the stream thread —
    * the single writer — so it cannot race an append) while batches
    * keep appending to generation N; each build-window batch also
    * parks its raw arrivals under `gen-(N+1)/pending-vectors`. The
    * first batch after the build finishes runs the SWAP, still in the
    * stream thread: encode the staged build-window arrivals on the new
    * quantizer, append to the new codes, write `COMMITTED` (the atomic
    * swap point, covering the catch-up), re-pin, delete staging. Swap
    * cost is O(build-window arrivals) + one scan of the COMPACT code
    * table for the new baseline — never the raw corpus. The catch-up
    * encode anti-joins staging against the built snapshot's codes, so
    * a vec_id re-sent during the build window is encoded once —
    * async ≡ inline, which dedups the full log. Crash at any point: an
    * uncommitted gen dir (staging included) is invisible to readers
    * and reaped at the next pipeline construction, by the next
    * submission, or — for a surfaced build failure — in the failure
    * branch itself, so an orphan never outlives the next observation
    * even if drift subsides. A build failure is surfaced through
    * `onBuildError` on the next batch (default rethrows; an overriding
    * hook may log and return, after which the drift signal re-submits —
    * self-healing). `rebuildGate` runs in the builder thread before
    * any read: a test hook to hold the build window open
    * deterministically.
    */
  def int8RebuildingPipeline(spark: SparkSession, root: String,
      sinkDir: String,
      nCentroids: Int = 16, lloydIters: Int = 2, trainN: Int = 4096,
      seedPlanes: Int = 6, dim: Int = 64, retrainRatio: Double = 0.9,
      onBatch: (Long, Row) => Unit = (_, _) => (),
      onRebuild: (Long, Long) => Unit = (_, _) => (),
      async: Boolean = false,
      rebuildGate: () => Unit = () => (),
      onBuildError: (Long, Throwable) => Unit = (_, e) => throw e)
      : (DataFrame, Long) => Unit = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // Construction-time gate: the store's persisted shape must match
    // this pipeline's parameters — a mismatched `dim`/`nCentroids`
    // reconstruction would mis-encode every append and train wrongly
    // shaped future generations.
    StoreManifest.check(spark, root, int8StoreEntries(dim, nCentroids),
      "int8 store")
    // Generation state, pinned ONCE at pipeline construction (and again
    // only on swap): the stored index is scanned exactly once for the
    // baseline fit, appends stay O(batch), and a restarted driver
    // re-constructs the pipeline and re-pins from the committed store —
    // no in-memory state to lose.
    var gen = latestGen(spark, root)
    var grid = pinLocal(spark.read.parquet(s"${genDir(root, gen)}/grid"))
    var cents = pinLocal(spark.read.parquet(s"${genDir(root, gen)}/centroids"))
    var baseline = Seq(Similarity.indexedFit(
        spark.read.parquet(s"${genDir(root, gen)}/codes"), grid, cents)
      .head().getDouble(0)).toDF("fit_indexed")
    // A staging dir on the LATEST (committed) generation is a crash
    // between the swap's commit and its staging delete — the rows were
    // already folded into the codes before the commit; reap it. And an
    // UNCOMMITTED generation above the committed frontier is a build
    // that died before its commit point — single-writer, so nothing is
    // in flight at construction; reap it too (it holds a partial
    // artifact plus a staging dir, and if drift has subsided no future
    // submission would ever overwrite it).
    deleteQuiet(spark, stagingDir(root, gen))
    GenStore.dropUncommittedAbove(spark, root, gen)
    // Off-path build state. `built`/`failed` cross the builder→stream
    // thread boundary; `buildingGen` is touched by the stream thread
    // only (-1 = no build in flight). `failed` carries (batchId,
    // targetGen, error) so the surfacing branch can reap the orphan.
    val built = new java.util.concurrent.atomic.AtomicLong(-1L)
    val failed = new java.util.concurrent.atomic
      .AtomicReference[(Long, Long, Throwable)](null)
    var buildingGen = -1L
    (batch: DataFrame, batchId: Long) => {
      val n = batch.count()
      if (n > 0) {
        if (async) {
          // Surface a failed build before anything else: reap the
          // orphan target dir eagerly (if drift has subsided it would
          // otherwise persist indefinitely), then clear `buildingGen`
          // to re-arm submission for the still-firing drift signal.
          val f = failed.getAndSet(null)
          if (f != null) {
            deleteQuiet(spark, genDir(root, f._2))
            buildingGen = -1L
            onBuildError(f._1, f._3)
          }
          // SWAP: a build finished since the last batch. Encode the
          // staged build-window arrivals on the new quantizer, commit
          // (the atomic point — covers the catch-up), re-pin from the
          // committed store, reap staging. Runs before this batch is
          // processed, so the batch lands on the new generation.
          val g2 = built.get()
          if (g2 >= 0) {
            val sd = stagingDir(root, g2)
            val newGrid =
              pinLocal(spark.read.parquet(s"${genDir(root, g2)}/grid"))
            val newCents =
              pinLocal(spark.read.parquet(s"${genDir(root, g2)}/centroids"))
            // Catch-up = staged rows the SNAPSHOT didn't already cover:
            // a vec_id re-sent during the build window is in both the
            // frozen snapshot (its first arrival) and staging (its
            // replay) — without the anti-join it would be encoded twice
            // in gen N+1, where the inline rebuild (which dedups the
            // full log) encodes it once. One anti-join against the
            // compact built code table keeps async ≡ inline.
            if (GenStore.fs(spark, sd).exists(new Path(sd)))
              writeCellPartitioned(Similarity.int8Encode(
                  spark.read.parquet(sd).dropDuplicates("vec_id")
                    .join(spark.read.parquet(s"${genDir(root, g2)}/codes")
                        .select(col("neighbor_id").as("vec_id")),
                      Seq("vec_id"), "left_anti"),
                  newGrid, newCents),
                "cid", "pcid", s"${genDir(root, g2)}/codes", "append")
            commitGen(spark, root, g2)
            deleteQuiet(spark, sd)
            gen = g2; grid = newGrid; cents = newCents
            baseline = Seq(Similarity.indexedFit(
                spark.read.parquet(s"${genDir(root, gen)}/codes"), grid, cents)
              .head().getDouble(0)).toDF("fit_indexed")
            built.set(-1L); buildingGen = -1L
            onRebuild(batchId, gen)
          }
        }
        val arrivals = batch.select(col("vec_id"), col("embedding"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          arrivals.write.mode("append").parquet(s"$root/vectors")
          // An in-flight build's snapshot is frozen — park this batch's
          // raw arrivals for the swap's catch-up encode.
          if (async && buildingGen >= 0)
            arrivals.write.mode("append")
              .parquet(stagingDir(root, buildingGen))
          val encoded = Similarity.int8Encode(arrivals, grid, cents)
            .persist(StorageLevel.MEMORY_AND_DISK)
          try {
            writeCellPartitioned(encoded, "cid", "pcid",
              s"${genDir(root, gen)}/codes", "append")
            val d = Similarity.indexDriftFromCodes(encoded, grid, cents,
              baseline, retrainRatio).head()
            val row = (batchId, n, d.getAs[Double]("fit_new"),
              d.getAs[Double]("drift"), d.getAs[Long]("retrain"), gen)
            onBatch(batchId, Row(row._1, row._2, row._3, row._4, row._5, row._6))
            Seq(row).toDF("batch_id", "n_rows", "fit_new", "drift",
              "retrain", "gen").write.mode("append").parquet(sinkDir)
            if (row._5 == 1L && !async) {
              // INLINE REBUILD: full vector log, deduped (replay
              // insurance), trained and encoded into generation N+1;
              // commit, then swap the pins — READ BACK from the
              // committed store, not from the training plans
              // (re-executing those would run training twice and rest
              // committed-codes/pinned-quantizer consistency on plan
              // determinism; pqRebuildingPipeline's pinHist is the same
              // posture). The next batch appends to gen N+1 and
              // measures against the retrained baseline.
              val vecs = spark.read.parquet(s"$root/vectors")
                .dropDuplicates("vec_id")
              writeInt8Gen(spark, root, gen + 1, vecs,
                Similarity.int8Stats(vecs, dim),
                Similarity.trainCentroids(vecs, nCentroids,
                  lloydIters, trainN, seedPlanes, dim,
                  artifactKey = Some(Seq(root, gen + 1))))
              gen += 1
              grid = pinLocal(spark.read.parquet(s"${genDir(root, gen)}/grid"))
              cents = pinLocal(
                spark.read.parquet(s"${genDir(root, gen)}/centroids"))
              baseline = Seq(Similarity.indexedFit(
                  spark.read.parquet(s"${genDir(root, gen)}/codes"), grid, cents)
                .head().getDouble(0)).toDF("fit_indexed")
              onRebuild(batchId, gen)
            } else if (row._5 == 1L && buildingGen < 0) {
              // SUBMIT the off-path build: snapshot the vector log's
              // file list HERE (single-writer thread — no append can
              // race the listing), clear any crash orphan of the target
              // generation (stale staging included), hand the frozen
              // snapshot to a daemon builder. Batches keep landing on
              // gen N until the build finishes.
              buildingGen = gen + 1
              val target = buildingGen
              deleteQuiet(spark, genDir(root, target))
              val snapshot = vectorSnapshot(spark, root)
              val t = new Thread(() => {
                try {
                  rebuildGate()
                  val vecs = spark.read.parquet(snapshot: _*)
                    .dropDuplicates("vec_id")
                  writeInt8Gen(spark, root, target, vecs,
                    Similarity.int8Stats(vecs, dim),
                    Similarity.trainCentroids(vecs, nCentroids,
                      lloydIters, trainN, seedPlanes, dim,
                      artifactKey = Some(Seq(root, target))),
                    commit = false)
                  built.set(target)
                } catch {
                  case e: Throwable => failed.set((batchId, target, e))
                }
              }, s"graft-int8-rebuild-gen-$target")
              t.setDaemon(true)
              t.start()
            }
          } finally encoded.unpersist(blocking = false)
        } finally arrivals.unpersist(blocking = false)
      }
    }
  }

  /** Streamed SERVING leg for the int8 generation store — the read path
    * that completes the tier's lifecycle (init → append → drift-driven
    * rebuild → SERVE): each query micro-batch runs
    * [[Similarity.queryInt8Index]] (float probe → int8 candidate rank →
    * exact float re-rank) against the artifacts of the latest COMMITTED
    * generation, and `onResult` receives (batchId, gen, top-k rows).
    *
    * Generation awareness is per batch and O(1): `latestGen` is one
    * marker-file listing, and only when it MOVES (a rebuild swapped
    * underneath the server) are the small artifacts re-pinned — grid
    * 1 row, centroids `nCentroids` rows, the bounded-driver-pin
    * pattern. The corpus-scale tables (codes, the float re-rank log)
    * are never pinned: they're read lazily per batch from the committed
    * generation dir, so a served batch always sees a commit-consistent
    * quantizer+codes pair (the COMMITTED marker is written only after
    * the catch-up encode lands). Serving is read-only — replay of a
    * query batch just re-serves it, so no staging or offset state is
    * needed on this leg.
    *
    * At 100 TB: per batch the probe is |queries|×nCentroids, the
    * candidate rank touches only the probed cells' code rows, and the
    * float log is consulted for ≤ rerankDepth·|queries| re-rank rows —
    * the same residue discipline as the batch serve (q_sim10's plan
    * pin); nothing scales with corpus size except the pruned candidate
    * scan itself.
    *
    * `filter` (a `vec_id` relation of allowed neighbors — a metadata
    * predicate's extension, e.g. `labels.where($"label" === x)`) turns
    * the serve into filtered ANN: "nearest WHERE predicate", answered
    * with the PRE-filter plan q_sim18 measured ~10× cheaper at equal
    * recall than post-filtering (StreamingSpec certifies the filtered
    * serve ≡ brute force over the filtered corpus at full probe).
    */
  def int8ServingPipeline(spark: SparkSession, root: String,
      k: Int = 10, rerankDepth: Int = 30, nProbe: Int = 8,
      nCentroids: Int = 16, dim: Int = 64,
      onResult: (Long, Long, DataFrame) => Unit,
      filter: Option[DataFrame] = None): (DataFrame, Long) => Unit = {
    StoreManifest.check(spark, root, int8StoreEntries(dim, nCentroids),
      "int8 store")
    var gen = -1L
    var grid: DataFrame = null
    var cents: DataFrame = null
    (batch: DataFrame, batchId: Long) => {
      val g = latestGen(spark, root)
      if (g != gen) { // first batch, or a rebuild swapped generations
        grid = pinLocal(spark.read.parquet(s"${genDir(root, g)}/grid"))
        cents = pinLocal(spark.read.parquet(s"${genDir(root, g)}/centroids"))
        gen = g
      }
      // Cell-pruned scan: the batch's probed cells (a ≤ |batch|·nProbe
      // driver pin, the same ranking the query tail computes) filter
      // the partitioned code table BEFORE the scan — per batch the
      // files read are the probed cells', O(n·nProbe/nCentroids) rows,
      // not the artifact (ServingProbe's round-13 diagnosis).
      val codes = pruneCells(
        spark.read.parquet(s"${genDir(root, gen)}/codes"), "pcid",
        Similarity.probedCells(batch, cents, nProbe), nCentroids)
      // The float log may hold replayed (duplicate) vec_ids; the re-rank
      // join must see each neighbor once.
      val corpus = spark.read.parquet(s"$root/vectors").dropDuplicates("vec_id")
      // PRE-filtered serve ("nearest WHERE <predicate>"): the allowed
      // ids semi-join the candidate codes BEFORE the int8 ranking, so
      // every rerankDepth slot goes to a matching vector — q_sim18's
      // measured law (post-filtering the unfiltered top-k collapses
      // recall toward the predicate's selectivity AND scores the full
      // candidate volume; the only post-filter fix, deepening k by
      // 1/selectivity, is pre-filter's volume paid later and larger).
      // One shared index serves every predicate.
      val (fCodes, fCorpus) = filter match {
        case Some(f) =>
          val ids = f.select(col("vec_id"))
          (codes.join(ids.withColumnRenamed("vec_id", "neighbor_id"),
            Seq("neighbor_id"), "left_semi"),
            corpus.join(ids, Seq("vec_id"), "left_semi"))
        case None => (codes, corpus)
      }
      onResult(batchId, gen,
        Similarity.queryInt8Index(batch, fCodes, grid, cents, fCorpus,
          k, rerankDepth, nProbe))
    }
  }

  /** [[int8ServingPipeline]]'s twin for the IVF-PQ generation store —
    * the composite serving tier (q_sim10's artifact) gains its streamed
    * read path: per query micro-batch, [[Similarity.queryIvfPqIndex]]
    * (coarse probe → ADC over the probed cells → exact float re-rank)
    * over the latest COMMITTED generation, with the small quantizer
    * tables (centroids + codebooks — nCentroids + m·ksub rows)
    * re-pinned only when a rebuild moves the generation marker. Codes
    * and the float re-rank log stay lazy per-batch reads of the
    * committed dir, so serving always sees a commit-consistent
    * (centroids, codebooks, codes) triple.
    */
  def ivfPqServingPipeline(spark: SparkSession, root: String,
      k: Int = 10, rerankDepth: Int = 50, nProbe: Int = 4,
      nCentroids: Int = 16, m: Int = 4, ksub: Int = 16, dim: Int = 64,
      onResult: (Long, Long, DataFrame) => Unit,
      filter: Option[DataFrame] = None): (DataFrame, Long) => Unit = {
    StoreManifest.check(spark, root,
      ivfPqStoreEntries(dim, m, ksub, nCentroids), "ivfpq store")
    var gen = -1L
    var cents: DataFrame = null
    var cb: DataFrame = null
    (batch: DataFrame, batchId: Long) => {
      val g = latestGen(spark, root)
      if (g != gen) {
        cents = pinLocal(spark.read.parquet(s"${genDir(root, g)}/centroids"))
        cb = pinLocal(spark.read.parquet(s"${genDir(root, g)}/codebooks"))
        gen = g
      }
      // Same cell-pruned scan as the int8 serve — this tier is where
      // ServingProbe measured the unpruned n·m-row scan dominating
      // (20 s/batch at n=500k); the `pcell=` filter makes the scan
      // itself O(n·m·nProbe/nCentroids).
      val codes = pruneCells(
        spark.read.parquet(s"${genDir(root, gen)}/codes"), "pcell",
        Similarity.probedCells(batch, cents, nProbe), nCentroids)
      val corpus = spark.read.parquet(s"$root/vectors").dropDuplicates("vec_id")
      // PRE-filtered serve — the int8 leg's q_sim18 rationale verbatim:
      // allowed ids drop non-matching candidates before the ADC rank.
      val (fCodes, fCorpus) = filter match {
        case Some(f) =>
          val ids = f.select(col("vec_id"))
          (codes.join(ids, Seq("vec_id"), "left_semi"),
            corpus.join(ids, Seq("vec_id"), "left_semi"))
        case None => (codes, corpus)
      }
      onResult(batchId, gen,
        Similarity.queryIvfPqIndex(batch, fCodes, cents, cb, fCorpus,
          k, rerankDepth, nProbe, m, dim))
    }
  }

  /** Create a PQ generation store: persist the MANIFEST, seed the
    * vector log, train generation-0 codebooks, encode, commit. Refuses
    * a root that already holds a committed generation ([[guardInit]]).
    */
  def initPqStore(spark: SparkSession, root: String, corpus: DataFrame,
      m: Int = 4, ksub: Int = 16, iters: Int = 2, trainN: Int = 1024,
      dim: Int = 64): Unit = {
    guardInit(spark, root, pqStoreEntries(dim, m, ksub), "pq store")
    corpus.select("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$root/vectors")
    val vecs = spark.read.parquet(s"$root/vectors")
    writePqGen(spark, root, 0L, vecs,
      Similarity.trainPqCodebooks(vecs, m, ksub, iters, trainN, dim,
        artifactKey = Some(Seq(root, 0L))), m, dim)
  }

  /** [[writeInt8Gen]]'s shape for PQ: codes are encoded on the WRITTEN
    * codebooks read back from parquet — training executes once, codes
    * ≡ committed codebooks by construction.
    */
  private def writePqGen(spark: SparkSession, root: String, gen: Long,
      vecs: DataFrame, codebooks: DataFrame, m: Int, dim: Int,
      commit: Boolean = true): Unit = {
    val d = genDir(root, gen)
    codebooks.write.mode("overwrite").parquet(s"$d/codebooks")
    Similarity.pqEncode(vecs, spark.read.parquet(s"$d/codebooks"), m, dim)
      .select("vec_id", "sub", "code")
      .write.mode("overwrite").parquet(s"$d/codes")
    if (commit) commitGen(spark, root, gen)
  }

  /** [[pqAppendPipeline]] WITH the retrain leg — [[int8RebuildingPipeline]]'s
    * shape for the PQ tier: codebooks + code-usage histogram are the
    * pinned generation state; a tripped tv_max rebuilds codebooks and
    * codes from the deduped vector log into generation N+1 and re-pins
    * the histogram, so post-rebuild batches of the (now indexed)
    * steady-state mix measure quiet. `async`/`rebuildGate`/
    * `onBuildError` are [[int8RebuildingPipeline]]'s off-path protocol:
    * snapshot → daemon build → staged build-window catch-up → commit →
    * re-pin, with the swap paying O(window) + one scan of the compact
    * code table, never the raw corpus.
    */
  def pqRebuildingPipeline(spark: SparkSession, root: String,
      sinkDir: String,
      m: Int = 4, ksub: Int = 16, iters: Int = 2, trainN: Int = 1024,
      dim: Int = 64, maxTv: Double = 0.2,
      onBatch: (Long, Row) => Unit = (_, _) => (),
      onRebuild: (Long, Long) => Unit = (_, _) => (),
      async: Boolean = false,
      rebuildGate: () => Unit = () => (),
      onBuildError: (Long, Throwable) => Unit = (_, e) => throw e)
      : (DataFrame, Long) => Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Construction-time gate — int8RebuildingPipeline's rationale for
    // the PQ shape (`dim`/`m`/`ksub`).
    StoreManifest.check(spark, root, pqStoreEntries(dim, m, ksub),
      "pq store")
    def pinHist(g: Long): (DataFrame, DataFrame, DataFrame) = {
      val codes = spark.read.parquet(s"${genDir(root, g)}/codes")
      // m·ksub + 1 rows — the bounded histogram pin
      // ([[pqAppendPipeline]]'s refreshByPath rationale).
      (pinLocal(spark.read.parquet(s"${genDir(root, g)}/codebooks")),
        pinLocal(codes.groupBy("sub", "code")
          .agg(count(lit(1)).as("n_idx"))),
        Seq(codes.agg(countDistinct("vec_id").cast("double"))
          .head().getDouble(0)).toDF("t_idx"))
    }
    // Generation state pinned once at construction —
    // [[int8RebuildingPipeline]]'s restart-safe posture.
    var gen = latestGen(spark, root)
    var (codebooks, hIdx, tIdx) = pinHist(gen)
    // Crash reaping at construction — int8RebuildingPipeline's
    // rationale: a committed-gen staging dir is a crash between commit
    // and staging delete; an uncommitted gen above the frontier is a
    // build that died before its commit point.
    deleteQuiet(spark, stagingDir(root, gen))
    GenStore.dropUncommittedAbove(spark, root, gen)
    val built = new java.util.concurrent.atomic.AtomicLong(-1L)
    val failed = new java.util.concurrent.atomic
      .AtomicReference[(Long, Long, Throwable)](null)
    var buildingGen = -1L
    (batch: DataFrame, batchId: Long) => {
      val n = batch.count()
      if (n > 0) {
        if (async) {
          val f = failed.getAndSet(null)
          if (f != null) {
            deleteQuiet(spark, genDir(root, f._2))
            buildingGen = -1L
            onBuildError(f._1, f._3)
          }
          // SWAP — [[int8RebuildingPipeline]]'s protocol: staged
          // catch-up encode on the new codebooks, commit, re-pin the
          // histogram over the full (snapshot + catch-up) code table.
          val g2 = built.get()
          if (g2 >= 0) {
            val sd = stagingDir(root, g2)
            val newCb =
              pinLocal(spark.read.parquet(s"${genDir(root, g2)}/codebooks"))
            // Anti-join the staged catch-up against the built snapshot's
            // codes — int8RebuildingPipeline's rationale: a vec_id
            // re-sent during the build window must not be encoded twice
            // in gen N+1 (async ≡ inline, which dedups the full log).
            if (GenStore.fs(spark, sd).exists(new Path(sd)))
              Similarity.pqEncode(
                  spark.read.parquet(sd).dropDuplicates("vec_id")
                    .join(spark.read
                        .parquet(s"${genDir(root, g2)}/codes")
                        .select("vec_id"),
                      Seq("vec_id"), "left_anti"),
                  newCb, m, dim)
                .select("vec_id", "sub", "code")
                .write.mode("append").parquet(s"${genDir(root, g2)}/codes")
            commitGen(spark, root, g2)
            deleteQuiet(spark, sd)
            gen = g2
            val swapped = pinHist(gen)
            codebooks = swapped._1; hIdx = swapped._2; tIdx = swapped._3
            built.set(-1L); buildingGen = -1L
            onRebuild(batchId, gen)
          }
        }
        val arrivals = batch.select(col("vec_id"), col("embedding"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          arrivals.write.mode("append").parquet(s"$root/vectors")
          if (async && buildingGen >= 0)
            arrivals.write.mode("append")
              .parquet(stagingDir(root, buildingGen))
          val encoded = Similarity.pqEncode(arrivals, codebooks, m, dim)
            .select("vec_id", "sub", "code")
            .persist(StorageLevel.MEMORY_AND_DISK)
          try {
            encoded.write.mode("append").parquet(s"${genDir(root, gen)}/codes")
            val d = Similarity.pqDriftFromCodes(encoded, hIdx, tIdx,
              codebooks, maxTv).head()
            val row = (batchId, n, d.getAs[Double]("tv_max"),
              d.getAs[Long]("retrain"), gen)
            onBatch(batchId, Row(row._1, row._2, row._3, row._4, row._5))
            Seq(row).toDF("batch_id", "n_rows", "tv_max", "retrain", "gen")
              .write.mode("append").parquet(sinkDir)
            if (row._4 == 1L && !async) {
              val vecs = spark.read.parquet(s"$root/vectors")
                .dropDuplicates("vec_id")
              writePqGen(spark, root, gen + 1, vecs,
                Similarity.trainPqCodebooks(vecs, m, ksub, iters, trainN, dim,
                  artifactKey = Some(Seq(root, gen + 1))),
                m, dim)
              gen += 1
              val swapped = pinHist(gen)
              codebooks = swapped._1; hIdx = swapped._2; tIdx = swapped._3
              onRebuild(batchId, gen)
            } else if (row._4 == 1L && buildingGen < 0) {
              // SUBMIT — int8RebuildingPipeline's off-path protocol.
              buildingGen = gen + 1
              val target = buildingGen
              deleteQuiet(spark, genDir(root, target))
              val snapshot = vectorSnapshot(spark, root)
              val t = new Thread(() => {
                try {
                  rebuildGate()
                  val vecs = spark.read.parquet(snapshot: _*)
                    .dropDuplicates("vec_id")
                  writePqGen(spark, root, target, vecs,
                    Similarity.trainPqCodebooks(vecs, m, ksub, iters,
                      trainN, dim, artifactKey = Some(Seq(root, target))),
                    m, dim, commit = false)
                  built.set(target)
                } catch {
                  case e: Throwable => failed.set((batchId, target, e))
                }
              }, s"graft-pq-rebuild-gen-$target")
              t.setDaemon(true)
              t.start()
            }
          } finally encoded.unpersist(blocking = false)
        } finally arrivals.unpersist(blocking = false)
      }
    }
  }

  /** Create an IVF-PQ generation store — the q_sim10 serving tier's
    * composite artifact under the [[GenStore]] protocol: persist the
    * MANIFEST (`dim`/`m`/`ksub`/`nCentroids` — the shape every later
    * pipeline construction is checked against), seed the vector log,
    * train generation-0 coarse centroids AND PQ codebooks, assign +
    * encode, commit. Refuses a root that already holds a committed
    * generation ([[guardInit]]). One `trainN` drives both trainers —
    * both sample by the same hash-top-N discipline.
    */
  def initIvfPqStore(spark: SparkSession, root: String, corpus: DataFrame,
      nCentroids: Int = 16, m: Int = 4, ksub: Int = 16,
      lloydIters: Int = 2, trainN: Int = 1024, seedPlanes: Int = 6,
      dim: Int = 64): Unit = {
    guardInit(spark, root, ivfPqStoreEntries(dim, m, ksub, nCentroids),
      "ivf-pq store")
    corpus.select("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$root/vectors")
    val vecs = spark.read.parquet(s"$root/vectors")
    writeIvfPqGen(spark, root, 0L, vecs,
      Similarity.trainCentroids(vecs, nCentroids, lloydIters, trainN,
        seedPlanes, dim, artifactKey = Some(Seq(root, 0L))),
      Similarity.trainPqCodebooks(vecs, m, ksub, lloydIters, trainN, dim,
        artifactKey = Some(Seq(root, 0L))),
      m, dim)
  }

  /** [[writeInt8Gen]]'s shape for the composite tier: centroids and
    * codebooks are written first, the (vec_id, sub, code, cell) codes
    * are produced on the WRITTEN quantizers read back from parquet —
    * each training plan executes exactly once (its own write), and
    * codes ≡ committed quantizers holds by construction. The cell join
    * is inner on vec_id, so zero-norm vectors (which
    * [[Similarity.ivfCellAssign]] drops) never enter the artifact —
    * the same exclusion the append path applies.
    */
  private def writeIvfPqGen(spark: SparkSession, root: String, gen: Long,
      vecs: DataFrame, cents: DataFrame, codebooks: DataFrame, m: Int,
      dim: Int, commit: Boolean = true): Unit = {
    val d = genDir(root, gen)
    cents.write.mode("overwrite").parquet(s"$d/centroids")
    codebooks.write.mode("overwrite").parquet(s"$d/codebooks")
    writeCellPartitioned(
      Similarity.pqEncode(vecs, spark.read.parquet(s"$d/codebooks"), m, dim)
        .select("vec_id", "sub", "code")
        .join(Similarity.ivfCellAssign(vecs,
          spark.read.parquet(s"$d/centroids")), "vec_id"),
      "cell", "pcell", s"$d/codes", "overwrite", compact = true)
    if (commit) commitGen(spark, root, gen)
  }

  /** [[ivfPqAppendPipeline]] WITH the retrain leg — the serving tier's
    * drift signal finally has its actuator ([[int8RebuildingPipeline]]'s
    * protocol on the composite artifact): per batch, log the raw
    * arrivals, assign coarse cells + PQ-encode on the CURRENT
    * generation's pinned quantizer pair, append the (vec_id, sub, code,
    * cell) rows, emit the (batch_id, n_rows, tv_cell, retrain, gen)
    * drift row — and when tv_cell trips, rebuild generation N+1 from
    * the deduped vector log (retrain centroids AND codebooks, re-assign
    * + re-encode, commit) and re-pin quantizers + cell histogram, so
    * post-rebuild batches of the now-indexed mix measure quiet.
    *
    * `async`/`rebuildGate`/`onBuildError` are the off-path protocol:
    * the trip SUBMITS a daemon build over a frozen file-list snapshot
    * while batches keep appending to gen N and parking raw arrivals in
    * `gen-(N+1)/pending-vectors`; the first batch after the build
    * finishes swaps — catch-up assign+encode of the staged window
    * (anti-joined against the built snapshot's vec_ids, so a replayed
    * vec_id encodes once: async ≡ inline, which dedups the full log),
    * COMMITTED marker (the atomic point), re-pin, staging reaped. This
    * tier's rebuild is the most expensive of the three (two trainings +
    * two corpus passes), which is exactly why it must be off-path at
    * 100 TB: the swap pays O(build-window) + one scan of the compact
    * code table, never the raw corpus.
    */
  def ivfPqRebuildingPipeline(spark: SparkSession, root: String,
      sinkDir: String,
      nCentroids: Int = 16, m: Int = 4, ksub: Int = 16,
      lloydIters: Int = 2, trainN: Int = 1024, seedPlanes: Int = 6,
      dim: Int = 64, maxTv: Double = 0.2,
      onBatch: (Long, Row) => Unit = (_, _) => (),
      onRebuild: (Long, Long) => Unit = (_, _) => (),
      async: Boolean = false,
      rebuildGate: () => Unit = () => (),
      onBuildError: (Long, Throwable) => Unit = (_, e) => throw e)
      : (DataFrame, Long) => Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    StoreManifest.check(spark, root,
      ivfPqStoreEntries(dim, m, ksub, nCentroids), "ivf-pq store")
    // Generation state: BOTH quantizer tables plus the cell-usage
    // histogram, pinned local at construction and re-pinned only on
    // swap ([[int8RebuildingPipeline]]'s restart-safe posture; the
    // histogram is ≤ nCentroids + 1 rows, the refreshByPath rationale).
    def pinState(g: Long): (DataFrame, DataFrame, DataFrame, Double) = {
      val codes = spark.read.parquet(s"${genDir(root, g)}/codes")
      (pinLocal(spark.read.parquet(s"${genDir(root, g)}/centroids")),
        pinLocal(spark.read.parquet(s"${genDir(root, g)}/codebooks")),
        pinLocal(codes.select("vec_id", "cell").distinct()
          .groupBy("cell").agg(count(lit(1)).as("n_idx"))),
        codes.agg(countDistinct("vec_id").cast("double"))
          .head().getDouble(0))
    }
    var gen = latestGen(spark, root)
    var (cents, codebooks, hIdx, tIdx) = pinState(gen)
    deleteQuiet(spark, stagingDir(root, gen))
    GenStore.dropUncommittedAbove(spark, root, gen)
    val built = new java.util.concurrent.atomic.AtomicLong(-1L)
    val failed = new java.util.concurrent.atomic
      .AtomicReference[(Long, Long, Throwable)](null)
    var buildingGen = -1L
    // The batch's composite encode — shared by the append path and the
    // swap's catch-up: PQ codes joined with the coarse assignment, both
    // on the GIVEN (pinned) quantizers.
    def assignEncode(rows: DataFrame, cn: DataFrame,
        cb: DataFrame): DataFrame =
      Similarity.pqEncode(rows, cb, m, dim)
        .select("vec_id", "sub", "code")
        .join(Similarity.ivfCellAssign(rows, cn), "vec_id")
    (batch: DataFrame, batchId: Long) => {
      val n = batch.count()
      if (n > 0) {
        if (async) {
          val f = failed.getAndSet(null)
          if (f != null) {
            deleteQuiet(spark, genDir(root, f._2))
            buildingGen = -1L
            onBuildError(f._1, f._3)
          }
          // SWAP — the off-path protocol's commit point on this tier.
          val g2 = built.get()
          if (g2 >= 0) {
            val sd = stagingDir(root, g2)
            val newCents =
              pinLocal(spark.read.parquet(s"${genDir(root, g2)}/centroids"))
            val newCb =
              pinLocal(spark.read.parquet(s"${genDir(root, g2)}/codebooks"))
            if (GenStore.fs(spark, sd).exists(new Path(sd))) {
              // Anti-join against the built snapshot's vec_ids
              // ([[int8RebuildingPipeline]]'s rationale): a vec_id
              // re-sent during the build window encodes exactly once.
              val fresh = spark.read.parquet(sd).dropDuplicates("vec_id")
                .join(spark.read.parquet(s"${genDir(root, g2)}/codes")
                    .select("vec_id"),
                  Seq("vec_id"), "left_anti")
              writeCellPartitioned(assignEncode(fresh, newCents, newCb),
                "cell", "pcell", s"${genDir(root, g2)}/codes", "append")
            }
            commitGen(spark, root, g2)
            deleteQuiet(spark, sd)
            gen = g2
            val swapped = pinState(gen)
            cents = swapped._1; codebooks = swapped._2
            hIdx = swapped._3; tIdx = swapped._4
            built.set(-1L); buildingGen = -1L
            onRebuild(batchId, gen)
          }
        }
        val arrivals = batch.select(col("vec_id"), col("embedding"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          arrivals.write.mode("append").parquet(s"$root/vectors")
          if (async && buildingGen >= 0)
            arrivals.write.mode("append")
              .parquet(stagingDir(root, buildingGen))
          val cells = Similarity.ivfCellAssign(arrivals, cents)
            .persist(StorageLevel.MEMORY_AND_DISK)
          try {
            writeCellPartitioned(
              Similarity.pqEncode(arrivals, codebooks, m, dim)
                .select("vec_id", "sub", "code")
                .join(cells, "vec_id"),
              "cell", "pcell", s"${genDir(root, gen)}/codes", "append")
            val tv = cellTv(cells, hIdx, tIdx)
            val row = (batchId, n, tv, if (tv > maxTv) 1L else 0L, gen)
            onBatch(batchId, Row(row._1, row._2, row._3, row._4, row._5))
            Seq(row).toDF("batch_id", "n_rows", "tv_cell", "retrain", "gen")
              .write.mode("append").parquet(sinkDir)
            if (row._4 == 1L && !async) {
              // INLINE REBUILD: both trainings over the deduped log,
              // re-assign + re-encode into gen N+1, commit, re-pin —
              // training plans execute once via [[writeIvfPqGen]]'s
              // written-quantizer read-back.
              val vecs = spark.read.parquet(s"$root/vectors")
                .dropDuplicates("vec_id")
              writeIvfPqGen(spark, root, gen + 1, vecs,
                Similarity.trainCentroids(vecs, nCentroids, lloydIters,
                  trainN, seedPlanes, dim,
                  artifactKey = Some(Seq(root, gen + 1))),
                Similarity.trainPqCodebooks(vecs, m, ksub, lloydIters,
                  trainN, dim, artifactKey = Some(Seq(root, gen + 1))),
                m, dim)
              gen += 1
              val swapped = pinState(gen)
              cents = swapped._1; codebooks = swapped._2
              hIdx = swapped._3; tIdx = swapped._4
              onRebuild(batchId, gen)
            } else if (row._4 == 1L && buildingGen < 0) {
              // SUBMIT — the off-path protocol, verbatim.
              buildingGen = gen + 1
              val target = buildingGen
              deleteQuiet(spark, genDir(root, target))
              val snapshot = vectorSnapshot(spark, root)
              val t = new Thread(() => {
                try {
                  rebuildGate()
                  val vecs = spark.read.parquet(snapshot: _*)
                    .dropDuplicates("vec_id")
                  writeIvfPqGen(spark, root, target, vecs,
                    Similarity.trainCentroids(vecs, nCentroids, lloydIters,
                      trainN, seedPlanes, dim,
                      artifactKey = Some(Seq(root, target))),
                    Similarity.trainPqCodebooks(vecs, m, ksub, lloydIters,
                      trainN, dim, artifactKey = Some(Seq(root, target))),
                    m, dim, commit = false)
                  built.set(target)
                } catch {
                  case e: Throwable => failed.set((batchId, target, e))
                }
              }, s"graft-ivfpq-rebuild-gen-$target")
              t.setDaemon(true)
              t.start()
            }
          } finally cells.unpersist(blocking = false)
        } finally arrivals.unpersist(blocking = false)
      }
    }
  }
}
