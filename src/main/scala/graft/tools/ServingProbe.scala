package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.IndexMaintenance

/** Decade-scaling probe for the streamed SERVING legs
  * (IndexMaintenance.int8ServingPipeline / ivfPqServingPipeline —
  * SCALE.md evidence): as the stored corpus grows 5k → 50k → 500k
  * vectors with the query batch FIXED at 64, per-batch serve cost must
  * follow the PROBED fraction, not the corpus.
  *
  * The centroid count follows the engine's own √n rule
  * ([[graft.operators.Similarity.autoCentroids]]) per decade, so at
  * fixed nProbe the candidate rows a query batch touches grow as
  * nProbe·n/√n = nProbe·√n — each ×10 corpus decade should cost the
  * serve ~√10 ≈ 3.2×, not 10×. The float re-rank is a
  * rerankDepth·|queries| residue regardless of n (its only corpus-size
  * term is the column-pruned scan feeding the id join).
  *
  * Measured per decade and tier, fresh store each:
  *  - `t_first`: the first served batch — includes the generation pin
  *    (grid/centroids/codebooks collect) and plan warmup, the
  *    worst-case batch a real stream pays once per swap.
  *  - `t_steady`: min of 3 subsequent identical batches — the
  *    steady-state per-batch serve cost the table's scaling claim is
  *    about.
  *
  * Diagnostic main, not an operator: `runMain graft.tools.ServingProbe`.
  */
object ServingProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f
      (System.nanoTime() - t0) / 1e9
    }
    // Two regimes per decade: BULK (batch 64 — a random batch probes
    // most cells, the conditional prune skips itself) and LATENCY
    // (batch 4 — the probed union is a small cell fraction, partition
    // pruning skips most of the scan).
    val batches = Seq(64, 4)
    for (n <- Seq(5000, 50000, 500000)) {
      val nc = graft.operators.Similarity.autoCentroids(n)
      val corpus = AsyncSwapProbe.synthVecs(spark, 0 until n, shifted = false)
      val rootI = Files.createTempDirectory(s"graft-serveprobe-i8-$n").toString
      val rootP = Files.createTempDirectory(s"graft-serveprobe-pq-$n").toString
      val tiers: Seq[(String, String => Unit,
          ((Long, Long, DataFrame) => Unit) => (DataFrame, Long) => Unit)] =
        Seq(
          ("int8",
            _ => IndexMaintenance.initInt8Store(spark, rootI, corpus,
              nCentroids = nc, lloydIters = 2, trainN = 4096, seedPlanes = 6,
              dim = 32),
            onRes => IndexMaintenance.int8ServingPipeline(spark, rootI,
              k = 10, rerankDepth = 30, nProbe = 8, nCentroids = nc, dim = 32,
              onResult = onRes)),
          ("ivfpq",
            _ => IndexMaintenance.initIvfPqStore(spark, rootP, corpus,
              nCentroids = nc, m = 4, ksub = 16, lloydIters = 2, trainN = 1024,
              seedPlanes = 6, dim = 32),
            onRes => IndexMaintenance.ivfPqServingPipeline(spark, rootP,
              k = 10, rerankDepth = 30, nProbe = 8, nCentroids = nc,
              m = 4, ksub = 16, dim = 32, onResult = onRes)))
      for ((tier, init, mkServe) <- tiers) {
        val tInit = time(init(""))
        var rows = -1L
        val serve = mkServe((_, _, df) => rows = df.count())
        for (batch <- batches) {
          val queries = AsyncSwapProbe
            .synthVecs(spark, 1000000 until (1000000 + batch), shifted = false)
          val tFirst = time(serve(queries, 0L))
          require(rows > 0, s"$tier n=$n: serve returned no rows")
          val tSteady = (1 to 3).map(b => time(serve(queries, b.toLong))).min
          println(f"[serve-probe] tier=$tier%-5s n=$n%7d nc=$nc%4d batch=$batch%2d " +
            f"t_init=$tInit%7.2f t_first=$tFirst%6.2f t_steady=$tSteady%6.2f")
        }
        // FILE-SIZE leg (round 14, largest decade only): init now writes
        // the code table compacted (one file per cell); rewrite it
        // SCATTERED (8 writer tasks per cell — the pre-compaction
        // layout) and re-measure the bulk serve, so "per-file overhead
        // dominates the bulk regime at probe-scale file sizes" is a
        // measurement of the LAYOUT axis, not arithmetic. Bulk batch
        // re-measured on each layout; file count/bytes printed per
        // point.
        if (n == 500000) {
          val root = if (tier == "int8") rootI else rootP
          val codesDir = s"$root/gen-0/codes"
          def hfs(p: String) = new org.apache.hadoop.fs.Path(p)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          def fileStats(): (Long, Long) = {
            val fs = hfs(codesDir)
            val it = fs.listFiles(new org.apache.hadoop.fs.Path(codesDir), true)
            var (cnt, bytes) = (0L, 0L)
            while (it.hasNext) {
              val f = it.next()
              if (f.getPath.getName.endsWith(".parquet")) {
                cnt += 1; bytes += f.getLen
              }
            }
            (cnt, bytes)
          }
          def bulkSteady(): Double = {
            val queries = AsyncSwapProbe
              .synthVecs(spark, 1000000 until 1000064, shifted = false)
            serve(queries, 10L) // warm re-pin after any layout change
            (1 to 3).map(b => time(serve(queries, 20L + b))).min
          }
          val (cCnt, cBytes) = fileStats()
          val tCompact = bulkSteady()
          val partCol = if (tier == "int8") "pcid" else "pcell"
          val scattered = s"$codesDir-scattered"
          spark.read.parquet(codesDir).repartition(8)
            .write.partitionBy(partCol).mode("overwrite").parquet(scattered)
          val fs = hfs(codesDir)
          val (cp, sp) = (new org.apache.hadoop.fs.Path(codesDir),
            new org.apache.hadoop.fs.Path(scattered))
          require(fs.delete(cp, true) && fs.rename(sp, cp),
            s"scatter swap failed for $codesDir")
          val (sCnt, sBytes) = fileStats()
          val tScatter = bulkSteady()
          println(f"[serve-probe-layout] tier=$tier%-5s n=$n%7d batch=64 " +
            f"compact: files=$cCnt%5d kb/file=${cBytes / math.max(cCnt, 1) / 1024}%5d t=$tCompact%6.2f | " +
            f"scattered: files=$sCnt%5d kb/file=${sBytes / math.max(sCnt, 1) / 1024}%5d t=$tScatter%6.2f")
        }
      }
    }
    spark.stop()
  }
}
