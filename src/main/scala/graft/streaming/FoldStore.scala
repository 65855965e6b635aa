package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch-partition folding for the APPEND-ONLY output stores
  * ([[StreamingDedup]]'s survivors, [[PackingStream]]'s window
  * partials): each micro-batch writes its rows into its own
  * `live/batch_id=N` partition (dynamic partition overwrite — the
  * exactly-once replay contract: a replayed batch REWRITES its own
  * partition with identical rows), and every `foldEvery` CLOSED batch
  * partitions are rewritten into one committed SEGMENT generation so
  * the directory count stays O(batches/foldEvery), not O(batches) —
  * the same small-files disease [[GenStore]] cures in the signature
  * index, adapted to a store whose history is output, not state.
  *
  * Why SEGMENTS instead of the index's cumulative rewrite: the index
  * is bounded state (rewriting all of it per compaction is amortized
  * O(index/trigger)), but an output store grows with the corpus — a
  * cumulative rewrite would re-copy the ENTIRE history every trigger,
  * O(corpus) per fold at 100 TB. A fold here touches only the
  * `foldEvery` closed partitions since the last fold, so the write
  * amplification is exactly 2× (each row lands once live, once in its
  * segment) no matter how long the stream runs. Segments accumulate —
  * [[GenStore.dropBelow]] is deliberately NOT called — and the reader
  * unions all committed segments with the still-live tail.
  *
  * Crash protocol (single-writer, foreachBatch): a fold writes the
  * closed rows under `gen-S/data`, records the highest folded batch id
  * in `gen-S/WATERMARK`, commits the [[GenStore]] marker LAST, and only
  * then deletes the folded live partitions. A crash before the marker
  * leaves an ignorable orphan the next fold overwrites; a crash after
  * the marker but before the deletes leaves folded rows ALSO live —
  * harmless, because the reader filters live partitions to
  * `batch_id >` the newest committed watermark, and the stranded
  * partitions are reaped at the next fold attempt. Only a batch id
  * ABOVE every watermark can ever replay (folds cover ids strictly
  * below the in-flight batch, and foreachBatch replays only the newest
  * batch), so a replay's partition overwrite always lands live, never
  * under a sealed segment.
  */
private[streaming] object FoldStore {

  def liveDir(root: String): String = s"$root/live"

  private def dataDir(root: String, gen: Long): String =
    s"${GenStore.dir(root, gen)}/data"

  private def watermarkPath(root: String, gen: Long): Path =
    new Path(s"${GenStore.dir(root, gen)}/WATERMARK")

  /** The batch's rows → its own `live/batch_id=N` partition, dynamic
    * overwrite scoped to this write (replay rewrites, never appends).
    */
  def writeLive(df: DataFrame, root: String, batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(liveDir(root))

  /** Live `batch_id=N` partition ids present on disk. */
  private def livePartitions(spark: SparkSession, root: String): Seq[Long] = {
    val hfs = GenStore.fs(spark, root)
    val dir = new Path(liveDir(root))
    if (!hfs.exists(dir)) Seq.empty
    else hfs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName.stripPrefix("batch_id=").toLong)
      .sorted
  }

  /** Highest folded batch id across committed segments: every live
    * partition at or below it is already sealed in a segment (and is
    * either deleted or awaiting reap). -1 on a store with no segments.
    */
  def maxWatermark(spark: SparkSession, root: String): Long =
    GenStore.committed(spark, root).lastOption.map { g =>
      val hfs = GenStore.fs(spark, root)
      val in = hfs.open(watermarkPath(root, g))
      try scala.io.Source.fromInputStream(in, StandardCharsets.UTF_8.name())
        .mkString.trim.toLong
      finally in.close()
    }.getOrElse(-1L)

  /** The full store: every committed segment plus the live tail ABOVE
    * the newest watermark (live rows at or below it are the
    * crash-window duplicates of sealed rows — filtered, then reaped by
    * the next fold). Explicit schema: a fresh store reads as empty,
    * never as a schema-inference failure.
    */
  def read(spark: SparkSession, root: String, schema: StructType): DataFrame = {
    val hfs = GenStore.fs(spark, root)
    val wm = maxWatermark(spark, root)
    val live0 =
      if (hfs.exists(new Path(liveDir(root))))
        spark.read.schema(schema).parquet(liveDir(root))
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val live = if (wm < 0) live0 else live0.where(col("batch_id") > wm)
    val segs = GenStore.committed(spark, root)
      .map(g => spark.read.schema(schema).parquet(dataDir(root, g)))
    (live +: segs).reduce(_.unionByName(_))
  }

  /** Fold the closed live partitions (ids strictly below
    * `currentBatchId`, above the previous watermark) into segment
    * generation S+1 once at least `foldEvery` of them have accrued;
    * also reaps live partitions a crashed previous fold left at or
    * below the committed watermark. `segmentFiles` clusters each
    * segment's rows (one fold touches `foldEvery` batches of data, so
    * a single file is right at test scale; a 100 TB deployment sizes
    * it to its batch volume).
    */
  def maybeFold(spark: SparkSession, root: String, currentBatchId: Long,
      foldEvery: Int, schema: StructType, segmentFiles: Int = 1): Unit = {
    require(foldEvery >= 1, s"foldEvery must be >= 1, got $foldEvery")
    val hfs = GenStore.fs(spark, root)
    val wm = maxWatermark(spark, root)
    val (stale, open) = livePartitions(spark, root).partition(_ <= wm)
    // Reap the crash window: live partitions already sealed in a
    // committed segment (died between commit and delete).
    stale.foreach(b =>
      hfs.delete(new Path(s"${liveDir(root)}/batch_id=$b"), true))
    val closed = open.filter(_ < currentBatchId)
    if (closed.size >= foldEvery) {
      val newWm = closed.max
      val nextGen = GenStore.committed(spark, root).lastOption
        .map(_ + 1).getOrElse(0L)
      spark.read.schema(schema).parquet(liveDir(root))
        .where(col("batch_id") > wm && col("batch_id") <= newWm)
        .coalesce(segmentFiles)
        .write.mode("overwrite").parquet(dataDir(root, nextGen))
      val out = hfs.create(watermarkPath(root, nextGen), true)
      try out.write(newWm.toString.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      GenStore.commit(spark, root, nextGen)
      closed.foreach(b =>
        hfs.delete(new Path(s"${liveDir(root)}/batch_id=$b"), true))
    }
  }
}
