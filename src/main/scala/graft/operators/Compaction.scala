package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Small-file compaction — the reference's Lambda/DynamoDB/Athena-CTAS
  * trio (SURVEY.md §2.3 CMP-1..9, sensor-log-compactor.py) collapsed into
  * synchronous Spark control flow:
  *
  *  - CMP-1/2/8: the DynamoDB counter item {ID: "Counter", TotalCount}
  *    with atomic increment / consistent read / reset
  *    (sensor-log-compactor.py:38-67, 142-155) → [[CounterState]];
  *  - CMP-3: CTAS `SELECT {columns}` dynamic projection
  *    (sensor-log-compactor.py:82-84) → `selectExpr(columns)`;
  *  - CMP-4/SNK-3: `bucketed_by=['timestamp'], bucket_count=1` + GZIP
  *    (sensor-log-compactor.py:28-36) → `coalesce(1)` + gzip JSON write —
  *    `coalesce(1)` ONLY here, where single-file output is the declared
  *    semantic; never globally (SURVEY.md §4.2);
  *  - CMP-5/6: CTAS execute + DROP tmp table → a synchronous write (no
  *    polling, no tmp table — and the reference's async-delete race,
  *    SURVEY.md §3.2 step 4, disappears);
  *  - CMP-7: source-prefix truncate (sensor-log-compactor.py:125-139) →
  *    Hadoop FS recursive delete AFTER the write commits;
  *  - CMP-9: the if-threshold-else-increment handler
  *    (sensor-log-compactor.py:157-173) → [[onFileArrived]].
  *
  * Threshold is 100 (code `> 99`, sensor-log-compactor.py:67; the
  * comment-vs-code drift is resolved in SURVEY.md §2.3).
  *
  * Scale: at 100 TB this runs per partition-prefix (e.g. per hour
  * directory) with the counter keyed by prefix; the write is one
  * sequential pass, and `coalesce(1)` applies to a single prefix's batch
  * (~100 small files), never the whole table.
  */
object Compaction {

  val DefaultThreshold = 100

  /** The DynamoDB counter analog: keyed, atomic. */
  final class CounterState {
    private val n = new AtomicLong(0L)
    def increment(): Long = n.incrementAndGet() // CMP-1
    def get: Long = n.get()                     // CMP-2 consistent read
    def reset(): Unit = n.set(0L)               // CMP-8
  }

  /** Result of one handler invocation. */
  case class CompactionResult(triggered: Boolean, filesSeen: Long, outputDir: Option[String])

  /** CMP-9: per-file-arrival handler. Call once per landed file (the S3
    * event trigger analog); at `threshold` runs [[compactDirectory]] and
    * resets the counter.
    */
  def onFileArrived(spark: SparkSession, state: CounterState, logsDir: String,
      outBase: String, schema: StructType, columns: Seq[String] = Seq("*"),
      threshold: Int = DefaultThreshold, batchTag: String = ""): CompactionResult =
    // Serialized per counter (the S3-event analog fires concurrently):
    // without this, two arrivals past the threshold would both run
    // compaction, and a file landing mid-compaction could be deleted
    // without ever being compacted.
    state.synchronized {
      val seen = state.increment()
      if (seen >= threshold) { // CMP-2: the `> 99` gate
        val out = compactDirectory(spark, logsDir, outBase, schema, columns, batchTag)
        state.reset() // CMP-8
        CompactionResult(triggered = true, filesSeen = seen, outputDir = Some(out))
      } else CompactionResult(triggered = false, filesSeen = seen, outputDir = None)
    }

  /** CMP-3..7: read the small-file prefix with the declared schema, apply
    * the dynamic projection, write ONE gzip JSON file to a
    * timestamp-suffixed output dir (the `{table}_{yyyyMMddHHmm}` naming,
    * sensor-log-compactor.py:76), then truncate the source prefix.
    */
  def compactDirectory(spark: SparkSession, logsDir: String, outBase: String,
      schema: StructType, columns: Seq[String] = Seq("*"),
      batchTag: String = ""): String = {
    val tag = if (batchTag.nonEmpty) batchTag
      else java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS")
        .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
    val outDir = s"$outBase/compacted_$tag"
    // Snapshot the input file list ONCE: read exactly these files and
    // delete exactly these files — a file landing mid-compaction is
    // neither half-read nor deleted-uncompacted (it stays for the next
    // batch). This closes the reference's async CTAS-vs-delete race
    // (SURVEY.md §3.2 step 4) under concurrent arrivals too.
    val fs = new Path(logsDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snapshot = fs.listStatus(new Path(logsDir)).filter(_.isFile).map(_.getPath)
    spark.read.schema(schema)               // SRC-6: schema-on-read, declared
      .json(snapshot.map(_.toString).toIndexedSeq: _*)
      .selectExpr(columns: _*)              // CMP-3
      .coalesce(1)                          // CMP-4: bucket_count=1 semantic
      .write.mode("overwrite")
      .option("compression", "gzip")        // SNK-3
      .json(outDir)
    // CMP-7 — safe ordering: delete inputs only after the write committed.
    snapshot.foreach(p => fs.delete(p, false))
    outDir
  }

  /** Layout-FIXING compaction — the extension-tier OPTIMIZE verb
    * (Delta `OPTIMIZE ... ZORDER BY`'s shape on plain parquet): fold a
    * parquet prefix's accumulated small files into `nFiles` files laid
    * out z-ordered on (`aCol`, `bCol`) ([[Layout.zOrderWrite]]), so one
    * maintenance pass fixes BOTH small-file overhead and scan-pruning
    * layout — at 100 TB these are the same nightly job, not two.
    * [[compactDirectory]]'s snapshot discipline carries over verbatim:
    * the input file list is taken ONCE, exactly those files are read
    * and (only after the write commits) deleted, so a file landing
    * mid-compaction is neither half-read nor deleted-uncompacted — it
    * waits for the next run. Returns the number of files folded.
    */
  def zOrderCompactParquet(spark: SparkSession, srcDir: String,
      outDir: String, aCol: String, bCol: String, nFiles: Int,
      bits: Int = 16): Int = {
    val fs = new Path(srcDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val snapshot = fs.listStatus(new Path(srcDir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
    if (snapshot.nonEmpty) {
      val df = spark.read.parquet(snapshot.map(_.toString).toIndexedSeq: _*)
      Layout.zOrderWrite(df, aCol, bCol, outDir, nFiles, bits)
      snapshot.foreach(p => fs.delete(p, false))
    }
    snapshot.length
  }

  /** Streaming LAYOUT-fixing form: `foreachBatch` sink that lands each
    * micro-batch as parquet small files in `stagingDir` (the SNK-1
    * buffered delivery) and, once `threshold` files have accumulated
    * (the reference's 100-file trigger, CMP-2), folds the staged
    * snapshot z-ordered on (`aCol`, `bCol`) into
    * `outBase/zorder_batch<id>` ([[zOrderCompactParquet]]) — the same
    * maintenance pass that fixes small-file overhead now also fixes
    * scan-pruning layout (REL-30's locality law) as the stream runs,
    * instead of waiting for a nightly job. Each fold is its own
    * z-ordered file set over ONE trigger-window's rows; cross-fold
    * ordering is not maintained (row-group stats prune within every
    * fold independently — at 100 TB the folds are the hour/day
    * partitions a reader prunes first anyway, and the periodic
    * [[zOrderRetighten]] pass restores global disjointness). The
    * snapshot discipline is inherited verbatim: a file
    * landing mid-fold is neither half-read nor deleted-uncompacted —
    * it stays staged for the next trigger.
    */
  def zOrderStreamingBatch(state: CounterState, stagingDir: String,
      outBase: String, aCol: String, bCol: String, nFiles: Int,
      threshold: Int = DefaultThreshold, bits: Int = 16)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    batch.write.mode("append").parquet(stagingDir) // SNK-1: small files
    val fs = new Path(stagingDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nStaged = fs.listStatus(new Path(stagingDir))
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    // Catch the counter up to the visible file count (idempotent on
    // replayed batch ids: counting files, not invocations).
    while (state.get < nStaged && state.get < threshold) state.increment()
    if (state.get >= threshold) {
      zOrderCompactParquet(spark, stagingDir,
        s"$outBase/zorder_batch$batchId", aCol, bCol, nFiles, bits)
      state.reset()
    }
  }

  /** The periodic RE-TIGHTEN pass over [[zOrderStreamingBatch]]'s
    * accumulated folds: snapshot every `zorder_batch*` fold dir under
    * `outBase`, re-lay ALL their rows as ONE z-ordered file set (a new
    * `zorder_retight_<tag>` dir), and delete exactly the snapshotted
    * fold dirs after the write commits — the nightly job that restores
    * global cross-fold disjointness the incremental trigger cannot
    * maintain. A fold landing mid-pass is untouched (directory
    * snapshot, same discipline as the file-level verbs); the retight
    * output is itself re-tightenable (matched by the same prefix), so
    * the pass composes. Returns the folds absorbed.
    */
  def zOrderRetighten(spark: SparkSession, outBase: String, aCol: String,
      bCol: String, nFiles: Int, bits: Int = 16, batchTag: String = "")
      : Int = {
    val fs = new Path(outBase).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val folds = fs.listStatus(new Path(outBase))
      .filter(st => st.isDirectory &&
        (st.getPath.getName.startsWith("zorder_batch") ||
          st.getPath.getName.startsWith("zorder_retight")))
      .map(_.getPath)
    if (folds.length > 1) {
      val tag = if (batchTag.nonEmpty) batchTag
        else java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS")
          .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
      val df = spark.read.parquet(folds.map(_.toString).toIndexedSeq: _*)
      Layout.zOrderWrite(df, aCol, bCol, s"$outBase/zorder_retight_$tag",
        nFiles, bits)
      folds.foreach(p => fs.delete(p, true))
    }
    if (folds.length > 1) folds.length else 0
  }

  /** Streaming form: `foreachBatch` sink that lands each micro-batch as
    * JSON files in `logsDir` (the Firehose buffered delivery, SNK-1) and
    * invokes the per-file handler — micro-batch by size/time (STR-4).
    */
  def streamingCompactorBatch(state: CounterState, logsDir: String, outBase: String,
      schema: StructType, threshold: Int = DefaultThreshold)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    batch.write.mode("append").json(logsDir) // SNK-1: buffered small files
    val fs = new Path(logsDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nFiles = fs.listStatus(new Path(logsDir))
      .count(st => st.isFile && st.getPath.getName.endsWith(".json"))
    // Catch the counter up to the visible file count (idempotent on
    // replayed batch ids: counting files, not invocations).
    while (state.get < nFiles && state.get < threshold) state.increment()
    if (state.get >= threshold) {
      compactDirectory(spark, logsDir, outBase, schema, batchTag = s"batch$batchId")
      state.reset()
    }
  }
}
