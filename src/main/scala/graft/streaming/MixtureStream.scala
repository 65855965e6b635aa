package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.functions.{TextFunctions => TF}

/** Domain-balanced mixture construction as a STREAM — q_ml13's greedy
  * per-domain token budget applied to documents as they arrive, the
  * [[CurationStream]] calibration posture: the per-domain share is
  * PINNED at construction (a corpus aggregate from a reference
  * snapshot — [[graft.analytics.ExtensionQueries.mixtureConstruction]]'s
  * budget row — refreshed on recalibration, never recomputed per
  * batch), and the only cross-batch state is one running token total
  * per domain.
  *
  * Selection law: the batch form charges EVERY document of a domain's
  * ordered prefix against the share — once the running total passes the
  * share the domain is closed, later documents are dropped but still
  * counted. That predicate depends only on the prefix total, so it is
  * prefix-local: given the carried per-domain totals, each batch
  * decides its own documents exactly as one big batch would — stream ≡
  * batch greedy prefix under id-ordered arrival (the monotonic-id
  * ingest property; [[PackingStream]]'s law), with the stream selecting
  * in ARRIVAL order where the batch audit orders by hash.
  *
  * State/replay posture (the [[PackingStream]] offset protocol, one row
  * per domain instead of one): survivors land in per-batch live
  * partitions via dynamic partition overwrite (a replayed batch
  * rewrites identical rows, never duplicates), and the domain totals
  * are an append-only (batch_id, source, before, after) log under a
  * [[GenStore]] generation — a replayed batch resolves its OWN row's
  * `before`, reproducing the original selection; compaction keeps the
  * newest row per domain. State is O(domains) — the histogram-pin size
  * class, never corpus-sized.
  */
object MixtureStream {

  private val stateSchema = StructType(Seq(
    StructField("batch_id", LongType), StructField("source", StringType),
    StructField("before_toks", LongType), StructField("after_toks", LongType)))
  val survivorsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("n_tok", LongType), StructField("batch_id", LongType)))

  private def genDir(root: String, gen: Long) = GenStore.dir(root, gen)

  /** One foreachBatch over (doc_id, source, text) arrivals: charge each
    * document against its domain's carried total in in-batch doc_id
    * order, keep those that fit the pinned `sharePerDomain`, advance
    * the per-domain state. `tokenCount` is the pluggable meter
    * ([[graft.operators.Packing]]'s parameter — whitespace by default,
    * [[graft.functions.Subword.textCount]] for a trained vocabulary).
    * `onBatch(batchId, nArrived, nKept)` is the monitor hook.
    */
  def mixturePipeline(survivorsDir: String, stateDir: String,
      sharePerDomain: Long, compactEvery: Int = 64, foldEvery: Int = 64,
      tokenCount: Column => Column = TF.tokenCount,
      onBatch: (Long, Long, Long) => Unit = (_, _, _) => ())
      : (DataFrame, Long) => Unit = {
    require(sharePerDomain >= 0,
      s"sharePerDomain must be >= 0, got $sharePerDomain")
    require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      import spark.implicits._
      val arrivals = batch
        .select(col("doc_id"), col("source"),
          tokenCount(col("text")).cast("long").as("n_tok"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val n = arrivals.count()
        if (n > 0) {
          val fs = GenStore.fs(spark, stateDir)
          val gens = GenStore.committed(spark, stateDir)
          var gen = if (gens.isEmpty) 0L else gens.max
          // Carried totals: newest state row per domain; a row carrying
          // THIS batch id is a replay — resolve its `before`, so the
          // re-run charges from the same point ([[PackingStream]]'s
          // replay rule). PINNED to a local relation (O(domains) rows —
          // the histogram-pin size class) BEFORE the compaction below
          // deletes the generation dir the plan would otherwise re-read.
          val carried =
            if (gens.isEmpty)
              Seq.empty[(String, Long)].toDF("source", "carried")
            else {
              import scala.jdk.CollectionConverters._
              val df = spark.read.schema(stateSchema)
                .parquet(genDir(stateDir, gen))
                .groupBy("source")
                .agg(max(struct(col("batch_id"), col("before_toks"),
                  col("after_toks"))).as("m"))
                .select(col("source"),
                  when(col("m.batch_id") === batchId, col("m.before_toks"))
                    .otherwise(col("m.after_toks")).as("carried"))
              spark.createDataFrame(df.collect().toSeq.asJava, df.schema)
            }
          // Compact BEFORE the append so the new rows land in the
          // surviving generation — newest row PER DOMAIN survives
          // verbatim (batch ids intact, so a replay across the boundary
          // still resolves); marker is the commit point.
          if (gens.nonEmpty && spark.read.schema(stateSchema)
              .parquet(genDir(stateDir, gen)).count() >= compactEvery) {
            spark.read.schema(stateSchema).parquet(genDir(stateDir, gen))
              .groupBy("source")
              .agg(max(struct(col("batch_id"), col("before_toks"),
                col("after_toks"))).as("m"))
              .select(col("m.batch_id").as("batch_id"), col("source"),
                col("m.before_toks").as("before_toks"),
                col("m.after_toks").as("after_toks"))
              .write.mode("overwrite").parquet(genDir(stateDir, gen + 1))
            fs.create(new Path(s"${genDir(stateDir, gen + 1)}/COMMITTED"),
              true).close()
            gens.foreach(g =>
              fs.delete(new Path(genDir(stateDir, g)), true))
            gen += 1
          }
          // In-batch greedy prefix per domain: running total in doc_id
          // order on top of the carried total. The window shuffles the
          // BATCH (hash by source), the carried totals broadcast.
          val w = Window.partitionBy("source").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val charged = arrivals
            .withColumn("run", sum("n_tok").over(w))
            .join(broadcast(carried), Seq("source"), "left")
            .na.fill(0L, Seq("carried"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          try {
            FoldStore.maybeFold(spark, survivorsDir, batchId, foldEvery,
              survivorsSchema)
            val selected = charged
              .where(col("carried") + col("run") <= sharePerDomain)
              .select(col("doc_id"), col("source"), col("n_tok"))
            FoldStore.writeLive(selected, survivorsDir, batchId)
            // Off the cached batch — never a store re-read.
            val kept = selected.count()
            // State append LAST (the crash-replay ordering): every
            // domain present in the batch advances by its FULL batch
            // total — dropped documents stay charged, the batch law.
            charged.groupBy("source")
              .agg(max("carried").as("before_toks"),
                (max("carried") + sum("n_tok")).as("after_toks"))
              .select(lit(batchId).as("batch_id"), col("source"),
                col("before_toks"), col("after_toks"))
              .write.mode("append").parquet(genDir(stateDir, gen))
            fs.create(new Path(s"${genDir(stateDir, gen)}/COMMITTED"), true)
              .close()
            onBatch(batchId, n, kept)
          } finally charged.unpersist(blocking = false)
        }
      } finally arrivals.unpersist(blocking = false)
    }
  }

  /** The selected mixture so far — every committed segment plus the
    * live tail ([[FoldStore]]).
    */
  def survivors(spark: SparkSession, survivorsDir: String): DataFrame =
    FoldStore.read(spark, survivorsDir, survivorsSchema)
      .select("doc_id", "source", "n_tok")

  /** Per-domain audit of the stream so far: documents/tokens taken and
    * tokens charged — the q_ml13 audit row shape over the stream's
    * stores (domains with nothing selected still appear, zero-valued).
    */
  def domainAudit(spark: SparkSession, survivorsDir: String,
      stateDir: String): DataFrame = {
    val gens = GenStore.committed(spark, stateDir)
    require(gens.nonEmpty, s"no committed state under $stateDir")
    val totals = spark.read.schema(stateSchema)
      .parquet(genDir(stateDir, gens.max))
      .groupBy("source")
      .agg(max(struct(col("batch_id"), col("after_toks"))).as("m"))
      .select(col("source"), col("m.after_toks").as("charged_toks"))
    totals.join(
        survivors(spark, survivorsDir).groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens")),
        Seq("source"), "left")
      .na.fill(0L, Seq("n_docs", "n_tokens"))
      .select("source", "n_docs", "n_tokens", "charged_toks")
      .orderBy("source")
  }
}
