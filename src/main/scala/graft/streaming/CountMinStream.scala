package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.operators.CountMin

/** Cross-batch Count-Min frequency tracking — the streaming face of
  * [[CountMin]] next to [[HeavyHitterStream]]'s Misra-Gries: where the
  * MG summary keeps a bounded CANDIDATE set (who is frequent), the CMS
  * state answers a bounded-error POINT QUERY for any item the stream
  * has ever carried, in d·w cells regardless of vocabulary.
  *
  * The state law is [[PackingStream]]'s generation protocol, but unlike
  * the MG summary the merge here is pure elementwise ADDITION — a
  * relational aggregate — so the state never rides through the driver:
  * per batch, ONE partial-aggregate job sketches the batch's tokens
  * (exchange bounded at ≤ d·w rows per task), the prior generation's
  * cell table unions in, and a `groupBy(hrow, bucket).sum` writes the
  * next generation (≤ d·w rows). The only driver pin is the 1-row batch
  * total. Estimates keep CMS's guarantees ACROSS batches because
  * summed sketches are exactly the sketch of the concatenated stream
  * (the mergeable-summaries law [[graft.operators.CountMinSpec]] pins
  * relationally).
  *
  * Replay discipline (the [[HeavyHitterStream]] contract): a replay of
  * the committed high-water batch SKIPS the merge and re-emits
  * (adding twice would double-count the batch — CMS estimates only
  * ever OVERcount, so the break would pass the est ≥ true check and
  * corrupt silently); a batch id below the high-water throws, loudly.
  *
  * The sketch geometry (d, w) is committed WITH the state and
  * validated on every batch and read — estimating against a state
  * sketched at different geometry would hash to the wrong cells and
  * produce silently wrong (even UNDER-counting) answers, so a mismatch
  * refuses instead.
  */
object CountMinStream {

  /** State rows: one META row (`hrow` null — exact total, high-water
    * batch id, and the sketch geometry) plus one row per non-empty
    * cell.
    */
  private val stateSchema = StructType(Seq(
    StructField("hrow", IntegerType), StructField("bucket", LongType),
    StructField("c", LongType), StructField("total", LongType),
    StructField("batch_id", LongType), StructField("d", LongType),
    StructField("w", LongType)))

  /** The committed meta under `stateDir`: (total, high-water batch_id,
    * d, w); `None` = fresh stream.
    */
  def readMeta(spark: SparkSession, stateDir: String)
      : Option[(Long, Long, Int, Int)] = {
    val gens = GenStore.committed(spark, stateDir)
    if (gens.isEmpty) None
    else {
      val meta = spark.read.schema(stateSchema)
        .parquet(GenStore.dir(stateDir, gens.max))
        .where(col("hrow").isNull)
        .collect()
      if (meta.length != 1) throw new IllegalStateException(
        s"count-min state generation ${gens.max} has ${meta.length} meta " +
          "rows (want exactly 1) — foreign or corrupt state")
      val m = meta.head
      Some((m.getLong(3), m.getLong(4), m.getLong(5).toInt, m.getLong(6).toInt))
    }
  }

  /** The committed cell table (hrow, bucket, c) — a lazy read, ≤ d·w
    * rows by construction; empty for a fresh dir.
    */
  def cells(spark: SparkSession, stateDir: String): DataFrame = {
    val gens = GenStore.committed(spark, stateDir)
    if (gens.isEmpty) {
      spark.createDataFrame(java.util.Collections.emptyList[Row](),
        StructType(stateSchema.take(3)))
    } else {
      spark.read.schema(stateSchema).parquet(GenStore.dir(stateDir, gens.max))
        .where(col("hrow").isNotNull)
        .select("hrow", "bucket", "c")
    }
  }

  /** One foreachBatch handler over batches carrying a `text` column.
    * `onBatch(batchId, total)` fires after the commit (or replay skip)
    * with the stream total now in force.
    */
  def pipeline(stateDir: String, d: Int = 4, w: Int = 1024,
      onBatch: (Long, Long) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = {
    require(d > 0 && w > 0, s"sketch dims must be positive, got d=$d w=$w")
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val prior = readMeta(spark, stateDir)
      prior.foreach { case (_, _, pd, pw) =>
        if (pd != d || pw != w) throw new IllegalStateException(
          s"count-min state at $stateDir was sketched at d=$pd w=$pw; " +
            s"this pipeline runs d=$d w=$w — estimates against mismatched " +
            "geometry hash to the wrong cells, refusing")
      }
      prior match {
        case Some((total, hw, _, _)) if hw == batchId =>
          // Replay after the state commit: adding the batch again would
          // double-count it — and CMS only ever overcounts, so the
          // corruption would pass the est >= true invariant silently.
          onBatch(batchId, total)
        case Some((_, hw, _, _)) if batchId < hw =>
          throw new IllegalStateException(
            s"count-min state at $stateDir is ahead of the stream: " +
              s"committed high-water batch $hw > replayed batch $batchId " +
              "— the streaming checkpoint was restored from an older " +
              "snapshot than the state dir; restore a matching pair")
        case _ =>
          val toks = batch.select(
            explode(graft.functions.TextFunctions.tokens(col("text")))
              .as("item"))
          val bSketch = CountMin.sketch(toks, d, w)
          // Batch total = any single hash row's cell mass (every row
          // counts every token once) — a 1-row bounded pin.
          val bTotal = bSketch.where(col("hrow") === 0)
            .agg(coalesce(sum("c"), lit(0L))).head().getLong(0)
          val total = prior.map(_._1).getOrElse(0L) + bTotal
          // Distributed merge: summed sketches ARE the sketch of the
          // concatenated stream. <= d*w rows in, <= d*w out.
          val merged = cells(spark, stateDir)
            .unionByName(bSketch)
            .groupBy("hrow", "bucket").agg(sum("c").as("c"))
            .withColumn("total", lit(null).cast("long"))
            .withColumn("batch_id", lit(null).cast("long"))
            .withColumn("d", lit(null).cast("long"))
            .withColumn("w", lit(null).cast("long"))
          val metaDf = spark.createDataFrame(
            java.util.Collections.singletonList(
              Row(null, null, null, total, batchId, d.toLong, w.toLong)),
            stateSchema)
          val gens = GenStore.committed(spark, stateDir)
          val gen = gens.lastOption.map(_ + 1).getOrElse(0L)
          merged.unionByName(metaDf)
            .coalesce(1)
            .write.mode("overwrite").parquet(GenStore.dir(stateDir, gen))
          GenStore.commit(spark, stateDir, gen)
          GenStore.dropBelow(spark, stateDir, gen)
          onBatch(batchId, total)
      }
    }
  }

  /** Point-query estimates against the committed state: geometry comes
    * from the state's own meta row, so a caller cannot mis-hash.
    * Returns (item, est_n); est ≥ the item's true whole-stream count,
    * est ≤ true + εN with the usual (ε = e/w, δ = e^−d) guarantee.
    */
  def estimates(spark: SparkSession, stateDir: String, queries: DataFrame)
      : DataFrame = {
    readMeta(spark, stateDir) match {
      case None => queries.select(col("item"), lit(0L).as("est_n"))
      case Some((_, _, d, w)) =>
        CountMin.estimates(queries, cells(spark, stateDir), d, w)
    }
  }
}
