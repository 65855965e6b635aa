package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal
import graft.operators.Similarity
import graft.schema.SensorReading
import graft.streaming.SensorPipeline

/** Cross-module integration: the seams the unit specs don't cover. */
class IntegrationSpec extends SparkSpec {
  import spark.implicits._

  private def reading(ts: String, count: Long, temp: Double): SensorReading =
    SensorReading("raspberrypi", Timestamp.valueOf(ts), 50.0, temp, 1012.0,
      0.0, 0.0, 0.0, count)

  test("STR-1 Kappa law: batch aggregation over the streamed sink equals direct aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      reading("2022-07-14 15:00:00", 1, 30.0),
      reading("2022-07-14 15:30:00", 2, 34.0),
      reading("2022-07-14 16:10:00", 3, 40.0),
      reading("2022-07-14 16:20:00", 4, 42.0))
    val mem = MemoryStream[SensorReading]
    mem.addData(rows: _*)
    val out = Files.createTempDirectory("graft-kappa")
    val cp = Files.createTempDirectory("graft-kappa-cp")
    val q = SensorPipeline.hourlyPartitionedWriter(mem.toDF(), out.toString, cp.toString).start()
    q.awaitTermination(60000); q.stop()

    // The batch view IS the streamed sink (no second pipeline):
    val batchView = spark.read.parquet(out.toString)
      .groupBy(col("hour")).agg(avg("temperature").as("avg_t"), count(lit(1)).as("n"))
    val direct = rows.toDF()
      .groupBy(date_format(col("timestamp"), "yyyy-MM-dd-HH").as("hour"))
      .agg(avg("temperature").as("avg_t"), count(lit(1)).as("n"))
    val a = batchView.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    val b = direct.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq, s"stream-then-batch $a != direct $b")
    assert(a.map(_._1).toSeq == Seq("2022-07-14-15", "2022-07-14-16"))
  }

  test("multimodal chain: stubbed media features feed similarity search") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"), // same bytes → same features
      (2L, "totally different words in this doc x"),
      (3L, "yet another unrelated document body y"))
      .toDF("doc_id", "text")
    val feats = Multimodal.stubDecodeFeatures(
      Multimodal.attachPayload(docs).as[Multimodal.MediaRecord], dim = 8)
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
    val q = feats.where(col("vec_id") === 0)
    val top = Similarity.bruteForceTopK(q, feats, k = 1).head()
    assert(top.getAs[Long]("neighbor_id") == 1L, "identical payload is the nearest neighbor")
    assert(top.getAs[Double]("cos") == 1.0)
  }

  test("full kappa run: sensors → rule → fan-out → hourly sink + compaction; docs → funnel stream; vectors → index append") {
    // The reference's architecture (README.md:5-8) composed as ONE
    // pipeline at sf0.01: every stage below exists and is unit-tested on
    // its own; this run is the cross-module contract — each leg's final
    // artifact must equal its batch-computed oracle digest.
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.01"

    // ---- Leg 1: the sensor story. At-least-once readings (one QoS1
    // redelivery) → watermarked dedup → IoT-rule filter → fan-out into
    // the hourly-partitioned parquet sink AND the buffered-JSON
    // compaction sink (threshold fires mid-run).
    def r(ts: String, count: Long, pressure: Double = 1012.0) =
      SensorReading("raspberrypi", Timestamp.valueOf(ts), 50.0,
        30.0 + count, pressure, 0.0, 0.0, 0.0, count)
    val readings = (1L to 10L).map(i => r(s"2022-07-14 15:0$i:00", i)) ++
      Seq(r("2022-07-14 15:05:00", 5),            // QoS1 duplicate of count=5
        r("2022-07-14 16:01:00", 11), r("2022-07-14 16:02:00", 12),
        r("2022-07-14 16:03:00", 13, pressure = 900.0)) // fails the rule
    val mem = MemoryStream[SensorReading]
    mem.addData(readings: _*)
    val curated = SensorPipeline.ruleSelect(
      SensorPipeline.dedupStream(mem.toDF(), watermark = "10 minutes"),
      predicate = col("pressure") > 1000.0)
    val sinkDir = Files.createTempDirectory("graft-kpipe-sink")
    val logsDir = Files.createTempDirectory("graft-kpipe-logs")
    val outBase = Files.createTempDirectory("graft-kpipe-compact")
    val cp1 = Files.createTempDirectory("graft-kpipe-cp1")
    val cp2 = Files.createTempDirectory("graft-kpipe-cp2")
    val state = new graft.operators.Compaction.CounterState
    import graft.schema.Schemas
    import org.apache.spark.sql.streaming.Trigger
    val (q1, q2) = SensorPipeline.fanOut(curated,
      df => SensorPipeline.hourlyPartitionedWriter(df, sinkDir.toString, cp1.toString),
      df => df.writeStream
        .option("checkpointLocation", cp2.toString)
        .foreachBatch(graft.operators.Compaction.streamingCompactorBatch(
          state, logsDir.toString, outBase.toString, Schemas.sensor,
          threshold = 2) _)
        .trigger(Trigger.AvailableNow()))
    q1.awaitTermination(120000); q1.stop()
    q2.awaitTermination(120000); q2.stop()
    // 12 unique rule-passing readings: the dup collapsed, pressure=900 dropped.
    val sunk = spark.read.parquet(sinkDir.toString)
    assert(sunk.count() == 12, "dedup collapses the redelivery; the rule drops one")
    assert(sunk.select("hour").distinct().collect().map(_.getString(0)).sorted
      .toSeq == Seq("2022-07-14-15", "2022-07-14-16"), "hourly index rotation")
    // Compaction leg: same 12 rows, whether already compacted (gzip
    // JSON) or still buffered as small files awaiting the threshold.
    val compactedDirs = Files.list(outBase).toArray.map(_.toString)
    assert(compactedDirs.nonEmpty, "threshold 2 must have fired at least once")
    val compactedRows = spark.read.schema(Schemas.sensor)
      .json(compactedDirs: _*).count()
    val leftover = Files.list(logsDir).toArray.map(_.toString)
      .count(_.endsWith(".json"))
    val leftoverRows = if (leftover == 0) 0L
      else spark.read.schema(Schemas.sensor).json(logsDir.toString).count()
    assert(compactedRows + leftoverRows == 12,
      s"compacted($compactedRows) + buffered($leftoverRows) must cover the leg")

    // ---- Leg 2: the curation funnel as a stream over the sf0.01
    // documents (id-ordered, two micro-batches), pinned to the batch
    // run's own calibration — survivors must equal the batch funnel's.
    import graft.functions.{TextFunctions => TF}
    import graft.streaming.CurationStream
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .where(col("doc_id") < 300)
      .select(col("doc_id"), col("text")).collect()
      .map(row => (row.getLong(0), row.getString(1)))
      .sortBy(_._1)
      .map { case (id, text) =>
        (id, text, Timestamp.valueOf(s"2024-01-01 10:00:${"%02d".format(id % 60)}")) }
    val benchGrams = docs.filter(d => d._1 == 10 || d._1 == 20)
      .flatMap(_._2.toLowerCase.split("\\W+").filter(_.nonEmpty)
        .sliding(8).map(_.mkString(" "))).toSet
    val static = docs.toSeq.toDF("doc_id", "text", "ts")
    val keep = static.groupBy(TF.fingerprintMd5(col("text")).as("fp"))
      .agg(min("doc_id").as("doc_id"))
    val deduped = static.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
    val contaminated = deduped
      .select(col("doc_id"), explode(TF.shingles(col("text"), 8)).as("gram"))
      .join(broadcast(benchGrams.toSeq.toDF("gram")), "gram")
      .select("doc_id").distinct()
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      .withColumn("q", TF.qualityScore(col("text")))
      .withColumn("u", round(TF.hexHash60(col("text")).cast("double") /
        lit(1152921504606846976.0), 6))
    val Array(qMin, qMax) = clean.agg(min("q"), max("q")).collect()(0)
      .toSeq.map(_.asInstanceOf[Double]).toArray
    val batchSurvivors = clean
      .where(col("u") < round(pow((col("q") - qMin) / (qMax - qMin), 0.5), 6))
      .collect().map(_.getLong(0)).toSet
    assert(batchSurvivors.nonEmpty && batchSurvivors.size < docs.length,
      "funnel must both keep and drop")
    val dmem = MemoryStream[(Long, String, Timestamp)]
    val funnel = CurationStream.curationFunnelStream(
      dmem.toDF().toDF("doc_id", "text", "ts"), benchGrams, qMin, qMax)
    val fq = funnel.writeStream.format("memory").queryName("kappa_funnel")
      .outputMode("append").start()
    // ---- Leg 2b: the funnel's survivors chain into the MIXTURE stage
    // (curation → mixture, the training-data path's order): each funnel
    // micro-batch's output feeds the streamed per-domain token budget,
    // and the end-to-end survivor set must equal the batch greedy
    // prefix over the funnel's own survivors in arrival order.
    val srcByDoc = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "source")
    val mixSurv = Files.createTempDirectory("graft-kpipe-mixsurv").toString
    val mixState = Files.createTempDirectory("graft-kpipe-mixstate").toString
    val share = 400L
    val mixFn = graft.streaming.MixtureStream.mixturePipeline(
      mixSurv, mixState, sharePerDomain = share)
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      var fed = Set.empty[Long]
      for (((batch, mixBatchId)) <- Seq((b1, 0L), (b2, 1L))) {
        dmem.addData(batch: _*); fq.processAllAvailable()
        val nowOut = spark.table("kappa_funnel")
          .select("doc_id", "text").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq
        val newRows = nowOut.filterNot(d => fed.contains(d._1))
        fed ++= newRows.map(_._1)
        mixFn(newRows.toDF("doc_id", "text")
          .join(srcByDoc, "doc_id")
          .select("doc_id", "source", "text"), mixBatchId)
      }
      val streamed = spark.table("kappa_funnel").collect().map(_.getLong(0)).toSet
      assert(streamed == batchSurvivors,
        s"stream ≡ batch funnel: missing=${(batchSurvivors -- streamed).toSeq.sorted.take(5)} " +
          s"extra=${(streamed -- batchSurvivors).toSeq.sorted.take(5)}")
      // Mixture ≡ batch greedy prefix over the funnel survivors in
      // doc_id order (ids arrive ordered across the two batches).
      val expectedMix = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        static.join(batchSurvivors.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi")
          .join(srcByDoc, "doc_id")
          .select(col("doc_id"), col("source"),
            TF.tokenCount(col("text")).as("n"))
          .withColumn("run", sum("n").over(w))
          .where(col("run") <= share)
          .collect().map(_.getLong(0)).toSet
      }
      val mixStreamed = graft.streaming.MixtureStream.survivors(spark, mixSurv)
        .collect().map(_.getLong(0)).toSet
      assert(expectedMix.nonEmpty && mixStreamed == expectedMix,
        s"chained mixture ≡ batch greedy prefix over the funnel survivors: " +
          s"missing=${(expectedMix -- mixStreamed).toSeq.sorted.take(5)} " +
          s"extra=${(mixStreamed -- expectedMix).toSeq.sorted.take(5)}")
    } finally fq.stop()

    // ---- Leg 3: curated vectors stream into the serving index — the
    // closed append+drift loop over the sf0.01 embeddings. Artifact
    // after two micro-batches (second carries a LATE low id) must equal
    // the batch append of the union, and each batch's drift row must
    // equal the batch-mode drift against the original index.
    import graft.streaming.IndexMaintenance
    val embs = graft.sources.Tables.embeddings(spark, sfDir)
    val base = embs.where(col("vec_id") % 10 =!= 0)
    val arrivals = embs.where(col("vec_id") % 10 === 0)
      .select("vec_id", "embedding").collect()
      .map(row => (row.getLong(0), row.getSeq[Float](1)))
      .sortBy(_._1)
    val cents = Similarity.trainCentroids(base, nCentroids = 16, iters = 2,
      trainN = 1024, seedPlanes = 6, dim = 64)
    val grid = Similarity.int8Stats(base, dim = 64)
    val index0 = Similarity.int8IndexWith(base, grid, cents)
    val indexDir = Files.createTempDirectory("graft-kpipe-idx").toString
    val driftSink = Files.createTempDirectory("graft-kpipe-drift").toString
    index0.write.mode("overwrite").parquet(indexDir)
    val vmem = MemoryStream[(Long, Seq[Float])]
    val vq = vmem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch(IndexMaintenance.int8AppendPipeline(indexDir, grid,
        cents, driftSink))
      .start()
    // Batch 1: all but the lowest two ids; batch 2: the stragglers.
    val (late, onTime) = arrivals.splitAt(2)
    try {
      vmem.addData(onTime: _*); vq.processAllAvailable()
      vmem.addData(late: _*); vq.processAllAvailable()
    } finally vq.stop()
    def digest(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(row => (row.getAs[Long]("neighbor_id"), row.getAs[Long]("cid"),
        row.getAs[Array[Byte]]("qcode").toSeq)).toSet
    val streamedIndex = digest(spark.read.parquet(indexDir))
    val batchIndex = digest(Similarity.appendToInt8Index(
      arrivals.toSeq.toDF("vec_id", "embedding"), index0, grid, cents))
    assert(streamedIndex == batchIndex,
      "streamed index artifact ≡ batch append of the union")
    // Stream-vs-batch drift equivalence per batch (retrain itself is
    // data-dependent — at this SF the 450-vector training makes the
    // held-out fit ratio ~0.69, legitimately under the 0.9 default; the
    // quiet/loud semantics are StreamingSpec's planted-shift tests).
    val driftRows = spark.read.parquet(driftSink).orderBy("batch_id").collect()
    assert(driftRows.length == 2, s"one drift row per batch: ${driftRows.toSeq}")
    for ((batchData, i) <- Seq(onTime, late).zipWithIndex) {
      val expected = Similarity.indexDrift(
        batchData.toSeq.toDF("vec_id", "embedding"), index0, grid, cents).head()
      assert(driftRows(i).getAs[Double]("fit_new") == expected.getAs[Double]("fit_new") &&
        driftRows(i).getAs[Double]("drift") == expected.getAs[Double]("drift"),
        s"batch $i drift ≡ batch-mode drift vs the pre-append index: " +
          s"${driftRows(i)} vs $expected")
    }
  }

  test("streamed training-data path at sf0.01: near-dup dedup feeds packing; stream ≡ batch laws on organic docs") {
    // The round-9 document path composed end to end over REAL data:
    // documents stream through the partitioned-index near-dup dedup,
    // and the survivors stream through offset-carried packing. Each
    // law is pinned at fixture scale in StreamingDedupSpec; this leg
    // re-proves them on 400 organic sf0.01 documents where the dup
    // structure is whatever the generator planted, not hand-built.
    import graft.operators.{Dedup, Packing}
    import graft.streaming.{PackingStream, StreamingDedup}
    val sfDir = "/root/testdata/sf0.01"
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .where(col("doc_id") < 400)
      .select(col("doc_id"), col("text")).collect()
      .map(row => (row.getLong(0), row.getString(1)))
      .sortBy(_._1)
      .map { case (id, text) =>
        (id, text, Timestamp.valueOf(s"2024-01-01 10:00:${"%02d".format(id % 60)}")) }
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val idx = Files.createTempDirectory("graft-tdp-idx").toString
    val surv = Files.createTempDirectory("graft-tdp-surv").toString
    StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    val dedup = StreamingDedup.minhashDedupPipeline(spark, idx, surv,
      numPerms = 64, bands = 32)
    dedup(b1.toSeq.toDF("doc_id", "text", "ts"), 0L)
    dedup(b2.toSeq.toDF("doc_id", "text", "ts"), 1L)
    def survivorsOf(batch: Long): Seq[Long] =
      StreamingDedup.survivorsTable(spark, surv)
        .where(col("batch_id") === batch)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    // Law 1 (one batch ≡ the batch pipeline) on batch 1:
    val b1df = b1.toSeq.toDF("doc_id", "text", "ts")
    val drop1 = Dedup.dupClusters(Dedup.minhashNearDups(b1df,
        numPerms = 64, bands = 32))
      .where(col("doc_id") =!= col("cluster"))
      .collect().map(_.getLong(0)).toSet
    val kept1 = b1.map(_._1).filterNot(drop1).sorted.toSeq
    assert(survivorsOf(0L) == kept1, "batch-1 survivors ≡ batch near-dup stage")
    // Law 2 (greedy-prefix across batches): batch-2 survivors are its
    // local keepers minus docs the SAME banding + verify links to a
    // RETAINED batch-1 doc — computed here from one batch run over the
    // union (banding is per-doc deterministic, so union pairs spanning
    // the sets are exactly the stream's stored-index candidates).
    val b2df = b2.toSeq.toDF("doc_id", "text", "ts")
    val drop2local = Dedup.dupClusters(Dedup.minhashNearDups(b2df,
        numPerms = 64, bands = 32))
      .where(col("doc_id") =!= col("cluster"))
      .collect().map(_.getLong(0)).toSet
    val keep2local = b2.map(_._1).filterNot(drop2local).toSet
    val kept1set = kept1.toSet
    val unionDf = (b1.filter(d => kept1set(d._1)) ++
        b2.filter(d => keep2local(d._1))).toSeq.toDF("doc_id", "text", "ts")
    val crossDrop = Dedup.minhashNearDups(unionDf, numPerms = 64, bands = 32)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .collect { case (a, b) if kept1set(a) && keep2local(b) => b
                 case (a, b) if kept1set(b) && keep2local(a) => a }
      .toSet
    assert(survivorsOf(1L) == (keep2local -- crossDrop).toSeq.sorted,
      "batch-2 survivors ≡ greedy-prefix reference over the union banding")
    // The index is partitioned and a per-batch-shaped read prunes.
    val bandDirs = new java.io.File(
        s"${StreamingDedup.currentGenDir(spark, idx)}/bands").listFiles()
      .filter(_.isDirectory)
    assert(bandDirs.nonEmpty && bandDirs.forall(_.getName.startsWith("band=")))
    // Packing leg: survivors stream (id-ordered batches) → window grid
    // ≡ one batch pack of all survivors.
    val windows = Files.createTempDirectory("graft-tdp-win").toString
    val offsets = Files.createTempDirectory("graft-tdp-off").toString
    val pack = PackingStream.packPipeline(windows, offsets, capacity = 128)
    val textOf = docs.map(d => d._1 -> d._2).toMap
    def survDocs(batch: Long) = survivorsOf(batch)
      .map(id => (id, textOf(id), Timestamp.valueOf("2024-01-01 10:00:00")))
    pack(survDocs(0L).toDF("doc_id", "text", "ts"), 0L)
    pack(survDocs(1L).toDF("doc_id", "text", "ts"), 1L)
    val merged = PackingStream.mergedWindows(spark, windows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batchPack = Packing.concatPackWindows(
        (survDocs(0L) ++ survDocs(1L)).toDF("doc_id", "text", "ts"),
        capacity = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(merged == batchPack,
      s"streamed windows over survivors ≡ batch pack (${merged.size} windows)")
    assert(merged.nonEmpty && merged.map(_._3).init.forall(_ == 128L),
      "every non-final window filled to capacity")
  }

  test("streamed funnel on organic events at sf0.001: FunnelStream == q_adv10 after replaying the table in batches") {
    import graft.streaming.FunnelStream
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us"))
      .localCheckpoint()
    val state = java.nio.file.Files
      .createTempDirectory("graft-funnelint").toString
    val fn = FunnelStream.pipeline(state)
    // Replay the organic table as 4 event-time-interleaved batches —
    // the kappa claim on real data, not a planted corpus.
    (0L until 4L).foreach(b => fn(ev.where(pmod(col("ts_us"), lit(4L)) === b), b))
    val got = FunnelStream.funnel(spark, state)
      .collect().map(_.toSeq).toSeq.sortBy(_.head.toString)
    val want = graft.analytics.AdvancedQueries.funnelSteps(spark, dir)
      .collect().map(_.toSeq).toSeq.sortBy(_.head.toString)
    assert(got == want, s"streamed funnel must equal q_adv10: $got vs $want")
    assert(want.exists(_(1).asInstanceOf[Long] > 0L), "fixture sanity")
  }

  test("streamed sessionization on organic events at sf0.001: SessionStream.userStats == q_adv11 after replaying the table in batches") {
    import graft.streaming.SessionStream
    val dir = "/root/testdata/sf0.001"
    val gapUs = 1800000000L // the q_adv4/q_adv11 30-minute gap
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"),
        col("value"))
      .localCheckpoint()
    val state = java.nio.file.Files
      .createTempDirectory("graft-sessint").toString
    val fn = SessionStream.pipeline(state, gapUs)
    // Event-time-interleaved batches: every user's sessions are built
    // across all four batches — maximal hull-merge pressure on the
    // kappa claim, on organic data.
    (0L until 4L).foreach(b =>
      fn(ev.where(pmod(col("ts_us"), lit(4L)) === b), b))
    val got = SessionStream.userStats(spark, state, gapUs)
      .collect().map(_.toSeq).toSeq
    val want = graft.analytics.AdvancedQueries.sessionStats(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(got == want, "streamed per-user session summary must equal q_adv11")
    assert(want.exists(_(1).asInstanceOf[Long] > 1L),
      "fixture sanity: some user has multiple sessions")
    // And the capacity curve off the same committed state == q_adv12.
    val gotC = SessionStream.concurrency(spark, state, gapUs)
      .collect().map(_.toSeq).toSeq
    val wantC = graft.analytics.AdvancedQueries.concurrency(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(gotC == wantC, "streamed concurrency curve must equal q_adv12")
  }

  test("streamed moments on organic events at sf0.001: MomentStream.stats corr == engine corr over the same quantized pairs") {
    import graft.streaming.MomentStream
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_type").as("key"),
        get_json_object(col("props"), "$.k").cast("double").as("x"),
        col("value").as("y"))
      .localCheckpoint()
    val state = java.nio.file.Files
      .createTempDirectory("graft-momint").toString
    val fn = MomentStream.pipeline(state)
    (0L until 3L).foreach(b =>
      fn(ev.where(pmod(crc32(concat_ws("|", col("key"), col("x"), col("y"))),
        lit(3L)) === b), b))
    val got = MomentStream.stats(spark, state).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // Engine truth over the SAME micro-quantized pairs (the store's
    // committed domain): pairwise-complete corr per key.
    val want = ev
      .where(col("key").isNotNull && col("x").isNotNull && col("y").isNotNull)
      .select(col("key"),
        round(col("x") * 1e6, 0).as("xm"), round(col("y") * 1e6, 0).as("ym"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), corr("xm", "ym").as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got.keySet == want.keySet)
    for ((k, (n, c)) <- want) {
      assert(got(k)._1 == n, s"n($k)")
      // The store derives corr from EXACT integer moments; the engine
      // estimates it with streaming double co-moments — agreement is
      // to double precision, not bit-equality.
      assert(math.abs(got(k)._2 - c) < 1e-6, s"corr($k): ${got(k)._2} vs $c")
    }
  }

  test("warehouse tier end-to-end on organic events at sf0.001: ingest → CoW upsert + delete → changelog → delta views; same log → SCD-2 stream → point-in-time reads == batch truth") {
    import graft.streaming.{ChangeFeedView, CowUpsertStream, MomentFeedView,
      Scd2Stream, SketchFeedView}
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts_ns div 1000").as("ts_us"), col("value"),
        expr("cast(get_json_object(props, '$.k') as bigint) div 25")
          .as("tier"))
      .localCheckpoint()
    val state = java.nio.file.Files
      .createTempDirectory("graft-whstate").toString
    val cfvDir = java.nio.file.Files
      .createTempDirectory("graft-whcfv").toString
    val mfvDir = java.nio.file.Files
      .createTempDirectory("graft-whmfv").toString
    val sfvDir = java.nio.file.Files
      .createTempDirectory("graft-whsfv").toString
    val scd2Dir = java.nio.file.Files
      .createTempDirectory("graft-whscd2").toString

    // Ingest: 4 adversarial (event-time-interleaved) slices into the
    // CoW upsert store AND the SCD-2 history store — one log, two
    // warehouse states. Views refresh at a LAZY cadence (every 2nd
    // batch) to exercise multi-generation folds.
    val maxTs = ev.agg(max("ts_us")).head().getLong(0)
    val up = CowUpsertStream.pipeline(state, buckets = 8, compactEvery = 3)
    val scd2 = Scd2Stream.pipeline(scd2Dir, buckets = 8,
      latenessUs = maxTs + 1, compactEvery = 100)
    (0L until 4L).foreach { b =>
      val s = ev.where(pmod(col("event_id"), lit(4L)) === b)
      up(s.select("user_id", "event_type", "ts_us", "event_id", "value"), b)
      scd2(s.select("user_id", "event_type", "ts_us", "event_id", "tier"), b)
      if (b % 2 == 1) {
        ChangeFeedView.refresh(spark, state, cfvDir)
        MomentFeedView.refresh(spark, state, mfvDir)
        SketchFeedView.refresh(spark, state, sfvDir)
      }
    }
    // Right-to-be-forgotten: delete two users' purchase rows from the
    // store; the CDC feed carries the closes, every view must follow.
    val delKeys = CowUpsertStream.latest(spark, state)
      .select("user_id", "event_type").limit(2)
    assert(CowUpsertStream.delete(spark, state, delKeys) > 0L)
    ChangeFeedView.refresh(spark, state, cfvDir)
    MomentFeedView.refresh(spark, state, mfvDir)
    SketchFeedView.refresh(spark, state, sfvDir)

    val latest = CowUpsertStream.latest(spark, state).localCheckpoint()
    // ChangeFeedView ≡ one-shot (count, Σmicro) per event_type
    val cfGot = ChangeFeedView.table(spark, cfvDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val cfWant = latest.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(coalesce(round(col("value") * 1e6).cast("long"), lit(0L)))
          .as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(cfGot == cfWant, "ChangeFeedView != one-shot over latest()")
    // MomentFeedView ≡ one-shot moment vectors (cell-exact decimals)
    val mfGot = MomentFeedView.table(spark, mfvDir).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2), r.getDecimal(3), r.getDecimal(4),
        r.getDecimal(5), r.getDecimal(6))).toSet
    val mfWant = MomentFeedView.oneShot(latest).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2), r.getDecimal(3), r.getDecimal(4),
        r.getDecimal(5), r.getDecimal(6))).toSet
    assert(mfGot == mfWant, "MomentFeedView != one-shot moment vectors")
    // SketchFeedView ≡ one-shot DDSketch per event_type
    val sfGot = graft.streaming.SketchFeedView.table(spark, sfvDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val sfWant = graft.operators.DDSketch.sketchBy(
        latest.select(col("event_type"), col("value")), 0.01,
        Seq("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(sfGot == sfWant, "SketchFeedView != one-shot sketch")

    // SCD-2: streamed versions ≡ q_rel32's batch history, and the
    // point-in-time read off the LIVE store ≡ q_rel34's interval
    // filter at the same mid-corpus T.
    def vset(d: org.apache.spark.sql.DataFrame) = d.collect().map { r =>
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5), r.getBoolean(6))
    }.toSet
    assert(vset(Scd2Stream.versions(spark, scd2Dir)) ==
      vset(graft.analytics.RelationalQueries.scd2History(spark, dir)),
      "streamed SCD-2 != q_rel32 history")
    val t = 1705363200000000L // q_rel34's as-of instant
    val asofGot = Scd2Stream.asOf(spark, scd2Dir, t).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3), r.getLong(4))).toSet
    val asofWant = graft.analytics.RelationalQueries.scd2AsOf(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3), r.getLong(4))).toSet
    assert(asofGot == asofWant, "live asOf != q_rel34")
    // Dwell off the LIVE store ≡ q_rel35's log rebuild — the factored
    // consumer reads ≤ state rows and closes open versions at the
    // meta's committed max event time, which IS the corpus max.
    def dset(d: org.apache.spark.sql.DataFrame) = d.collect().map { r =>
      (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(2), r.getDouble(3))
    }.toSet
    assert(dset(Scd2Stream.dwell(spark, scd2Dir)) ==
      dset(graft.analytics.RelationalQueries.scd2Dwell(spark, dir)),
      "live dwell != q_rel35")
  }

  test("driver contract: entry() returns rows; every query has a runnable entry") {
    assert(SparkEntry.entry(spark).count() > 0, "flagship must return rows")
    // Every oracleSql key must refer to a real query (a typo'd key would
    // silently drop that query from the driver's correctness gate).
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without a query: $orphans")
  }
}
