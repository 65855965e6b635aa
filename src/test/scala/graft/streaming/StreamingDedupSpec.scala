package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** Streamed MinHash near-dup dedup against the stored signature index.
  * Spec band config: 64 perms / 32 bands (r = 2) so every planted pair
  * down to Jaccard ≈ 0.5 is a CANDIDATE with near-certainty and the
  * exact-Jaccard verify is the deciding stage — the operator's default
  * (16 bands, r = 4) tunes the knee for production recall/cost, not for
  * deterministic fixtures.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 10:00:$s%02d")
  private def doc(words: Seq[String]) = words.mkString(" ")
  private val base = (0 until 20).map(i => s"w$i")
  // X replaces 6 of W's 20 tokens → J(X,W) = 14/26 ≈ 0.538 ≥ 0.5 (dup);
  // Y replaces 6 OTHERS of X → J(Y,X) ≈ 0.538 (dup of X) but
  // J(Y,W) = 8/32 = 0.25 < 0.5 (NOT a dup of W).
  private val docW = doc(base)
  private val docX = doc(base.zipWithIndex.map { case (w, i) => if (i < 6) s"x$i" else w })
  private val docY = doc(base.zipWithIndex.map { case (w, i) =>
    if (i < 6) s"x$i" else if (i < 12) s"y$i" else w })
  private val docN = doc((0 until 20).map(i => s"n$i"))
  private val docB = doc((0 until 20).map(i => s"b$i"))
  private val docB2 = doc((0 until 20).map(i => if (i == 0) "bb0" else s"b$i"))
  private val docC = doc((0 until 20).map(i => s"c$i"))

  private def jaccard(a: String, b: String): Double = {
    val (sa, sb) = (a.split(" ").toSet, b.split(" ").toSet)
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("fixture preconditions: the planted Jaccard ladder") {
    assert(jaccard(docX, docW) >= 0.5, s"X~W: ${jaccard(docX, docW)}")
    assert(jaccard(docY, docX) >= 0.5, s"Y~X: ${jaccard(docY, docX)}")
    assert(jaccard(docY, docW) < 0.5, s"Y!~W: ${jaccard(docY, docW)}")
    assert(jaccard(docB2, docB) >= 0.5, s"B2~B: ${jaccard(docB2, docB)}")
    assert(jaccard(docN, docW) == 0.0)
  }

  private def runStream(indexDir: String, survivorsDir: String,
      batches: Seq[(Long, String, Timestamp)]*)(
      onBatch: (Long, Long, Long) => Unit = (_, _, _) => ()): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = mem.toDF().toDF("doc_id", "text", "ts").writeStream
      .foreachBatch(StreamingDedup.minhashDedupPipeline(spark, indexDir,
        survivorsDir, numPerms = 64, bands = 32, onBatch = onBatch))
      .start()
    try batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
  }

  private def survivors(dir: String): Set[Long] =
    StreamingDedup.survivorsTable(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  // The windows store's folded union view (the spec-side mirror of
  // mergedWindows' read, kept raw to inspect per-batch partial rows).
  private val windowsViewSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("window_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_docs",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_tokens",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("batch_id",
      org.apache.spark.sql.types.LongType)))
  private def windowsView(dir: String) =
    FoldStore.read(spark, dir, windowsViewSchema)

  test("one batch ≡ the batch pipeline's near-dup stage") {
    val idx = Files.createTempDirectory("graft-sdedup-idx1").toString
    val out = Files.createTempDirectory("graft-sdedup-out1").toString
    StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    val docs = Seq((1L, docW, ts(0)), (2L, docX, ts(1)), (3L, docN, ts(2)))
    runStream(idx, out, docs)()
    // Batch reference over the same rows: min-id canonical per cluster.
    val static = docs.toDF("doc_id", "text", "ts")
    val pairs = Dedup.minhashNearDups(static, numPerms = 64, bands = 32)
    val drop = Dedup.dupClusters(pairs)
      .where(col("doc_id") =!= col("cluster"))
      .collect().map(_.getLong(0)).toSet
    val batchKeep = docs.map(_._1).toSet -- drop
    assert(batchKeep == Set(1L, 3L), s"precondition: X collapses into W: $batchKeep")
    assert(survivors(out) == batchKeep, "stream ≡ batch on a single batch")
    // The index admitted exactly the survivors.
    assert(StreamingDedup.toksTable(spark, idx).count() == 2)
  }

  test("cross-batch: the index grows with novel docs and later dups hit it") {
    val idx = Files.createTempDirectory("graft-sdedup-idx2").toString
    val out = Files.createTempDirectory("graft-sdedup-out2").toString
    StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    var log = Vector.empty[(Long, Long, Long)]
    runStream(idx, out,
      Seq((1L, docW, ts(0)), (2L, docN, ts(1))),   // both novel
      Seq((3L, docX, ts(2)), (4L, docB, ts(3))),   // X dups stored W; B novel
      Seq((5L, docB2, ts(4)), (6L, docC, ts(5)))   // B2 dups batch-2's B; C novel
    )((id, n, kept) => log :+= ((id, n, kept)))
    assert(survivors(out) == Set(1L, 2L, 4L, 6L),
      s"dups against the GROWING index dropped: ${survivors(out)}")
    assert(log.map(t => (t._2, t._3)) == Vector((2L, 2L), (2L, 1L), (2L, 1L)),
      s"per-batch (arrived, kept): $log")
    // Stored signatures: one bands-row set + one toks row per survivor,
    // none for dropped docs (signatures are computed once, at admission).
    assert(StreamingDedup.toksTable(spark, idx).count() == 4)
    assert(StreamingDedup.bandsTable(spark, idx)
      .select("doc_id").distinct().count() == 4)
  }

  test("greedy-prefix semantics: similar only to a DROPPED doc ⇒ kept") {
    val idx = Files.createTempDirectory("graft-sdedup-idx3").toString
    val out = Files.createTempDirectory("graft-sdedup-out3").toString
    StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    runStream(idx, out,
      Seq((1L, docW, ts(0))),
      Seq((2L, docX, ts(1))),   // dup of retained W → dropped
      Seq((3L, docY, ts(2)))    // dup of DROPPED X only → kept (greedy)
    )()
    assert(survivors(out) == Set(1L, 3L),
      "the index holds retained docs only, so Y survives — the documented " +
        "greedy-prefix divergence from a full-corpus transitive closure " +
        s"(which would keep W alone): ${survivors(out)}")
    // And the batch run over the union indeed differs (keeps only W):
    val static = Seq((1L, docW), (2L, docX), (3L, docY)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(static, numPerms = 64, bands = 32)
    val batchDrop = Dedup.dupClusters(pairs)
      .where(col("doc_id") =!= col("cluster")).collect().map(_.getLong(0)).toSet
    assert(batchDrop == Set(2L, 3L), s"batch closure collapses the chain: $batchDrop")
  }

  test("index layout: bands under band=/pslot= dirs, toks under tslot= dirs") {
    val idx = Files.createTempDirectory("graft-sdedup-idxp").toString
    val out = Files.createTempDirectory("graft-sdedup-outp").toString
    StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    val fn = StreamingDedup.minhashDedupPipeline(spark, idx, out,
      numPerms = 64, bands = 32)
    val docs = (0L until 8L).map(i =>
      (i, (0 until 20).map(j => s"p${i}w$j").mkString(" "), ts(i.toInt)))
    fn(docs.toDF("doc_id", "text", "ts"), 0L)
    def subdirs(p: String) = new java.io.File(p).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    val gd = StreamingDedup.currentGenDir(spark, idx)
    val bandDirs = subdirs(s"$gd/bands")
    assert(bandDirs.nonEmpty && bandDirs.forall(_.startsWith("band=")),
      s"bands partitioned by band: $bandDirs")
    val slotDirs = subdirs(s"$gd/bands/${bandDirs.head}")
    assert(slotDirs.nonEmpty && slotDirs.forall(_.startsWith("pslot=")),
      s"second-level bucket-slot dirs: $slotDirs")
    val tokDirs = subdirs(s"$gd/toks")
    assert(tokDirs.nonEmpty && tokDirs.forall(_.startsWith("tslot=")),
      s"toks partitioned by id slot: $tokDirs")
    // Survivors land under live/batch_id= partitions (the exactly-once
    // sink; closed partitions fold into sealed gen- segments).
    assert(subdirs(s"$out/live").forall(_.startsWith("batch_id=")),
      subdirs(s"$out/live"))
  }

  test("the stored-bands scan carries partition filters and prunes") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val idx = Files.createTempDirectory("graft-sdedup-idxq").toString
    val out = Files.createTempDirectory("graft-sdedup-outq").toString
    StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    val fn = StreamingDedup.minhashDedupPipeline(spark, idx, out,
      numPerms = 64, bands = 32)
    // 8 novel docs spread signatures over many (band, pslot) partitions.
    val docs = (0L until 8L).map(i =>
      (i, (0 until 20).map(j => s"q${i}w$j").mkString(" "), ts(i.toInt)))
    fn(docs.toDF("doc_id", "text", "ts"), 0L)
    def leafDirs(p: String) = new java.io.File(p).listFiles()
      .filter(_.isDirectory)
      .flatMap(_.listFiles().filter(_.isDirectory)).length
    val total = leafDirs(s"${StreamingDedup.currentGenDir(spark, idx)}/bands")
    assert(total > 2, s"fixture writes a spread of partitions, got $total")
    // A one-key read — the per-batch shape — must NOT scan the index.
    val pruned = StreamingDedup.prunedBands(spark, idx,
      bucketSlots = 4, keys = Seq(1))
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in " +
      pruned.queryExecution.executedPlan))
    assert(scan.partitionFilters.nonEmpty,
      "the key predicate must reach the scan as a partition filter: " +
        scan.toString)
    assert(scan.selectedPartitions.partitionCount < total,
      s"pruned ${scan.selectedPartitions.partitionCount} of $total " +
        "partitions — the scan must not read the whole index")
    // And the pruned read still finds exactly the band=b/pslot=s rows.
    val keyRows = pruned.collect()
    assert(keyRows.nonEmpty &&
      keyRows.forall(r => r.getAs[Int]("band") * 4 + r.getAs[Int]("pslot") == 1))
  }

  test("replay after a PARTIAL commit leaves zero duplicate survivors") {
    // Simulate a crash between the toks append and the bands append:
    // run a batch, wipe the bands table back to empty (as if its append
    // never committed), and replay on a RECONSTRUCTED pipeline — the
    // real crash model (the driver died, the restarted stream rebuilds
    // the pipeline, which re-lists the index into a fresh file cache;
    // the crashed instance's in-memory listing died with it). The
    // replay finds no candidate bands rows, re-admits both docs, and
    // dynamic partition overwrite REWRITES batch_id=0 with identical
    // rows instead of appending — the exactly-once survivor contract.
    val idx = Files.createTempDirectory("graft-sdedup-idxpc").toString
    val out = Files.createTempDirectory("graft-sdedup-outpc").toString
    StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    val fn = StreamingDedup.minhashDedupPipeline(spark, idx, out,
      numPerms = 64, bands = 32)
    val b = Seq((1L, docW, ts(0)), (2L, docN, ts(1))).toDF("doc_id", "text", "ts")
    fn(b, 0L)
    assert(survivors(out) == Set(1L, 2L))
    Seq.empty[(Long, Long, Int, Int)].toDF("doc_id", "bucket", "band", "pslot")
      .write.partitionBy("band", "pslot").mode("overwrite")
      .parquet(s"${StreamingDedup.currentGenDir(spark, idx)}/bands") // crash erased the bands commit
    val fn2 = StreamingDedup.minhashDedupPipeline(spark, idx, out,
      numPerms = 64, bands = 32) // restart
    fn2(b, 0L) // replay
    assert(StreamingDedup.survivorsTable(spark, out).count() == 2,
      "the replayed batch rewrote its own partition — no duplicates")
    assert(survivors(out) == Set(1L, 2L))
    assert(StreamingDedup.bandsTable(spark, idx)
      .select("doc_id").distinct().count() == 2,
      "the replay completed the missing bands append")
    // And the restarted stream continues correctly: a dup of doc 1 is
    // dropped.
    fn2(Seq((3L, docX, ts(2))).toDF("doc_id", "text", "ts"), 1L)
    assert(survivors(out) == Set(1L, 2L))
  }

  test("a mismatched structural layout fails loudly at pipeline construction") {
    val idx = Files.createTempDirectory("graft-sdedup-idxm").toString
    val out = Files.createTempDirectory("graft-sdedup-outm").toString
    StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    // A different pruning grid would silently prune WRONG partitions
    // (missed duplicates) — construction must refuse, naming the key.
    val e = intercept[IllegalStateException] {
      StreamingDedup.minhashDedupPipeline(spark, idx, out,
        numPerms = 64, bands = 32, bucketSlots = 8)
    }
    assert(e.getMessage.contains("bucketSlots"), e.getMessage)
    // A different signature shape makes stored signatures unfindable.
    val e2 = intercept[IllegalStateException] {
      StreamingDedup.minhashDedupPipeline(spark, idx, out,
        numPerms = 64, bands = 16)
    }
    assert(e2.getMessage.contains("bands"), e2.getMessage)
    // An unmanifested dir refuses construction outright.
    val bare = Files.createTempDirectory("graft-sdedup-bare").toString
    intercept[IllegalStateException] {
      StreamingDedup.minhashDedupPipeline(spark, bare, out,
        numPerms = 64, bands = 32)
    }
    // Matching parameters construct and run; threshold is a semantic
    // knob, NOT structural — a retuned threshold constructs fine.
    val fn = StreamingDedup.minhashDedupPipeline(spark, idx, out,
      numPerms = 64, bands = 32, threshold = 0.7)
    fn(Seq((1L, docW, ts(0))).toDF("doc_id", "text", "ts"), 0L)
    assert(survivors(out) == Set(1L))
  }

  test("index compaction: generations roll, files shrink, dedup memory intact") {
    val idx = Files.createTempDirectory("graft-sdedup-idxc").toString
    val out = Files.createTempDirectory("graft-sdedup-outc").toString
    val idx2 = Files.createTempDirectory("graft-sdedup-idxc2").toString
    val out2 = Files.createTempDirectory("graft-sdedup-outc2").toString
    StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    StreamingDedup.initMinhashIndex(spark, idx2, numPerms = 64, bands = 32)
    // compactAtFiles = 1: every batch after the first finds files and
    // compacts before processing — maximum boundary stress.
    val fn = StreamingDedup.minhashDedupPipeline(spark, idx, out,
      numPerms = 64, bands = 32, compactAtFiles = 1)
    val un = StreamingDedup.minhashDedupPipeline(spark, idx2, out2,
      numPerms = 64, bands = 32, compactAtFiles = Int.MaxValue)
    val batches = Seq(
      Seq((1L, docW, ts(0)), (2L, docN, ts(1))),  // both novel
      Seq((3L, docX, ts(2)), (4L, docB, ts(3))),  // X dups COMPACTED W
      Seq((5L, docB2, ts(4)), (6L, docC, ts(5)))) // B2 dups compacted B
    batches.zipWithIndex.foreach { case (b, i) =>
      fn(b.toDF("doc_id", "text", "ts"), i.toLong)
      un(b.toDF("doc_id", "text", "ts"), i.toLong)
    }
    // Dedup semantics identical to the uncompacted run: dups planted
    // against PRE-compaction admissions are still found and verified
    // through the rewritten generations.
    assert(survivors(out) == Set(1L, 2L, 4L, 6L), survivors(out).toString)
    assert(survivors(out) == survivors(out2))
    // Exactly one generation survives, and it is not gen-0 (older
    // generations were dropped after each commit).
    val gens = new java.io.File(idx).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("gen-")).toSeq
    assert(gens.size == 1 && gens.head != "gen-0", gens.toString)
    // Index content (rows) is preserved exactly through compactions.
    assert(StreamingDedup.toksTable(spark, idx).count() ==
      StreamingDedup.toksTable(spark, idx2).count())
    assert(StreamingDedup.bandsTable(spark, idx)
        .orderBy("doc_id", "band").collect().toSeq ==
      StreamingDedup.bandsTable(spark, idx2)
        .orderBy("doc_id", "band").collect().toSeq)
    // The compacted store holds FEWER data files than the append-only
    // one — the point of the exercise.
    def files(root: String) = {
      val gd = StreamingDedup.currentGenDir(spark, root)
      GenStore.dataFileCount(spark, s"$gd/bands") +
        GenStore.dataFileCount(spark, s"$gd/toks")
    }
    assert(files(idx) < files(idx2),
      s"compacted ${files(idx)} vs append-only ${files(idx2)}")
    // Replay ACROSS a compaction boundary: re-running the last batch
    // (which itself triggers another compaction first) changes nothing.
    fn(batches.last.toDF("doc_id", "text", "ts"), 2L)
    assert(StreamingDedup.survivorsTable(spark, out).count() == 4)
    assert(survivors(out) == Set(1L, 2L, 4L, 6L))
    // And the pruned per-batch read shape still prunes post-compaction.
    fn(Seq((7L, docX, ts(6))).toDF("doc_id", "text", "ts"), 3L)
    assert(survivors(out) == Set(1L, 2L, 4L, 6L),
      "a dup of the earliest (multiply-compacted) admission still drops")
  }

  test("re-init over an existing index: verify-and-no-op on match, refusal on mismatch") {
    // ADVICE r10: init used to overwrite the MANIFEST unconditionally —
    // a re-init with different structural params would leave old-layout
    // generations authoritative while the construction check passed
    // against the NEW params, resurrecting the silent mis-prune.
    val idx = Files.createTempDirectory("graft-sdedup-reinit").toString
    val out = Files.createTempDirectory("graft-sdedup-reinitout").toString
    StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    val fn = StreamingDedup.minhashDedupPipeline(spark, idx, out,
      numPerms = 64, bands = 32)
    fn(Seq((1L, docW, ts(0)), (2L, docN, ts(1))).toDF("doc_id", "text", "ts"), 0L)
    // Matching re-init is an idempotent no-op: index data survives.
    StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    assert(StreamingDedup.toksTable(spark, idx).count() == 2,
      "matching re-init must not clobber the live index")
    // Mismatched structural params refuse, naming the key.
    val e = intercept[IllegalStateException] {
      StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 16)
    }
    assert(e.getMessage.contains("bands"), e.getMessage)
    // Committed generations with no manifest (foreign layout) refuse
    // rather than silently adopting the caller's params.
    assert(new java.io.File(s"$idx/MANIFEST").delete())
    intercept[IllegalStateException] {
      StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    }
  }

  test("construction reaps generations stranded by a crashed compaction") {
    val idx = Files.createTempDirectory("graft-sdedup-reap").toString
    val out = Files.createTempDirectory("graft-sdedup-reapout").toString
    StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    val fn0 = StreamingDedup.minhashDedupPipeline(spark, idx, out,
      numPerms = 64, bands = 32)
    fn0(Seq((1L, docW, ts(0))).toDF("doc_id", "text", "ts"), 0L)
    // Simulate a compaction that died AFTER committing gen-1 but BEFORE
    // dropping gen-0: copy the tables forward and commit the marker.
    StreamingDedup.bandsTable(spark, idx)
      .write.partitionBy("band", "pslot").parquet(s"$idx/gen-1/bands")
    StreamingDedup.toksTable(spark, idx)
      .write.partitionBy("tslot").parquet(s"$idx/gen-1/toks")
    GenStore.commit(spark, idx, 1L)
    def gens() = new java.io.File(idx).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("gen-")).toSeq.sorted
    assert(gens() == Seq("gen-0", "gen-1"), gens().toString)
    // The next pipeline construction reaps the stale generation.
    val fn = StreamingDedup.minhashDedupPipeline(spark, idx, out,
      numPerms = 64, bands = 32)
    assert(gens() == Seq("gen-1"), s"stale gen-0 reaped: ${gens()}")
    // And the surviving generation still dedups.
    fn(Seq((3L, docX, ts(2))).toDF("doc_id", "text", "ts"), 1L)
    assert(survivors(out) == Set(1L), survivors(out).toString)
  }

  test("compaction triggers on GROWTH, not absolute size — the floor cannot re-trigger") {
    // ADVICE r10: post-compaction the count floors at one file per
    // non-empty leaf; with compactAtFiles at or below that floor the
    // old absolute trigger compacted every batch forever. A batch that
    // appends NOTHING (all dups) must therefore not re-trigger.
    val idx = Files.createTempDirectory("graft-sdedup-grw").toString
    val out = Files.createTempDirectory("graft-sdedup-grwout").toString
    StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    val fn = StreamingDedup.minhashDedupPipeline(spark, idx, out,
      numPerms = 64, bands = 32, compactAtFiles = 1)
    def gen() = StreamingDedup.currentGenDir(spark, idx).split("gen-").last.toLong
    fn(Seq((1L, docW, ts(0)), (2L, docN, ts(1))).toDF("doc_id", "text", "ts"), 0L)
    assert(gen() == 0L, "first batch finds an empty index — no compaction")
    // Batch 1 compacts at start (absolute trigger learns the floor),
    // then retains nothing (pure dup) — zero files appended.
    fn(Seq((3L, docX, ts(2))).toDF("doc_id", "text", "ts"), 1L)
    assert(gen() == 1L, "threshold crossed — one compaction")
    // Batch 2 is another pure dup: the count sits AT the floor (>= the
    // compactAtFiles=1 absolute threshold), but growth since the last
    // compaction is zero — must NOT compact.
    fn(Seq((4L, docX, ts(3))).toDF("doc_id", "text", "ts"), 2L)
    assert(gen() == 1L,
      "no growth since the last compaction — the floor must not re-trigger")
    // A batch that admits a novel doc grows the index; the following
    // batch compacts again.
    fn(Seq((5L, docB, ts(4))).toDF("doc_id", "text", "ts"), 3L)
    fn(Seq((6L, docB2, ts(5))).toDF("doc_id", "text", "ts"), 4L)
    assert(gen() == 2L, "growth crossed the bound — compaction resumed")
    assert(survivors(out) == Set(1L, 2L, 5L), survivors(out).toString)
  }

  test("replay: a fully-committed dedup batch self-matches and absorbs idempotently") {
    // foreachBatch is at-least-once; the pipeline functions are plain
    // (DataFrame, batchId) closures, so a replay is literally calling
    // the function again with the same inputs.
    val idx = Files.createTempDirectory("graft-sdedup-idxr").toString
    val out = Files.createTempDirectory("graft-sdedup-outr").toString
    StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    val fn = StreamingDedup.minhashDedupPipeline(spark, idx, out,
      numPerms = 64, bands = 32)
    val b = Seq((1L, docW, ts(0)), (2L, docN, ts(1))).toDF("doc_id", "text", "ts")
    fn(b, 0L)
    assert(survivors(out) == Set(1L, 2L))
    fn(b, 0L) // replay after full commit
    assert(StreamingDedup.survivorsTable(spark, out).count() == 2,
      "replayed docs self-match their committed admission — nothing re-emitted")
    assert(StreamingDedup.toksTable(spark, idx).count() == 2,
      "index unchanged by the replay")
    // And the stream still works past the replay: a novel doc is
    // admitted, a dup of the original is dropped.
    fn(Seq((3L, docX, ts(2)), (4L, docB, ts(3))).toDF("doc_id", "text", "ts"), 1L)
    assert(survivors(out) == Set(1L, 2L, 4L))
  }

  test("replay: packing re-packs at the original offset — the grid never shifts, zero duplicates") {
    val windows = Files.createTempDirectory("graft-packwr").toString
    val offsets = Files.createTempDirectory("graft-packor").toString
    val fn = PackingStream.packPipeline(windows, offsets, capacity = 16)
    def doc(i: Long) = (i, (0 until 7).map(j => s"d${i}t$j").mkString(" "), ts(i.toInt))
    val b0 = Seq(doc(0), doc(1), doc(2)).toDF("doc_id", "text", "ts")
    val b1 = Seq(doc(3), doc(4), doc(5)).toDF("doc_id", "text", "ts")
    fn(b0, 0L); fn(b1, 1L)
    def state() = PackingStream.readOffsetState(spark, offsets).get
    val before = (state().getLong(0), state().getLong(1), state().getLong(2))
    val maxWin = windowsView(windows).agg(max("window_id")).head().getLong(0)
    fn(b1, 1L) // replay of the LAST batch, after its state commit
    assert((state().getLong(0), state().getLong(1), state().getLong(2)) == before,
      "replay reuses the pre-batch offset; the state row is re-appended unchanged")
    assert(windowsView(windows).agg(max("window_id")).head().getLong(0)
      == maxWin, "no forward shift: the replay emitted the same window ids")
    // EXACTLY-ONCE: the replay rewrote its own batch_id= partition with
    // identical rows — one row per (window, batch), no duplicates to
    // vanish into mergedWindows' sums.
    val dup = windowsView(windows)
      .groupBy("window_id", "batch_id").count()
      .where(col("count") > 1).count()
    assert(dup == 0, "replayed partials rewrite, never duplicate")
    val merged = PackingStream.mergedWindows(spark, windows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = graft.operators.Packing.concatPackWindows(
        (Seq(doc(0), doc(1), doc(2)) ++ Seq(doc(3), doc(4), doc(5)))
          .toDF("doc_id", "text", "ts"), capacity = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(merged == batch, "post-replay merged view ≡ the batch pack")
  }

  test("offset log compacts across generations; a replay across the boundary keeps the grid") {
    val windows = Files.createTempDirectory("graft-packwc").toString
    val offsets = Files.createTempDirectory("graft-packoc").toString
    // compactEvery = 2 forces a compaction roughly every batch.
    val fn = PackingStream.packPipeline(windows, offsets, capacity = 16,
      compactEvery = 2)
    def doc(i: Long) = (i, (0 until 7).map(j => s"d${i}t$j").mkString(" "), ts(i.toInt))
    val docs = (0L until 15L).map(doc)
    docs.grouped(3).zipWithIndex.foreach { case (b, i) =>
      fn(b.toDF("doc_id", "text", "ts"), i.toLong)
    }
    val genDirs = new java.io.File(offsets).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(genDirs.forall(_.startsWith("gen-")) && genDirs.size == 1,
      s"older generations deleted after compaction: $genDirs")
    val st = PackingStream.readOffsetState(spark, offsets).get
    assert(st.getLong(0) == 4L && st.getLong(2) == 15L * 7L,
      s"state survives compaction: $st")
    // Replay the last batch ACROSS the compaction boundary (its own
    // replay triggers another compaction first): grid unchanged.
    fn(docs.takeRight(3).toDF("doc_id", "text", "ts"), 4L)
    val st2 = PackingStream.readOffsetState(spark, offsets).get
    assert((st2.getLong(0), st2.getLong(1), st2.getLong(2)) ==
      (st.getLong(0), st.getLong(1), st.getLong(2)),
      s"replayed state identical through compaction: $st2")
    val merged = PackingStream.mergedWindows(spark, windows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = graft.operators.Packing.concatPackWindows(
        docs.toDF("doc_id", "text", "ts"), capacity = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(merged == batch, s"grid intact through compactions: $merged")
  }

  test("foreign offset-state layout fails loudly instead of restarting the grid") {
    val windows = Files.createTempDirectory("graft-packwf").toString
    val offsets = Files.createTempDirectory("graft-packof").toString
    // An offline rewrite this reader does not understand: flat parquet
    // under a non-generation subdir. Misreading it as a fresh stream
    // would silently restart the grid at offset 0.
    Seq((0L, 0L, 21L)).toDF("batch_id", "before", "after")
      .write.parquet(s"$offsets/compacted")
    intercept[IllegalStateException] {
      PackingStream.readOffsetState(spark, offsets)
    }
    val fn = PackingStream.packPipeline(windows, offsets, capacity = 16)
    intercept[IllegalStateException] {
      fn(Seq((1L, "a b c", ts(0))).toDF("doc_id", "text", "ts"), 1L)
    }
  }

  test("PackingStream: merged streamed windows ≡ one batch pack of the union") {
    implicit val sqlCtx = spark.sqlContext
    val windows = Files.createTempDirectory("graft-packw").toString
    val offsets = Files.createTempDirectory("graft-packo").toString
    // 9 docs × 7 tokens = 63 tokens at capacity 16 → windows straddle
    // both document and BATCH boundaries (21 tokens per 3-doc batch).
    val docs = (0L until 9L).map(i =>
      (i, (0 until 7).map(j => s"d${i}t$j").mkString(" "), ts(i.toInt)))
    var log = Vector.empty[(Long, Long)]
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = mem.toDF().toDF("doc_id", "text", "ts").writeStream
      .foreachBatch(PackingStream.packPipeline(windows, offsets,
        capacity = 16, onBatch = (_, n, t) => log :+= ((n, t))))
      .start()
    try docs.grouped(3).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    assert(log == Vector((3L, 21L), (3L, 21L), (3L, 21L)), s"per-batch: $log")
    // At least one window was emitted as partials across two batches.
    val partials = windowsView(windows)
      .groupBy("window_id").count().where(col("count") > 1).count()
    assert(partials > 0, "a straddled window must appear as partial rows")
    val merged = PackingStream.mergedWindows(spark, windows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = graft.operators.Packing.concatPackWindows(
        docs.toDF("doc_id", "text", "ts"), capacity = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(merged == batch, s"stream ≡ batch: $merged vs $batch")
  }

  private def livePartDirs(root: String): Seq[String] = {
    val d = new java.io.File(s"$root/live")
    if (!d.exists()) Seq.empty
    else d.listFiles().filter(_.isDirectory).map(_.getName).toSeq.sorted
  }

  test("survivors fold: sealed segments ≡ unfolded store, replay across the boundary") {
    // foldSurvivorsEvery = 1 folds the closed partitions before EVERY
    // batch — maximum boundary stress — differentially against an
    // unfolded run of the same batches.
    val batches = Seq(
      Seq((1L, docW, ts(0)), (2L, docN, ts(1))),
      Seq((3L, docX, ts(2)), (4L, docB, ts(3))),
      Seq((5L, docB2, ts(4)), (6L, docC, ts(5))))
    def run(foldEvery: Int): ((org.apache.spark.sql.DataFrame, Long) => Unit, String) = {
      val idx = Files.createTempDirectory("graft-sfold-idx").toString
      val out = Files.createTempDirectory("graft-sfold-out").toString
      StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
      val fn = StreamingDedup.minhashDedupPipeline(spark, idx, out,
        numPerms = 64, bands = 32, foldSurvivorsEvery = foldEvery)
      batches.zipWithIndex.foreach { case (b, i) =>
        fn(b.toDF("doc_id", "text", "ts"), i.toLong)
      }
      (fn, out)
    }
    val (fnF, folded) = run(1)
    val (_, unfolded) = run(Int.MaxValue)
    def rows(dir: String) = StreamingDedup.survivorsTable(spark, dir)
      .select("doc_id", "text", "ts", "batch_id")
      .collect().map(_.toSeq).toSeq.sortBy(_.head.toString)
    assert(rows(folded) == rows(unfolded),
      "folding must not change a single survivor row (batch ids included)")
    assert(survivors(folded) == Set(1L, 2L, 4L, 6L))
    // Two folds happened (before batches 1 and 2); only the newest
    // batch partition is still live, the folded ones are deleted.
    assert(GenStore.committed(spark, folded) == Seq(0L, 1L))
    assert(livePartDirs(folded) == Seq("batch_id=2"),
      s"folded live partitions must be deleted: ${livePartDirs(folded)}")
    assert(FoldStore.maxWatermark(spark, folded) == 1L)
    // Replay of the newest batch: its id sits above every watermark by
    // construction (folds cover ids strictly below the in-flight
    // batch), so the overwrite lands LIVE and rewrites its own
    // partition — survivors unchanged, no duplicates, segments sealed.
    fnF(batches.last.toDF("doc_id", "text", "ts"), 2L)
    assert(rows(folded) == rows(unfolded),
      "replay across the fold boundary is idempotent")
    assert(GenStore.committed(spark, folded) == Seq(0L, 1L),
      "a replay must not grow new segments")
  }

  test("survivors fold: a crash between commit and delete is filtered, then reaped") {
    val idx = Files.createTempDirectory("graft-sfoldc-idx").toString
    val out = Files.createTempDirectory("graft-sfoldc-out").toString
    StreamingDedup.initMinhashIndex(spark, idx, numPerms = 64, bands = 32)
    val fn = StreamingDedup.minhashDedupPipeline(spark, idx, out,
      numPerms = 64, bands = 32, foldSurvivorsEvery = 1)
    fn(Seq((1L, docW, ts(0))).toDF("doc_id", "text", "ts"), 0L)
    fn(Seq((2L, docN, ts(1))).toDF("doc_id", "text", "ts"), 1L) // folds batch 0
    assert(FoldStore.maxWatermark(spark, out) == 0L)
    assert(livePartDirs(out) == Seq("batch_id=1"))
    // Simulate the crash window: batch 0's rows sealed in the segment
    // AND still live (fold died after COMMITTED, before the delete).
    Seq((1L, docW, ts(0)))
      .toDF("doc_id", "text", "ts").withColumn("batch_id", lit(0L))
      .write.partitionBy("batch_id").mode("append").parquet(s"$out/live")
    assert(livePartDirs(out).contains("batch_id=0"))
    assert(StreamingDedup.survivorsTable(spark, out).count() == 2,
      "the reader filters live rows at or below the watermark — no double count")
    // The next batch's fold reaps the stranded partition.
    fn(Seq((3L, docB, ts(2))).toDF("doc_id", "text", "ts"), 2L)
    assert(!livePartDirs(out).contains("batch_id=0"),
      s"stale live partition reaped: ${livePartDirs(out)}")
    assert(survivors(out) == Set(1L, 2L, 3L))
  }

  test("windows fold: directory count bounded, merged view ≡ batch pack through folds") {
    val windows = Files.createTempDirectory("graft-packfw").toString
    val offsets = Files.createTempDirectory("graft-packfo").toString
    val fn = PackingStream.packPipeline(windows, offsets, capacity = 16,
      foldWindowsEvery = 2)
    def doc(i: Long) = (i, (0 until 7).map(j => s"d${i}t$j").mkString(" "), ts(i.toInt))
    val docs = (0L until 15L).map(doc)
    docs.grouped(3).zipWithIndex.foreach { case (b, i) =>
      fn(b.toDF("doc_id", "text", "ts"), i.toLong)
    }
    // Folds fired before batches 2 and 4 (two closed partitions each):
    // two sealed segments, ONE live partition — 3 directories where the
    // unfolded store would hold 5, and the ratio keeps shrinking with
    // stream length (O(batches/foldEvery), each row written at most
    // twice — never the O(corpus)-per-fold cumulative rewrite, which is
    // the wrong trade for an append-only output store).
    assert(GenStore.committed(spark, windows) == Seq(0L, 1L))
    assert(livePartDirs(windows) == Seq("batch_id=4"),
      s"folded window partitions must be deleted: ${livePartDirs(windows)}")
    assert(FoldStore.maxWatermark(spark, windows) == 3L)
    // No partial row lost or duplicated across the two fold boundaries.
    val dup = windowsView(windows).groupBy("window_id", "batch_id")
      .count().where(col("count") > 1).count()
    assert(dup == 0)
    val merged = PackingStream.mergedWindows(spark, windows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = graft.operators.Packing.concatPackWindows(
        docs.toDF("doc_id", "text", "ts"), capacity = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(merged == batch, s"grid intact through folds: $merged")
    // Replay of the newest batch across the fold boundary: lands live,
    // rewrites its own partition, seals nothing new.
    fn(docs.takeRight(3).toDF("doc_id", "text", "ts"), 4L)
    assert(GenStore.committed(spark, windows) == Seq(0L, 1L))
    val merged2 = PackingStream.mergedWindows(spark, windows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(merged2 == batch, "replay through the folded store is idempotent")
  }
}
