package graft.operators

import java.nio.file.{Files, Path}

import org.apache.spark.sql.types._

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType)))

  private def writeSmallFile(dir: Path, i: Int): Unit =
    Files.writeString(dir.resolve(f"part-$i%05d.json"), s"""{"id": $i, "v": ${i * 1.5}}\n""")

  test("CMP-2/9: below threshold increments, at threshold compacts and resets") {
    val logs = Files.createTempDirectory("graft-logs")
    val out = Files.createTempDirectory("graft-out")
    val state = new Compaction.CounterState

    (0 until 99).foreach { i =>
      writeSmallFile(logs, i)
      val r = Compaction.onFileArrived(spark, state, logs.toString, out.toString,
        schema, threshold = 100, batchTag = "t")
      assert(!r.triggered)
    }
    assert(state.get == 99)

    writeSmallFile(logs, 99)
    val r = Compaction.onFileArrived(spark, state, logs.toString, out.toString,
      schema, threshold = 100, batchTag = "t")
    assert(r.triggered && r.filesSeen == 100)
    assert(state.get == 0, "counter reset after compaction (CMP-8)")

    // SNK-3: exactly one gzip json output file
    val outFiles = Files.list(Path.of(r.outputDir.get)).toArray.map(_.toString)
      .filter(_.endsWith(".json.gz"))
    assert(outFiles.length == 1, s"expected single gzip file, got ${outFiles.toSeq}")

    // CMP-7: source prefix truncated
    assert(Files.list(logs).toArray.isEmpty, "logs dir emptied")

    // Multiset preserved: ids 0..99 each once, values intact
    val back = spark.read.schema(schema).json(r.outputDir.get)
    assert(back.count() == 100)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0) == 4950L)
  }

  test("SRC-6: malformed JSON lines survive schema-on-read as null rows, valid rows intact") {
    val logs = Files.createTempDirectory("graft-logs3")
    val out = Files.createTempDirectory("graft-out3")
    writeSmallFile(logs, 1)
    Files.writeString(logs.resolve("part-bad.json"), "{not json at all\n")
    writeSmallFile(logs, 2)
    val dir = Compaction.compactDirectory(spark, logs.toString, out.toString,
      schema, batchTag = "bad")
    val back = spark.read.schema(schema).json(dir)
    // Spark's default PERMISSIVE mode nulls unparseable rows rather than
    // failing the batch — the compactor must not lose the good records
    // around a bad line.
    assert(back.where($"id".isNotNull).count() == 2, "both valid records compacted")
    assert(back.count() >= 2)
  }

  test("CMP-3: dynamic column projection applies") {
    val logs = Files.createTempDirectory("graft-logs2")
    val out = Files.createTempDirectory("graft-out2")
    (0 until 3).foreach(i => writeSmallFile(logs, i))
    val dir = Compaction.compactDirectory(spark, logs.toString, out.toString,
      schema, columns = Seq("id"), batchTag = "proj")
    val back = spark.read.json(dir)
    assert(back.columns.toSeq == Seq("id"))
    assert(back.count() == 3)
  }

  test("streamed z-order compaction: the 100-file trigger folds staged parquet into z-laid-out sets, losslessly") {
    import org.apache.spark.sql.functions._
    val staging = Files.createTempDirectory("graft-zstage").toString
    val outBase = Files.createTempDirectory("graft-zoutbase").toString
    val state = new Compaction.CounterState
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // 128x128 grid dealt round-robin to 3 batches (each batch spans
    // the whole key space); 1 staged file per batch, threshold 2:
    // batch 1 triggers the fold over batches 0-1, batch 2 stays
    // staged for the next trigger.
    val all = for (x <- 0L until 128L; y <- 0L until 128L) yield (x, y)
    val slices = (0 until 3).map(b => all.zipWithIndex.collect {
      case (e, i) if i % 3 == b => e })
    val mem = MemoryStream[(Long, Long)]
    val handler = (b: org.apache.spark.sql.DataFrame, id: Long) =>
      Compaction.zOrderStreamingBatch(state, staging, outBase,
        "x", "y", nFiles = 8, threshold = 2, bits = 8)(
        b.toDF("x", "y").repartition(1), id)
    val q = mem.toDF().writeStream.foreachBatch(handler).start()
    try {
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    val folds = Files.list(Path.of(outBase)).toArray.map(_.toString)
      .filter(_.contains("zorder_batch"))
    assert(folds.length == 1, s"exactly one fold expected, got ${folds.toSeq}")
    // Lossless: fold + still-staged remainder == everything delivered.
    val folded = spark.read.parquet(folds.head)
    val staged = spark.read.parquet(staging)
    assert(folded.count() + staged.count() == all.size.toLong)
    assert(folded.agg(sum(col("x") * 65536 + col("y"))).head().getLong(0) +
      staged.agg(sum(col("x") * 65536 + col("y"))).head().getLong(0) ==
      all.map { case (x, y) => x * 65536 + y }.sum)
    // The REL-30 locality law holds on the streamed output: per-file
    // min/max boxes bound BOTH keys (most files at ~half span), so a
    // 2-d box predicate prunes most of the fold.
    val boxes = folded.groupBy(input_file_name())
      .agg(min("x"), max("x"), min("y"), max("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(boxes.length == 8, s"fold must land in nFiles=8, got ${boxes.length}")
    assert(boxes.count { case (x0, x1, y0, y1) =>
      (x1 - x0) <= 95 && (y1 - y0) <= 95 } >= 4,
      s"z-laid-out fold files must be bounded boxes: ${boxes.toSeq}")
    val corner = boxes.count { case (x0, x1, y0, y1) =>
      x0 <= 31 && y0 <= 31 } // files a [0,31]^2 box predicate touches
    assert(corner <= 5, s"corner box touches $corner of 8 fold files")
    // Counter reset after the fold; the staged remainder waits.
    assert(state.get <= 1L)

    // The nightly RE-TIGHTEN: land a second fold (another 2 batches),
    // then absorb both into one globally z-ordered set.
    val mem2 = MemoryStream[(Long, Long)]
    val q2 = mem2.toDF().writeStream.foreachBatch(handler).start()
    try {
      // offset batch ids continue under a fresh query; deliver the
      // remaining slice twice to cross the 2-file threshold again
      Seq(slices(2), slices(0)).foreach { s =>
        mem2.addData(s: _*); q2.processAllAvailable() }
    } finally q2.stop()
    val foldsBefore = Files.list(Path.of(outBase)).toArray.map(_.toString)
      .filter(_.contains("zorder_"))
    assert(foldsBefore.length == 2, s"fixture wants 2 folds: ${foldsBefore.toSeq}")
    val totalBefore = spark.read.parquet(foldsBefore: _*).count()
    val absorbed = Compaction.zOrderRetighten(spark, outBase,
      "x", "y", nFiles = 8, bits = 8, batchTag = "t")
    assert(absorbed == 2)
    val after = Files.list(Path.of(outBase)).toArray.map(_.toString)
      .filter(_.contains("zorder_"))
    assert(after.length == 1 && after.head.contains("zorder_retight_t"))
    assert(spark.read.parquet(after.head).count() == totalBefore,
      "re-tighten must be lossless")
    // Globally disjoint again: corner box touches few files.
    val rboxes = spark.read.parquet(after.head)
      .groupBy(input_file_name())
      .agg(min("x"), max("x"), min("y"), max("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rboxes.count { case (x0, _, y0, _) => x0 <= 31 && y0 <= 31 } <= 4,
      s"retightened corner-box touch count: ${rboxes.toSeq}")
    // A single remaining fold is a no-op (already tight).
    assert(Compaction.zOrderRetighten(spark, outBase, "x", "y", 8, 8) == 0)
  }
}
