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
}
