package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.CountMin
import org.apache.spark.sql.functions._

/** Unlike the Misra-Gries stream (merge-order dependent below the
  * guarantee line), the Count-Min merge is EXACT: summed batch sketches
  * equal the one-shot sketch of the concatenated stream, cell for cell.
  * These tests pin that equality, the exact total, replay idempotence,
  * geometry validation, and the engine-driven leg.
  */
class CountMinStreamSpec extends SparkSpec {
  import spark.implicits._

  private val D = 3
  private val W = 16

  private def slices: Seq[Seq[String]] = {
    val toks = (0 until 900).map { i =>
      if (i % 3 == 0) "alpha" else if (i % 7 == 0) "beta" else s"t${i % 50}"
    }
    toks.grouped(300).toSeq
  }

  private def docs(toks: Seq[String]) =
    toks.grouped(30).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")

  private def cellMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("cross-batch cells equal the one-shot sketch of the whole stream") {
    val dir = Files.createTempDirectory("graft-cmstream").toString
    var lastTotal = -1L
    val fn = CountMinStream.pipeline(dir, D, W,
      onBatch = (_, total) => lastTotal = total)
    slices.zipWithIndex.foreach { case (s, i) => fn(docs(s), i.toLong) }
    assert(lastTotal == 900L, s"exact stream total, got $lastTotal")
    val streamed = cellMap(CountMinStream.cells(spark, dir))
    val oneShot = cellMap(CountMin.sketch(
      slices.flatten.toDF("item"), D, W))
    assert(streamed == oneShot, "summed sketches == sketch of concatenation")
    // Point queries never undercount the true whole-stream counts.
    val est = CountMinStream.estimates(spark, dir,
        Seq("alpha", "beta", "t1").toDF("item"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = slices.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    assert(est("alpha") >= truth("alpha"))
    assert(est("beta") >= truth("beta"))
    assert(est("t1") >= truth("t1"))
  }

  test("replay of the committed batch does not double-count") {
    val dir = Files.createTempDirectory("graft-cmreplay").toString
    val fn = CountMinStream.pipeline(dir, D, W)
    slices.zipWithIndex.foreach { case (s, i) => fn(docs(s), i.toLong) }
    val before = cellMap(CountMinStream.cells(spark, dir))
    val metaBefore = CountMinStream.readMeta(spark, dir)
    fn(docs(slices.last), (slices.size - 1).toLong) // at-least-once replay
    assert(cellMap(CountMinStream.cells(spark, dir)) == before)
    assert(CountMinStream.readMeta(spark, dir) == metaBefore)
  }

  test("a batch below the committed high-water refuses loudly") {
    val dir = Files.createTempDirectory("graft-cmstale").toString
    val fn = CountMinStream.pipeline(dir, D, W)
    slices.zipWithIndex.foreach { case (s, i) => fn(docs(s), i.toLong) }
    intercept[IllegalStateException] { fn(docs(slices.head), 0L) }
  }

  test("geometry mismatch refuses instead of mis-hashing") {
    val dir = Files.createTempDirectory("graft-cmgeom").toString
    CountMinStream.pipeline(dir, D, W)(docs(slices.head), 0L)
    intercept[IllegalStateException] {
      CountMinStream.pipeline(dir, D, W * 2)(docs(slices(1)), 1L)
    }
    intercept[IllegalStateException] {
      CountMinStream.pipeline(dir, D + 1, W)(docs(slices(1)), 1L)
    }
  }

  test("under the streaming engine: MemoryStream batches converge to the one-shot sketch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-cmengine").toString
    val fn = CountMinStream.pipeline(dir, D, W)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(fn).start()
    try {
      slices.foreach { s =>
        mem.addData(docs(s).collect().map(r =>
          (r.getLong(0), r.getString(1))).toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = cellMap(CountMinStream.cells(spark, dir))
    val oneShot = cellMap(CountMin.sketch(slices.flatten.toDF("item"), D, W))
    assert(streamed == oneShot)
    assert(CountMinStream.readMeta(spark, dir).exists(_._1 == 900L))
  }

  test("foreign metaless state fails loudly") {
    val dir = Files.createTempDirectory("graft-cmforeign").toString
    Seq((0, 1L, 1L)).toDF("hrow", "bucket", "c")
      .write.parquet(GenStore.dir(dir, 0L))
    GenStore.commit(spark, dir, 0L)
    intercept[IllegalStateException] {
      CountMinStream.readMeta(spark, dir)
    }
  }
}
