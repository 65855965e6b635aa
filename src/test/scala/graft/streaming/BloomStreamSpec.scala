package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Bloom
import org.apache.spark.sql.functions._

/** The Bloom merge (bit-set union) is EXACT: unioned batch filters
  * equal the one-shot filter over the concatenated stream, bit for
  * bit. These tests pin that equality, the no-false-negative read
  * path across batches, replay idempotence, geometry validation, the
  * engine-driven leg, and foreign-state refusal.
  */
class BloomStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val M = 256
  private val N = 4 // shingle width for the test corpus

  // Three batches of benchmark docs; vocab overlaps across batches so
  // per-batch distinct != global distinct (the meta bound is an UB).
  private def slices: Seq[Seq[(Long, String)]] =
    (0 until 3).map { b =>
      (0 until 4).map { d =>
        val words = (0 until 12).map(i => s"w${(b * 7 + d * 3 + i) % 30}")
        ((b * 4 + d).toLong, words.mkString(" "))
      }
    }

  private def docs(s: Seq[(Long, String)]) = s.toDF("doc_id", "text")

  private def allGrams: Seq[String] = {
    import graft.functions.{TextFunctions => TF}
    docs(slices.flatten)
      .select(explode(TF.shingles(col("text"), N)).as("item"))
      .distinct().collect().map(_.getString(0)).toSeq
  }

  private def bitSet(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  test("cross-batch bits equal the one-shot filter of the whole stream") {
    val dir = Files.createTempDirectory("graft-bloomstream").toString
    var lastTotal = -1L
    val fn = BloomStream.pipeline(dir, K, M, N,
      onBatch = (_, total) => lastTotal = total)
    slices.zipWithIndex.foreach { case (s, i) => fn(docs(s), i.toLong) }
    val streamed = bitSet(BloomStream.bits(spark, dir))
    val oneShot = bitSet(Bloom.build(allGrams.toDF("item"), K, M))
    assert(streamed == oneShot, "unioned filters == filter of concatenation")
    // Meta total is an upper bound on distinct-ever grams (overlapping
    // batches re-count), never an undercount.
    assert(lastTotal >= allGrams.size.toLong)
  }

  test("read path: no false negatives across batches") {
    val dir = Files.createTempDirectory("graft-bloomread").toString
    val fn = BloomStream.pipeline(dir, K, M, N)
    slices.zipWithIndex.foreach { case (s, i) => fn(docs(s), i.toLong) }
    // Every gram ever inserted — including batch 0's — still passes
    // after later generations replaced the state.
    val kept = BloomStream.filterMembers(spark, dir,
        allGrams.toDF("item"), "item")
      .collect().map(_.getString(0)).toSet
    assert(kept == allGrams.toSet, "an inserted gram was rejected")
    // The packed (codegen'd bitmap) read path returns the identical
    // set over the same committed state.
    val packed = BloomStream.filterMembersPacked(spark, dir,
        allGrams.toDF("item"), "item")
      .collect().map(_.getString(0)).toSet
    assert(packed == kept)
    assert(BloomStream.filterMembersPacked(spark,
      java.nio.file.Files.createTempDirectory("graft-bloomfresh2").toString,
      allGrams.toDF("item"), "item").count() == 0L)
    // Auto form: this state's meta bound (~30 grams) is far below the
    // crossover → the join form serves, same rows, no caller decision.
    val auto = BloomStream.filterMembersAuto(spark, dir,
      allGrams.toDF("item"), "item")
    assert(!auto.queryExecution.analyzed.toString
      .contains("bloom_might_contain"))
    assert(auto.collect().map(_.getString(0)).toSet == kept)
    assert(BloomStream.filterMembersAuto(spark,
      java.nio.file.Files.createTempDirectory("graft-bloomfresh3").toString,
      allGrams.toDF("item"), "item").count() == 0L)
  }

  test("fresh state keeps nothing; replay of the committed batch is a no-op") {
    val fresh = Files.createTempDirectory("graft-bloomfresh").toString
    assert(BloomStream.filterMembers(spark, fresh,
      Seq("x").toDF("item"), "item").count() == 0L)
    val dir = Files.createTempDirectory("graft-bloomreplay").toString
    val fn = BloomStream.pipeline(dir, K, M, N)
    slices.zipWithIndex.foreach { case (s, i) => fn(docs(s), i.toLong) }
    val before = bitSet(BloomStream.bits(spark, dir))
    val metaBefore = BloomStream.readMeta(spark, dir)
    fn(docs(slices.last), (slices.size - 1).toLong) // at-least-once replay
    assert(bitSet(BloomStream.bits(spark, dir)) == before)
    assert(BloomStream.readMeta(spark, dir) == metaBefore)
  }

  test("stale batch and mismatched geometry refuse loudly") {
    val dir = Files.createTempDirectory("graft-bloomstale").toString
    val fn = BloomStream.pipeline(dir, K, M, N)
    slices.zipWithIndex.foreach { case (s, i) => fn(docs(s), i.toLong) }
    intercept[IllegalStateException] { fn(docs(slices.head), 0L) }
    intercept[IllegalStateException] {
      BloomStream.pipeline(dir, K, M * 2, N)(docs(slices.head), 3L)
    }
    intercept[IllegalStateException] {
      BloomStream.pipeline(dir, K + 1, M, N)(docs(slices.head), 3L)
    }
  }

  test("under the streaming engine: MemoryStream batches converge to the one-shot filter") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-bloomengine").toString
    val fn = BloomStream.pipeline(dir, K, M, N)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(fn).start()
    try {
      slices.foreach { s =>
        mem.addData(s: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = bitSet(BloomStream.bits(spark, dir))
    val oneShot = bitSet(Bloom.build(allGrams.toDF("item"), K, M))
    assert(streamed == oneShot)
  }

  test("foreign metaless state fails loudly") {
    val dir = Files.createTempDirectory("graft-bloomforeign").toString
    Seq(1L).toDF("bit").write.parquet(GenStore.dir(dir, 0L))
    GenStore.commit(spark, dir, 0L)
    intercept[IllegalStateException] {
      BloomStream.readMeta(spark, dir)
    }
  }
}
