package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.AdvancedQueries

/** The copy-on-write cohort store must be EXACTLY CohortStream — same
  * union-distinct algebra, retroactive reassignment, guards — while
  * writing only the buckets a batch touches and folding the exact
  * pair total incrementally.
  */
class CowCohortStreamSpec extends SparkSpec {
  import spark.implicits._

  private val WeekUs = 1000L

  private def slices: Seq[Seq[(Long, Long)]] = {
    def at(u: Long, w: Long): (Long, Long) = (u, w * WeekUs + u % 7)
    val mid = for (u <- 0L until 60L; w <- 2L to 5L if (u + w) % 3 != 0)
      yield at(u, w)
    val retro = for (u <- 0L until 60L if u % 2 == 0)
      yield at(u, u % 2)
    val fresh = for (u <- 40L until 60L) yield at(u, 1L)
    Seq(mid, retro ++ fresh.take(5), fresh.drop(5) ++ mid.take(30),
      mid.drop(60), retro.take(10) ++ fresh)
  }

  private def df(s: Seq[(Long, Long)]) = s.toDF("user_id", "ts_us")

  private def matrix(d: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    d.collect().map(_.toSeq).toSet

  private def oneShot(rows: Seq[(Long, Long)]): Set[Seq[Any]] =
    matrix(AdvancedQueries.cohortMatrix(
      df(rows).select(col("user_id"),
        expr(s"ts_us div $WeekUs").as("week"))))

  private def refPairs(rows: Seq[(Long, Long)]): Set[(Long, Long)] =
    rows.map { case (u, t) => (u, t / WeekUs) }.toSet

  test("streamed matrix == batch operator after EVERY batch, across compaction; exact incremental total") {
    val dir = Files.createTempDirectory("graft-cowcohort").toString
    // compactEvery=3: the 5-slice run crosses a compaction at gen 3
    val fn = CowCohortStream.pipeline(dir, WeekUs, buckets = 8,
      compactEvery = 3)
    slices.zipWithIndex.foreach { case (s, i) =>
      fn(df(s), i.toLong)
      val seen = slices.take(i + 1).flatten
      assert(matrix(CowCohortStream.retention(spark, dir)) == oneShot(seen),
        s"after batch $i")
      assert(CowCohortStream.readMeta(spark, dir).map(_._1)
        .contains(refPairs(seen).size.toLong),
        s"incremental total after batch $i")
    }
    // compaction happened: generations below 3 dropped
    assert(GenStore.committed(spark, dir).min == 3L)
    intercept[IllegalArgumentException] {
      CowCohortStream.pairsAt(spark, dir, 1L)
    }
  }

  test("z-ordered compaction generations leave pairs and matrix exact (writeGen routing)") {
    val dir = Files.createTempDirectory("graft-cowcohortz").toString
    val fn = CowCohortStream.pipeline(dir, WeekUs, buckets = 8,
      compactEvery = 3, zOrderOn = Some(ZOrder("week", "user_id")))
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    assert(matrix(CowCohortStream.retention(spark, dir)) ==
      oneShot(slices.flatten),
      "z-order is layout only — the matrix must be untouched")
  }

  test("a batch touching one user writes exactly one bucket dir; untouched buckets resolve from older gens") {
    val dir = Files.createTempDirectory("graft-cowcohio").toString
    val fn = CowCohortStream.pipeline(dir, WeekUs, buckets = 8,
      compactEvery = 100)
    fn(df(slices.head), 0L)
    fn(df(Seq((7L, 9 * WeekUs))), 1L)
    val hfs = GenStore.fs(spark, dir)
    val g1 = hfs.listStatus(new Path(GenStore.dir(dir, 1L))).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("bucket="))
      .map(_.stripPrefix("bucket=").toInt).filter(_ >= 0)
    assert(g1.size == 1, s"one user => one bucket dir, got $g1")
    val seen = slices.head :+ (7L, 9 * WeekUs)
    assert(matrix(CowCohortStream.retention(spark, dir)) == oneShot(seen))
  }

  test("redelivery cannot inflate; replay skips; stale/grain/layout refuse; nulls drop; fresh empty") {
    val dir = Files.createTempDirectory("graft-cowcohguard").toString
    assert(CowCohortStream.pairs(spark, dir).count() == 0L)
    val fn = CowCohortStream.pipeline(dir, WeekUs, buckets = 8)
    slices.take(3).zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val before = matrix(CowCohortStream.retention(spark, dir))
    val metaBefore = CowCohortStream.readMeta(spark, dir)
    fn(df(slices(2)), 2L) // replay: skip
    assert(CowCohortStream.readMeta(spark, dir) == metaBefore)
    // a NEW batch of only already-seen pairs: total unchanged
    fn(df(slices.head), 3L)
    assert(matrix(CowCohortStream.retention(spark, dir)) == before)
    assert(CowCohortStream.readMeta(spark, dir).map(_._1) ==
      metaBefore.map(_._1))
    intercept[IllegalStateException] { fn(df(slices.head), 0L) } // stale
    intercept[IllegalStateException] { // grain change
      CowCohortStream.pipeline(dir, WeekUs * 2, buckets = 8)(
        df(slices.head), 9L)
    }
    intercept[IllegalStateException] { // bucket-layout change
      CowCohortStream.pipeline(dir, WeekUs, buckets = 16)(
        df(slices.head), 9L)
    }
    val withNulls = Seq[(java.lang.Long, java.lang.Long)](
      (null, 5L), (1L, null))
      .toDF("user_id", "ts_us")
    fn(withNulls, 4L) // all rows drop; matrix unchanged
    assert(matrix(CowCohortStream.retention(spark, dir)) == before)
  }

  test("under the streaming engine: MemoryStream batches converge to the batch matrix") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-cowcohengine").toString
    val fn = CowCohortStream.pipeline(dir, WeekUs, buckets = 8,
      compactEvery = 2)
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("user_id", "ts_us")
      .writeStream.foreachBatch(fn).start()
    try {
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(matrix(CowCohortStream.retention(spark, dir)) ==
      oneShot(slices.flatten))
  }
}
