package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.analytics.AdvancedQueries
import org.apache.spark.sql.functions._

/** The pairs-state design makes the streamed retention matrix EXACT
  * and redelivery-immune: after any prefix of batches the matrix read
  * equals the batch operator over the union of arrivals — including
  * the case the design exists for, a user's EARLIEST week arriving in
  * a LATER batch (retroactive cohort reassignment: the user's whole
  * matrix row moves). Plus the family contract.
  */
class CohortStreamSpec extends SparkSpec {
  import spark.implicits._

  private val WeekUs = 1000L

  // 60 users, weeks 0..5. Batch 0 carries MIDDLE activity (weeks 2-5);
  // batch 1 retro-delivers week-0/1 FIRST activity for half the users
  // (their cohort must move); batch 2 adds fresh activity and
  // redelivers batch 0's pairs (immunity).
  private def slices: Seq[Seq[(Long, Long)]] = {
    def at(u: Long, w: Long): (Long, Long) = (u, w * WeekUs + u % 7)
    val mid = for (u <- 0L until 60L; w <- 2L to 5L if (u + w) % 3 != 0)
      yield at(u, w)
    val retro = for (u <- 0L until 60L if u % 2 == 0)
      yield at(u, u % 2)
    val fresh = for (u <- 40L until 60L) yield at(u, 1L)
    Seq(mid, retro ++ fresh.take(5), fresh.drop(5) ++ mid.take(30))
  }

  private def df(s: Seq[(Long, Long)]) = s.toDF("user_id", "ts_us")

  private def matrix(d: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    d.collect().map(_.toSeq).toSet

  private def oneShot(rows: Seq[(Long, Long)]): Set[Seq[Any]] =
    matrix(AdvancedQueries.cohortMatrix(
      df(rows).select(col("user_id"),
        expr(s"ts_us div $WeekUs").as("week"))))

  test("streamed matrix == batch operator over the union; late first weeks REASSIGN cohorts") {
    val dir = Files.createTempDirectory("graft-cohort").toString
    val fn = CohortStream.pipeline(dir, WeekUs)
    slices.zipWithIndex.foreach { case (s, i) =>
      fn(df(s), i.toLong)
      val seen = slices.take(i + 1).flatten
      assert(matrix(CohortStream.retention(spark, dir)) == oneShot(seen),
        s"after batch $i")
    }
    // The reassignment actually happened: batch 1 moved the even
    // users' cohort below batch 0's earliest week.
    val cohorts = CohortStream.retention(spark, dir)
      .select("cohort_week").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cohorts.contains(0L) && cohorts.contains(2L))
  }

  test("redelivery cannot inflate any cell; replay skips; stale/grain refuse; fresh empty") {
    val dir = Files.createTempDirectory("graft-cohortre").toString
    assert(CohortStream.pairs(spark, dir).count() == 0L)
    val fn = CohortStream.pipeline(dir, WeekUs)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    val before = matrix(CohortStream.retention(spark, dir))
    val metaBefore = CohortStream.readMeta(spark, dir)
    fn(df(slices.last), (slices.size - 1).toLong) // replay: skip
    assert(matrix(CohortStream.retention(spark, dir)) == before)
    assert(CohortStream.readMeta(spark, dir) == metaBefore)
    // A NEW batch of only already-seen pairs: matrix AND pair total
    // unchanged (idempotent union), high-water advances.
    fn(df(slices.head), slices.size.toLong)
    assert(matrix(CohortStream.retention(spark, dir)) == before)
    assert(CohortStream.readMeta(spark, dir).map(_._1) ==
      metaBefore.map(_._1))
    intercept[IllegalStateException] { fn(df(slices.head), 0L) }
    intercept[IllegalStateException] {
      CohortStream.pipeline(dir, WeekUs * 2)(df(slices.head), 9L)
    }
    intercept[IllegalArgumentException] { CohortStream.pipeline(dir, 0L) }
  }

  test("null user_id/ts_us rows are dropped before the merge (meta discriminator survives)") {
    val dir = Files.createTempDirectory("graft-cohortnull").toString
    val fn = CohortStream.pipeline(dir, WeekUs)
    val dirty = df(slices.head).unionByName(
      Seq((Option.empty[Long], Option(3L * WeekUs)),
          (Option(7L), Option.empty[Long]),
          (Option.empty[Long], Option.empty[Long]))
        .toDF("user_id", "ts_us"))
    fn(dirty, 0L)
    // A null pair committed into state would make readMeta see 2 meta
    // rows and throw on EVERY later batch; instead the state equals
    // the clean batch's and the stream keeps running.
    assert(matrix(CohortStream.retention(spark, dir)) ==
      oneShot(slices.head))
    fn(df(slices(1)), 1L)
    assert(matrix(CohortStream.retention(spark, dir)) ==
      oneShot(slices.take(2).flatten))
  }

  test("state write is hash-partitioned on user_id: file count tracks pairs/targetRowsPerFile") {
    val dir = Files.createTempDirectory("graft-cohortpart").toString
    // 40 pairs per file over ~190 committed pairs -> the batch-2
    // rewrite must land in ceil(prior/40) >= 4 files, not one task.
    val fn = CohortStream.pipeline(dir, WeekUs, targetRowsPerFile = 40L)
    slices.zipWithIndex.foreach { case (s, i) => fn(df(s), i.toLong) }
    assert(matrix(CohortStream.retention(spark, dir)) ==
      oneShot(slices.flatten))
    val total = CohortStream.readMeta(spark, dir).get._1
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gen = hfs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("gen-"))
      .map(_.stripPrefix("gen-").toLong).max
    val parts = hfs.listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/gen-$gen")).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
    // prior total going into the last rewrite was the batch-1 commit;
    // >= 4 data files (plus the 1-file meta append) proves the rewrite
    // fanned out across tasks instead of a coalesce(1).
    assert(parts.size >= 5, s"want >=5 parquet files, got ${parts.size}")
    assert(total > 150L, s"probe corpus shrank? $total pairs")
  }

  test("under the streaming engine: MemoryStream batches converge to the one-shot matrix") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-cohorteng").toString
    val fn = CohortStream.pipeline(dir, WeekUs)
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("user_id", "ts_us")
      .writeStream.foreachBatch(fn).start()
    try {
      slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(matrix(CohortStream.retention(spark, dir)) ==
      oneShot(slices.flatten))
  }
}
