package graft.tools

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{ChangeFeedView, CowUpsertStream, MomentFeedView, Scd2Stream, SketchFeedView}

/** Decade probe for the incremental-warehouse tier's two cost claims:
  *
  *  1. **A delta view refresh costs O(new changes) + O(view), never
  *     O(state)** — the reason the CDC feed exists. Measured: per-
  *     generation refresh seconds for all three view families
  *     (count/Σ, moment vector, DDSketch) against a store of growing
  *     key count, next to the one-shot aggregate over `latest()` each
  *     refresh replaces. The refresh should stay FLAT across decades
  *     while the one-shot grows with state.
  *  2. **SCD-2 state is versions + an in-watermark tail, never the
  *     event count** — [[Scd2Stream]]'s collapse law. A retention-
  *     shaped corpus where active keys re-send an UNCHANGED tier half
  *     the time: the collapsed state must track change points (+ the
  *     bounded tail), visibly below the delivered event count, at
  *     CoW per-batch cost.
  *
  * Diagnostic main, not an operator (tools/ contract).
  * Run: `runMain graft.tools.WarehouseProbe`.
  */
object WarehouseProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val v = body
      (v, (System.nanoTime() - t0) / 1e9)
    }
    def fs(path: String) = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    import spark.implicits._
    val kTouch = 256
    val deltas = 4

    // ---- 1. view refresh vs one-shot recompute across state decades
    println("| keys | consumer | refresh s/gen | one-shot s |")
    println("|---|---|---|---|")
    for (n <- Seq(100000L, 1000000L, 4000000L)) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-whprobe").toString
      val fn = CowUpsertStream.pipeline(dir, buckets = 4096,
        compactEvery = 100)
      fn(spark.range(0L, n).select(col("id").as("user_id"),
        concat(lit("t"), pmod(col("id"), lit(5L))).as("event_type"),
        lit(0L).as("ts_us"), col("id").as("event_id"),
        (col("id") % 97).cast("double").as("value")), 0L)
      (1 to deltas).foreach { b =>
        fn((0 until kTouch).map { i =>
          (i.toLong * (n / kTouch) + b, 1000L + b,
            n + b.toLong * kTouch + i, (b + i).toDouble)
        }.toDF("user_id", "ts_us", "event_id", "value")
          .select(col("user_id"),
            concat(lit("t"), pmod(col("user_id"), lit(5L)))
              .as("event_type"),
            col("ts_us"), col("event_id"), col("value")),
          b.toLong)
      }
      // Measure ONE steady-state single-gen fold per view family: the
      // view catches up to the frontier (the seed fold is O(state) by
      // definition — excluded), a fresh delta generation lands, and
      // the timed call folds exactly that generation.
      def perGen(idx: Int, tag: String,
          refresh: (String, String) => Long,
          oneShot: () => Long): Unit = {
        val v2 = java.nio.file.Files
          .createTempDirectory(s"graft-whview2").toString
        refresh(dir, v2) // view now current
        fn((0 until kTouch).map { i =>
          (i.toLong * (n / kTouch) + 99 + idx, 2000L + idx,
            n * 2 + idx.toLong * kTouch + i, 42.0)
        }.toDF("user_id", "ts_us", "event_id", "value")
          .select(col("user_id"),
            concat(lit("t"), pmod(col("user_id"), lit(5L)))
              .as("event_type"),
            col("ts_us"), col("event_id"), col("value")),
          (deltas + 1 + idx).toLong)
        val (_, t1) = timed { refresh(dir, v2) }
        val (_, tOne) = timed { oneShot() }
        println(f"| $n | $tag | $t1%.2f | $tOne%.2f |")
        fs(v2).delete(new Path(v2), true)
      }
      perGen(0, "count/sum (ChangeFeedView)",
        (s, v) => ChangeFeedView.refresh(spark, s, v),
        () => CowUpsertStream.latest(spark, dir).groupBy("event_type")
          .agg(count(lit(1)), sum("value")).collect().length.toLong)
      perGen(1, "moments (MomentFeedView)",
        (s, v) => MomentFeedView.refresh(spark, s, v),
        () => MomentFeedView.oneShot(
          CowUpsertStream.latest(spark, dir)).collect().length.toLong)
      perGen(2, "quantiles (SketchFeedView)",
        (s, v) => SketchFeedView.refresh(spark, s, v),
        () => graft.operators.DDSketch.sketchBy(
          CowUpsertStream.latest(spark, dir)
            .select(col("event_type"), col("value")),
          0.01, Seq("event_type")).collect().length.toLong)
      fs(dir).delete(new Path(dir), true)
    }

    // ---- 2. SCD-2 collapsed state vs delivered events
    println()
    println("| keys | events delivered | kept rows | s/batch |")
    println("|---|---|---|---|")
    val active = 2000
    val weeks = 5
    for (n <- Seq(100000L, 1000000L)) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-whscd2").toString
      val fn = Scd2Stream.pipeline(dir, buckets = 256,
        latenessUs = 10L, compactEvery = 3)
      fn(spark.range(0L, n).select(col("id").as("user_id"),
        lit("t").as("event_type"), lit(0L).as("ts_us"),
        col("id").as("event_id"), (col("id") % 3).as("tier")), 0L)
      var secs = 0.0
      var delivered = n
      (1 to weeks).foreach { w =>
        // active keys re-send: half change tier, half repeat it — the
        // repeats must collapse once the watermark passes them
        val batch = spark.range(0L, active.toLong).select(
          ((col("id") * (n / active)) % n).as("user_id"),
          lit("t").as("event_type"),
          (lit(w * 1000L) + col("id") % 7).as("ts_us"),
          (lit(n) + lit(w.toLong * active) + col("id")).as("event_id"),
          when(col("id") % 2 === 0, (col("id") + w) % 3)
            .otherwise(((col("id") * (n / active)) % n) % 3).as("tier"))
        val (_, t) = timed { fn(batch, w.toLong) }
        secs += t
        delivered += active
      }
      val kept = Scd2Stream.kept(spark, dir).count()
      println(f"| $n | $delivered | $kept | ${secs / weeks}%.2f |")
      fs(dir).delete(new Path(dir), true)
    }

    // ---- 3. z-order box law ON THE HISTORY STORE: a time-travel read
    // ("this user band's versions inside this time window" — the
    // interval slice every asOf/dwell consumer runs) reads rows by
    // per-file min/max pruning, z-ordered compaction vs plain. Same
    // measurement as CowProbe's CMP-COWZ leg, re-certified on
    // Scd2Stream's own writeGen routing: 512x512 (user_id × ts_us)
    // change-point grid (tier alternates along ts so nothing
    // collapses), a 64x64 box = 1.6% of key space.
    println()
    println("| layout | files | files hit | rows read | of rows |")
    println("|---|---|---|---|---|")
    for ((tag, z) <- Seq(
        ("plain", None),
        ("zorder rf=64", Some(graft.streaming.ZOrder(
          "ts_us", "user_id", bits = 9, rangeFiles = 64))))) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-whscd2z").toString
      val fn = Scd2Stream.pipeline(dir, buckets = 1,
        latenessUs = 1000000L, compactEvery = 1, zOrderOn = z)
      val grid = spark.range(0L, 512L * 512L).select(
        pmod(col("id"), lit(512L)).as("user_id"),
        lit("g").as("event_type"),
        (col("id") / 512L).cast("long").as("ts_us"),
        col("id").as("event_id"),
        ((col("id") / 512L) % 3).as("tier")) // changes every step: all kept
      fn(grid, 0L)
      fn(grid.limit(1), 1L) // gen 1: the compacting (z-laying) write
      val files = spark.read
        .parquet(s"$dir/gen-1/bucket=0")
        .groupBy(input_file_name().as("f"))
        .agg(min("ts_us").as("xlo"), max("ts_us").as("xhi"),
          min("user_id").as("ylo"), max("user_id").as("yhi"),
          count(lit(1)).as("rows"))
        .collect()
      val hit = files.filter(r => r.getLong(1) <= 287L &&
        r.getLong(2) >= 224L && r.getLong(3) <= 287L &&
        r.getLong(4) >= 224L)
      val total = files.map(_.getLong(5)).sum
      val read = hit.map(_.getLong(5)).sum
      println(f"| $tag | ${files.length} | ${hit.length} | $read | " +
        f"${100.0 * read / total}%.1f%% |")

      // ---- 4. the SERVING path prunes (not just the file census):
      // asOf/versions with a key-band predicate pushed to the scan.
      // Engine-measured records read (task input metrics), full read
      // vs the 12.5% user band — on the z-ordered layout the pruned
      // read should approach the band fraction; plain layout reads
      // everything either way (each file spans all users).
      if (tag != "plain") {
        val recs = new java.util.concurrent.atomic.LongAdder
        val lst = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (t.taskMetrics != null)
              recs.add(t.taskMetrics.inputMetrics.recordsRead)
        }
        def rowsRead(body: => Unit): Long = {
          spark.sparkContext.addSparkListener(lst)
          recs.reset()
          body
          Thread.sleep(1500) // drain the listener bus (diagnostic main)
          spark.sparkContext.removeSparkListener(lst)
          recs.sum()
        }
        val pred = Some(col("user_id").between(224L, 287L))
        val full = rowsRead(
          Scd2Stream.versions(spark, dir).count())
        val pruned = rowsRead(
          Scd2Stream.versions(spark, dir, keyPredicate = pred).count())
        println()
        println("| serving read | records read | of full |")
        println("|---|---|---|")
        println(f"| versions() full | $full | 100%% |")
        println(f"| versions(user band 12.5%%) | $pruned | " +
          f"${100.0 * pruned / full}%.1f%% |")
      }
      fs(dir).delete(new Path(dir), true)
    }
    spark.stop()
  }
}
