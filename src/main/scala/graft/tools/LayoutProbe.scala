package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Decade probe for [[Layout]]'s claim: what does a z-order write buy
  * a selective 2-d scan, in rows actually READ (post row-group-skip
  * task input metrics — the ground truth the planner never sees) and
  * wall clock, vs the two layouts a pipeline gets for free (natural
  * arrival order; single-column sort)?
  *
  * Corpus: lineitem's (l_orderkey, l_partkey) pairs at sf0.1 and a
  * 10×/100× synthetic extension (keys scaled with the same uniform
  * shape). Each layout writes 32 files with 1 MB row groups (the
  * skipping granularity local file sizes can exercise; a 100 TB table
  * keeps 128 MB groups and relies on file-level disjointness, same
  * law). Query: a centered box selecting ~1% of each key's span —
  * AND of two range predicates, both pushed to parquet.
  *
  * Run: `runMain graft.tools.LayoutProbe`. Diagnostic main (tools/
  * contract): the listener and timing loop are the probe; the
  * operator under test is Layout.zOrderWrite unchanged.
  */
object LayoutProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val recordsRead = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          recordsRead.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    })

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val v = body
      (v, (System.nanoTime() - t0) / 1e9)
    }

    val base = spark.read
      .parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(col("l_orderkey").cast("long").as("x"),
        col("l_partkey").cast("long").as("y"))

    println("| corpus | layout | predicate | rows out | rows read | read frac | scan s |")
    println("|---|---|---|---|---|---|---|")
    for (scale <- Seq(1, 10)) {
      // Scale by replicating into a CONTIGUOUS x key space (offset =
      // span + 1) — same uniform shape, scale x the rows and the x
      // span, no gaps for a centered predicate to fall into.
      val xSpan = base.agg(max("x")).head().getLong(0) + 1
      val df = (0 until scale).map { r =>
        base.select((col("x") + lit(r.toLong * xSpan)).as("x"), col("y"))
      }.reduce(_ unionByName _)
      val n = df.count()
      val (xMin, xMax, yMin, yMax) = {
        val r = df.agg(min("x"), max("x"), min("y"), max("y")).head()
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
      def band(lo: Long, hi: Long, frac: Double): (Long, Long) = {
        val span = hi - lo
        val half = (span * frac / 2).toLong
        // Off-center (3/8 point): the exact midline is the z-curve's
        // documented worst case (quadrant corner) — measured separately
        // by LayoutSpec; the probe takes the typical case.
        val c = lo + (span * 3) / 8
        (c - half, c + half)
      }
      // Three predicate shapes: the 1-d bands are where a single-column
      // sort is respectively perfect and useless; the 2-d box is the
      // shape z-order exists for.
      val (x1, x2) = band(xMin, xMax, 0.01)
      val (y1, y2) = band(yMin, yMax, 0.01)
      val (bx1, bx2) = band(xMin, xMax, 0.1)
      val (by1, by2) = band(yMin, yMax, 0.1)
      val preds: Seq[(String, org.apache.spark.sql.Column)] = Seq(
        "x-band 1%" -> col("x").between(x1, x2),
        "y-band 1%" -> col("y").between(y1, y2),
        "xy-box 10%x10%" ->
          (col("x").between(bx1, bx2) && col("y").between(by1, by2)))
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-layout-$scale").toString
      // Three layouts, same content, same file/row-group budget.
      val layouts: Seq[(String, () => Unit)] = Seq(
        "natural" -> (() => df.repartition(32)
          .write.mode("overwrite")
          .option("parquet.block.size", 1L << 20)
          .parquet(s"$root/natural")),
        "x-sorted" -> (() => df.repartitionByRange(32, col("x"))
          .sortWithinPartitions("x")
          .write.mode("overwrite")
          .option("parquet.block.size", 1L << 20)
          .parquet(s"$root/x-sorted")),
        "z-order" -> (() =>
          Layout.zOrderWrite(df, "x", "y", s"$root/z-order", nFiles = 32,
            bits = 24)))
      for ((name, write) <- layouts) {
        write()
        for ((pname, pred) <- preds) {
          val scan = spark.read.parquet(s"$root/$name").where(pred)
          // Warm the footers once, then measure.
          scan.count()
          recordsRead.set(0)
          val (rows, t) = timed { scan.count() }
          // Listener events drain asynchronously after the job returns
          // (the bus is spark-private; a short settle is enough for a
          // diagnostic main).
          Thread.sleep(1000)
          val read = recordsRead.get()
          println(f"| ${n / 1000}k | $name | $pname | $rows | $read " +
            f"| ${read.toDouble / n}%.4f | $t%.2f |")
        }
      }
      org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
    }
    spark.stop()
  }
}
