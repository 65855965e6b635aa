package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.hadoop.fs.Path

import graft.streaming.SplitStream

/** Decade probe for [[SplitStream]]'s ONE driver pin — the redirect
  * log collected for min-label union-find resolution (SplitStream
  * resolveRoots; round-14 VERDICT's unmeasured-pin flag). The corpus
  * is deliberately MERGE-HEAVY, the regime where the pin is worst:
  * every family of 10 docs arrives as 5 disconnected singletons
  * (slots 0–4, no edges) and 5 later bridges (slots 5–9, each edging
  * two earlier singletons), so ~half of all docs generate a redirect
  * event — template families split across batches, exactly the shape
  * a 100 TB dedup stream produces when near-dup families straddle
  * ingestion days.
  *
  * Measured per decade (5k / 50k / 500k docs, 10 batches):
  *   - redirect rows in the committed log with compaction OFF (the
  *     pin's size: ≈ merge events since the last compaction, NOT docs)
  *   - driver-side resolveRoots cost on that log (collect + union-find
  *     — the per-batch price every batch pays)
  *   - the same with compactEvery = 4 (the fold bounds the log at
  *     ≤ 4 batches of merges; post-compaction reads resolve instantly)
  *   - end-to-end pipeline + assignments() time for both settings
  *
  * Diagnostic main, not an operator (tools/ contract): the timing
  * loop and println are the probe; the operator under test never
  * changes. Run: `runMain graft.tools.SplitProbe`.
  */
object SplitProbe {

  /** Bridge edges from doc_id arithmetic alone: family f = id % nFam,
    * slot s = id / nFam; slots ≥ 5 edge to the (s−5)'th and (s−4)'th
    * singleton of their family. Deterministic and text-free, so the
    * probe isolates the STATE cost from any generator cost.
    */
  private def pairsOf(nFam: Long)(fresh: DataFrame, members: DataFrame)
      : DataFrame = {
    val f = col("doc_id") % nFam
    val s = (col("doc_id") / nFam).cast("long")
    val bridges = fresh.where(s >= 5)
    bridges.select(col("doc_id").as("doc_a"),
        (f + (s - 5) * nFam).as("doc_b"))
      .unionByName(bridges.select(col("doc_id").as("doc_a"),
        (f + (s - 4) * nFam).as("doc_b")))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val v = body
      (v, (System.nanoTime() - t0) / 1e9)
    }

    println("| docs | compactEvery | merges | pipeline s | redirect rows " +
      "| resolve s | assignments s |")
    println("|---|---|---|---|---|---|---|")
    for (n <- Seq(5000L, 50000L, 500000L)) {
      val nFam = n / 10
      val batches = (0 until 10).map(b =>
        spark.range(b * nFam, (b + 1) * nFam).select(col("id").as("doc_id")))
      for (compactEvery <- Seq(Int.MaxValue, 4)) {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-splitprobe-$n-$compactEvery").toString
        var merges = 0L
        val fn = SplitStream.splitPipeline(dir,
          pairsOf = pairsOf(nFam), compactEvery = compactEvery,
          onBatch = (_, _, _, m) => merges += m)
        val (_, tPipe) = timed {
          batches.zipWithIndex.foreach { case (d, i) => fn(d, i.toLong) }
        }
        // The pin, isolated: collect the committed redirect log and run
        // the in-memory union-find — what EVERY subsequent batch pays
        // before its own work. (GenStore is streaming-private; the gen
        // listing is three lines of fs walking.)
        val hfs = new Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val latest = hfs.listStatus(new Path(dir)).toSeq
          .map(_.getPath.getName).filter(_.startsWith("gen-"))
          .map(_.stripPrefix("gen-")).filter(_.forall(_.isDigit))
          .map(_.toLong)
          .filter(g => hfs.exists(new Path(s"$dir/gen-$g/COMMITTED"))).max
        // Explicit schema: a schemaless read would try to merge footers
        // of every file in the dir, including the 0-byte COMMITTED marker.
        val state = spark.read.schema(
            "kind STRING, a BIGINT, b BIGINT, batch_id BIGINT")
          .parquet(s"$dir/gen-$latest")
        val (nRedirect, tResolve) = timed {
          val pairs = state.where(col("kind") === "r")
            .select(col("a"), col("b")).as[(Long, Long)].collect()
          val parent = scala.collection.mutable.Map.empty[Long, Long]
          def find(x: Long): Long = {
            val p = parent.getOrElse(x, x)
            if (p == x) x else { val r = find(p); parent(x) = r; r }
          }
          pairs.foreach { case (u, v) =>
            val (ru, rv) = (find(u), find(v))
            if (ru != rv) {
              val root = math.min(ru, rv)
              parent(math.max(ru, rv)) = root
              parent(ru) = root; parent(rv) = root
            }
          }
          pairs.length.toLong
        }
        val (nAssigned, tAssign) = timed {
          SplitStream.assignments(spark, dir).count()
        }
        require(nAssigned == n, s"probe bug: $nAssigned of $n docs assigned")
        val ceLabel = if (compactEvery == Int.MaxValue) "off"
          else compactEvery.toString
        println(f"| $n | $ceLabel | $merges | $tPipe%.2f | $nRedirect " +
          f"| $tResolve%.3f | $tAssign%.2f |")
        hfs.delete(new Path(dir), true)
      }
    }
    spark.stop()
  }
}
