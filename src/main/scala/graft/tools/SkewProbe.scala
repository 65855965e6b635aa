package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured law for the OTHER skew lever: q_adv3 demonstrates salting
  * (the rewrite the USER owns); this probe pins what the ENGINE's AQE
  * skew-join does un-rewritten, so SCALE.md's "AQE splits oversized
  * partitions" row carries a number instead of a claim.
  *
  * Shape: a sort-merge join (broadcast disabled) of a fact table whose
  * join key is planted-skewed (one key holds `share` of all rows)
  * against a uniform build side — the exact join AQE's skew handling
  * targets (OptimizeSkewedJoin splits the oversized sorted partition
  * into advisory-sized slices and replicates the matching build rows).
  * Thresholds are scaled to the probe (8 MB skew threshold, 2 MB
  * advisory) the way a cluster job scales them to executor memory;
  * what transfers is the RATIO and the split behavior, not the
  * absolute seconds. Each cell: same plan, AQE skew-join OFF vs ON,
  * min of 2 reps; `skewed=` reports whether the executed plan's SMJ
  * was actually marked skew=true (the probe validates it fired, not
  * just that a config was set).
  *
  * Diagnostic main, not an operator (tools/ contract).
  * Run: `runMain graft.tools.SkewProbe`.
  */
object SkewProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.autoBroadcastJoinThreshold", -1)
      .config("spark.sql.adaptive.enabled", true)
      .config("spark.sql.adaptive.coalescePartitions.enabled", true)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", 2)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nFact = 8000000L
    val nDim = 2000000L
    val keys = 100000L

    def fact(share: Double) = spark.range(nFact).select(
      // First `share` of rows land on key 0; the rest spread uniformly.
      when(col("id") < (nFact * share).toLong, lit(0L))
        .otherwise(col("id") % keys).as("k"),
      (col("id") * 17 % 1000).as("v"))

    val dim = spark.range(nDim)
      .select((col("id") % keys).as("k"), (col("id") % 97).as("w"))

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    println("| skew share | off s | on s | ratio | skewed= |")
    println("|---|---|---|---|---|")
    for (share <- Seq(0.1, 0.5, 0.9)) {
      val f = fact(share)
      def run(): (Double, Boolean) = {
        var marked = false
        val t = timed {
          f.join(dim, "k").agg(sum(col("v") * col("w"))).head()
        }
        // Re-derive the executed plan to read the skew marker. collect()
        // (not head(): head runs a separate limited plan, leaving THIS
        // queryExecution unexecuted and its adaptive plan non-final).
        val q = f.join(dim, "k").agg(sum(col("v") * col("w")))
        q.collect()
        val ps = q.queryExecution.executedPlan.toString
        marked = ps.contains("skew=true")
        (t, marked)
      }
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val off = Seq.fill(2)(run()._1).min
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val runs = Seq.fill(2)(run())
      val on = runs.map(_._1).min
      val marked = runs.exists(_._2)
      println(f"| ${(share * 100).toInt}%% | $off%.2f | $on%.2f | " +
        f"${off / on}%.2f | $marked |")
    }

    // ---- the sketch-priced salted plan in AQE's blind BAND. The band
    // is structural: a partition is marked only above factor × median,
    // so at P partitions the unmarked hot-share tops out where
    // s + (1−s)/P = F·(1−s)/P — at the probe's scaled F=2 that is
    // s < 11% (bounded pain: straggler < 2× median by construction),
    // but at the PRODUCTION default F=5 the band reaches s ≈ 33%: a
    // 27%-hot key rides a ~4×-median straggler partition completely
    // unmarked. That is the case planted here (factor restored to the
    // default 5 for this leg; skew-join ON both sides). decideSalt
    // flags the key from the CMS estimate (27% > the 2×-fair-share
    // floor at parts=8) and saltedEquiJoin replicates ONLY its dim
    // rows.
    println()
    println("| skew share | aqe-on s | salted s | ratio | keys salted |")
    println("|---|---|---|---|---|")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5")
    // 3× the fact rows of the probe above: the tail must dominate the
    // run's fixed costs for the comparison to measure the LAW rather
    // than planner overhead (at 8M rows both plans measured ~1.8 s —
    // the ~4×-median straggler hid under the constant terms).
    val nFact2 = 24000000L
    def fact2(share: Double) = spark.range(nFact2).select(
      when(col("id") < (nFact2 * share).toLong, lit(0L))
        .otherwise(col("id") % keys).as("k"),
      (col("id") * 17 % 1000).as("v"))
    for (share <- Seq(0.30)) {
      val f = fact2(share)
      val items = f.select(col("k").cast("string").as("item"))
      val sk = graft.operators.CountMin.sketch(items, 4, 512)
        .localCheckpoint()
      val hot = graft.operators.SkewSalt.decideSalt(
          items.distinct(), sk, 4, 512,
          graft.operators.SkewSalt.sketchTotal(sk), parts = 8)
        .where(col("salt"))
        .select(col("item").cast("long").as("k"))
        .localCheckpoint()
      val nHot = hot.count()
      val plain = Seq.fill(2)(timed {
        f.join(dim, "k").agg(sum(col("v") * col("w"))).head()
      }).min
      val salted = Seq.fill(2)(timed {
        graft.operators.SkewSalt.saltedEquiJoin(f, dim, "k", hot,
            salts = 8, saltOn = col("v"))
          .agg(sum(col("v") * col("w"))).head()
      }).min
      println(f"| ${(share * 100).toInt}%% | $plain%.2f | $salted%.2f | " +
        f"${plain / salted}%.2f | $nHot |")
    }
    spark.stop()
  }
}
