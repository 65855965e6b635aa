package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},...,"sf":...}.
  * Per-query seconds are rounded to 3dp to keep the line compact (the
  * driver captures only a bounded tail of stdout). An untimed warmup
  * query absorbs JVM/codegen startup so per-query numbers are steady.
  *
  * Noise control (round-3): queries run in sorted-name order (stable
  * cache/JIT context round over round — Map iteration order used to
  * reshuffle it), 2 reps with the min taken, plus a 3rd rep for
  * sub-second queries, where run-to-run noise (observed ±30%) is the
  * same order as the signal (r2's two flagged "regressions" — q_agg4,
  * q_rel17, sources unchanged since r1 — were exactly this), and for
  * wide-spread queries (max > 1.5×min), whose first rep paid a
  * one-time memoized training that 2-rep medians would report as the
  * steady state (round 7; q_sim5c).
  *
  * Reps are INTERLEAVED across queries (pass 1 = A,B,C…, pass 2 =
  * A,B,C…), not run back-to-back per query (A,A,B,B…): round 5's bench
  * showed ten sort-contiguous queries 2.8-6.5× slower with zero code
  * change — sustained environment load during one window of the run
  * poisons EVERY rep of a contiguous block under back-to-back reps,
  * while under interleaving it costs each affected query one rep of
  * many and min-of-reps recovers. The line also reports per-query
  * MEDIANS (`queries_med`, `total_med`) so min-vs-median divergence
  * flags a noisy run directly, and the JVM's cumulative GC time
  * (`gc_sec`) to rule collector pressure in or out.
  *
  * Floor accounting: with ~70 queries at a ≈0.2 s session/plan-overhead
  * floor, the floor is half the total and drowns per-operator trends.
  * The line reports `floor` (the minimum per-query time — an overhead
  * estimate no real work can undercut) and `value_adj` = value −
  * n·floor, the floor-adjusted work estimate to trend across rounds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmups spanning the main execution paths (scan/pushdown,
    // shuffle join + agg, window) — with a single scan-only warmup, the
    // first queries in sorted order paid the JIT for joins and windows:
    // q_adv1 measured 1.4 s in full runs vs 0.67 s once warm.
    for (w <- Seq("q_rel1_scan_filter", "q_adv2_local_supplier_volume",
        "q_rel12_window_rank"))
      SparkEntry.queries.get(w)
        .foreach(fn => try { fn(spark, sfDir).count() } catch { case _: Throwable => () })
    // Optional args = subset of query names to (re)run (local profiling;
    // the driver passes none). SPARK_GRAFT_REPS overrides the base reps.
    val selected =
      if (args.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else SparkEntry.queries.filter { case (k, _) => args.contains(k) }.toSeq.sortBy(_._1)
    val baseReps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    // A query that THROWS must not be silently timed as a success — its
    // near-instant failure time would become `floor` and poison
    // value_adj while hiding the breakage. Track (elapsed, ok) per rep;
    // a query with any failed rep lands in `failed` and is excluded
    // from total/floor/value_adj.
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] query failed: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // Free the graph-family queries' eager pair-graph checkpoints
      // deterministically after each rep's action — without this every
      // rep stacks another copy in executor storage until the
      // ContextCleaner notices. Outside the timed region (it's the
      // next rep's hygiene, not this query's work).
      graft.util.ScratchCheckpoints.drain()
      (elapsed, ok)
    }
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).filter(_ > 0).sum
    }
    // Machine load (1/5/15-min averages) at run start and end, so a
    // BENCH_rN is self-diagnosing: round 8 burned a full re-run proving
    // a regression-looking window was load-poisoned — with start/end
    // loadavg in the record, that postmortem is one field read. Best
    // effort: absent /proc (non-Linux), report an empty list.
    def loadavg: Seq[Double] =
      try new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg")),
          java.nio.charset.StandardCharsets.UTF_8)
        .split("\\s+").take(3).toSeq.map(_.toDouble)
      catch { case _: Throwable => Seq.empty }
    // Host-calibration probe (round 19): a FIXED, data-free, CPU-bound
    // job — xxhash64 over a 200M-row range, partitioned across the
    // worker threads — timed at run start and end and reported as
    // `calib_s` (the min: a load spike during one probe must not fake
    // a slow host). The r16→r18 boards drifted ~10%/round with zero
    // plan changes (SCALE.md adjudicated it environmental by ratio
    // argument); with calib_s in every board, cross-round totals
    // divide by it DIRECTLY instead of being argued, and the 2× bench
    // contract evaluates on calibrated numbers.
    def calibOnce(): Double = {
      val t0 = System.nanoTime()
      // bit_xor, not sum: 200M full-range hashes overflow a Long sum
      // under ANSI; xor is closed over Long and still forces the work.
      spark.range(0L, 200000000L, 1L, cpus.toInt)
        .selectExpr("xxhash64(id) AS h").selectExpr("bit_xor(h)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // Shuffle+IO calibration leg (round 21, VERDICT #10): the CPU-only
    // probe missed the non-CPU contention that poisoned whole windows
    // (SCALE.md rounds 19-21: same code, same calib_s, totals 25%
    // apart). A fixed 10M-row keyed exchange prices the shuffle path
    // (serialization, local shuffle disk, scheduler) so a poisoned
    // window shows as calib_shuffle_s drift even when calib_s is flat.
    // Reported as `calib_shuffle_s` (min of the two bracketing runs) —
    // an ADDITION to the line; the timed queries are untouched.
    def calibShuffleOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 10000000L, 1L, cpus.toInt)
        .selectExpr("pmod(xxhash64(id), 1000000) AS k", "id AS v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v").as("s"))
        .selectExpr("bit_xor(s)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val calib0 = calibOnce()
    val calibSh0 = calibShuffleOnce()
    val load0 = loadavg
    val gc0 = gcMillis
    // Interleaved passes: every pass visits all queries in sorted order,
    // so a transient load window hits one rep of many queries instead of
    // every rep of a few.
    val passes = (1 to baseReps).map { _ =>
      selected.map { case (name, fn) => name -> timeOnce(fn) }
    }
    val byName = selected.map { case (name, _) =>
      name -> passes.map(_.collectFirst { case (`name`, r) => r }.get)
    }
    // One extra (third) pass for two classes: sub-second queries, where
    // the plan floor dominates and a single slow rep (GC, JIT
    // code-cache compaction) is common; and WIDE-SPREAD queries
    // (max > 1.5×min), where the first rep paid a one-time cost later
    // reps amortize — the sim family's memoized index training is the
    // standing case (round 6: q_sim5c "median" at 2 reps was literally
    // its cold-training rep, 2.9× its min). With 3 reps the median is
    // the steady-state number; min stays the best case.
    val needsExtra = byName.collect {
      case (n, reps) if reps.map(_._1).min < 1.0 ||
          reps.map(_._1).max > 1.5 * reps.map(_._1).min => n
    }.toSet
    val extra = selected.collect { case (name, fn) if needsExtra(name) =>
      name -> timeOnce(fn)
    }.toMap
    val timed = byName.map { case (name, reps) =>
      val all = reps ++ extra.get(name)
      val ts = all.map(_._1).sorted
      (name, ts.head, ts(ts.size / 2), all.forall(_._2))
    }
    val gcSec = (gcMillis - gc0) / 1e3
    val results = timed.collect { case (n, t, _, true) => n -> t }
    val medians = timed.collect { case (n, _, m, true) => n -> m }
    val failed = timed.collect { case (n, _, _, false) => n }
    // Locale.ROOT: the default-locale f-interpolator would emit "0,123"
    // under comma-decimal locales — invalid JSON for the driver's parse.
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val qsMed = medians.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalMed = medians.map(_._2).sum
    val floor = if (results.nonEmpty) results.map(_._2).min else 0.0
    val adj = total - results.size * floor
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    def loadJson(l: Seq[Double]): String = l.map(f3).mkString("[", ",", "]")
    val calib1 = calibOnce()
    val calibSh1 = calibShuffleOnce()
    val calibS = math.min(calib0, calib1)
    val calibShS = math.min(calibSh0, calibSh1)
    // Field ORDER is load-bearing (round 21, VERDICT #2): the driver
    // parses a bounded stdout TAIL, and a 177-query line overflows it
    // from the HEAD — round 20's PERF comparison got n_common=0 because
    // the leading summary scalars fell outside the window. The bulky
    // per-query maps therefore go FIRST and every summary scalar
    // (value, n, calib, failed, sf, and the new "cpus" echo of
    // $SPARK_GRAFT_CPUS for the scaling audit) goes at the END, so
    // truncation eats per-query detail, never the totals. Additions +
    // ordering only — the metric itself and the timing methodology are
    // unchanged, so cross-round comparison stays valid.
    val line =
      s"""{"metric":"total","unit":"sec","queries":$qs,""" +
      s""""queries_med":$qsMed,""" +
      s""""n":${results.size},"floor":${f3(floor)},"value_adj":${f3(adj)},""" +
      s""""total_med":${f3(totalMed)},"gc_sec":${f3(gcSec)},""" +
      s""""calib_s":${f3(calibS)},"calib_start":${f3(calib0)},""" +
      s""""calib_end":${f3(calib1)},""" +
      s""""calib_shuffle_s":${f3(calibShS)},""" +
      s""""calib_shuffle_start":${f3(calibSh0)},"calib_shuffle_end":${f3(calibSh1)},""" +
      s""""load_start":${loadJson(load0)},"load_end":${loadJson(loadavg)},""" +
      s""""cpus":$cpus,""" +
      s""""failed":$failedJson,"value":${f3(total)},"sf":"$sfDir"}"""
    println(line)
    // Memo-slot observability (stderr, opt-in): per-slot hit/miss since
    // JVM start. A slot whose misses grow with passes is cycling its
    // LRU — every miss is an eager corpus pass — while misses equal to
    // the distinct config count mean the cache is doing its job.
    if (sys.env.contains("SPARK_GRAFT_MEMOSTATS"))
      graft.operators.Similarity.memoStats.toSeq.sortBy(_._1)
        .foreach { case (s, (h, m)) =>
          System.err.println(s"[memo] $s hits=$h misses=$m")
        }
    // The driver captures only a bounded stdout TAIL — with 77+ queries
    // the head of the per-query map can fall outside the window (it did
    // in round 3). The file copy is the complete record.
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
