package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StringType, StructField, StructType}

import graft.operators.DDSketch

/** The generalized delta algebra over [[CowUpsertStream]]'s CDC feed —
  * [[ChangeFeedView]] (count/Σ) extended to the two other view
  * families whose state the repo already maintains STREAM-side and can
  * therefore also maintain FEED-side, bit-exactly, at any refresh
  * cadence:
  *
  *  - [[MomentFeedView]]: per-`event_type` moment vectors
  *    ([[MomentStream]]'s algebra — n, Σx, Σy, Σx², Σy², Σxy over the
  *    CURRENT rows, x = event time, y = value), serving live
  *    mean/variance/corr/slope of the store without rescanning it;
  *  - [[SketchFeedView]]: per-`event_type` DDSketch bucket tables
  *    ([[DDSketchStream]]'s state over the CURRENT rows), serving live
  *    quantiles of the store.
  *
  * What makes a view family delta-able off a feed with UPDATES and
  * DELETES is stronger than streamed-mergeable: the fold must support
  * SUBTRACTION, not just addition. Both families here qualify because
  * their state entries are exact integers (micro-quantized decimal
  * sums; bucket counters) — an update folds (after − before), a delete
  * folds (− before), and integer arithmetic telescopes exactly, so the
  * committed view equals the one-shot aggregate over
  * [[CowUpsertStream.latest]] cell for cell at EVERY refresh cadence,
  * including cadences that batch delete generations together
  * (certified in ChangeFeedViewSpec). A float-summed view could not:
  * subtraction would reintroduce association-order drift.
  *
  * THE ONE-SIDED CAP CAVEAT ([[DDSketch.collapse]] under subtraction):
  * the collapsing cap is merge-compatible (cutoffs only rise under
  * UNION) but NOT delete-compatible, so [[SketchFeedView]] runs
  * uncapped by design. Counterexample: sketch {b₁:1, …, bₘ₊₁:1}
  * capped at m pools b₁ into the cutoff b₂; now delete the value in
  * bₘ₊₁ — the true capped sketch of the remaining m values is the
  * UNCOLLAPSED {b₁:1,…,bₘ:1} (it fits the cap), but the view cannot
  * un-pool b₁ from b₂, and subtracting the deleted bₘ₊₁ cannot lower
  * the cutoff. Collapse destroys exactly the information deletion
  * needs back; a capped delta view is therefore only an upper-bound
  * sketch. The uncapped state is bounded by ⌈log_γ(max/min)⌉ buckets
  * per key regardless of row count — the cap's job (pathological value
  * ranges) is the one thing this view declines.
  *
  * The same criterion rules OUT the remaining stream-side family: an
  * HLL distinct-count view is register-MAX state — max is idempotent
  * but has no inverse, so a delete cannot be folded (was the departing
  * value the register's sole witness? the sketch forgot). Exact
  * distinct-per-key IS delta-able but its state is the value set
  * itself — that view is [[CowUpsertStream.latest]] + a groupBy, not a
  * bounded summary. Negative space stated so nobody "completes" it
  * wrongly.
  *
  * Both views follow the family protocol: GenStore commit-last state
  * under `viewDir`, meta row discriminated on a null key, progress as
  * the high-water FEED generation, refresh folding exactly
  * (hw, frontier] with the frontier pinned BEFORE the change listing
  * (the [[ChangeFeedView]] concurrent-writer bound).
  */
object MomentFeedView {

  private val Dec = DecimalType(38, 0)

  /** y quantization: micro-units of `value` (the [[MomentStream]]
    * discipline). */
  val Scale = 1000000L

  /** x quantization: epoch SECONDS (ts_us div 10⁶) — epoch µs squared
    * (~10³⁰ per row) would exhaust decimal(38,0) within ~10⁷ rows;
    * seconds (~10⁹, squared ~10¹⁸) hold 10¹⁹ rows. The one-shot truth
    * uses the same floor, so the view stays bit-exact; slope reads in
    * value-units per second.
    */
  private def xSec = expr("ts_us div 1000000").cast(Dec)
  private def xSecOld = expr("old_ts_us div 1000000").cast(Dec)

  private val viewSchema = StructType(Seq(
    StructField("event_type", StringType), StructField("n", LongType),
    StructField("sx", Dec), StructField("sy", Dec),
    StructField("sxx", Dec), StructField("syy", Dec),
    StructField("sxy", Dec),
    StructField("hw_gen", LongType), StructField("view_rows", LongType)))

  /** Committed meta: (high-water feed gen, view rows); None = fresh. */
  def readMeta(spark: SparkSession, viewDir: String)
      : Option[(Long, Long)] = {
    val gens = GenStore.committed(spark, viewDir)
    if (gens.isEmpty) None
    else {
      val meta = spark.read.schema(viewSchema)
        .parquet(GenStore.dir(viewDir, gens.max))
        .where(col("event_type").isNull)
        .collect()
      if (meta.length != 1) throw new IllegalStateException(
        s"moment view generation ${gens.max} has ${meta.length} meta rows " +
          "(want exactly 1) — foreign or corrupt state")
      Some((meta.head.getLong(7), meta.head.getLong(8)))
    }
  }

  /** The live moment table (event_type, n, sx, sy, sxx, syy, sxy). */
  def table(spark: SparkSession, viewDir: String): DataFrame = {
    val gens = GenStore.committed(spark, viewDir)
    if (gens.isEmpty)
      spark.createDataFrame(java.util.Collections.emptyList[Row](),
        StructType(viewSchema.take(7)))
    else spark.read.schema(viewSchema)
      .parquet(GenStore.dir(viewDir, gens.max))
      .where(col("event_type").isNotNull)
      .select("event_type", "n", "sx", "sy", "sxx", "syy", "sxy")
  }

  /** The one-shot truth over an arbitrary (event_type, ts_us, value)
    * current-row table — the aggregate the view must equal cell for
    * cell (pairwise-complete: null values drop, as in MomentStream).
    */
  def oneShot(current: DataFrame): DataFrame = {
    val ym = round(col("value") * lit(Scale), 0).cast(Dec)
    current.where(col("value").isNotNull)
      .select(col("event_type"), xSec.as("xm"), ym.as("ym"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("xm").cast(Dec).as("sx"), sum("ym").cast(Dec).as("sy"),
        sum(col("xm") * col("xm")).cast(Dec).as("sxx"),
        sum(col("ym") * col("ym")).cast(Dec).as("syy"),
        sum(col("xm") * col("ym")).cast(Dec).as("sxy"))
  }

  /** Fold every unseen committed feed generation into the view.
    * Returns change rows folded; 0 = nothing new.
    */
  def refresh(spark: SparkSession, stateDir: String,
      viewDir: String): Long = {
    val feedGens = GenStore.committed(spark, stateDir)
    if (feedGens.isEmpty) return 0L
    val frontier = feedGens.max
    val hw = readMeta(spark, viewDir).map(_._1).getOrElse(-1L)
    if (frontier <= hw) return 0L
    val fresh = CowUpsertStream.changes(spark, stateDir)
      .where(col("gen") > hw && col("gen") <= frontier)
    // after-image contributes unless this row is a delete (or carries
    // a null value); before-image subtracts unless it is an insert
    // (or the stored value was null) — pairwise-complete both sides.
    val hasA = col("op") =!= "delete" && col("value").isNotNull
    val hasB = col("op") =!= "insert" && col("old_value").isNotNull
    val yA = round(col("value") * lit(Scale), 0).cast(Dec)
    val yB = round(col("old_value") * lit(Scale), 0).cast(Dec)
    val zero = lit(0L).cast(Dec)
    def d(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      when(hasA, a).otherwise(zero) - when(hasB, b).otherwise(zero)
    val deltas = fresh.select(col("event_type"),
        (when(hasA, 1L).otherwise(0L) - when(hasB, 1L).otherwise(0L))
          .as("n"),
        d(xSec, xSecOld).as("sx"), d(yA, yB).as("sy"),
        d(xSec * xSec, xSecOld * xSecOld).as("sxx"),
        d(yA * yA, yB * yB).as("syy"),
        d(xSec * yA, xSecOld * yB).as("sxy"))
    val merged = table(spark, viewDir).unionByName(deltas)
      .groupBy("event_type")
      .agg(sum("n").as("n"),
        sum("sx").cast(Dec).as("sx"), sum("sy").cast(Dec).as("sy"),
        sum("sxx").cast(Dec).as("sxx"), sum("syy").cast(Dec).as("syy"),
        sum("sxy").cast(Dec).as("sxy"))
      // a fully-deleted key telescopes to n=0 (and exactly then the
      // sums are 0) — the one-shot aggregate has no such row
      .where(col("n") =!= 0L)
      .withColumn("hw_gen", lit(null).cast("long"))
      .withColumn("view_rows", lit(null).cast("long"))
    val folded = fresh.count()
    val gens = GenStore.committed(spark, viewDir)
    val gen = gens.lastOption.map(_ + 1).getOrElse(0L)
    val genDir = GenStore.dir(viewDir, gen)
    merged.coalesce(1).write.mode("overwrite").parquet(genDir)
    val rows = spark.read.schema(viewSchema).parquet(genDir).count()
    val metaDf = spark.createDataFrame(
      java.util.Collections.singletonList(
        Row(null, null, null, null, null, null, null, frontier, rows)),
      viewSchema)
    metaDf.coalesce(1).write.mode("append").parquet(genDir)
    GenStore.commit(spark, viewDir, gen)
    GenStore.dropBelow(spark, viewDir, gen)
    folded
  }

  /** Live statistics off the view — per event_type mean value,
    * variance, value-vs-time corr and OLS slope (value units per
    * second) over the store's CURRENT rows, derived from ≤ keys rows
    * of decimal arithmetic. Degenerate series (n < 2, zero variance)
    * read null, the MomentStream convention.
    */
  def stats(spark: SparkSession, viewDir: String): DataFrame = {
    val n = col("n").cast(Dec)
    val covN = col("sxy") * n - col("sx") * col("sy")
    val varXN = col("sxx") * n - col("sx") * col("sx")
    val varYN = col("syy") * n - col("sy") * col("sy")
    val ok = (col("n") > 1) && (varXN > 0) && (varYN > 0)
    table(spark, viewDir)
      .withColumn("mean_value",
        col("sy").cast("double") / col("n") / lit(Scale.toDouble))
      .withColumn("var_value", when(col("n") > 1,
        varYN.cast("double") / col("n") / col("n") /
          lit(Scale.toDouble * Scale.toDouble)))
      .withColumn("corr", when(ok,
        covN.cast("double") /
          sqrt(varXN.cast("double")) / sqrt(varYN.cast("double"))))
      .withColumn("slope_per_sec", when(ok,
        covN.cast("double") / varXN.cast("double") / lit(Scale.toDouble)))
      .select("event_type", "n", "mean_value", "var_value", "corr",
        "slope_per_sec")
      .orderBy("event_type")
  }
}

/** Per-key DDSketch quantile view off the CDC feed — see the
  * [[MomentFeedView]] companion scaladoc for the shared delta law and
  * the one-sided collapsing-cap caveat (this view is uncapped BY
  * DESIGN; the cap is not delete-compatible).
  */
object SketchFeedView {

  private def alphaMicro(alpha: Double): Long = math.round(alpha * 1e6)

  private val viewSchema = StructType(Seq(
    StructField("event_type", StringType),
    StructField("bucket", LongType), StructField("n", LongType),
    StructField("hw_gen", LongType), StructField("alpha_micro", LongType)))

  /** Committed meta: (high-water feed gen, alphaMicro); None = fresh. */
  def readMeta(spark: SparkSession, viewDir: String)
      : Option[(Long, Long)] = {
    val gens = GenStore.committed(spark, viewDir)
    if (gens.isEmpty) None
    else {
      val meta = spark.read.schema(viewSchema)
        .parquet(GenStore.dir(viewDir, gens.max))
        .where(col("event_type").isNull)
        .collect()
      if (meta.length != 1) throw new IllegalStateException(
        s"sketch view generation ${gens.max} has ${meta.length} meta rows " +
          "(want exactly 1) — foreign or corrupt state")
      Some((meta.head.getLong(3), meta.head.getLong(4)))
    }
  }

  /** The live (event_type, bucket, n) table. */
  def table(spark: SparkSession, viewDir: String): DataFrame = {
    val gens = GenStore.committed(spark, viewDir)
    if (gens.isEmpty)
      spark.createDataFrame(java.util.Collections.emptyList[Row](),
        StructType(viewSchema.take(3)))
    else spark.read.schema(viewSchema)
      .parquet(GenStore.dir(viewDir, gens.max))
      .where(col("event_type").isNotNull)
      .select("event_type", "bucket", "n")
  }

  /** Fold every unseen committed feed generation into the view.
    * α is fixed at first refresh and validated thereafter (a different
    * γ grid cannot merge — the DDSketchStream stance).
    */
  def refresh(spark: SparkSession, stateDir: String, viewDir: String,
      alpha: Double = 0.01): Long = {
    val am = alphaMicro(alpha)
    DDSketch.gamma(alpha) // validates alpha eagerly
    val feedGens = GenStore.committed(spark, stateDir)
    if (feedGens.isEmpty) return 0L
    val frontier = feedGens.max
    val prior = readMeta(spark, viewDir)
    prior.foreach { case (_, pam) =>
      if (pam != am) throw new IllegalStateException(
        s"sketch view at $viewDir was bucketed at alpha=${pam / 1e6}; " +
          s"this refresh runs alpha=$alpha — different γ grids cannot " +
          "merge, refusing")
    }
    val hw = prior.map(_._1).getOrElse(-1L)
    if (frontier <= hw) return 0L
    val fresh = CowUpsertStream.changes(spark, stateDir)
      .where(col("gen") > hw && col("gen") <= frontier)
      .localCheckpoint() // two delta projections + the fold count
    // +1 at the after-image's bucket (non-deletes, positive values —
    // the log grid's domain), −1 at the before-image's (non-inserts).
    val after = fresh.where(col("op") =!= "delete" && col("value") > 0)
      .select(col("event_type"),
        DDSketch.bucketOf(col("value"), alpha).as("bucket"),
        lit(1L).as("dn"))
    val before = fresh.where(col("op") =!= "insert" && col("old_value") > 0)
      .select(col("event_type"),
        DDSketch.bucketOf(col("old_value"), alpha).as("bucket"),
        lit(-1L).as("dn"))
    val merged = table(spark, viewDir)
      .unionByName(after.union(before).withColumnRenamed("dn", "n"))
      .groupBy("event_type", "bucket").agg(sum("n").as("n"))
      .where(col("n") =!= 0L) // exact counters telescope to 0 on full drain
      .withColumn("hw_gen", lit(null).cast("long"))
      .withColumn("alpha_micro", lit(null).cast("long"))
    val folded = fresh.count()
    val gens = GenStore.committed(spark, viewDir)
    val gen = gens.lastOption.map(_ + 1).getOrElse(0L)
    val genDir = GenStore.dir(viewDir, gen)
    merged.coalesce(1).write.mode("overwrite").parquet(genDir)
    val metaDf = spark.createDataFrame(
      java.util.Collections.singletonList(Row(null, null, null,
        frontier, am)),
      viewSchema)
    metaDf.coalesce(1).write.mode("append").parquet(genDir)
    GenStore.commit(spark, viewDir, gen)
    GenStore.dropBelow(spark, viewDir, gen)
    folded
  }

  /** Per-event_type quantiles of the store's CURRENT rows, answered
    * off the view (α from the view's own meta).
    */
  def quantiles(spark: SparkSession, viewDir: String, qs: Seq[Double])
      : DataFrame = {
    readMeta(spark, viewDir) match {
      case None =>
        import spark.implicits._
        Seq.empty[(String, Double, Double, Long)]
          .toDF("event_type", "q", "est", "n_total")
      case Some((_, am)) =>
        DDSketch.quantilesBy(table(spark, viewDir), am / 1e6, qs,
          Seq("event_type"))
    }
  }
}
