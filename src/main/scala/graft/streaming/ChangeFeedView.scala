package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Incremental materialized-view maintenance off the CDC feed — the
  * downstream half of the changelog story: a per-`event_type`
  * (row count, Σ value) view kept current by folding ONLY
  * [[CowUpsertStream.changes]] rows it has not seen yet. Each refresh
  * costs O(new changes) + O(view), never O(state): the view never
  * re-reads the upsert store, which is exactly what a change feed is
  * FOR (the alternative — recompute the aggregate from `latest()`
  * every time — rescans the full current-row table per refresh).
  *
  * The fold is pure delta algebra over the feed's before/after
  * images:
  *
  *   insert:  n += 1,  Σ += new_value
  *   update:  n += 0,  Σ += new_value − old_value
  *   delete:  n −= 1,  Σ −= old_value   (the maintenance-verb feed)
  *
  * Exactness discipline: values fold in integer micro-units
  * (`round(value·10⁶)` as long — the [[MomentStream]] lesson: double
  * sums are association-order-dependent across refresh cadences, so
  * the committed Σ would depend on WHEN you refreshed; long sums make
  * view ≡ one-shot aggregate bit-exact for ANY cadence). Progress is
  * tracked as the high-water FEED GENERATION (the feed's own replay
  * key): a refresh folds gens in (hw, frontier], so refreshing twice,
  * never, or once per ten batches all converge to the same view —
  * proven in the spec against a direct aggregate of `latest()` after
  * every cadence. The view store follows the family protocol
  * (GenStore commit-last, replay-safe, meta discriminated on a null
  * key).
  */
object ChangeFeedView {

  /** One row per event_type plus one META row (`event_type` null —
    * high-water feed gen in `n_rows`, view row count in `sum_micro`).
    */
  private val viewSchema = StructType(Seq(
    StructField("event_type", StringType),
    StructField("n_rows", LongType),
    StructField("sum_micro", LongType)))

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
        s"view state generation ${gens.max} has ${meta.length} meta rows " +
          "(want exactly 1) — foreign or corrupt state")
      Some((meta.head.getLong(1), meta.head.getLong(2)))
    }
  }

  /** The live view: (event_type, n_rows, sum_micro) — a straight read
    * of committed state, zero recompute.
    */
  def table(spark: SparkSession, viewDir: String): DataFrame = {
    val gens = GenStore.committed(spark, viewDir)
    if (gens.isEmpty)
      spark.createDataFrame(java.util.Collections.emptyList[Row](),
        viewSchema)
    else spark.read.schema(viewSchema)
      .parquet(GenStore.dir(viewDir, gens.max))
      .where(col("event_type").isNotNull)
  }

  /** Fold every unseen committed feed generation of the upsert store
    * at `stateDir` into the view at `viewDir`. Idempotent: a refresh
    * with nothing new commits nothing. Returns the number of change
    * rows folded.
    */
  def refresh(spark: SparkSession, stateDir: String,
      viewDir: String): Long = {
    val feedGens = GenStore.committed(spark, stateDir)
    if (feedGens.isEmpty) return 0L
    val frontier = feedGens.max
    val prior = readMeta(spark, viewDir)
    val hw = prior.map(_._1).getOrElse(-1L)
    if (frontier <= hw) return 0L
    // Bound the fold to (hw, frontier] EXPLICITLY: a generation the
    // stream commits between the frontier read above and the changes()
    // listing here must NOT fold now (we'd record hw = frontier and
    // re-fold it next refresh — a double count). Deferring it to the
    // next refresh keeps the documented window exact under a
    // concurrent writer.
    val fresh = CowUpsertStream.changes(spark, stateDir)
      .where(col("gen") > hw && col("gen") <= frontier)
    // Delta algebra in integer micro-units; updates contribute the
    // (new − old) difference, inserts the new value and a count.
    // Null values contribute zero on EITHER side (a one-shot
    // sum(round(value·1e6)) skips nulls, so an update between null and
    // a value must move Σ by exactly the non-null side).
    val deltas = fresh.select(col("event_type"),
        when(col("op") === "insert", 1L)
          .when(col("op") === "delete", -1L).otherwise(0L).as("dn"),
        (coalesce(round(col("value") * 1e6).cast("long"), lit(0L)) -
          coalesce(round(col("old_value") * 1e6).cast("long"), lit(0L)))
          .as("dmicro"))
      .groupBy("event_type")
      .agg(sum("dn").as("n_rows"), sum("dmicro").as("sum_micro"))
    val merged = table(spark, viewDir).unionByName(deltas)
      .groupBy("event_type")
      .agg(sum("n_rows").as("n_rows"), sum("sum_micro").as("sum_micro"))
      // a fully-deleted key folds to n=0 (and, exactly then, Σ=0):
      // the one-shot aggregate has no such row, so neither do we
      .where(col("n_rows") =!= 0L)
    val folded = fresh.count()
    val gens = GenStore.committed(spark, viewDir)
    val gen = gens.lastOption.map(_ + 1).getOrElse(0L)
    val genDir = GenStore.dir(viewDir, gen)
    merged.coalesce(1).write.mode("overwrite").parquet(genDir)
    val rows = spark.read.schema(viewSchema).parquet(genDir).count()
    val metaDf = spark.createDataFrame(
      java.util.Collections.singletonList(Row(null, frontier, rows)),
      viewSchema)
    metaDf.coalesce(1).write.mode("append").parquet(genDir)
    GenStore.commit(spark, viewDir, gen)
    GenStore.dropBelow(spark, viewDir, gen)
    folded
  }
}
