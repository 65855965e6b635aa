package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.operators.{DataSplits, Dedup}

/** Leakage-free (cluster-aware) train/val/test assignment as a STREAM —
  * q_ml17's batch law ([[DataSplits.clusterAwareSplits]]: near-dup
  * connected components share a split, split = residue of the
  * component's min doc id) applied to documents as they arrive,
  * completing the kappa story for the last batch-only round-13
  * operator. [[MixtureStream]]'s state posture: the only cross-batch
  * state is the committed COMPONENT store.
  *
  * The hard part a stream adds over the batch form: a later document
  * can BRIDGE two components that were committed with different labels
  * (and so different splits). Freezing the first label would leak
  * (near-dups straddling train/test); relabeling by rewriting the store
  * would be O(corpus) per merge. The fix is a REDIRECT log: member rows
  * (doc_id → cluster-at-assignment) are immutable, and each merge
  * appends label-merge edges; the effective label is the MIN label of
  * the redirect-connected label group (union-find with min-label roots
  * — order-independent and confluent, so replays and stale re-runs
  * converge to the same roots). Since the batch operator's label IS the
  * component's min doc id, resolved-stream ≡ batch EXACTLY — for any
  * arrival order, any bridging — and splits derived from resolved
  * labels are leak-free by construction.
  *
  * Replay posture (stronger than a skip guard): state consulted for
  * batch B is the store filtered to `batch_id < B`, so a replayed batch
  * recomputes from exactly the state it originally saw and appends
  * byte-identical rows, which the reader dedups — idempotent without
  * detecting the replay, provided `pairsOf` is deterministic (all
  * in-repo generators are). Replays reaching back past a compaction
  * boundary see already-resolved labels instead of the originals; the
  * rows they append resolve to the same roots (confluence), so
  * assignments still converge.
  *
  * Scale shape: per batch, one pair-generation pass (pluggable — the
  * in-repo generator is the MinHash machinery; the state store never
  * stores text), one bounded component fixpoint over the BATCH-TOUCHED
  * subgraph (nodes = batch docs + the labels they touch, never the
  * corpus), one append. The redirect log is collected driver-side for
  * resolution: O(cross-batch merge events since the last compaction) —
  * merge events, not documents — and compaction (every `compactEvery`
  * batches) folds it into the members and re-empties it, the same
  * bounded-pin discipline as the histogram pins.
  *
  * compactEvery SIZING LAW (measured, SCALE.md round-15 SplitProbe —
  * a merge-heavy corpus where 2 of every 5 docs are merge events, 5k
  * → 500k docs): the union-find FOLD is never the limit (~100
  * ns/event; 100× events moved resolveRoots 0.137 → 0.165 s — collect
  * job overhead dominates); the binding constraint is DRIVER HEAP,
  * ~50–100 B/event for the boxed pair log + root map. Pick
  * compactEvery ≈ budget / merges-per-batch with budget ≈ 5·10⁷
  * events (a few GB of heap). Err low: compaction also made the whole
  * pipeline 25–35% faster at the 500k decade (every batch re-reads a
  * smaller, already-resolved state), so the fold pays for itself
  * before the pin even matters.
  */
object SplitStream {

  /** One state table per generation: member rows (`kind` 'm': `a` =
    * doc_id, `b` = cluster label at assignment) and redirect rows
    * (`kind` 'r': `a` = from-label, `b` = to-label), each stamped with
    * the writing batch.
    */
  private val stateSchema = StructType(Seq(
    StructField("kind", StringType), StructField("a", LongType),
    StructField("b", LongType), StructField("batch_id", LongType)))

  private def genDir(root: String, gen: Long) = GenStore.dir(root, gen)

  private def manifestEntries(fractions: Seq[(String, Int)]) = Seq(
    "kind" -> "split-store",
    "fractions" -> fractions.map { case (n, p) => s"$n:$p" }.mkString(","))

  private def readState(spark: SparkSession, root: String): DataFrame = {
    val gens = GenStore.committed(spark, root)
    if (gens.isEmpty) spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), stateSchema)
    else spark.read.schema(stateSchema).parquet(genDir(root, gens.max))
  }

  /** Min-label union-find over the collected redirect pairs: every
    * label in a redirect-connected group maps to the group's minimum.
    * Pure driver-side on the bounded merge log.
    */
  private def resolveRoots(pairs: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) {
        val root = math.min(ru, rv)
        parent(math.max(ru, rv)) = root
        parent(ru) = root; parent(rv) = root
      }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** Apply redirect resolution to a `cluster` column via a broadcast
    * local mapping (merge-event-bounded).
    */
  private def resolved(df: DataFrame, roots: Map[Long, Long]): DataFrame =
    if (roots.isEmpty) df
    else {
      val spark = df.sparkSession
      import spark.implicits._
      val m = roots.toSeq.toDF("cluster", "root")
      df.join(broadcast(m), Seq("cluster"), "left")
        .withColumn("cluster", coalesce(col("root"), col("cluster")))
        .drop("root")
    }

  /** One foreachBatch handler over (doc_id, …payload) arrivals.
    * `pairsOf(batchDocs, members)` produces the near-dup edges touching
    * this batch — (`doc_a`, `doc_b`) where either side is a batch doc
    * or a committed member doc id; `members` is the resolved committed
    * (doc_id, cluster) table (text-free — a generator needing stored
    * payloads keeps its own index, the [[StreamingDedup]] pattern).
    * `onBatch(batchId, nArrived, nNew, nMerges)` is the monitor hook.
    */
  def splitPipeline(stateDir: String,
      fractions: Seq[(String, Int)] =
        Seq("train" -> 80, "val" -> 10, "test" -> 10),
      pairsOf: (DataFrame, DataFrame) => DataFrame,
      compactEvery: Int = 64,
      onBatch: (Long, Long, Long, Long) => Unit = (_, _, _, _) => ())
      : (DataFrame, Long) => Unit = {
    require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      import spark.implicits._
      val arrivals = batch.persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val n = arrivals.count()
        if (n > 0) {
          StoreManifest.sealOrCheck(spark, stateDir,
            manifestEntries(fractions), "split store")
          val fs = GenStore.fs(spark, stateDir)
          val gens = GenStore.committed(spark, stateDir)
          var gen = if (gens.isEmpty) 0L else gens.max
          // State AS OF this batch: rows this batch (or a failed later
          // attempt) wrote are excluded, so a replay recomputes from
          // what it originally saw.
          val state = readState(spark, stateDir)
            .where(col("batch_id") < batchId)
            .persist(StorageLevel.MEMORY_AND_DISK)
          try {
            val roots = resolveRoots(state.where(col("kind") === "r")
              .select(col("a"), col("b")).as[(Long, Long)].collect())
            val members = resolved(
              state.where(col("kind") === "m")
                .groupBy(col("a").as("doc_id"))
                .agg(min(col("b")).as("cluster")),
              roots).persist(StorageLevel.MEMORY_AND_DISK)
            try {
              // Cross-batch re-sends are members already — only new
              // docs get assignment rows.
              val fresh = arrivals
                .join(members.select(col("doc_id")), Seq("doc_id"), "left_anti")
                .persist(StorageLevel.MEMORY_AND_DISK)
              try {
                val nNew = fresh.count()
                // Edge endpoints translated to NODES: a batch doc is
                // its own id; a member endpoint stands for its whole
                // component, i.e. its resolved label.
                val edges = pairsOf(fresh, members)
                  .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
                def toNode(c: String) =
                  coalesce(col(s"lbl_$c"), col(c)).as(s"n_$c")
                val translated = edges
                  .join(members.select(col("doc_id").as("doc_a"),
                    col("cluster").as("lbl_doc_a")), Seq("doc_a"), "left")
                  .join(members.select(col("doc_id").as("doc_b"),
                    col("cluster").as("lbl_doc_b")), Seq("doc_b"), "left")
                  .select(toNode("doc_a"), toNode("doc_b"))
                  .where(col("n_doc_a") =!= col("n_doc_b"))
                  .select(least(col("n_doc_a"), col("n_doc_b")).as("doc_a"),
                    greatest(col("n_doc_a"), col("n_doc_b")).as("doc_b"))
                  .distinct()
                // Components over the batch-touched subgraph only; the
                // label is the min node = min(batch doc ids, member
                // labels) of the component — the batch operator's law.
                val comp = Dedup.dupClusters(translated)
                  .select(col("doc_id").as("node"), col("cluster"))
                  .persist(StorageLevel.MEMORY_AND_DISK)
                try {
                  val memberRows = fresh.select(col("doc_id"))
                    .join(comp.select(col("node").as("doc_id"), col("cluster")),
                      Seq("doc_id"), "left")
                    .select(lit("m").as("kind"), col("doc_id").as("a"),
                      coalesce(col("cluster"), col("doc_id")).as("b"),
                      lit(batchId).as("batch_id"))
                  // A touched member label whose component label moved
                  // below it is a MERGE: record the redirect.
                  val redirectRows = comp
                    .join(members.select(col("cluster").as("node")).distinct(),
                      Seq("node"), "left_semi")
                    .where(col("cluster") =!= col("node"))
                    .select(lit("r").as("kind"), col("node").as("a"),
                      col("cluster").as("b"), lit(batchId).as("batch_id"))
                  val out = memberRows.unionByName(redirectRows)
                    .persist(StorageLevel.MEMORY_AND_DISK)
                  try {
                    val nMerges = out.where(col("kind") === "r").count()
                    out.write.mode("append").parquet(genDir(stateDir, gen))
                    fs.create(new Path(s"${genDir(stateDir, gen)}/COMMITTED"),
                      true).close()
                    // Compaction: fold redirects into members, advance
                    // the generation. batch_id survives, so the as-of
                    // filter keeps working across the boundary.
                    if (batchId > 0 && batchId % compactEvery == 0) {
                      val all = readState(spark, stateDir)
                      val allRoots = resolveRoots(all.where(col("kind") === "r")
                        .select(col("a"), col("b")).as[(Long, Long)].collect())
                      resolved(all.where(col("kind") === "m")
                          .select(col("kind"), col("a"),
                            col("b").as("cluster"), col("batch_id")),
                          allRoots)
                        .select(col("kind"), col("a"), col("cluster").as("b"),
                          col("batch_id"))
                        .write.mode("overwrite").parquet(genDir(stateDir, gen + 1))
                      fs.create(new Path(s"${genDir(stateDir, gen + 1)}/COMMITTED"),
                        true).close()
                      GenStore.committed(spark, stateDir).filter(_ <= gen)
                        .foreach(g => fs.delete(new Path(genDir(stateDir, g)), true))
                      gen += 1
                    }
                    onBatch(batchId, n, nNew, nMerges)
                  } finally out.unpersist(blocking = false)
                } finally comp.unpersist(blocking = false)
              } finally fresh.unpersist(blocking = false)
            } finally members.unpersist(blocking = false)
          } finally state.unpersist(blocking = false)
        }
      } finally arrivals.unpersist(blocking = false)
    }
  }

  /** The committed assignment table, fully resolved: (doc_id, cluster,
    * split) — identical to [[DataSplits.clusterAwareSplits]] over the
    * union of all arrivals and the union of all generated pairs.
    */
  def assignments(spark: SparkSession, stateDir: String,
      fractions: Seq[(String, Int)] =
        Seq("train" -> 80, "val" -> 10, "test" -> 10)): DataFrame = {
    import spark.implicits._
    StoreManifest.check(spark, stateDir, manifestEntries(fractions),
      "split store")
    val state = readState(spark, stateDir)
    val roots = resolveRoots(state.where(col("kind") === "r")
      .select(col("a"), col("b")).as[(Long, Long)].collect())
    resolved(state.where(col("kind") === "m")
        .groupBy(col("a").as("doc_id")).agg(min(col("b")).as("cluster")),
      roots)
      .withColumn("split", DataSplits.assignSplit(col("cluster"), fractions))
      // The using-column join inside resolved() reorders columns
      // (cluster first); pin the contract order.
      .select("doc_id", "cluster", "split")
  }
}
