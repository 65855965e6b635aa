package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Dataset-splitting and contamination operators for a training-data
  * pipeline: reproducible train/val/test assignment and train-vs-eval
  * overlap detection.
  *
  * Both are single-pass/map-side where possible: split assignment is a
  * pure projection (no shuffle, no sampling state), contamination is a
  * fingerprint equi-join (broadcast when the eval set is small — the
  * common case).
  */
object DataSplits {

  /** Deterministic split assignment from the id's residue: reproducible
    * across runs/engines/partitionings (unlike `randomSplit`/`sampleBy`,
    * whose output depends on partition layout). `fractions` are
    * percentages summing to ≤ 100; the remainder falls into the last
    * named split.
    */
  def assignSplit(idCol: Column, fractions: Seq[(String, Int)]): Column = {
    require(fractions.map(_._2).sum <= 100, "fractions must sum to <= 100")
    val bucket = pmod(idCol, lit(100L))
    val (_, result) = fractions.foldLeft((0, lit(fractions.last._1): Column)) {
      case ((offset, acc), (name, pct)) =>
        (offset + pct, when(bucket >= offset && bucket < offset + pct, name).otherwise(acc))
    }
    result
  }

  /** Hash-based variant: decorrelates the split from id assignment order
    * (ids often encode time/source). Deterministic given the seed, but
    * NOT reproducible in engines lacking xxhash64 — use [[assignSplit]]
    * when cross-engine reproducibility matters.
    */
  def assignSplitByHash(idCol: Column, fractions: Seq[(String, Int)], seed: Long = 42L): Column =
    assignSplit(pmod(xxhash64(lit(seed), idCol), lit(100L)), fractions)

  /** Materialize a dataset as split-partitioned parquet — the output
    * step of the training-data pipeline: `outDir/split=train/...` etc.,
    * consumable downstream with partition pruning
    * (`spark.read.parquet(out).where($"split" === "train")` reads one
    * directory). One pass, no shuffle: split assignment is a projection
    * and `partitionBy` routes rows at write time.
    */
  def writeSplits(df: DataFrame, idCol: String, outDir: String,
      fractions: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10)): Unit =
    df.withColumn("split", assignSplit(col(idCol), fractions))
      .write.partitionBy("split").mode("overwrite").parquet(outDir)

  /** Train-vs-eval contamination: training docs whose exact content
    * fingerprint appears in the eval set (the md5 tier; near-dup
    * contamination composes [[Dedup.minhashNearDups]] over the union
    * instead). Join strategy is left to Catalyst/AQE: typical eval sets
    * are small enough to auto-broadcast, but a forced broadcast would
    * OOM when callers pass a large slice as "eval".
    */
  def exactContamination(train: DataFrame, eval: DataFrame): DataFrame = {
    val evalFps = eval.select(TF.fingerprintMd5(col("text")).as("fp")).distinct()
    train
      .withColumn("fp", TF.fingerprintMd5(col("text")))
      .join(evalFps, "fp")
      .select(col("doc_id"), col("fp"))
  }

  /** Leakage-free (cluster-aware) split assignment: near-duplicate
    * documents must never straddle train/eval — a test doc whose
    * near-copy sits in train is contamination that per-DOCUMENT
    * assignment cannot prevent. The fix is to assign the split to the
    * duplicate CLUSTER: label every document with its near-dup
    * connected component ([[Dedup.dupClusters]] over `pairs`; documents
    * in no pair are their own singleton cluster) and derive the split
    * from the CLUSTER id's residue ([[assignSplit]]), so a template and
    * all its near-copies land in the same split by construction.
    *
    * Returns `docs` + (`cluster`, `split`). Scale shape: the component
    * fixpoint is the existing bounded-lineage operator; the label
    * join-back is one shuffle on doc_id (the component table is
    * cluster-member-sized, usually far smaller than the corpus); the
    * split derivation is a pure projection.
    */
  def clusterAwareSplits(docs: DataFrame, pairs: DataFrame,
      fractions: Seq[(String, Int)] =
        Seq("train" -> 80, "val" -> 10, "test" -> 10),
      clusters: Option[DataFrame] = None): DataFrame =
    docs
      .join(clusters.getOrElse(Dedup.dupClusters(pairs))
          .select(col("doc_id"), col("cluster")),
        Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .withColumn("split", assignSplit(col("cluster"), fractions))
}
