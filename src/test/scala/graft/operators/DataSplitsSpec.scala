package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DataSplitsSpec extends SparkSpec {
  import spark.implicits._

  test("assignSplit: exact residue boundaries, remainder to last split, reproducible") {
    val df = Seq(0L, 79L, 80L, 89L, 90L, 99L, 100L, 179L).toDF("id")
      .withColumn("split", DataSplits.assignSplit(col("id"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10)))
    val m = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(0L) == "train" && m(79L) == "train" && m(179L) == "train")
    assert(m(80L) == "val" && m(89L) == "val")
    assert(m(90L) == "test" && m(99L) == "test")
    assert(m(100L) == "train", "wraps at 100")
  }

  test("assignSplitByHash: deterministic for a seed, roughly proportional") {
    val ids = (0L until 2000L).toDF("id")
    val split = ids.withColumn("s",
      DataSplits.assignSplitByHash(col("id"), Seq("train" -> 80, "test" -> 20)))
    val counts = split.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") > 1500 && counts("train") < 1700, s"got $counts")
    val again = ids.withColumn("s",
      DataSplits.assignSplitByHash(col("id"), Seq("train" -> 80, "test" -> 20)))
    assert(split.except(again).isEmpty, "same seed ⇒ same assignment")
  }

  test("exactContamination finds planted eval overlap only") {
    val train = Seq((1L, "clean doc one"), (2L, "leaked eval content"), (3L, "clean doc two"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, "leaked eval content"), (101L, "eval only content"))
      .toDF("doc_id", "text")
    val hits = DataSplits.exactContamination(train, eval).collect()
    assert(hits.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("writeSplits materializes split=... partitions; pruned read returns one split") {
    val out = java.nio.file.Files.createTempDirectory("graft_splits").toString
    try {
      val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      DataSplits.writeSplits(docs, "doc_id", out)
      val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("split="))
      assert(dirs.toSet == Set("split=train", "split=val", "split=test"))
      val back = spark.read.parquet(out)
      assert(back.count() == 200)
      val train = back.where(col("split") === "train")
      assert(train.count() == 160, "80% of a full two-cycle id range")
      // The split filter must prune to the one partition directory.
      val p = train.queryExecution.executedPlan.toString
      assert(p.contains("PartitionFilters: [isnotnull(split"), p.take(400))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("clusterAwareSplits: components share a split; singletons keep their residue; a naive-straddling pair is healed") {
    // Docs 79 and 80 straddle the naive train/val boundary (79 % 100 ->
    // train, 80 % 100 -> val); as a near-dup pair their cluster label is
    // 79, so BOTH must land in train. 85-86-90 chain a component whose
    // label 85 is val even though 90's own residue says test. 300 is a
    // singleton -> its own residue (train).
    val docs = Seq(79L, 80L, 85L, 86L, 90L, 300L).map(id => (id, s"text $id"))
      .toDF("doc_id", "text")
    val pairs = Seq((79L, 80L), (85L, 86L), (86L, 90L)).toDF("doc_a", "doc_b")
    val got = DataSplits.clusterAwareSplits(docs, pairs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster"), r.getAs[String]("split")))).toMap
    assert(got(79L) == ((79L, "train")) && got(80L) == ((79L, "train")),
      s"pair healed into the label's split: $got")
    assert(got(85L) == ((85L, "val")) && got(86L) == ((85L, "val")) &&
      got(90L) == ((85L, "val")), s"transitive component shares the split: $got")
    assert(got(300L) == ((300L, "train")), s"singleton keeps its residue: $got")
  }
}
