package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

/** The generation-directory protocol's listing hygiene: every lister
  * tolerates stray non-numeric `gen-*` names (a hand-made `gen-tmp`, an
  * editor backup) — ignoring them rather than crashing pipeline
  * construction with NumberFormatException — while numeric generations
  * keep their committed/uncommitted semantics.
  */
class GenStoreSpec extends SparkSpec {

  test("stray non-numeric gen-* directories are ignored by every lister") {
    val root = Files.createTempDirectory("graft-genstore").toString
    val hfs = GenStore.fs(spark, root)
    def mkdir(name: String): Unit =
      hfs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/$name"))
    mkdir("gen-0"); GenStore.commit(spark, root, 0L)
    mkdir("gen-2") // uncommitted orphan above the frontier
    mkdir("gen-tmp"); mkdir("gen-"); mkdir("gen-1x") // strays
    assert(GenStore.committed(spark, root) == Seq(0L))
    assert(GenStore.latest(spark, root) == 0L)
    // dropUncommittedAbove reaps the numeric orphan, leaves the strays.
    GenStore.dropUncommittedAbove(spark, root, 0L)
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(s"$root/gen-2")))
    assert(hfs.exists(new org.apache.hadoop.fs.Path(s"$root/gen-tmp")))
    // dropBelow: numeric predecessors go, strays stay.
    mkdir("gen-3"); GenStore.commit(spark, root, 3L)
    GenStore.dropBelow(spark, root, 3L)
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(s"$root/gen-0")))
    assert(hfs.exists(new org.apache.hadoop.fs.Path(s"$root/gen-tmp")))
    assert(GenStore.committed(spark, root) == Seq(3L))
  }
}
