package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared generation-directory machinery for the streaming state
  * stores ([[PackingStream]]'s offset log, [[IndexMaintenance]]'s
  * quantizer stores, [[StreamingDedup]]'s signature index): state
  * lives under `root/gen-N/`, a generation is resolvable only once its
  * `COMMITTED` marker exists (written LAST, so a crash mid-write
  * leaves an unresolvable orphan every reader ignores and a later
  * retry overwrites), and readers always take the highest committed N.
  * Factored here because three stores independently grew the same
  * protocol; one implementation keeps the crash-ordering rules in one
  * place.
  */
private[streaming] object GenStore {

  def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def dir(root: String, gen: Long): String = s"$root/gen-$gen"

  /** `gen-<digits>` names only: a stray non-numeric `gen-*` directory
    * (hand-made `gen-tmp`, an editor backup) must be ignored by every
    * listing, not crash it with NumberFormatException at pipeline
    * construction.
    */
  private def genNumber(name: String): Option[Long] = {
    val s = name.stripPrefix("gen-")
    if (s.nonEmpty && s.forall(_.isDigit)) Some(s.toLong) else None
  }

  /** Committed generations under `root`, ascending; empty for a
    * missing or never-committed store.
    */
  def committed(spark: SparkSession, root: String): Seq[Long] = {
    val hfs = fs(spark, root)
    if (!hfs.exists(new Path(root))) Seq.empty
    else hfs.listStatus(new Path(root)).toSeq
      .filter(_.isDirectory)
      .flatMap(s => genNumber(s.getPath.getName))
      .filter(g => hfs.exists(new Path(s"${dir(root, g)}/COMMITTED")))
      .sorted
  }

  /** Highest committed generation — fails loudly on a store with none
    * (init first; an uncommitted orphan alone means a writer died
    * before its commit point).
    */
  def latest(spark: SparkSession, root: String): Long = {
    val gens = committed(spark, root)
    require(gens.nonEmpty,
      s"no committed generation under $root — init the store first")
    gens.max
  }

  /** Write the `COMMITTED` marker — the commit point; idempotent. */
  def commit(spark: SparkSession, root: String, gen: Long): Unit =
    fs(spark, root).create(new Path(s"${dir(root, gen)}/COMMITTED"), true)
      .close()

  /** Delete every `gen-*` directory numbered below `keep` — committed
    * predecessors and crash orphans alike (single-writer stores: an
    * orphan below the surviving generation can only be a dead crash
    * remnant, never a concurrent writer's work-in-progress).
    */
  def dropBelow(spark: SparkSession, root: String, keep: Long): Unit = {
    val hfs = fs(spark, root)
    hfs.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory &&
        genNumber(s.getPath.getName).exists(_ < keep))
      .foreach(s => hfs.delete(s.getPath, true))
  }

  /** Delete every UNCOMMITTED `gen-*` directory numbered above `keep` —
    * crash orphans from a writer (an off-path rebuild) that died before
    * its commit point. Safe only when no build is in flight: the
    * single-writer stores call this at pipeline construction, where an
    * uncommitted generation above the committed frontier can only be a
    * dead remnant — invisible to readers but holding disk (and, for a
    * rebuild orphan, a staging dir that stale appends could keep
    * growing).
    */
  def dropUncommittedAbove(spark: SparkSession, root: String,
      keep: Long): Unit = {
    val hfs = fs(spark, root)
    if (hfs.exists(new Path(root)))
      hfs.listStatus(new Path(root)).toSeq
        .filter(s => s.isDirectory &&
          genNumber(s.getPath.getName).exists(g =>
            g > keep && !hfs.exists(new Path(s"${dir(root, g)}/COMMITTED"))))
        .foreach(s => hfs.delete(s.getPath, true))
  }

  /** Count data files under `path` (recursive, `_`-prefixed bookkeeping
    * files excluded) — the compaction trigger's measure of small-file
    * accretion. Cost is one directory walk, bounded post-compaction by
    * the trigger threshold itself.
    */
  def dataFileCount(spark: SparkSession, path: String): Long =
    dataFiles(spark, path).size.toLong

  /** The data-file paths under `path` (recursive, `_`-prefixed
    * bookkeeping excluded). Taken in the single-writer thread, this is
    * a consistent snapshot an off-path job can read while the writer
    * keeps appending — and the set difference of a later listing
    * against it is exactly the appends made in between (the async
    * compaction's catch-up delta).
    */
  def dataFiles(spark: SparkSession, path: String): Seq[String] = {
    val hfs = fs(spark, path)
    if (!hfs.exists(new Path(path))) Seq.empty
    else {
      val it = hfs.listFiles(new Path(path), true)
      val out = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        if (!f.getPath.getName.startsWith("_")) out += f.getPath.toString
      }
      out.result()
    }
  }

  /** Recursive delete, quiet on a missing path. */
  def deleteQuiet(spark: SparkSession, path: String): Unit = {
    val hfs = fs(spark, path)
    if (hfs.exists(new Path(path))) hfs.delete(new Path(path), true)
  }
}
