package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Persisted structural-parameter manifest for an on-disk store — a
  * `MANIFEST` file of `key=value` lines at the store root, written at
  * init and CHECKED at pipeline construction.
  *
  * The hazard it closes: [[StreamingDedup]]'s pruning grid
  * (`bucketSlots`/`idSlots`) and signature shape (`numPerms`/`bands`/
  * `shingleSize`/`md5Parity`), and [[IndexMaintenance]]'s artifact
  * shapes (`dim`/`nCentroids` for int8, `dim`/`m`/`ksub` for PQ — both
  * wired at every init and pipeline constructor there), existed only
  * as call-site arguments — reconstructing a pipeline over an existing
  * store with different values would silently mis-prune (missed
  * duplicates) or mis-encode, the one class of corruption this repo's
  * stores otherwise fail loudly on. Structural parameters only:
  * semantic knobs an operator may legitimately retune between runs
  * (thresholds, training iteration counts, sample sizes) stay out, so
  * the check never blocks a legal retune and never passes an illegal
  * re-layout.
  */
object StoreManifest {

  val FileName = "MANIFEST"

  /** Manifest name for a store root that IS a parquet table directory
    * (the append tiers' bare code artifacts): the underscore prefix
    * makes Spark's file listing treat it as bookkeeping, so the data
    * read never tries to parse it as parquet. Store roots whose tables
    * live in subdirectories use the unprefixed [[FileName]].
    */
  val InlineFileName = "_MANIFEST"

  /** Write the manifest (overwrite — init-time only; a manifest never
    * changes for the life of a store).
    */
  def write(spark: SparkSession, root: String,
      entries: Seq[(String, String)], file: String = FileName): Unit = {
    val out = GenStore.fs(spark, root)
      .create(new Path(s"$root/$file"), true)
    try out.write(entries.map { case (k, v) => s"$k=$v" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The manifest's entries, or None if the store has none. */
  def read(spark: SparkSession, root: String,
      file: String = FileName): Option[Map[String, String]] = {
    val hfs = GenStore.fs(spark, root)
    val p = new Path(s"$root/$file")
    if (!hfs.exists(p)) None
    else {
      val in = hfs.open(p)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(txt.linesIterator.map(_.trim).filter(_.nonEmpty).map { l =>
        val i = l.indexOf('=')
        require(i > 0, s"malformed manifest line in $root/$file: '$l'")
        (l.substring(0, i), l.substring(i + 1))
      }.toMap)
    }
  }

  /** Construction-time gate: every expected entry must match the
    * stored manifest exactly; a missing manifest or ANY mismatch
    * throws, listing every offending key — loud refusal instead of the
    * silent mis-prune/mis-encode a mismatched layout would produce.
    */
  def check(spark: SparkSession, root: String,
      expected: Seq[(String, String)], store: String,
      file: String = FileName): Unit =
    read(spark, root, file) match {
      case None => throw new IllegalStateException(
        s"$store at $root has no $file — init the store first " +
          "(running over an unmanifested store cannot verify its layout)")
      case Some(found) =>
        val bad = expected.filterNot { case (k, v) => found.get(k).contains(v) }
        if (bad.nonEmpty) throw new IllegalStateException(
          s"$store at $root was laid out with different structural " +
            "parameters — refusing to run (a mismatched layout silently " +
            "mis-prunes or mis-encodes): " +
            bad.map { case (k, v) =>
              s"$k: store=${found.getOrElse(k, "<absent>")}, caller=$v"
            }.mkString("; "))
    }

  /** Self-sealing gate for stores whose data predates their manifest
    * (the append tiers hand a pipeline an EXISTING bare artifact dir —
    * there is no init call that could have written one): the first
    * construction writes the manifest, every later construction is
    * [[check]]ed against it. The seal necessarily trusts the first
    * constructor's parameters; what it buys is that the store can
    * never be RE-opened with a different layout once sealed.
    */
  def sealOrCheck(spark: SparkSession, root: String,
      entries: Seq[(String, String)], store: String,
      file: String = FileName): Unit =
    read(spark, root, file) match {
      case None => write(spark, root, entries, file)
      case Some(_) => check(spark, root, entries, store, file)
    }
}
