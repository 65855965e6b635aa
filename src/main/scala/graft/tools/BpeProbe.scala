package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Bpe
import graft.sources.Tables

/** Decade probe for BPE merge-table learning (q_txt17's operator): the
  * scale claim is that after the one corpus wordcount shuffle, every
  * learning round is VOCABULARY-local — so growing the corpus 1× → 100×
  * while holding the vocabulary fixed (replicating the sf0.01 documents
  * with shifted doc_ids: same words, scaled frequencies) should move
  * only the wordcount stage, not the per-round cost. A second leg grows
  * the VOCABULARY instead (suffixing words per replica), which is the
  * axis the rounds genuinely pay for. Run:
  * `runMain graft.tools.BpeProbe`.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))

    def replicate(n: Int, newVocab: Boolean) =
      (0 until n).map { i =>
        if (!newVocab || i == 0) base.select(col("doc_id") + lit(i * 1000000L), col("text"))
        else base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          // per-replica word suffix: every replica contributes a DISTINCT
          // vocabulary of the same size/shape
          regexp_replace(col("text"), "(\\S+)", s"$$1x$i").as("text"))
      }.reduce(_ union _)

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      scala.Console.out.println(
        f"PROBE $name%-28s min=${ts.min}%.3f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    for (n <- Seq(1, 10, 100))
      time(s"corpus x$n vocab x1") { Bpe.learnMerges(replicate(n, false), 6).count() }
    for (n <- Seq(1, 4, 16))
      time(s"corpus x$n vocab x$n") { Bpe.learnMerges(replicate(n, true), 6).count() }
    // The nMerges axis — the vocab-scale question (a production vocab
    // is ~32k merges): the distributed loop pays one job + one 1-row
    // collect PER ROUND (and a lineage one replace deeper each round),
    // so its cost law is linear-or-worse in nMerges; learnMergesLocal
    // pays ONE wordcount + ONE vocab collect and then in-memory rounds,
    // so nMerges moves only the driver loop. Distributed capped at 64
    // rounds (the law is visible by then and 256 rounds of job latency
    // is probe budget, not signal); local runs the full ladder.
    def timeOnce(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      scala.Console.out.println(
        f"PROBE $name%-28s once=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (m <- Seq(6, 64))
      timeOnce(s"distributed nMerges=$m") { Bpe.learnMerges(base, m).count() }
    for (m <- Seq(6, 64, 256, 4096))
      timeOnce(s"local nMerges=$m") {
        // A small probe corpus can exhaust its pairs before m merges —
        // that IS the vocabulary bound, report it rather than abort.
        try Bpe.learnMergesLocal(base, m).count()
        catch { case e: IllegalArgumentException =>
          scala.Console.out.println(s"  (exhausted: ${e.getMessage})") }
      }
    spark.stop()
  }
}
