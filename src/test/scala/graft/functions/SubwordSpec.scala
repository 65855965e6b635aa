package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The subword merge-table apply ([[SubwordTokenCount]]): greedy
  * longest-match semantics pinned case by case, codegen parity, and the
  * packing family's pluggable token meter.
  */
class SubwordSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = graft.analytics.ExtensionQueries.SubwordMerges

  test("greedy longest-match: full word beats prefixes, chains merge, fallback consumes one char") {
    val cases = Seq(
      "table" -> 1,    // full-word entry wins over "tab"/"ta"
      "tab" -> 1,      // exact shorter entry
      "customer" -> 3, // cust + om + er
      "batch" -> 2,    // ba + tch
      "row" -> 2,      // fallback 'r' + merge "ow"
      "dup" -> 3,      // pure fallback, one per char
      "a" -> 1,        // single-char vocab entry
      "agg" -> 2,      // a + gg
      "order" -> 2,    // or + der
      "the" -> 1)
    val got = cases.map(_._1).toDF("w")
      .select(col("w"), Subword.wordCount(col("w"), vocab).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    cases.foreach { case (w, n) =>
      assert(got(w) == n, s"'$w': expected $n tokens, got ${got(w)}") }
  }

  test("interpreted == codegen'd, and CODEGEN_ONLY compiles (no janino fallback)") {
    val words = Seq("table", "customer", "row", "dup", "agg", "window",
      "stream", "spark", "x", "").toDF("w").where(col("w") =!= "")
    def run(): Map[String, Int] = words
      .select(col("w"), Subword.wordCount(col("w"), vocab).as("n"),
        Subword.wordCount(col("w"), Seq("ta")).as("n2")) // two instances, distinct vocabs
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val codegen = try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      run()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = try run()
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(codegen == interpreted, "codegen and interpreted paths diverge")
  }

  test("textCount == sum of per-word counts; packing accepts the subword meter") {
    val docs = Seq(
      (1L, "table batch row"),        // 1 + 2 + 2 = 5
      (2L, "customer  dup"),          // double space: empty word skipped; 3 + 3 = 6
      (3L, "a")                       // 1
    ).toDF("doc_id", "text")
    val counts = docs
      .select(col("doc_id"), Subword.textCount(col("text"), vocab).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 5L, 2L -> 6L, 3L -> 1L), counts.toString)
    // The packing family meters with the plugged tokenizer: total
    // packed tokens == total subword tokens, windows cut at capacity.
    val packed = graft.operators.Packing.concatPackWindows(docs,
        capacity = 4, tokenCount = Subword.textCount(_, vocab))
      .collect().map(r => (r.getAs[Long]("window_id"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toSeq.sorted
    // Stream: doc1 5 toks [0..4], doc2 6 toks [5..10], doc3 1 tok [11].
    // Windows of 4: w0 = 4 (doc1), w1 = 1 (doc1) + 3 (doc2),
    // w2 = 3 (doc2) + 1 (doc3).
    assert(packed == Seq((0L, 1L, 4L), (1L, 2L, 4L), (2L, 2L, 4L)),
      packed.toString)
  }
}
