package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** BPE merge-table LEARNING (Sennrich et al. 2016 shape) — the training
  * counterpart of the merge-table APPLY in
  * [[graft.functions.SubwordExpressions]] (q_txt14): learn, from corpus
  * word frequencies, the `nMerges` highest-count adjacent symbol pairs,
  * each merged greedily into the working vocabulary before the next
  * round is counted (so later merges compose earlier ones — "m"+"er"
  * after "e"+"r").
  *
  * Scale shape: the corpus is touched ONCE (the word-frequency
  * aggregate — the same wordcount shuffle every TXT operator bottoms
  * out in); every learning round then runs over the VOCABULARY table
  * (bounded: unique words, not corpus rows), which is checkpointed at
  * entry. Per round: one vocabulary-keyed pair-count aggregate, a
  * top-1 (TakeOrderedAndProject — never a global sort), and a narrow
  * per-row merge apply. The winning pair is collected to the driver —
  * a documented bounded pin (exactly ONE row per round, `nMerges`
  * total), the same posture as the quantizer pins in
  * [[graft.streaming.IndexMaintenance]]; the alternative (a broadcast
  * cross-join per round) would stack `nMerges` limit-subqueries into
  * one lineage and re-execute the prefix exponentially.
  *
  * Symbol states are SPACE-PREFIXED strings (`" l o w"`), so applying
  * a merge is a literal non-overlapping left-to-right
  * `replace(" l r" → " lr")` — exactly greedy BPE application, with
  * identical semantics in any engine with literal `replace` (the
  * DuckDB oracle replays it verbatim). The leading separator makes a
  * symbol-BOUNDARY anchor: `" a b"` cannot match inside `" xa b"`,
  * and consuming no trailing separator means `" a a a a"` merges to
  * `" aa aa"`, not `" aa a a"`. Pair counts are over all adjacent
  * positions (overlapping, the reference implementation's zip count).
  *
  * Returns (`rank`, `lhs`, `rhs`, `merged`, `cnt`) — one row per
  * learned merge, in learning order.
  */
object Bpe {

  /** The learning loop: returns the learned merge rows AND the final
    * per-word symbol state (`w`, `state`, `freq`) with every merge
    * applied — the trained tokenizer's view of the vocabulary, consumed
    * by [[tokenCounts]].
    */
  private def learn(docs: DataFrame, nMerges: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")

    val wf = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val base = graft.util.ScratchCheckpoints.register(
      wf.select(col("w"),
        concat(lit(" "), concat_ws(" ", split(col("w"), ""))).as("state"),
        col("freq"))
        .localCheckpoint())

    var state = base
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (i <- 1 to nMerges) {
      val pairs = state
        .select(col("freq"), split(expr("substring(state, 2)"), " ").as("s"))
        .select(col("freq"), explode(
          transform(slice(col("s"), lit(1), size(col("s")) - 1),
            (x, j) => struct(x.as("l"), element_at(col("s"), j + 2).as("r"))))
          .as("p"))
      val top: Array[Row] = pairs
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect() // bounded pin: ONE row per round (see scaladoc)
      require(top.nonEmpty,
        s"BPE round $i found no adjacent pairs — corpus has no multi-char words")
      val (l, r, cnt) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((i, l, r, l + r, cnt))
      state = state.withColumn("state",
        replace(col("state"), lit(s" $l $r"), lit(s" $l$r")))
    }
    (merges.result(), state)
  }

  def learnMerges(docs: DataFrame, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learn(docs, nMerges)._1.toDF("rank", "lhs", "rhs", "merged", "cnt")
  }

  /** Scalar (map-side) token-count meter under a FIXED merge list — the
    * packing family's `tokenCount` parameter driven by a LEARNED
    * tokenizer: per word, rebuild the space-prefixed symbol state,
    * apply the merges in learning order as chained literal `replace`s
    * (plan-time literals — no join, no state table; the per-row cost is
    * `merges.length` scans of a short string), count the symbols, sum
    * over the split array. Counts are identical to [[tokenCounts]]'s
    * join form by construction — same fold per word.
    */
  def textCount(merges: Seq[(String, String)])(text: Column): Column =
    aggregate(
      filter(split(text, " "), w => w =!= ""),
      lit(0L),
      (acc, w) => {
        val st0 = concat(lit(" "), concat_ws(" ", split(w, "")))
        val stN = merges.foldLeft(st0) { case (st, (l, r)) =>
          replace(st, lit(s" $l $r"), lit(s" $l$r"))
        }
        acc + size(split(substring(stN, 2, Integer.MAX_VALUE), " ")).cast("long")
      })

  /** Per-document token counts under the LEARNED tokenizer — true BPE
    * application (the merge sequence in learning order), not the greedy
    * longest-match of [[graft.functions.SubwordExpressions]] (the two
    * disagree in general; this is the one the learned table defines).
    *
    * The trained per-word state is vocabulary-sized; the corpus pass is
    * one explode + one hash join on the word (vocabulary side is the
    * SMALL side at scale) + a per-doc aggregate. Documents with no
    * words (empty text) have no rows, matching the word explode.
    * Returns (`doc_id`, `n_words`, `n_chars`, `n_tokens`,
    * `compression` = chars/token, 6dp).
    */
  def tokenCounts(docs: DataFrame, nMerges: Int): DataFrame = {
    val trained = learn(docs, nMerges)._2
      .select(col("w"),
        size(split(expr("substring(state, 2)"), " ")).cast("long").as("n_tok"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
      .join(trained, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w")).cast("long")).as("n_chars"),
        sum(col("n_tok")).as("n_tokens"))
      .withColumn("compression",
        round(col("n_chars").cast("double") / col("n_tokens"), 6))
      .orderBy("doc_id")
  }
}
