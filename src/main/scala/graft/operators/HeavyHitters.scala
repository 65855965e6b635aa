package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact frequent-item (heavy-hitter) detection in two bounded passes —
  * the only shape that stays exact at 100 TB, where a full `GROUP BY`
  * over every distinct token is fine but a SINGLE-pass exact answer in
  * bounded memory is provably impossible (Alon-Matias-Szegedy lower
  * bound territory).
  *
  * Pass 1 — a Misra-Gries summary of capacity `m` runs as a regular
  * partial aggregate: each map task folds its partition into a ≤ m-entry
  * sketch, the exchange carries ONE sketch per partition (m entries, not
  * the token stream), and sketches merge associatively on the reduce
  * side. The classic guarantee: every item with true frequency
  * > N/(m+1) survives to the merged summary (undercounts are at most
  * N/(m+1)); the summary also carries the exact total N, so the
  * support threshold needs no extra scan.
  *
  * Pass 2 — the ≤ m surviving candidates (a driver pin BOUNDED BY m, the
  * documented-bounded-collect pattern) are broadcast back and counted
  * EXACTLY with a semi-joined aggregate; the keep decision
  * `n · denom ≥ N · num` is integer arithmetic, so the result is the
  * exact set { item : freq ≥ φ·N } with exact counts — no approximation
  * leaves the operator.
  *
  * `require(m + 1 > 1/φ)` enforces the soundness condition: with it, no
  * φ-frequent item can be evicted from the sketch, so pass 2's exact
  * filter sees every true heavy hitter.
  */
object HeavyHitters {

  /** Misra-Gries buffer: counters (≤ capacity entries after trim) plus
    * the exact stream length. Kryo-encoded — the buffer is a per-task
    * object, never row data.
    */
  case class MG(counters: mutable.Map[String, Long], var total: Long)

  class MisraGries(m: Int) extends Aggregator[String, MG, (Map[String, Long], Long)] {
    require(m > 0, "capacity must be positive")
    def zero: MG = MG(mutable.Map.empty, 0L)

    def reduce(b: MG, x: String): MG = {
      b.total += 1
      b.counters.get(x) match {
        case Some(c) => b.counters.update(x, c + 1)
        case None =>
          if (b.counters.size < m) b.counters.update(x, 1L)
          else decrementAll(b, 1L)
      }
      b
    }

    /** Merge = add counts, then restore the ≤ m bound
      * ([[HeavyHitters.mergeCounters]] — the standard Agarwal et al.
      * mergeable-summaries step, so the N/(m+1) undercount bound is
      * preserved).
      */
    def merge(a: MG, b: MG): MG = {
      mergeCounters(a.counters, b.counters, m)
      a.total += b.total
      a
    }

    private def decrementAll(b: MG, by: Long): Unit = {
      val dead = mutable.ArrayBuffer.empty[String]
      for ((k, v) <- b.counters) {
        if (v <= by) dead += k else b.counters.update(k, v - by)
      }
      dead.foreach(b.counters.remove)
    }

    def finish(b: MG): (Map[String, Long], Long) = (b.counters.toMap, b.total)
    def bufferEncoder: Encoder[MG] = Encoders.kryo[MG]
    def outputEncoder: Encoder[(Map[String, Long], Long)] =
      Encoders.product[(Map[String, Long], Long)]
  }

  /** Merge `b`'s counters into `a`, then restore the ≤ m bound by
    * subtracting the (m+1)-th largest count from every counter and
    * dropping the non-positive ones — equivalent to that many rounds of
    * the streaming decrement, so two merged summaries keep the combined
    * N/(m+1) undercount guarantee (Agarwal et al., Mergeable
    * Summaries). Shared by the [[MisraGries]] aggregator's reduce-side
    * merge and the cross-batch state merge in
    * [[graft.streaming.HeavyHitterStream]].
    */
  private[graft] def mergeCounters(a: mutable.Map[String, Long],
      b: Iterable[(String, Long)], m: Int): Unit = {
    for ((k, v) <- b)
      a.update(k, a.getOrElse(k, 0L) + v)
    if (a.size > m) {
      val kth = a.values.toArray.sorted(Ordering[Long].reverse)(m)
      val keep = a.collect { case (k, v) if v > kth => k -> (v - kth) }
      a.clear()
      a ++= keep
    }
  }

  /** Exact { item : freq ≥ num/denom · N } with exact counts and shares.
    * `items` is the token stream (already exploded); `m` is the sketch
    * capacity. Output: (item, n, share) ordered by n desc, item asc.
    */
  def frequentItems(items: Dataset[String], num: Long, denom: Long,
      m: Int = 1024): DataFrame = {
    require(num > 0 && denom > 0, "threshold fraction must be positive")
    // Soundness: an item at exactly the threshold freq = N·num/denom must
    // beat the worst-case undercount N/(m+1), i.e. (m+1)·num > denom.
    require((m + 1).toLong * num > denom,
      s"sketch capacity $m too small for threshold $num/$denom " +
        s"(need m+1 > denom/num): frequent items could be evicted")
    val spark = items.sparkSession
    import spark.implicits._
    // Pass 1: one merged sketch. The driver pin is ≤ m entries + a long —
    // bounded by construction, independent of N.
    val (cands, total) = items.select(new MisraGries(m).toColumn).head()
    if (cands.isEmpty || total == 0L) {
      return spark.emptyDataset[(String, Long, Double)]
        .toDF("item", "n", "share")
    }
    // Pass 2: exact counts for the ≤ m candidates only; integer keep test.
    val candDf = broadcast(cands.keys.toSeq.toDF("item"))
    items.toDF("item")
      .join(candDf, Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("n"))
      .where(col("n") * lit(denom) >= lit(total) * lit(num))
      .withColumn("share", round(col("n").cast("double") / lit(total.toDouble), 6))
      .orderBy(col("n").desc, col("item"))
  }
}
