package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass bounded top-k aggregation (SURVEY.md §4.3's optional
  * custom aggregate, patterned on Spark's own ApproximatePercentile
  * buffer design but with the public `Aggregator` API).
  *
  * Why: ranking neighbors with a window function shuffles EVERY scored
  * pair to sort within each query's partition — O(|corpus|·|queries|)
  * rows over the wire. This aggregator keeps at most `k` candidates per
  * (query, map partition) and merges the bounded buffers: the shuffle
  * carries k·partitions rows per query instead of |corpus|. At 100 TB
  * that is the difference between a top-k and an impossible sort.
  *
  * Ordering matches the window form exactly: score desc, then id asc —
  * results are bit-identical, so the same DuckDB oracle covers both.
  */
object TopKAggregator {

  case class Scored(id: Long, score: Double)
  case class TopKBuf(items: Seq[Scored])

  private def ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  /** Input rows are (groupKey, id, score); group externally on _1. The
    * buffer is trimmed lazily (only past 2k) so reduce stays O(1)
    * amortized per row.
    */
  class TopK(k: Int) extends Aggregator[(Long, Long, Double), TopKBuf, Seq[Scored]] {
    def zero: TopKBuf = TopKBuf(Seq.empty)
    def reduce(b: TopKBuf, x: (Long, Long, Double)): TopKBuf = {
      val grown = b.items :+ Scored(x._2, x._3)
      if (grown.size > 2 * k) trim(grown) else TopKBuf(grown)
    }
    def merge(a: TopKBuf, b: TopKBuf): TopKBuf = trim(a.items ++ b.items)
    private def trim(items: Seq[Scored]): TopKBuf =
      TopKBuf(items.sorted(ord).take(k))
    def finish(b: TopKBuf): Seq[Scored] = b.items.sorted(ord).take(k)
    def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }
}
