package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the one stateful operator family
  * on this board where the ENGINE manages the state: Structured
  * Streaming's symmetric hash join buffers both sides, matches across
  * micro-batches in either arrival order, and uses the two watermarks
  * plus the join's time bound to EVICT state it can prove will never
  * match again (and, for the outer form, to emit the null-padded
  * unmatched rows at exactly that proof point). Everything else
  * streamed here is a foreachBatch store under the repo's generation
  * protocol — which buys exact replay semantics and readable state
  * but re-implements what the engine gives natively; this module is
  * the native path, used where its semantics (bounded event-time
  * correlation, not all-time state) are exactly the ask.
  *
  * The shape is the canonical ad-attribution correlate: impressions
  * and clicks as two INDEPENDENT streams, a click attributed to its
  * impression iff it lands within `window` after it. The time bound
  * is what makes unbounded two-stream state FINITE: without
  * `click_ts BETWEEN imp_ts AND imp_ts + window`, neither side's
  * buffer could ever be released (the engine refuses outer joins
  * without it for exactly that reason). State per side is
  * O(events within watermark + window) — arrival-rate bounded,
  * independent of stream lifetime.
  *
  * Column contract: impressions carry (`imp_id`, `user_id`,
  * `imp_ts`: timestamp), clicks carry (`click_id`, `c_imp_id`,
  * `click_ts`: timestamp) — disjoint names so the join condition and
  * the output need no aliasing dance.
  *
  * Operational law, pinned in the spec: the engine's GLOBAL watermark
  * is the MIN of the two streams' watermarks
  * (`spark.sql.streaming.multipleWatermarkPolicy=min`, the default) —
  * late-input dropping and state eviction move only when BOTH sides
  * progress, so a quiet side holds the whole join's state hostage.
  * Production deployments heartbeat thin streams or accept `max`
  * policy's correctness trade; the spec exhibits the min behavior
  * (a one-sided advance drops nothing).
  */
object StreamJoins {

  /** Inner attribution join: each click matched to its impression if
    * it arrived within `window` of it; both sides tolerate
    * `lateness` of out-of-order arrival. Emits (imp_id, user_id,
    * imp_ts, click_id, click_ts, delay_us) as matches are proven —
    * append-safe, no watermark wait on the inner form.
    */
  def impressionClickJoin(impressions: DataFrame, clicks: DataFrame,
      window: String = "10 minutes",
      lateness: String = "5 minutes"): DataFrame = {
    val imp = impressions.withWatermark("imp_ts", lateness)
    val clk = clicks.withWatermark("click_ts", lateness)
    imp.join(clk,
        expr(s"""imp_id = c_imp_id AND
                 click_ts >= imp_ts AND
                 click_ts <= imp_ts + interval $window"""))
      .select(col("imp_id"), col("user_id"), col("imp_ts"),
        col("click_id"), col("click_ts"),
        (unix_micros(col("click_ts")) - unix_micros(col("imp_ts")))
          .as("delay_us"))
  }

  /** Left-outer attribution: every impression emits exactly once —
    * joined to its click when one lands in the window, or null-padded
    * once the watermark PROVES no click can still arrive (imp_ts +
    * window + lateness behind the click watermark). This is the
    * "conversion funnel with explicit non-conversions" feed; the
    * unmatched row's emission time is the engine's state-eviction
    * point, so the same bound that sizes the state also bounds result
    * latency.
    */
  def impressionClickOuter(impressions: DataFrame, clicks: DataFrame,
      window: String = "10 minutes",
      lateness: String = "5 minutes"): DataFrame = {
    val imp = impressions.withWatermark("imp_ts", lateness)
    val clk = clicks.withWatermark("click_ts", lateness)
    imp.join(clk,
        expr(s"""imp_id = c_imp_id AND
                 click_ts >= imp_ts AND
                 click_ts <= imp_ts + interval $window"""),
        "left_outer")
      .select(col("imp_id"), col("user_id"), col("imp_ts"),
        col("click_id"), col("click_ts"))
  }
}
