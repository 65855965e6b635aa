package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.schema.SensorReading

/** Custom keyed streaming state via `KeyValueGroupedDataset
  * .flatMapGroupsWithState` — the engine's arbitrary-state surface.
  *
  * Two operators, both derived from the reference:
  *
  *  - [[thresholdCounter]]: CMP-1/2/8 as *streaming state* — the DynamoDB
  *    counter item ({ID, TotalCount} with atomic increment, threshold
  *    read, reset; sensor-log-compactor.py:38-67, 142-155) becomes one
  *    long of state per key, emitting a trigger record each time the
  *    count crosses the threshold (the batch-side compactor in
  *    [[graft.operators.Compaction]] consumes such triggers).
  *
  *  - [[countAnomalies]]: EXP-6/STR-2 — the publisher's monotonic
  *    per-session `count` (sensor_publish.py:47,83) under at-least-once
  *    delivery implies downstream sees dups and (on loss) gaps; state =
  *    highest count seen per device, emitting one record per gap/dup.
  *
  * Scale: state is one long per device key — partitioned by key across
  * executors, no global structure; timeouts are unnecessary for a
  * bounded device fleet but the hook is where expiry would plug in.
  */
object StatefulOps {

  case class CounterTrigger(client_id: String, total: Long)
  case class CountAnomaly(client_id: String, expected: Long, got: Long, kind: String)

  /** Per-key record counter: emits a [[CounterTrigger]] whenever the
    * running count reaches `threshold`, then resets that key's count
    * (CMP-8). State per key: a single Long.
    */
  def thresholdCounter(ds: Dataset[SensorReading], threshold: Int): Dataset[CounterTrigger] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.client_id)
      .flatMapGroupsWithState[Long, CounterTrigger](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[SensorReading], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[CounterTrigger]
          rows.foreach { _ =>
            n += 1
            if (n >= threshold) { out += CounterTrigger(key, n); n = 0L }
          }
          state.update(n)
          out.result().iterator
      }
  }

  /** Per-device sequence auditor: state = max `count` seen; emits "dup"
    * for replays (count ≤ state) and "gap" when the sequence skips
    * (count > state+1). In-batch rows are processed in count order so a
    * single batch behaves like orderly arrival.
    */
  def countAnomalies(ds: Dataset[SensorReading]): Dataset[CountAnomaly] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.client_id)
      .flatMapGroupsWithState[Long, CountAnomaly](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[SensorReading], state: GroupState[Long]) =>
          var last = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[CountAnomaly]
          rows.toSeq.sortBy(_.count).foreach { r =>
            if (r.count <= last) out += CountAnomaly(key, last + 1, r.count, "dup")
            else {
              if (r.count > last + 1) out += CountAnomaly(key, last + 1, r.count, "gap")
              last = r.count
            }
          }
          state.update(last)
          out.result().iterator
      }
  }
}
