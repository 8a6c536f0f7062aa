package graft.engine.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Arbitrary keyed state via the Spark 4 `transformWithState` API — the
  * successor to `(flat)mapGroupsWithState` (SPARK-45939): typed state
  * variables (`ValueState`/`ListState`/`MapState`) living in the RocksDB
  * state store, composable per key, with TTL and timers.
  *
  * The reference's consumer keeps no cross-batch state (its producer
  * guarantees exactly-once, in-order batches — reference README.md:24),
  * so like [[WindowedAggs]] this is the Silver-layer extension surface: a
  * per-user running profile a feature store would maintain over an event
  * stream.
  *
  * Scale notes: state is partitioned by the grouping key and lives in
  * RocksDB (off-heap, spillable), so per-key profiles scale to the key
  * cardinality × state size the disks hold, not the executor heap. Each
  * micro-batch shuffles once on the key; updates are point lookups.
  * `transformWithState` requires the RocksDB state store provider — the
  * caller sets `spark.sql.streaming.stateStore.providerClass` before
  * starting the query (see `Ingest.withRocksDbState`).
  */
object StatefulProfiles {

  final case class UserValue(user_id: Long, value: Long)

  /** One row per user per micro-batch the user appears in: how many
    * batches/events seen so far, the running sum, and the running max.
    */
  final case class UserProfile(
      user_id: Long,
      n_batches: Long,
      n_events: Long,
      sum_value: Long,
      max_value: Long)

  /** Running per-user profile: two scalar accumulators (`ValueState`) and
    * a per-batch event-count journal (`ListState`) whose length is the
    * number of batches this key appeared in. Emits the post-update profile
    * for every key touched by the micro-batch (update semantics).
    */
  final class RunningProfileProcessor
      extends StatefulProcessor[Long, UserValue, UserProfile] {

    @transient private var nEvents: ValueState[Long] = _
    @transient private var sumValue: ValueState[Long] = _
    @transient private var maxValue: ValueState[Long] = _
    @transient private var batchCounts: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val h = getHandle
      nEvents = h.getValueState[Long]("n_events", Encoders.scalaLong, TTLConfig.NONE)
      sumValue = h.getValueState[Long]("sum_value", Encoders.scalaLong, TTLConfig.NONE)
      maxValue = h.getValueState[Long]("max_value", Encoders.scalaLong, TTLConfig.NONE)
      batchCounts = h.getListState[Long]("batch_counts", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[UserValue],
        timerValues: TimerValues): Iterator[UserProfile] = {
      var c = 0L
      var s = 0L
      var m = Long.MinValue
      rows.foreach { r =>
        c += 1
        s += r.value
        if (r.value > m) m = r.value
      }
      val n = (if (nEvents.exists()) nEvents.get() else 0L) + c
      val sv = (if (sumValue.exists()) sumValue.get() else 0L) + s
      val mv = math.max(if (maxValue.exists()) maxValue.get() else Long.MinValue, m)
      nEvents.update(n)
      sumValue.update(sv)
      maxValue.update(mv)
      batchCounts.appendValue(c)
      Iterator(UserProfile(key, batchCounts.get().size.toLong, n, sv, mv))
    }
  }

  /** Declarative entry: group by user, maintain the running profile. */
  def runningProfiles(events: Dataset[UserValue]): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new RunningProfileProcessor, TimeMode.None(), OutputMode.Update())
  }
}
