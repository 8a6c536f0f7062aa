package graft.engine.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators beyond the reference's surface (the
  * reference needs none: its producer guarantees never-late events and it
  * explicitly rejects stateful dedup at ingest — reference README.md:24,
  * 58-72; SURVEY.md §2.10 T2-T4). These are the standard Structured
  * Streaming building blocks a downstream Silver layer would use,
  * declared Spark-first: watermark + windowed aggregation, session
  * windows, within-watermark dedup, and custom keyed state.
  *
  * Scale notes: all of these shuffle once on their grouping key and keep
  * per-key state bounded by the watermark horizon — the state store
  * evicts anything older, so 100 TB of history never accumulates in
  * memory.
  */
object WindowedAggs {

  /** Tumbling event-time counts/sums with a watermark bounding state and
    * dropping late rows.
    */
  def tumblingCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding (hopping) event-time counts: each event contributes to
    * every `windowLen` window whose start is a multiple of `slide` and
    * contains it (windowLen/slide windows per event). State per key is
    * still watermark-bounded — the overlap multiplies row->window fanout,
    * not retained history.
    */
  def slidingCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      slide: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Chained stateful aggregation (window over window): fine-grained
    * sub-windows aggregate first, then roll up into coarser windows —
    * BOTH levels incremental in one streaming query (multiple stateful
    * operators, the pre-aggregation cascade a high-rate metrics pipeline
    * uses so the coarse level only sees one row per closed sub-window).
    * Append-only: a coarse window emits once the watermark closes it.
    */
  def twoLevelCounts(
      events: DataFrame,
      subWindow: String = "30 minutes",
      rollupWindow: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), subWindow), col("event_type"))
      .agg(count(lit(1)).as("n_sub"))
      .groupBy(window(col("window"), rollupWindow), col("event_type"))
      .agg(sum(col("n_sub")).as("n"), count(lit(1)).as("n_subwindows"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("n_subwindows"))

  /** Session windows: gap-based event-time sessions per user. */
  def userSessions(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"), col("n_events"))

  /** Streaming exact dedup with bounded state: duplicates of event_id
    * arriving within the watermark horizon are dropped, state for older
    * ids is evicted (the op the reference discusses and defers,
    * reference README.md:58-72).
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join with event-time range correlation (the
    * ad-attribution shape): each impression joins the clicks on the same
    * ad within [imp_ts, imp_ts + followWindow]. Watermarks on BOTH sides
    * plus the time-range predicate bound the join state — impressions
    * older than the click watermark minus the follow window (and vice
    * versa) are evicted, so state never grows with stream length. Inner
    * join emits matches as soon as both rows are present (no watermark
    * wait), which keeps the roundtrip deterministic per micro-batch set.
    */
  def adAttribution(
      impressions: DataFrame,
      clicks: DataFrame,
      followWindow: String = "1 hour",
      watermark: String = "2 hours",
      joinType: String = "inner"): DataFrame = {
    val i = impressions.withWatermark("ts", watermark)
      .select(col("ad_id"), col("ts").as("imp_ts"))
    val c = clicks.withWatermark("ts", watermark)
      .select(col("ad_id").as("click_ad_id"), col("ts").as("click_ts"))
    i.join(c,
      expr(s"""ad_id = click_ad_id AND
               click_ts >= imp_ts AND
               click_ts <= imp_ts + INTERVAL $followWindow"""),
      joinType)
      .select(col("ad_id"), col("imp_ts"), col("click_ts"))
  }

  /** Left-outer variant of [[adAttribution]]: impressions that attract no
    * click inside the follow window STILL emit (null click_ts) — but only
    * once the watermark passes imp_ts + followWindow, because until then
    * a matching click could still arrive. The time-range predicate is
    * what makes the outer join runnable at all: it gives the engine the
    * eviction bound at which "no match" becomes final.
    */
  def adAttributionOuter(
      impressions: DataFrame,
      clicks: DataFrame,
      followWindow: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    adAttribution(impressions, clicks, followWindow, watermark, "left_outer")

  /** Stream-static enrichment join: each micro-batch of the stream joins
    * a bounded dimension relation (LEFT, so stream rows with no dimension
    * match still flow, null-marked). Stateless — nothing is buffered
    * across micro-batches and no watermark is needed; the dimension side
    * is broadcast, so at scale every executor enriches its stream
    * partitions locally and the stream is never shuffled. This is the
    * standard lookup/enrichment stage between ingest and windowed aggs.
    */
  def staticEnrich(
      stream: DataFrame,
      dim: DataFrame,
      streamKey: String,
      dimKey: String): DataFrame =
    stream.join(broadcast(dim), col(streamKey) === col(dimKey), "left")

  /** Custom keyed state via flatMapGroupsWithState: per-user running
    * event counter emitting an update row per input batch.
    */
  final case class UserEvent(user_id: Long, event_id: Long)
  final case class UserCount(user_id: Long, n_events: Long)

  def runningUserCounts(events: Dataset[UserEvent]): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, UserCount](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[Long]) =>
          val seen = state.getOption.getOrElse(0L) + batch.size
          state.update(seen)
          Iterator(UserCount(user, seen))
      }
  }
}
