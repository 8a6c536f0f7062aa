package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.engine.Sessions
import graft.engine.stream.WindowedAggs

/** Runnable demo of the event-time streaming operators (watermarked
  * tumbling windows, session windows, within-watermark dedup, custom
  * keyed state): feeds timed event batches through each query and prints
  * the emitted results.
  *
  * Usage: runMain graft.StreamingDemo
  */
object StreamingDemo {
  import WindowedAggs._

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "graft-streaming-demo")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // tumbling windows + watermark, with one deliberately-late event
    val in1 = MemoryStream[Ev]
    val q1 = tumblingCounts(in1.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("tumbling").outputMode("append").start()
    in1.addData(
      Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 10:45:00"), 1, "click", 2.0),
      Ev(3, ts("2024-01-01 11:10:00"), 2, "view", 3.0))
    q1.processAllAvailable()
    in1.addData(Ev(4, ts("2024-01-01 14:00:00"), 1, "click", 1.0)) // advances watermark
    q1.processAllAvailable()
    in1.addData(Ev(5, ts("2024-01-01 10:30:00"), 1, "click", 100.0)) // LATE: beyond watermark
    in1.addData(Ev(6, ts("2024-01-01 23:00:00"), 1, "click", 1.0))
    q1.processAllAvailable()
    q1.stop()
    println("[demo] tumbling windows (late event 5 must be absent):")
    spark.table("tumbling").orderBy("window_start", "event_type").show(truncate = false)

    // session windows
    val in2 = MemoryStream[Ev]
    val q2 = userSessions(in2.toDF(), "30 minutes", "2 hours")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    in2.addData(
      Ev(1, ts("2024-01-01 09:00:00"), 7, "click", 0),
      Ev(2, ts("2024-01-01 09:10:00"), 7, "click", 0),
      Ev(3, ts("2024-01-01 10:30:00"), 7, "click", 0),
      Ev(4, ts("2024-01-01 20:00:00"), 8, "click", 0))
    q2.processAllAvailable()
    q2.stop()
    println("[demo] session windows (user 7 splits into 2 sessions):")
    spark.table("sessions").orderBy("session_start").show(truncate = false)

    // streaming dedup within watermark
    val in3 = MemoryStream[Ev]
    val q3 = dedupWithinWatermark(in3.toDF(), "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    in3.addData(
      Ev(1, ts("2024-01-01 09:00:00"), 1, "click", 0),
      Ev(1, ts("2024-01-01 09:00:10"), 1, "click", 0),
      Ev(2, ts("2024-01-01 09:05:00"), 1, "click", 0))
    q3.processAllAvailable()
    q3.stop()
    println("[demo] dedup within watermark (event 1 appears once):")
    spark.table("dedup").orderBy("event_id").show(truncate = false)

    // custom keyed state
    val in4 = MemoryStream[UserEvent]
    val q4 = runningUserCounts(in4.toDS())
      .writeStream.format("memory").queryName("usercounts").outputMode("append").start()
    in4.addData(UserEvent(1, 10), UserEvent(1, 11), UserEvent(2, 12))
    q4.processAllAvailable()
    in4.addData(UserEvent(1, 13))
    q4.processAllAvailable()
    q4.stop()
    println("[demo] running per-user counts (state carried across batches):")
    spark.table("usercounts").orderBy("user_id", "n_events").show(truncate = false)

    spark.stop()
  }
}
