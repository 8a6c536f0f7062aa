package graft.fixtures

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import scala.util.Random

/** Deterministic producer-equivalent fixture generator: builds the same
  * batch-file contract the reference producer emits (one JSON array of
  * event objects per file), including the fault injections that make the
  * input interesting (reference: src/producer/event_factory.py:16-138,
  * src/producer/data_sinks.py:44-64):
  *
  *   - page_view events with url/user_agent properties; purchase events
  *     add the top-level product_id (the schema-evolution field) and
  *     amount/currency properties with amount as a JSON NUMBER
  *     (event_factory.py:114-131);
  *   - invalid-schema events are a single bogus random key
  *     (event_factory.py:134-138);
  *   - duplicates re-emit the previous event verbatim
  *     (event_factory.py:71-86);
  *   - batch corruption truncates the serialized array at len/2
  *     (data_sinks.py:59-64);
  *   - user ids drawn from a fixed pre-generated pool
  *     (event_factory.py:88-93).
  *
  * Plain JVM string building — this is a test fixture, not a Spark op.
  */
final class EventGen(
    seed: Long = 42L,
    corruptionChance: Double = 0.0,
    invalidSchemaChance: Double = 0.0,
    duplicateChance: Double = 0.0) {

  private val rnd = new Random(seed)
  private val userIds = Vector.fill(1000)(randomUuid())
  private var prevEvent: Option[String] = None
  private var clockMs: Long = 1704067200000L // 2024-01-01T00:00:00Z

  private def randomUuid(): String =
    new java.util.UUID(rnd.nextLong(), rnd.nextLong()).toString

  private def randomStr(n: Int): String =
    Iterator.continually(rnd.nextInt(26)).map(i => ('a' + i).toChar).take(n).mkString

  private def nextTimestamp(): String = {
    clockMs += 1000L + rnd.nextInt(9000)
    java.time.Instant.ofEpochMilli(clockMs).toString // ISO-8601 UTC, Z suffix
  }

  /** One event object as JSON text. */
  def nextEvent(): String = {
    val roll = rnd.nextDouble()
    val ev =
      if (roll < invalidSchemaChance) s"""{"${randomStr(8)}":"${randomStr(12)}"}"""
      else if (roll < invalidSchemaChance + duplicateChance && prevEvent.isDefined) prevEvent.get
      else {
        val user = userIds(rnd.nextInt(userIds.length))
        val id = randomUuid()
        val ts = nextTimestamp()
        if (rnd.nextBoolean())
          s"""{"user_id":"$user","event_id":"$id","event_timestamp":"$ts","event_type":"page_view","properties":{"url":"https://example.com/${randomStr(6)}","user_agent":"agent-${randomStr(4)}"}}"""
        else
          s"""{"user_id":"$user","event_id":"$id","event_timestamp":"$ts","event_type":"purchase","product_id":"prod-${randomStr(5)}","properties":{"amount":${rnd.nextInt(10000) / 100.0},"currency":"USD"}}"""
      }
    prevEvent = Some(ev)
    ev
  }

  /** One batch with its ground-truth stats (for property tests). */
  final case class BatchInfo(json: String, records: Int, corrupted: Boolean)

  def nextBatchInfo(events: Int): BatchInfo = {
    val body = Seq.fill(events)(nextEvent()).mkString("[", ",", "]")
    if (rnd.nextDouble() < corruptionChance)
      BatchInfo(body.substring(0, body.length / 2), events, corrupted = true)
    else BatchInfo(body, events, corrupted = false)
  }

  /** One serialized batch, possibly truncated at the midpoint. */
  def nextBatch(events: Int): String = nextBatchInfo(events).json

  /** Write one file per batch into dir (the streaming file-source
    * contract: reference src/producer/data_sinks.py:99-121).
    */
  def writeBatchFiles(dir: Path, nBatches: Int, eventsPerBatch: Int): Seq[Path] = {
    Files.createDirectories(dir)
    (0 until nBatches).map { _ =>
      val p = dir.resolve(s"${randomUuid()}.json")
      Files.write(p, nextBatch(eventsPerBatch).getBytes(StandardCharsets.UTF_8))
      p
    }
  }
}
