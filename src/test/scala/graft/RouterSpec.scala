package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ingest.{EventSchema, JsonArrayBatchParser, Router}

/** Routing precedence and output-shape semantics
  * (reference: src/consumer/stream_processor.py:66-116).
  */
class RouterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, "graft-test")
  import EventSchema._

  private def route(batches: String*) = {
    import spark.implicits._
    Router.withReason(new JsonArrayBatchParser().parse(batches.toDF("value")))
  }

  private val validEvent =
    """{"user_id":"u1","event_id":"e1","event_timestamp":"2024-01-01 00:00:00","event_type":"page_view","properties":{"url":"x","user_agent":"y"}}"""

  test("corrupted batch beats invalid schema in reason precedence") {
    val rows = route("""not json at all""").collect()
    assert(rows.length == 1)
    // parsed fields are all NULL too (required-fields predicate false),
    // but corruption wins
    assert(rows.head.getAs[String](DeadLetterReason) == Router.CorruptedBatch)
  }

  test("invalid schema beats extra fields") {
    // 7 top-level keys AND a missing required field
    val rows = route(
      """[{"a":"1","b":"2","c":"3","d":"4","e":"5","f":"6","g":"7"}]""").collect()
    assert(rows.head.getAs[String](DeadLetterReason) == Router.InvalidSchema)
  }

  test("extra fields flagged when all required fields present") {
    val rows = route(
      """[{"user_id":"u","event_id":"e","event_timestamp":"2024-01-01 00:00:00","event_type":"t","product_id":"p","properties":{},"zz":"1"}]""").collect()
    assert(rows.head.getAs[String](DeadLetterReason) == Router.ExtraFields)
  }

  test("valid rows carry exactly the business schema columns") {
    val valid = Router.valid(route(s"[$validEvent]"))
    assert(valid.columns.toSeq == EventSchema.schema.fields.map(_.name).toSeq)
    assert(valid.count() == 1)
  }

  test("dead letters put the reason first and keep the raw record") {
    val dead = Router.deadLetters(route("[]"))
    assert(dead.columns.head == DeadLetterReason)
    assert(dead.columns.last == RawRecord)
    val row = dead.collect().head
    assert(row.getAs[String](DeadLetterReason) == Router.CorruptedBatch)
    assert(row.getAs[String](RawRecord) == "[]")
  }

  test("a batch mixing all classes routes each record independently") {
    val mixed = route(
      s"[$validEvent,{\"glorp\":\"z\"}]",
      "[]")
    val reasons = mixed.collect().map(_.getAs[String](DeadLetterReason))
    assert(reasons.count(_ == null) == 1)
    assert(reasons.count(_ == Router.InvalidSchema) == 1)
    assert(reasons.count(_ == Router.CorruptedBatch) == 1)
  }
}
