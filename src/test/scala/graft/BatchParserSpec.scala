package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ingest.{EventSchema, JsonArrayBatchParser}

/** 1:1 port of the reference parser unit tests
  * (reference: tests/consumer/test_batch_parsers.py:10-93), same reduced
  * two-required-string-field schema, same asserts.
  */
class BatchParserSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, "graft-test")
  import EventSchema.{IsCorruptedBatch, HasExtraFields, RawRecord}

  private val reduced = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false)))

  private def parse(batch: String) = {
    import spark.implicits._
    new JsonArrayBatchParser(reduced).parse(Seq(batch).toDF("value")).collect()
  }

  test("valid two-record batch parses with flags false") {
    val rows = parse("""[{"id":"1","name":"a"},{"id":"2","name":"b"}]""")
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("id")).sorted.sameElements(Array("1", "2")))
    assert(rows.map(_.getAs[String]("name")).sorted.sameElements(Array("a", "b")))
    assert(rows.forall(!_.getAs[Boolean](IsCorruptedBatch)))
    assert(rows.forall(!_.getAs[Boolean](HasExtraFields)))
  }

  test("malformed JSON yields one corrupted row preserving the raw batch") {
    val rows = parse("""[{"id":"1"""")
    assert(rows.length == 1)
    assert(rows.head.getAs[Boolean](IsCorruptedBatch))
    assert(rows.head.getAs[String](RawRecord) == """[{"id":"1"""")
    assert(rows.head.getAs[String]("id") == null)
  }

  test("extra field flags the record but known fields still parse") {
    val rows = parse("""[{"id":"1","name":"a","x":"y"}]""")
    assert(rows.length == 1)
    assert(rows.head.getAs[Boolean](HasExtraFields))
    assert(!rows.head.getAs[Boolean](IsCorruptedBatch))
    assert(rows.head.getAs[String]("id") == "1")
    assert(rows.head.getAs[String]("name") == "a")
  }

  test("missing required field parses to NULL (parser does not reject)") {
    val rows = parse("""[{"id":"1"}]""")
    assert(rows.length == 1)
    assert(!rows.head.getAs[Boolean](IsCorruptedBatch))
    assert(!rows.head.getAs[Boolean](HasExtraFields))
    assert(rows.head.getAs[String]("id") == "1")
    assert(rows.head.getAs[String]("name") == null)
  }

  test("empty array yields one row classified corrupted (G1 rule)") {
    val rows = parse("[]")
    assert(rows.length == 1)
    assert(rows.head.getAs[Boolean](IsCorruptedBatch))
    assert(rows.head.getAs[String](RawRecord) == "[]")
  }
}
