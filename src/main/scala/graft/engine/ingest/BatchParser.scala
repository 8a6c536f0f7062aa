package graft.engine.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical parsed-event schema of the ingestion pipeline
  * (reference: src/consumer/__main__.py:120-131). product_id is the
  * schema-evolution field (only on purchase events,
  * reference: src/producer/event_factory.py:120-132).
  */
object EventSchema {
  val schema: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("event_id", StringType, nullable = false),
    StructField("event_timestamp", TimestampType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("product_id", StringType, nullable = true),
    StructField("properties", MapType(StringType, StringType), nullable = true)))

  /** Engine-internal service columns (underscore-prefixed). */
  val RawRecord = "_raw_record"
  val IsCorruptedBatch = "_is_corrupted_batch"
  val HasExtraFields = "_has_extra_fields"
  val DeadLetterReason = "_dead_letter_reason"
}

/** Parses raw batch rows (one JSON array of event objects per row, column
  * `value`) into flat event rows plus corruption/extra-field flags.
  *
  * Semantics ported from the reference's JsonArrayBatchParser
  * (reference: src/consumer/batch_parsers.py:40-142):
  *
  *   - the whole batch is parsed as ARRAY<STRING> so each element survives
  *     as raw JSON text; malformed JSON yields NULL (PERMISSIVE), which is
  *     the corruption signal (batch_parsers.py:127-132);
  *   - explode_outer keeps NULL and EMPTY arrays as a single NULL row, so
  *     a corrupted batch — or an empty `[]` batch — still produces exactly
  *     one (dead-letter) row (batch_parsers.py:126-132; empty-array case
  *     proven by tests/consumer/test_batch_parsers.py:84-93);
  *   - extra-field detection counts top-level keys of the record re-parsed
  *     as an untyped map against the expected schema width — counts, not
  *     names (batch_parsers.py:65-76); the nested properties map is ONE
  *     key;
  *   - corrupted batches coalesce the whole raw batch text into
  *     _raw_record so dead letters always carry a payload
  *     (batch_parsers.py:78-84);
  *   - each record is parsed against the business schema; missing fields
  *     become NULL here and are rejected by the Router, not the parser
  *     (batch_parsers.py:96-99).
  *
  * The whole path is built-in Catalyst expressions — no UDFs — so it stays
  * inside whole-stage codegen and is embarrassingly parallel per input
  * split (no shuffle anywhere before the sink).
  */
final class JsonArrayBatchParser(schema: StructType = EventSchema.schema) {
  import EventSchema._

  def parse(raw: DataFrame): DataFrame = {
    val expectedKeys = schema.fields.length
    val exploded = raw
      .select(col("value").as("_raw_batch"))
      .select(col("_raw_batch"),
        explode_outer(from_json(col("_raw_batch"), ArrayType(StringType))).as(RawRecord))
    val flagged = exploded
      .withColumn(IsCorruptedBatch, col(RawRecord).isNull)
      // size(NULL) is NULL under Spark 4 defaults (the reference's Spark
      // 3.5 non-ANSI gave -1); coalesce to false to keep the reference's
      // "unparseable record is not extra-fields" behavior.
      .withColumn(HasExtraFields,
        coalesce(
          size(map_keys(from_json(col(RawRecord), MapType(StringType, StringType)))) > lit(expectedKeys),
          lit(false)))
      .withColumn(RawRecord, coalesce(col(RawRecord), col("_raw_batch")))
      .withColumn("_parsed_record", from_json(col(RawRecord), schema))
    flagged.select(
      schema.fields.map(f => col(s"_parsed_record.${f.name}").as(f.name)).toSeq ++
        Seq(col(RawRecord), col(IsCorruptedBatch), col(HasExtraFields)): _*)
  }
}
