package graft.engine.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Routes parsed event rows to the valid sink or the dead-letter sink.
  *
  * Reason semantics ported from the reference's StreamProcessor
  * (reference: src/consumer/stream_processor.py:66-116):
  *
  *   - required-field predicate: conjunction of isNotNull over every
  *     non-nullable schema field, built from schema metadata
  *     (stream_processor.py:68-74);
  *   - reason precedence: corrupted_batch > invalid_schema > extra_fields
  *     > NULL (stream_processor.py:79-91);
  *   - valid rows drop all service columns; dead-letter rows put the
  *     reason FIRST and keep _raw_record (stream_processor.py:92-116).
  */
object Router {
  import EventSchema._

  val CorruptedBatch = "corrupted_batch"
  val InvalidSchema = "invalid_schema"
  val ExtraFields = "extra_fields"

  /** lit(true) AND f1 IS NOT NULL AND ... over required fields. */
  def requiredFieldsPresent(schema: StructType): Column =
    schema.fields.filterNot(_.nullable)
      .map(f => col(f.name).isNotNull)
      .foldLeft(lit(true))(_ && _)

  def reason(schema: StructType): Column =
    when(col(IsCorruptedBatch), lit(CorruptedBatch))
      .when(!requiredFieldsPresent(schema), lit(InvalidSchema))
      .when(col(HasExtraFields), lit(ExtraFields))
      .otherwise(lit(null).cast("string"))

  /** Parsed rows annotated with _dead_letter_reason. */
  def withReason(parsed: DataFrame, schema: StructType = EventSchema.schema): DataFrame =
    parsed.withColumn(DeadLetterReason, reason(schema))

  /** Valid rows: reason IS NULL, service columns dropped. */
  def valid(routed: DataFrame, schema: StructType = EventSchema.schema): DataFrame =
    routed.filter(col(DeadLetterReason).isNull)
      .select(schema.fields.map(f => col(f.name)).toSeq: _*)

  /** Dead-letter rows: reason IS NOT NULL; reason first, then the parsed
    * fields, then the raw payload.
    */
  def deadLetters(routed: DataFrame, schema: StructType = EventSchema.schema): DataFrame =
    routed.filter(col(DeadLetterReason).isNotNull)
      .select(col(DeadLetterReason) +:
        schema.fields.map(f => col(f.name)).toSeq :+ col(RawRecord): _*)
}
