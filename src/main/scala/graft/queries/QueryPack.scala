package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One declared engine query: a Spark builder plus (optionally) an ANSI SQL
  * equivalent the driver runs in DuckDB over the same parquet tables.
  *
  * Contract notes (driver compare):
  *   - column names must match between the Spark result and the oracle SQL
  *     (the compare sorts columns by NAME before hashing values);
  *   - every query emits a deterministic row order (explicit orderBy with
  *     full tie-breaks) and NULLS FIRST semantics on both sides;
  *   - double aggregates are rounded on both sides so association-order
  *     float noise (Spark partial aggs vs DuckDB sequential) cannot flip a
  *     hash;
  *   - timestamps are never emitted raw: they leave as DATE or epoch-micros
  *     BIGINT, sidestepping parquet physical-type mismatches (testdata
  *     events.ts is ns; Spark truncates to micros, DuckDB keeps ns).
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryPack {
  def defs: Map[String, QueryDef]
}

/** Shared helpers for oracle-parity arithmetic. */
object Q {
  /** Timestamp literal interpreted in the (UTC) session zone. */
  def ts(s: String): Column = to_timestamp(lit(s))

  /** Epoch microseconds of a timestamp column; cast first so NTZ-read
    * parquet (events.ts) goes through the UTC session zone. DuckDB
    * equivalent: epoch_us(col).
    */
  def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))
}
