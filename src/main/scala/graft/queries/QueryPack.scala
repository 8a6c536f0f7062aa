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

  /** Bit-identical cross-engine rounding: floor(x * 10^n + 0.5) / 10^n,
    * every step an exact IEEE op on the same input. Spark's round() goes
    * through the double's shortest DECIMAL representation (HALF_UP on the
    * string form) while DuckDB rounds the binary double — a value whose
    * shortest repr ends exactly in '5' at the cut (e.g. 0.53575 -> 0.5358
    * vs 0.5357) splits the engines. Use this for derived doubles whose
    * decimal expansion can terminate near the cut.
    */
  def roundExpr(e: String, n: Int): String = {
    val p = "1" + "0" * n
    s"floor(($e) * $p.0 + 0.5) / $p.0"
  }
}
