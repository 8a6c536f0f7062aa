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
  *     hash; derived doubles (ratios, folds, means-of-folds) additionally
  *     leave as scaled BIGINTs (Q.scaledLong) so no build-dependent double
  *     rendering ever reaches the driver's hash;
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

// The Persisted registry moved to graft.engine.Persisted in r9 (engine
// ops cache their internal multi-consumer frames through it too); the
// queries package object aliases it so existing call sites stand.

/** Shared helpers for oracle-parity arithmetic. */
object Q {
  /** Timestamp literal interpreted in the (UTC) session zone. */
  def ts(s: String): Column = to_timestamp(lit(s))

  /** Epoch microseconds of a timestamp column; cast first so NTZ-read
    * parquet (events.ts) goes through the UTC session zone. DuckDB
    * equivalent: epoch_us(col).
    */
  def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Round-half-up a derived double to n decimals and emit it as a SCALED
    * BIGINT (value * 10^n). floor and the *10^n multiply are exact/correctly
    * rounded IEEE ops on the same input in both engines, and an integer
    * hashes identically across every DuckDB/arrow/pandas build — unlike a
    * post-rounded DOUBLE, whose decimal re-rendering is build-dependent
    * (round-2 driver hash failures were exactly the post-rounded-double
    * queries). Derived double columns must leave the engine through this.
    *
    * ACCEPTED ULP RISK (documented, not eliminated): expressions routed
    * through transcendentals (log10/ln/pow/sqrt — quality_benford,
    * curate_ccnet_buckets, curate_dsir_select, stats_ttest_welch, ...)
    * rely on JVM Math and DuckDB libm both being correctly-rounded-to-
    * ~1-ulp, NOT bit-identical. If the true value of `e` sits within
    * ~1 ulp of a .5 * 10^-n rounding boundary the scaled integer can
    * differ by 1 between engines. We keep n small (<=6) relative to
    * double precision (~15-16 significant digits) so the boundary band
    * is ~1e-10 of the value space; six rounds x 250 queries have never
    * hit it. A driver-side +/-1-in-last-digit tolerance would close the
    * gap entirely; until then this comment is the contract.
    */
  def scaledLong(e: String, n: Int): String = {
    val p = "1" + "0" * n
    s"CAST(floor(($e) * $p.0 + 0.5) AS BIGINT)"
  }
}
