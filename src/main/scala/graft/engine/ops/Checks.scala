package graft.engine.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints evaluated in ONE pass over the
  * relation (the deequ/great-expectations pattern, Spark-first): every
  * constraint compiles to an aggregate expression, all of them run in a
  * single map-side-combinable aggregation, and the report is one tiny
  * row per constraint. At 100 TB this matters because N constraints cost
  * one scan, not N — the metrics all fold in the same partial aggregate.
  *
  * Metrics are emitted as exact scaled integers (parts-per-million for
  * ratios) so a CI gate diffing two reports never sees float noise.
  */
object Checks {

  /** One constraint: a name, a per-million metric expression, and the
    * minimum metric value (ppm) at which it passes.
    */
  final case class Constraint(name: String, metricPpm: Column, minPpm: Long)

  private val M = 1000000L

  /** floor((num * 1e6) / den) — portable scaled ratio. The division is
    * one correctly-rounded double op whose fractional part is at least
    * 1/den (far above ulp scale), so floor lands identically in every
    * engine; the later long cast is identity on the integral result
    * (Spark's cast truncates, DuckDB's rounds — both no-ops here).
    */
  private def ppm(num: Column, den: Column): Column = floor((num * M) / den)

  /** Fraction of rows with `c` non-null, in ppm. */
  def completeness(c: Column): Column =
    ppm(sum(when(c.isNotNull, 1L).otherwise(0L)), count(lit(1)))

  /** Distinct values per row, in ppm — 1e6 exactly when `c` never
    * repeats (the unique-key check).
    */
  def uniqueness(c: Column): Column =
    ppm(countDistinct(c), count(lit(1)))

  /** Fraction of rows satisfying the predicate, in ppm. */
  def compliance(pred: Column): Column =
    ppm(sum(when(pred, 1L).otherwise(0L)), count(lit(1)))

  /** Evaluate all constraints in one aggregation pass: one agg row with
    * a column per constraint, unpivoted to (constraint_name, metric_ppm,
    * pass) with thresholds joined from a broadcast lookup.
    */
  def run(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = constraints.map(c => c.metricPpm.cast("long").as(c.name))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val melted = row.unpivot(
      Array.empty[Column], constraints.map(c => col(c.name)).toArray,
      "constraint_name", "metric_ppm")
    val mins = constraints.map(c => (c.name, c.minPpm))
      .toDF("constraint_name", "min_ppm")
    melted.join(broadcast(mins), Seq("constraint_name"))
      .selectExpr("constraint_name", "metric_ppm",
        "CAST(CASE WHEN metric_ppm >= min_ppm THEN 1 ELSE 0 END AS BIGINT) AS pass")
  }
}
