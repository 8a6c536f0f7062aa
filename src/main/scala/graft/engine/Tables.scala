package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided testdata tables
  * (`/root/testdata/sf0.01/{name}.parquet` etc., see TESTDATA.md).
  *
  * All queries go through here so that the scan side is uniform:
  * plain parquet reads, letting Catalyst push filters/projections into
  * the scan (`PushedFilters`/`ReadSchema` in explain output). At 100 TB
  * these would be partitioned/bucketed tables behind a catalog; the
  * load API is the one seam to swap.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is parquet INT64 TIMESTAMP(NANOS), which Spark 4 refuses to
    * read natively. Read nanos as a raw long (legacy conf) and normalize to
    * a microsecond TimestampType column, truncating like DuckDB's
    * epoch_us(). Integer division — ns values (~1.7e18) overflow a double's
    * 53-bit mantissa.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      // TIMESTAMP(NANOS) arrived as a raw nanos long — truncate to micros
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // already micro/millis timestamp (e.g. a rewritten copy of the table)
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
