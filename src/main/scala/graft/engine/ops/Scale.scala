package graft.engine.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster-scale physical-layout helpers: bucketed co-located joins and
  * key salting for skewed aggregations. Neither exists in the reference
  * (its pipeline is join-free and agg-light); they are the layout tools a
  * 100 TB deployment of this engine leans on and are asserted by
  * ScaleOpsSpec (bucketed join plans with NO Exchange; salted results
  * equal unsalted).
  */
object Scale {

  /** Persist a DataFrame as a bucketed+sorted catalog table. Two tables
    * bucketed the same way join with zero shuffle (scan-time
    * co-location) — the pre-partitioning strategy for repeated fact-fact
    * joins.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Two-phase salted aggregation for skewed grouping keys: spread each
    * hot key over `saltBuckets` partial groups (salt derived
    * deterministically from the row content), aggregate partially, then
    * aggregate the partials. sum/count re-aggregate losslessly.
    */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      value: Column,
      saltBuckets: Int = 16): DataFrame = {
    val salted = df
      .withColumn("_salt", pmod(hash(struct(df.columns.map(col).toSeq: _*)), lit(saltBuckets)))
      .groupBy(key.as("_key"), col("_salt"))
      .agg(sum(value).as("_psum"), count(lit(1)).as("_pcnt"))
    salted
      .groupBy(col("_key"))
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("n"))
  }
}
