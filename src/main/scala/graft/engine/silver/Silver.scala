package graft.engine.silver

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.sinks.EvolvingTableSink

/** Silver-layer compaction: the batch dedup pass the reference
  * deliberately defers out of its ingest path (reference: README.md:58-72
  * — "deduplication is the Silver layer's job"). Reads bronze back,
  * keeps the first-seen row per event_id, and writes a day-partitioned
  * silver table.
  *
  * Scale notes: dedup is one hash shuffle on event_id with map-side
  * partial aggregation (min_by struct); the write re-partitions by the
  * hidden day column only. No window over the full table, no sort.
  */
object Silver {

  /** First-seen row per event_id (ties broken by event_timestamp then
    * insertion order via min_by struct comparison).
    */
  def dedupEvents(bronze: DataFrame): DataFrame = {
    val cols = bronze.columns.filter(_ != "event_id")
    bronze
      .groupBy(col("event_id"))
      .agg(min_by(struct(cols.map(col).toSeq: _*), col("event_timestamp")).as("r"))
      .select(col("event_id") +: cols.map(c => col(s"r.$c").as(c)): _*)
  }

  /** bronze dir -> silver dir, returns deduplicated row count.
    * Compaction is a REBUILD: the silver table is replaced wholesale, so
    * re-running it (retried job, scheduled recompaction) is idempotent
    * rather than appending a second copy of every row.
    */
  def compact(spark: SparkSession, bronze: EvolvingTableSink, silverPath: String): Long = {
    val deduped = dedupEvents(bronze.read(spark)).drop("_event_date", "_batch_id")
      .cache()
    deduped.count() // materialize BEFORE wiping the old silver output
    val dir = new java.io.File(silverPath)
    if (dir.exists()) {
      import scala.reflect.io.Directory
      new Directory(dir).deleteRecursively()
    }
    val silver = new EvolvingTableSink(silverPath)
    try silver.write(deduped) finally deduped.unpersist()
    silver.read(spark).count()
  }
}
