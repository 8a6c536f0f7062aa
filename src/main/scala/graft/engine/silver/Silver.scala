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
    * Compaction is a REBUILD, staged for idempotence AND availability:
    * the new table is written next to the old one and swapped in only
    * after the distributed write succeeded — a crash mid-compact leaves
    * the previous silver table intact, and re-running never appends a
    * second copy.
    */
  def compact(spark: SparkSession, bronze: EvolvingTableSink, silverPath: String): Long = {
    val tmpPath = silverPath + ".compacting"
    graft.engine.util.Fs.deleteRecursively(java.nio.file.Paths.get(tmpPath))
    val deduped = dedupEvents(bronze.read(spark)).drop("_event_date", "_batch_id")
    new EvolvingTableSink(tmpPath).write(deduped)
    graft.engine.util.Fs.replace(
      java.nio.file.Paths.get(tmpPath), java.nio.file.Paths.get(silverPath))
    new EvolvingTableSink(silverPath).read(spark).count()
  }
}
