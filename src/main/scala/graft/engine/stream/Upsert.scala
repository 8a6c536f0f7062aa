package graft.engine.stream

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming keyed upsert — the CDC/last-write-wins merge the reference's
  * append-only sink family stops short of (reference src/consumer/
  * data_sinks.py appends; mutation is deferred downstream, like dedup).
  * Each micro-batch is merged into a parquet table so the table always
  * holds exactly one row per key: the one with the highest `ord` seen so
  * far. On an engine with table formats (Iceberg/Delta) this is MERGE
  * INTO; here it is the same parquet-substitute seam as
  * EvolvingTableSink, with the swap staged for crash safety.
  *
  * Scale notes: the merge is ONE hash shuffle on the key with map-side
  * partial aggregation (max_by of the payload struct) — no window sort,
  * no row_number. The rewrite cost is proportional to the table, which is
  * the honest cost of parquet-without-a-table-format; a 100 TB deployment
  * bounds it by partitioning the table on a key prefix and rewriting only
  * the partitions a batch touches (or swaps in Iceberg MERGE at this
  * seam).
  */
object Upsert {

  /** Last-write-wins merge: of all rows in base ∪ updates sharing a key,
    * the one with the highest `ord` survives. `ord` must be unique per
    * key (a CDC sequence number / log offset) — ties would be broken
    * arbitrarily. Re-merging already-applied rows is a no-op by
    * construction, which is what makes checkpoint replay idempotent.
    */
  def merge(base: DataFrame, updates: DataFrame, keys: Seq[String], ord: String): DataFrame = {
    val all = base.unionByName(updates)
    val payload = all.columns.filterNot(keys.contains)
    all.groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col).toSeq: _*), col(ord)).as("_r"))
      .select(keys.map(col) ++ payload.map(c => col(s"_r.$c").as(c)): _*)
  }

  private def pointer(dir: String) = Paths.get(dir, "_LATEST")

  /** Version the _LATEST pointer names, if the table exists. */
  def currentVersion(dir: String): Option[Long] = {
    val p = pointer(dir)
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** The committed table (None before the first batch lands). */
  def current(spark: SparkSession, dir: String): Option[DataFrame] =
    currentVersion(dir).map(v => spark.read.parquet(s"$dir/v$v"))

  /** Time travel: read a specific RETAINED version — the committed one or
    * the single kept back-version (older versions are pruned; a table
    * format would retain a configurable history at this seam). The
    * version directory is immutable once _LATEST has moved past it, so
    * this read is a consistent snapshot of the table as of that batch.
    */
  def at(spark: SparkSession, dir: String, version: Long): DataFrame =
    spark.read.parquet(s"$dir/v$version")

  /** Merge one batch into the table as version `version`: read the
    * committed version, merge, write `v<version>` NEXT TO it, then
    * atomically repoint `_LATEST`. A crash anywhere leaves the previous
    * version fully readable; a checkpoint replay of an already-committed
    * version is detected by the pointer and skipped (the batch-id
    * replay no-op, same contract as EvolvingTableSink's batch range).
    * Superseded versions older than the one just replaced are pruned.
    */
  def applyBatch(batch: DataFrame, dir: String, keys: Seq[String], ord: String,
      version: Long): Unit =
    applyBatchWith(batch, dir, version) { (cur, b) =>
      cur match {
        case Some(c) => merge(c, b, keys, ord)
        case None    => merge(b.limit(0), b, keys, ord) // in-batch LWW dedup
      }
    }

  /** The generic exactly-once version commit: merge the batch into the
    * current table with `mergeFn`, write the next version directory,
    * atomically repoint _LATEST, prune superseded versions (keeping one
    * back-version for in-flight readers). Replay of an already-committed
    * version is a no-op. LWW upsert and additive aggregate maintenance
    * are both instances of this with different mergeFn.
    */
  def applyBatchWith(batch: DataFrame, dir: String, version: Long)(
      mergeFn: (Option[DataFrame], DataFrame) => DataFrame): Unit = {
    val prev = currentVersion(dir)
    if (prev.contains(version)) return // checkpoint replay of a committed batch
    val spark = batch.sparkSession
    val merged = mergeFn(current(spark, dir), batch)
    merged.write.mode("overwrite").parquet(s"$dir/v$version")
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, s"_LATEST.tmp$version")
    Files.writeString(tmp, version.toString)
    Files.move(tmp, pointer(dir), StandardCopyOption.ATOMIC_MOVE)
    // prune everything older than the version we just superseded (keep
    // one back-version so an in-flight reader of `prev` finishes cleanly)
    prev.foreach { p =>
      val d = new java.io.File(dir)
      Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
        if (f.getName.startsWith("v") &&
            f.getName.drop(1).forall(_.isDigit) &&
            f.getName.drop(1).toLong < p)
          graft.engine.util.Fs.deleteRecursively(f.toPath)
      }
    }
  }

  /** Incremental materialized aggregate: each micro-batch's per-key
    * partial sums/counts FOLD INTO the maintained table (base ∪ partial,
    * re-aggregated on the key) — the materialized-view-maintenance
    * pattern for additive aggregates. Each batch costs one partial
    * aggregation of the batch plus a merge proportional to the DISTINCT
    * KEYS, never a rescan of history; sums and counts re-aggregate
    * losslessly, so the table always equals the aggregate over every row
    * ever delivered (exactly-once via the version replay no-op).
    */
  def streamAggregate(updates: DataFrame, dir: String, keys: Seq[String],
      sumCols: Seq[String], checkpoint: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        applyBatchWith(b.toDF(), dir, id) { (cur, batch) =>
          val partial = batch.groupBy(keys.map(col): _*)
            .agg(count(lit(1)).as("n_rows"),
              sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)
          cur match {
            case None => partial
            case Some(c) =>
              c.unionByName(partial)
                .groupBy(keys.map(col): _*)
                .agg(sum(col("n_rows")).as("n_rows"),
                  sumCols.map(c2 => sum(col(s"sum_$c2")).as(s"sum_$c2")): _*)
          }
        }
      }
      .start()

  /** Continuous upsert: every micro-batch merges into the table, with the
    * micro-batch id as the version (exactly-once via the replay no-op).
    */
  def stream(updates: DataFrame, dir: String, keys: Seq[String], ord: String,
      checkpoint: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        applyBatch(b.toDF(), dir, keys, ord, id)
      }
      .start()
}
