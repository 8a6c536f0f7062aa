package graft.engine.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg-semantics bronze sink on plain parquet (SURVEY.md §7.4).
  *
  * Preserves the observable behaviors of the reference's Iceberg sink
  * (reference: src/consumer/data_sinks.py:68-147) without the Iceberg
  * runtime (not present in this offline build):
  *
  *   - create-on-first-write (data_sinks.py:86-101): first batch creates
  *     the table directory and a schema sidecar (the stand-in for Iceberg
  *     table metadata);
  *   - hidden day partitioning (data_sinks.py:134-144, partitionedBy
  *     days(event_timestamp)): a derived `_event_date` partition column is
  *     added at write and never supplied by writers; readers still get
  *     partition pruning from the directory layout;
  *   - schema evolution on append (data_sinks.py:103-125): new nullable
  *     columns are added; integer/float widening is accepted by casting
  *     the incoming batch to the widened type (Spark 4's parquet reader
  *     up-casts old narrow files on read); NARROWING is rejected exactly
  *     as Iceberg would reject the ALTER at execution. Unlike the
  *     reference — which fires ALTER COLUMN TYPE on any mismatch and lets
  *     Iceberg throw (SURVEY.md §2.13) — the check happens before any
  *     data is written;
  *   - batch-level exactly-once (reference README.md:41): the sidecar
  *     records the last committed batchId; a replayed foreachBatch id
  *     (checkpoint recovery) is skipped instead of double-appended.
  *
  * At 100 TB the day-partitioned append is the same layout Iceberg
  * produces underneath; the sidecar plays the metadata role for this
  * single-writer pipeline.
  */
final class EvolvingTableSink(
    val path: String,
    timestampCol: String = "event_timestamp") {

  private val PartitionCol = "_event_date"
  private val BatchCol = "_batch_id"
  private def metaPath: Path = Paths.get(path, "_graft_meta.json")
  private def commitLogPath: Path = Paths.get(path, "_graft_commits.log")

  // ---- metadata sidecar -------------------------------------------------

  /** lastBatchId tracks STREAMING batch ids only (replay detection);
    * backfill writes get their own negative id sequence via
    * nextBackfillId so they can never collide with — and silently
    * swallow — a future streaming batch id.
    */
  private case class Meta(schema: StructType, lastBatchId: Long, nextBackfillId: Long)

  private def readMeta(): Option[Meta] =
    if (Files.exists(metaPath)) {
      val txt = new String(Files.readAllBytes(metaPath), StandardCharsets.UTF_8)
      val lines = txt.split("\n", 3)
      Some(Meta(
        DataType.fromJson(lines(2)).asInstanceOf[StructType],
        lines(0).toLong, lines(1).toLong))
    } else None

  private def writeMeta(m: Meta): Unit = {
    Files.createDirectories(Paths.get(path))
    // atomic tmp+move (r12): the sidecar IS the commit point — a kill
    // mid-write would otherwise leave a truncated file that bricks
    // every subsequent read AND write (readMeta throws before the
    // replay path can run), the one crash window with no recovery
    val tmp = Paths.get(path, "_graft_meta.json.tmp")
    Files.write(tmp,
      (m.lastBatchId.toString + "\n" + m.nextBackfillId.toString + "\n" +
        m.schema.json).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, metaPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  // ---- evolution rules --------------------------------------------------

  private def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case _ => false
  }

  /** Merged table schema after accepting a batch, or an error for
    * narrowing/incompatible changes.
    */
  private def evolve(table: StructType, batch: StructType): StructType = {
    val evolvedExisting = table.fields.map { tf =>
      batch.fields.find(_.name == tf.name) match {
        case Some(bf) if widens(bf.dataType, tf.dataType) => tf
        case Some(bf) if widens(tf.dataType, bf.dataType) =>
          tf.copy(dataType = bf.dataType) // widen the table column
        case Some(bf) =>
          throw new IllegalArgumentException(
            s"illegal type change for column ${tf.name}: ${tf.dataType.simpleString} -> ${bf.dataType.simpleString}")
        case None => tf
      }
    }
    val added = batch.fields.filter(bf => !table.fields.exists(_.name == bf.name))
      .map(_.copy(nullable = true)) // new columns arrive nullable, as in Iceberg ADD COLUMN
    StructType(evolvedExisting ++ added)
  }

  /** Align a batch to the merged schema: add missing columns as NULL,
    * cast widened columns, order columns canonically.
    */
  private def align(df: DataFrame, merged: StructType): DataFrame =
    df.select(merged.fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)

  // ---- write path -------------------------------------------------------

  /** True when the batchId was already committed (checkpoint replay). */
  def isCommitted(batchId: Long): Boolean =
    batchId >= 0 && readMeta().exists(batchId <= _.lastBatchId)

  /** Append one micro-batch. Returns false when the batchId was already
    * committed (checkpoint replay) and nothing was written.
    *
    * Idempotence: data lands under a per-batch partition directory
    * (`_batch_id=N`) which is wiped before writing, so a crash between
    * the data append and the sidecar commit leaves a partial dir that the
    * replay deletes and rewrites — no double-append (the sidecar marker
    * alone could not guarantee that; SURVEY.md §7.4's idempotent
    * per-batch overwrite). Backfills (no batchId) write under negative
    * ids from their own sequence, never touching the streaming marker.
    */
  def write(df: DataFrame, batchId: Long = -1L): Boolean = {
    val meta = readMeta()
    if (meta.exists(m => batchId >= 0 && batchId <= m.lastBatchId)) return false
    val merged = meta.map(m => evolve(m.schema, df.schema)).getOrElse(df.schema)
    val effectiveId =
      if (batchId >= 0) batchId else meta.map(_.nextBackfillId).getOrElse(-1L)
    graft.engine.util.Fs.deleteRecursively(Paths.get(path, s"$BatchCol=$effectiveId"))
    align(df, merged)
      .withColumn(PartitionCol, to_date(col(timestampCol)))
      .withColumn(BatchCol, lit(effectiveId))
      .write.mode("append").partitionBy(BatchCol, PartitionCol).parquet(path)
    // File-stats ledger per committed batch (r12, the data-skipping
    // follow-through): Iceberg's commit records per-file column bounds
    // in its manifests; this sink records the same for every INTEGRAL
    // top-level column of the evolved schema, long-format so the ledger
    // survives schema evolution, keyed by batch dir so a crash-replay's
    // rewrite atomically replaces its own stats. Runs over the
    // just-written (hot) batch only — never a table rescan.
    val integralCols = merged.fields.collect {
      case f if graft.engine.ops.StatsManifest.IntegralTypes(f.dataType) =>
        f.name
    }.toSeq
    graft.engine.ops.StatsManifest.appendBatchStats(df.sparkSession,
      Paths.get(path, s"$BatchCol=$effectiveId").toString, path,
      s"$BatchCol=$effectiveId", integralCols)
    // Snapshot commit log (r12): one `<seq> <effectiveId>` line per
    // COMMITTED write, the Iceberg-snapshot stand-in that makes as-of
    // reads real (backfills interleave with streaming ids in COMMIT
    // order, which batch ids alone cannot express). ORDER MATTERS (r12
    // self-review): the line lands BEFORE the sidecar commit — replay
    // detection keys off the sidecar, so a crash between the two
    // replays the batch and appends a fresh line for the same id
    // (the [[snapshots]] reader is last-line-wins per id, keeping this
    // append O(1) instead of rewriting the whole log per commit); the
    // reverse order would permanently drop a committed batch from
    // every snapshot. An uncommitted log line is harmless: [[readAsOf]]
    // intersects with committed visibility.
    val seq = rawLogLines.lastOption.map(_._1 + 1).getOrElse(1L)
    Files.write(commitLogPath,
      s"$seq $effectiveId\n".getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    writeMeta(Meta(merged,
      lastBatchId = if (batchId >= 0) batchId else meta.map(_.lastBatchId).getOrElse(-1L),
      nextBackfillId = if (batchId >= 0) meta.map(_.nextBackfillId).getOrElse(-1L)
        else effectiveId - 1))
    true
  }

  private def rawLogLines: Seq[(Long, Long)] =
    if (!Files.exists(commitLogPath)) Nil
    else new String(Files.readAllBytes(commitLogPath), StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty).map { line =>
        val Array(s, id) = line.split(" ", 2)
        (s.toLong, id.toLong)
      }

  /** Committed snapshots in commit order: (snapshot seq, batch dir id).
    * Last line WINS per batch id: a crash-replayed batch appends a
    * fresh line, superseding the failed attempt's — the same id never
    * legitimately commits twice (the sidecar guard), so earlier lines
    * for it are by construction failed attempts.
    */
  def snapshots: Seq[(Long, Long)] =
    rawLogLines.groupBy(_._2).values.map(_.last).toSeq.sortBy(_._1)

  /** Snapshot (as-of) read: the table as it stood after commit `seq` —
    * exactly the batch dirs committed by then, in COMMIT order (a
    * backfill committed after a streaming batch is excluded from
    * earlier snapshots even though its id is lower). One honest delta
    * from real Iceberg: rows come back under the CURRENT evolved
    * schema (old files up-cast/null-fill), not the snapshot's
    * historical schema — the sidecar stores only the latest schema.
    */
  def readAsOf(spark: SparkSession, seq: Long): DataFrame = {
    val meta = readMeta()
      .getOrElse(throw new IllegalStateException(s"no table at $path"))
    val visible = snapshots.filter(_._1 <= seq).map(_._2)
    // intersect with COMMITTED visibility: the log line lands before
    // the sidecar commit, so a crash window can leave a logged-but-
    // uncommitted id — its rows must stay invisible until the replay
    // commits (the same guarantee read() gives partial batch dirs)
    spark.read.schema(fullSchema(meta)).parquet(path)
      .where(col(BatchCol).isin(visible: _*) &&
        col(BatchCol).between(meta.nextBackfillId + 1, meta.lastBatchId))
  }

  /** The read schema: the evolved data schema plus the two hidden
    * partition columns (single source of truth for read/readAsOf/
    * prunedRead).
    */
  private def fullSchema(meta: Meta): StructType = meta.schema
    .add(BatchCol, LongType, nullable = true)
    .add(PartitionCol, DateType, nullable = true)

  /** Read the table back under the evolved schema (old narrow/absent
    * columns up-cast/null-filled by the parquet reader). Only COMMITTED
    * batches are visible: an uncommitted partial dir left by a crash
    * (data appended, sidecar not yet updated) is filtered out until its
    * replay rewrites it.
    */
  def read(spark: SparkSession): DataFrame = {
    val meta = readMeta()
      .getOrElse(throw new IllegalStateException(s"no table at $path"))
    spark.read.schema(fullSchema(meta)).parquet(path)
      .where(col(BatchCol).between(meta.nextBackfillId + 1, meta.lastBatchId))
  }

  /** Manifest-planned read for the box predicate
    * `AND_i (lo_i <= col_i <= hi_i)` over integral columns: plans the
    * file list from the per-batch stats ledger (files whose recorded
    * bounds cannot overlap are never opened; files predating a column
    * are conservatively read — the Iceberg missing-stats rule), applies
    * the predicate as the residual filter, and keeps [[read]]'s
    * committed-only visibility. Returns the frame plus (filesTotal,
    * filesRead) accounting. Value-identical to
    * `read(spark).where(predicate)` for any data.
    */
  def prunedRead(spark: SparkSession,
      ranges: Seq[(String, Long, Long)]): (DataFrame, Long, Long) = {
    val meta = readMeta()
      .getOrElse(throw new IllegalStateException(s"no table at $path"))
    // ledger coverage is per BATCH DIR: any committed batch dir WITHOUT
    // a ledger entry (pre-ledger table, empty-batch skip, or a missing
    // _manifest dir entirely) is conservatively read WHOLE — the same
    // missing-stats rule applied at dir granularity; without this, an
    // unledgered batch's rows would silently vanish from pruned results
    def subDirs(p: Path, prefix: String): Seq[String] =
      if (!Files.isDirectory(p)) Nil
      else {
        val s = Files.list(p)
        try {
          val it = s.iterator()
          val b = Seq.newBuilder[String]
          while (it.hasNext) {
            val f = it.next()
            if (Files.isDirectory(f) && f.getFileName.toString.startsWith(prefix))
              b += f.getFileName.toString
          }
          b.result()
        } finally s.close()
      }
    val batchDirs = subDirs(Paths.get(path), s"$BatchCol=")
    val ledgered = subDirs(Paths.get(path, "_manifest"), "").toSet
    val (total, keep0) =
      if (ledgered.isEmpty) (0L, Seq.empty[String])
      else graft.engine.ops.StatsManifest.prunedFilesLong(spark, path, ranges)
    // a crash between a replay's data rewrite and its ledger overwrite
    // can leave rows naming deleted files. Only an UNCOMMITTED batch
    // can be in that state (the ledger overwrite happens before the
    // sidecar commit), so the existence check is restricted to files
    // of uncommitted batch dirs — zero driver syscalls on the steady
    // path, never one per planned file (r12 self-review: planning must
    // stay one-object, the reason the ledger exists)
    val batchIdRe = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(BatchCol) + "=(-?\\d+)/")
    def committed(f: String): Boolean = {
      val m = batchIdRe.matcher(f)
      m.find() && {
        val id = m.group(1).toLong
        id >= meta.nextBackfillId + 1 && id <= meta.lastBatchId
      }
    }
    val keep = keep0.filter { f =>
      committed(f) || Files.exists(Paths.get(f.stripPrefix("file:")))
    }
    val unledgeredDirs = batchDirs.filterNot(ledgered.contains)
      .map(d => s"$path/$d")
    // accounting stays in FILE units on both sides (r12 self-review):
    // unledgered dirs contribute their actual parquet file counts, so
    // the (filesTotal, filesRead) ratio never overstates skipping on a
    // mixed table. The walk touches only the rare unledgered dirs.
    val unledgeredFiles = unledgeredDirs.map { dir =>
      val p = Paths.get(dir)
      if (!Files.isDirectory(p)) 0L
      else {
        val w = Files.walk(p)
        try w.filter(f => f.getFileName.toString.endsWith(".parquet")).count()
        finally w.close()
      }
    }.sum
    val residual = ranges.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi }.reduce(_ && _) &&
      col(BatchCol).between(meta.nextBackfillId + 1, meta.lastBatchId)
    val paths = keep ++ unledgeredDirs
    val df =
      if (paths.isEmpty)
        spark.read.schema(fullSchema(meta)).parquet(path).where(residual).limit(0)
      else
        // basePath recovers the _batch_id/_event_date partition columns
        // from the selected files' directory segments
        spark.read.option("basePath", path).schema(fullSchema(meta))
          .parquet(paths: _*).where(residual)
    (df, total + unledgeredFiles, keep.size + unledgeredFiles)
  }

  def tableSchema: Option[StructType] = readMeta().map(_.schema)

  /** Inclusive `_batch_id` range of COMMITTED data (backfills use the
    * negative id sequence below the low bound, streaming batches the
    * non-negative ids up to the high bound). Catalog registration uses
    * this to publish the same committed-only visibility `read` enforces.
    */
  def committedBatchRange: Option[(Long, Long)] =
    readMeta().map(m => (m.nextBackfillId + 1, m.lastBatchId))
}
