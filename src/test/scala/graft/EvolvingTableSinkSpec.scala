package graft

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.sinks.EvolvingTableSink

/** Iceberg-semantics substitute on parquet (SURVEY.md §7.4): create on
  * first write, hidden day partitioning, additive schema evolution, type
  * widening, narrowing rejection, batch-replay idempotence.
  */
class EvolvingTableSinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, "graft-test")

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  private val v1 = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("qty", IntegerType, nullable = true),
    StructField("event_timestamp", TimestampType, nullable = false)))

  test("create on first write, hidden day partitioning, additive evolution, widening") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)

    assert(sink.write(df(v1,
      Row("a", Integer.valueOf(1), ts("2024-01-01 10:00:00")),
      Row("b", Integer.valueOf(2), ts("2024-01-02 11:00:00"))), batchId = 0))

    // hidden partitioning: per-batch dir on top (idempotent replay unit),
    // day directories nested inside — writers supplied neither
    val batchDirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("_batch_id="))
    assert(batchDirs.toSet == Set("_batch_id=0"))
    val days = new java.io.File(s"$dir/_batch_id=0").listFiles().map(_.getName)
      .filter(_.startsWith("_event_date="))
    assert(days.toSet == Set("_event_date=2024-01-01", "_event_date=2024-01-02"))

    // evolution: new nullable column + int->long widening in one batch
    val v2 = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("qty", LongType, nullable = true),
      StructField("product_id", StringType, nullable = true),
      StructField("event_timestamp", TimestampType, nullable = false)))
    assert(sink.write(df(v2,
      Row("c", java.lang.Long.valueOf(3L), "p1", ts("2024-01-03 09:00:00"))), batchId = 1))

    val back = sink.read(spark)
    assert(back.schema("qty").dataType == LongType)
    assert(back.count() == 3)
    // old rows read back with NULL product_id, new row carries it
    val byId = back.collect().map(r => r.getAs[String]("id") -> r.getAs[String]("product_id")).toMap
    assert(byId("a") == null && byId("c") == "p1")
    // old narrow int32 files up-cast to long on read
    assert(back.collect().map(_.getAs[Long]("qty")).sorted.sameElements(Array(1L, 2L, 3L)))
  }

  test("narrowing and incompatible type changes are rejected before writing") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    val long1 = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("qty", LongType, nullable = true),
      StructField("event_timestamp", TimestampType, nullable = false)))
    sink.write(df(long1, Row("a", java.lang.Long.valueOf(1L), ts("2024-01-01 00:00:00"))), 0)

    val stringQty = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("qty", StringType, nullable = true),
      StructField("event_timestamp", TimestampType, nullable = false)))
    val e = intercept[IllegalArgumentException] {
      sink.write(df(stringQty, Row("b", "oops", ts("2024-01-02 00:00:00"))), 1)
    }
    assert(e.getMessage.contains("illegal type change"))
    assert(sink.read(spark).count() == 1)

    // int batch into long table is fine (write-side up-cast, not narrowing)
    assert(sink.write(df(v1, Row("c", Integer.valueOf(7), ts("2024-01-03 00:00:00"))), 1))
    assert(sink.tableSchema.get("qty").dataType == LongType)
    assert(sink.read(spark).count() == 2)
  }

  test("a partial uncommitted batch dir is wiped and rewritten on replay") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    assert(sink.write(df(v1,
      Row("a", Integer.valueOf(1), ts("2024-01-01 00:00:00")),
      Row("b", Integer.valueOf(2), ts("2024-01-01 01:00:00"))), batchId = 0))

    // simulate a crash between data append and sidecar commit for batch 1:
    // data exists under _batch_id=1 but the marker still says 0
    val src = java.nio.file.Paths.get(s"$dir/_batch_id=0")
    val dst = java.nio.file.Paths.get(s"$dir/_batch_id=1")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(src).iterator().asScala.foreach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    }
    assert(!sink.isCommitted(1))
    // the uncommitted partial is invisible to readers until replayed
    assert(sink.read(spark).count() == 2)

    // the replayed write must wipe the partial dir, not double-append
    assert(sink.write(df(v1, Row("c", Integer.valueOf(3), ts("2024-01-02 00:00:00"))), batchId = 1))
    assert(sink.read(spark).count() == 3) // 2 from batch 0 + 1 from batch 1
    assert(sink.isCommitted(1))
  }

  test("backfill writes never collide with future streaming batch ids") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    // backfill first (no batchId): must not advance the streaming marker
    assert(sink.write(df(v1, Row("bf", Integer.valueOf(9), ts("2024-01-01 00:00:00")))))
    // a stream starting fresh at batchId=0 must be written, not skipped
    assert(!sink.isCommitted(0))
    assert(sink.write(df(v1, Row("s0", Integer.valueOf(1), ts("2024-01-02 00:00:00"))), batchId = 0))
    // second backfill gets its own id too
    assert(sink.write(df(v1, Row("bf2", Integer.valueOf(8), ts("2024-01-03 00:00:00")))))
    assert(sink.read(spark).count() == 3)
    assert(sink.isCommitted(0))
  }

  test("replayed batch ids are skipped (batch-level exactly-once)") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    val row = Row("a", Integer.valueOf(1), ts("2024-01-01 00:00:00"))
    assert(sink.write(df(v1, row), batchId = 5))
    assert(!sink.write(df(v1, row), batchId = 5)) // replay: skipped
    assert(!sink.write(df(v1, row), batchId = 4)) // older id: skipped
    assert(sink.write(df(v1, row), batchId = 6))
    assert(sink.read(spark).count() == 2)
  }

  test("per-batch stats ledger prunes files and survives schema evolution") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    // batch 0: qty 1..2; batch 1: qty 100..200 — disjoint ranges so a
    // selective predicate can prove file skipping
    assert(sink.write(df(v1,
      Row("a", Integer.valueOf(1), ts("2024-01-01 10:00:00")),
      Row("b", Integer.valueOf(2), ts("2024-01-01 11:00:00"))), batchId = 0))
    assert(sink.write(df(v1,
      Row("c", Integer.valueOf(100), ts("2024-01-02 10:00:00")),
      Row("d", Integer.valueOf(200), ts("2024-01-02 11:00:00"))), batchId = 1))
    // batch 2 EVOLVES the schema with a new integral column
    val v2 = v1.add(StructField("score", LongType, nullable = true))
    assert(sink.write(df(v2,
      Row("e", Integer.valueOf(300), ts("2024-01-03 10:00:00"),
        java.lang.Long.valueOf(7L))), batchId = 2))

    // selective qty box: only batch 1's file overlaps [100, 250]
    val (pruned, total, kept) = sink.prunedRead(spark, Seq(("qty", 100L, 250L)))
    assert(total >= 3, s"expected >=3 ledgered files, got $total")
    assert(kept < total, s"selective qty box must skip files ($kept of $total)")
    val got = pruned.select("id", "qty").collect().map(r =>
      (r.getString(0), r.getInt(1))).sorted.toSeq
    assert(got == Seq(("c", 100), ("d", 200)))
    // value identity vs the full committed read + filter
    val want = sink.read(spark).where("qty BETWEEN 100 AND 250")
      .select("id", "qty").collect().map(r =>
        (r.getString(0), r.getInt(1))).sorted.toSeq
    assert(got == want)

    // evolution conservatism: predicate on the NEW column must still
    // READ the pre-evolution files (their bounds are unknown — the
    // Iceberg missing-stats rule) and return the value-correct result
    val (byScore, total2, kept2) = sink.prunedRead(spark, Seq(("score", 7L, 7L)))
    assert(kept2 == total2,
      s"files predating 'score' must be conservatively read ($kept2 of $total2)")
    assert(byScore.select("id").collect().map(_.getString(0)).toSeq == Seq("e"))

    // replay rewrite replaces the batch's ledger rows, not duplicates
    assert(!sink.write(df(v2,
      Row("e2", Integer.valueOf(999), ts("2024-01-03 10:00:00"),
        java.lang.Long.valueOf(8L))), batchId = 2)) // committed: skipped
    val (_, total3, _) = sink.prunedRead(spark, Seq(("qty", 100L, 250L)))
    assert(total3 == total, "ledger must not grow on a skipped replay")
  }

  test("snapshot as-of reads follow COMMIT order, backfills included") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    def row(id: String, h: Int) =
      Row(id, Integer.valueOf(h), ts("2024-01-01 10:00:00"))
    assert(sink.write(df(v1, row("a", 1)), batchId = 0)) // snapshot 1
    assert(sink.write(df(v1, row("b", 2)), batchId = 1)) // snapshot 2
    assert(sink.write(df(v1, row("z", 9))))              // backfill: snapshot 3
    assert(sink.write(df(v1, row("c", 3)), batchId = 2)) // snapshot 4
    assert(sink.snapshots.map(_._1) == Seq(1L, 2L, 3L, 4L))
    def ids(seq: Long) = sink.readAsOf(spark, seq)
      .select("id").collect().map(_.getString(0)).sorted.toSeq
    assert(ids(1) == Seq("a"))
    assert(ids(2) == Seq("a", "b"))
    // the backfill has a NEGATIVE batch id but a LATER commit — batch-id
    // visibility alone could not express this snapshot boundary
    assert(ids(3) == Seq("a", "b", "z"))
    assert(ids(4) == Seq("a", "b", "c", "z"))
    // as-of the latest snapshot equals the committed read
    assert(ids(4) == sink.read(spark)
      .select("id").collect().map(_.getString(0)).sorted.toSeq)
    // a replayed (skipped) batch adds no snapshot
    assert(!sink.write(df(v1, row("c", 3)), batchId = 2))
    assert(sink.snapshots.size == 4)
  }

  test("a logged-but-uncommitted batch stays invisible until its replay commits") {
    // simulate the crash window the commit-log ordering creates: data +
    // ledger + log line written, sidecar commit NOT yet — by rewinding
    // the sidecar to its pre-batch state after a successful write
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    def row(id: String, h: Int) =
      Row(id, Integer.valueOf(h), ts("2024-01-01 10:00:00"))
    assert(sink.write(df(v1, row("a", 1)), batchId = 0))
    val sidecar = java.nio.file.Paths.get(dir, "_graft_meta.json")
    val preCrash = Files.readAllBytes(sidecar)
    assert(sink.write(df(v1, row("b", 2)), batchId = 1))
    Files.write(sidecar, preCrash) // "crash" before the sidecar commit
    // batch 1's dir, ledger and log line all exist, but it is NOT
    // committed: every read path must exclude it
    assert(sink.read(spark).count() == 1)
    assert(sink.readAsOf(spark, Long.MaxValue)
      .select("id").collect().map(_.getString(0)).toSeq == Seq("a"))
    val (pruned, _, _) = sink.prunedRead(spark, Seq(("qty", 0L, 10L)))
    assert(pruned.select("id").collect().map(_.getString(0)).toSeq == Seq("a"))
    // the replay rewrites and commits batch 1; consistency restored
    assert(sink.write(df(v1, row("b", 2)), batchId = 1))
    assert(sink.read(spark).count() == 2)
    assert(sink.readAsOf(spark, Long.MaxValue).count() ==
      sink.read(spark).count())
    // the replay REPLACED batch 1's log line (no duplicate id entries)
    assert(sink.snapshots.map(_._2).count(_ == 1L) == 1)
  }

  private def row3(id: String, h: Int) =
    Row(id, Integer.valueOf(h), java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))

  test("a torn trailing commit-log line is tolerated, not a brick (r12 ADVICE)") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    assert(sink.write(df(v1, row3("a", 1)), batchId = 0))
    assert(sink.write(df(v1, row3("b", 2)), batchId = 1))
    // crash mid-append: half a line at the end of the commit log
    val log = java.nio.file.Paths.get(dir, "_graft_commits.log")
    Files.write(log, "3 ".getBytes, java.nio.file.StandardOpenOption.APPEND)
    // every path must still work: read, snapshots, as-of, AND write
    assert(sink.read(spark).count() == 2)
    assert(sink.snapshots.map(_._1) == Seq(1L, 2L))
    assert(sink.readAsOf(spark, 1).count() == 1)
    assert(sink.write(df(v1, row3("c", 3)), batchId = 2))
    // the new commit supersedes the torn line's seq slot cleanly
    assert(sink.snapshots.map(_._1) == Seq(1L, 2L, 3L))
    assert(sink.read(spark).count() == 3)
  }

  test("pre-log tables: readAsOf falls back for latest, throws for history (r12 ADVICE)") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    assert(sink.write(df(v1, row3("a", 1)), batchId = 0))
    // simulate a table created before the commit log existed
    Files.delete(java.nio.file.Paths.get(dir, "_graft_commits.log"))
    assert(sink.readAsOf(spark, Long.MaxValue).count() == 1) // = committed read
    val e = intercept[IllegalStateException] { sink.readAsOf(spark, 1) }
    assert(e.getMessage.contains("no snapshot history"))
  }

  test("as-of reads return the HISTORICAL schema (r12 verdict #3)") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    assert(sink.write(df(v1, row3("a", 1)), batchId = 0)) // snapshot 1: int qty, no product_id
    val v2 = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("qty", LongType, nullable = true),
      StructField("product_id", StringType, nullable = true),
      StructField("event_timestamp", TimestampType, nullable = false)))
    assert(sink.write(df(v2, Row("b", java.lang.Long.valueOf(2L), "p1",
      ts("2024-01-02 09:00:00"))), batchId = 1))       // snapshot 2: widened + added
    val asOf1 = sink.readAsOf(spark, 1)
    assert(!asOf1.columns.contains("product_id"),
      "column added after snapshot 1 must be absent from its as-of read")
    assert(asOf1.schema("qty").dataType == IntegerType,
      "as-of read must carry the pre-widening type")
    assert(asOf1.select("id").collect().map(_.getString(0)).toSeq == Seq("a"))
    val asOf2 = sink.readAsOf(spark, 2)
    assert(asOf2.columns.contains("product_id"))
    assert(asOf2.schema("qty").dataType == LongType)
    assert(asOf2.count() == 2)
    assert(sink.schemaAt(1).fieldNames.toSeq == v1.fieldNames.toSeq)
  }

  test("compaction rewrites visible dirs, preserves values and old snapshots") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    assert(sink.write(df(v1, row3("a", 1)), batchId = 0))
    assert(sink.write(df(v1, row3("b", 2)), batchId = 1))
    assert(sink.write(df(v1, row3("c", 3))))             // backfill interleaved
    val before = sink.read(spark).select("id", "qty").collect()
      .map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
    val seq = sink.compactBatches(spark)
    assert(seq.contains(4L), s"expected snapshot seq 4, got $seq")
    // value identity on the data columns
    val after = sink.read(spark).select("id", "qty").collect()
      .map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
    assert(after == before)
    // the current table reads ONLY the compacted dir
    assert(sink.read(spark).select("_batch_id").distinct().count() == 1)
    assert(sink.replacedBatchIds.toSet == Set(0L, 1L, -1L))
    // pre-compaction snapshots still as-of readable (dirs retained)
    assert(sink.readAsOf(spark, 2).select("id").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
    // as-of the compaction snapshot equals the current read
    assert(sink.readAsOf(spark, 4).select("id").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("a", "b", "c"))
    // the pruned read stays value-identical (no double rows from the
    // replaced dirs' still-present ledger entries)
    val (pruned, _, _) = sink.prunedRead(spark, Seq(("qty", 0L, 10L)))
    assert(pruned.select("id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a", "b", "c"))
    // a second compaction right away is a no-op (only one visible dir)
    assert(sink.compactBatches(spark).isEmpty)
    // streaming replay detection is untouched: batch 2 commits normally
    assert(sink.write(df(v1, row3("d", 4)), batchId = 2))
    assert(sink.read(spark).count() == 4)
  }

  test("a torn PARSEABLE commit-line prefix can never re-date a committed batch (r13 ADVICE)") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    assert(sink.write(df(v1, row3("a", 1)), batchId = 0))  // seq 1
    assert(sink.write(df(v1, row3("b", 2)), batchId = 1))  // seq 2
    // crash mid-append tears a line at a point where the PREFIX itself
    // matches the entry grammar: "3 0" (a re-commit of batch 0 at seq
    // 3). Pre-r14 the tolerant reader accepted it and last-line-wins
    // re-dated batch 0 to seq 3 — readAsOf(1..2) silently lost its rows.
    val log = java.nio.file.Paths.get(dir, "_graft_commits.log")
    Files.write(log, "3 0".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    // the CRC-validating reader rejects the torn prefix: batch 0 stays
    // at seq 1 and historical reads keep its rows
    assert(sink.snapshots == Seq((1L, 0L), (2L, 1L)))
    assert(sink.readAsOf(spark, 1).select("id").collect()
      .map(_.getString(0)).toSeq == Seq("a"))
    // the next append heals the torn tail and commits normally (the
    // rejected torn line never consumed a snapshot seq)
    assert(sink.write(df(v1, row3("c", 3)), batchId = 2))
    assert(sink.snapshots == Seq((1L, 0L), (2L, 1L), (3L, 2L)))
    assert(sink.read(spark).count() == 3)
  }

  test("pre-r14 legacy logs read correctly and migrate on first append") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    assert(sink.write(df(v1, row3("a", 1)), batchId = 0))
    assert(sink.write(df(v1, row3("b", 2)), batchId = 1))
    val snapsBefore = sink.snapshots
    // strip the CRC suffixes, simulating a table written before r14
    val log = java.nio.file.Paths.get(dir, "_graft_commits.log")
    val legacy = new String(Files.readAllBytes(log), "UTF-8")
      .split("\n").map(_.replaceAll(" #[0-9a-f]+$", "")).mkString("", "\n", "\n")
    Files.write(log, legacy.getBytes("UTF-8"))
    assert(!legacy.contains("#"))
    // legacy mode: reads are unchanged
    assert(sink.snapshots == snapsBefore)
    assert(sink.readAsOf(spark, 1).count() == 1)
    // first append migrates the whole file to CRC'd lines atomically
    assert(sink.write(df(v1, row3("c", 3)), batchId = 2))
    val migrated = new String(Files.readAllBytes(log), "UTF-8")
      .split("\n").filter(_.nonEmpty)
    assert(migrated.forall(_.matches(".* #[0-9a-f]+$")),
      s"every line must carry a CRC after migration:\n${migrated.mkString("\n")}")
    assert(sink.snapshots == snapsBefore :+ (3L, 2L))
    assert(sink.read(spark).count() == 3)
  }

  test("a missing dir for a never-replaced id is an empty pre-upgrade batch, not expiry (r13 ADVICE)") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    assert(sink.write(df(v1, row3("a", 1)), batchId = 0))
    assert(sink.write(df(v1), batchId = 1)) // empty committed batch
    assert(sink.write(df(v1, row3("b", 2)), batchId = 2))
    // simulate a pre-r13 table: the explicit empty-dir creation did not
    // exist, so the committed empty batch has NO dir
    graft.engine.util.Fs.deleteRecursively(
      java.nio.file.Paths.get(dir, "_batch_id=1"))
    // as-of reads covering the empty batch answer exactly (zero rows
    // from it) instead of throwing "partially expired"
    assert(sink.readAsOf(spark, 2).select("id").collect()
      .map(_.getString(0)).toSeq == Seq("a"))
    assert(sink.readAsOf(spark, 3).count() == 2)
    assert(sink.snapshotIntact(2) && sink.snapshotIntact(3))
    // a REPLACED id's missing dir still throws — that IS partial expiry
    assert(sink.compactBatches(spark).isDefined)
    graft.engine.util.Fs.deleteRecursively(
      java.nio.file.Paths.get(dir, "_batch_id=0"))
    val e = intercept[IllegalStateException] { sink.readAsOf(spark, 2) }
    assert(e.getMessage.contains("partially expired"))
    assert(!sink.snapshotIntact(2))
  }

  test("size-thresholded compaction never rewrites its own output (r13 verdict #1)") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    // incompressible payload so parquet size tracks data size
    val rnd = new scala.util.Random(41)
    def batch(n: Int) = df(v1, (0 until 400).map(i =>
      Row(s"b$n-$i-${rnd.alphanumeric.take(64).mkString}", Integer.valueOf(i),
        ts("2024-01-01 10:00:00"))): _*)
    for (i <- 0 until 4) assert(sink.write(batch(i), batchId = i))
    def bytesOf(id: Long): Long = {
      val p = java.nio.file.Paths.get(dir, s"_batch_id=$id")
      val w = Files.walk(p)
      try w.filter(f => Files.isRegularFile(f)).mapToLong(f => Files.size(f)).sum()
      finally w.close()
    }
    // threshold just above the largest input dir: every input is small,
    // the merged output (~4x the data) lands ABOVE it
    val threshold = (0L to 3L).map(bytesOf).max + 1
    val before = sink.read(spark).count()
    assert(sink.compactBatches(spark, targetBytes = threshold).isDefined)
    assert(sink.read(spark).count() == before)
    assert(bytesOf(-1L) >= threshold,
      "test premise: the compacted output must exceed the threshold")
    // a second tick with NO new small dirs is a NO-OP — the previous
    // output is at/above target size and is skipped, so steady-state
    // maintenance cost is proportional to new data, not table size
    assert(sink.compactBatches(spark, targetBytes = threshold).isEmpty,
      "maintenance tick with no new small dirs must be a no-op")
    // two new small batches arrive: only THEY are rewritten
    assert(sink.write(batch(4), batchId = 4))
    assert(sink.write(batch(5), batchId = 5))
    assert(sink.compactBatches(spark, targetBytes = threshold).isDefined)
    assert(!sink.replacedBatchIds.contains(-1L),
      "an already-compacted dir must never be re-compacted")
    assert(sink.replacedBatchIds.toSet == Set(0L, 1L, 2L, 3L, 4L, 5L))
    assert(sink.read(spark).count() == 6 * 400)
  }

  test("day-granular compaction settles each day once and never rewrites it (r13 verdict #4)") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    assert(sink.write(df(v1,
      Row("a", Integer.valueOf(1), ts("2024-01-01 10:00:00")),
      Row("b", Integer.valueOf(2), ts("2024-01-02 11:00:00"))), batchId = 0))
    assert(sink.write(df(v1,
      Row("c", Integer.valueOf(3), ts("2024-01-02 12:00:00"))), batchId = 1))
    // tick 1: two input dirs spanning two days -> ONE output dir PER DAY,
    // committed under a single snapshot
    assert(sink.compactBatches(spark, byDay = true).contains(3L))
    assert(sink.read(spark).select("id").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("a", "b", "c"))
    assert(sink.replacedBatchIds.toSet == Set(0L, 1L))
    val dayOut = sink.read(spark)
      .select("_batch_id", "_event_date").distinct().collect()
      .map(r => r.getLong(0) -> r.getDate(1).toString).toSeq.sorted
    assert(dayOut == Seq(-2L -> "2024-01-02", -1L -> "2024-01-01"),
      s"each day must settle into its own single-day dir, got $dayOut")
    // pre-compaction snapshots remain as-of readable
    assert(sink.readAsOf(spark, 1).count() == 2)
    // tick 2 with nothing new: every visible dir is single-day and alone
    // for its day — a pure no-op
    assert(sink.compactBatches(spark, byDay = true).isEmpty)
    // a new day arrives in two small dirs: ONLY that day compacts; the
    // settled day dirs are untouched (old days are never rewritten)
    assert(sink.write(df(v1, Row("d", Integer.valueOf(4),
      ts("2024-01-03 09:00:00"))), batchId = 2))
    assert(sink.write(df(v1, Row("e", Integer.valueOf(5),
      ts("2024-01-03 10:00:00"))), batchId = 3))
    assert(sink.compactBatches(spark, byDay = true).isDefined)
    assert(!sink.replacedBatchIds.contains(-1L) &&
      !sink.replacedBatchIds.contains(-2L),
      "a settled day outside the window must not be rewritten")
    assert(sink.replacedBatchIds.toSet == Set(0L, 1L, 2L, 3L))
    assert(sink.read(spark).select("id").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("a", "b", "c", "d", "e"))
    // a multi-day stray dir still gets split per day
    assert(sink.write(df(v1,
      Row("f", Integer.valueOf(6), ts("2024-01-03 23:00:00")),
      Row("g", Integer.valueOf(7), ts("2024-01-04 01:00:00"))), batchId = 4))
    assert(sink.compactBatches(spark, byDay = true).isDefined)
    assert(sink.read(spark).count() == 7)
    val day3Dirs = sink.read(spark)
      .where("_event_date = DATE'2024-01-03'")
      .select("_batch_id").distinct().count()
    assert(day3Dirs == 1, "a day's rows must re-settle into one dir")
    // expiry still composes: only the latest snapshot's dirs survive
    assert(sink.expireSnapshots(keepLast = 1).nonEmpty)
    assert(sink.read(spark).count() == 7)
  }

  test("an uncommitted compaction's replaces are ignored (crash window)") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    assert(sink.write(df(v1, row3("a", 1)), batchId = 0))
    assert(sink.write(df(v1, row3("b", 2)), batchId = 1))
    val sidecar = java.nio.file.Paths.get(dir, "_graft_meta.json")
    val preCrash = Files.readAllBytes(sidecar)
    assert(sink.compactBatches(spark).isDefined)
    Files.write(sidecar, preCrash) // "crash" before the sidecar commit
    // the compacted dir is uncommitted: its add AND its replaces must
    // both be ignored — the old dirs stay visible, no rows lost or doubled
    assert(sink.read(spark).select("id").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
    assert(sink.replacedBatchIds.isEmpty)
    // the retry commits under a fresh backfill id and heals
    assert(sink.compactBatches(spark).isDefined)
    assert(sink.read(spark).select("id").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
    assert(sink.read(spark).select("_batch_id").distinct().count() == 1)
  }

  test("snapshot expiry deletes orphaned dirs and truncates history") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    for (i <- 0 to 3)
      assert(sink.write(df(v1, row3(s"r$i", i)), batchId = i)) // snapshots 1..4
    assert(sink.compactBatches(spark, upToSeq = 3).contains(5L)) // replaces dirs 0..2
    // keep the last 2 snapshots: snapshot 4 still SEES dirs 0..2 (the
    // compaction landed after it), so nothing may be deleted yet
    assert(sink.expireSnapshots(keepLast = 2).isEmpty)
    assert(sink.readAsOf(spark, 4).select("id").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("r0", "r1", "r2", "r3"))
    val e2 = intercept[IllegalStateException] { sink.readAsOf(spark, 3) }
    assert(e2.getMessage.contains("expired"))
    // keep only the compaction snapshot: dirs 0..2 become unreachable
    val deleted = sink.expireSnapshots(keepLast = 1)
    assert(deleted.sorted == Seq(0L, 1L, 2L), s"deleted $deleted")
    // current read identical: batch 3 + the compacted dir
    assert(sink.read(spark).select("id").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("r0", "r1", "r2", "r3"))
    // the retained snapshot still answers; expired ones throw, not lie
    assert(sink.readAsOf(spark, 5).count() == 4)
    val e = intercept[IllegalStateException] { sink.readAsOf(spark, 4) }
    assert(e.getMessage.contains("expired"))
    // deleted dirs are gone from disk, ledger entries too
    val dirs = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("_batch_id=")).toSet
    assert(!dirs.contains("_batch_id=0") && dirs.contains("_batch_id=3"))
    assert(!new java.io.File(s"$dir/_manifest/_batch_id=0").exists())
    // pruned read over the survivors stays value-correct
    val (pruned, _, _) = sink.prunedRead(spark, Seq(("qty", 0L, 10L)))
    assert(pruned.count() == 4)
    // the stream continues committing after maintenance
    assert(sink.write(df(v1, row3("r4", 9)), batchId = 4))
    assert(sink.read(spark).count() == 5)
    assert(sink.readAsOf(spark, Long.MaxValue).count() == 5)
  }

  test("clustered compaction keeps per-file bounds selective") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    // four batches with interleaved qty ranges: a plain coalesce rewrite
    // mixes them into every output file (bounds widen to the full range)
    for (i <- 0 until 4)
      assert(sink.write(df(v1,
        Row(s"lo$i", Integer.valueOf(i), ts("2024-01-01 10:00:00")),
        Row(s"hi$i", Integer.valueOf(1000 + i), ts("2024-01-01 11:00:00"))),
        batchId = i))
    assert(sink.compactBatches(spark, files = 4, clusterBy = Seq("qty")).isDefined)
    assert(sink.expireSnapshots(keepLast = 1).nonEmpty)
    // value identity survives the clustered rewrite
    assert(sink.read(spark).count() == 8)
    // and a selective box still SKIPS files inside the compacted dir:
    // range partitioning on qty puts the lo and hi rows in different
    // files with narrow bounds
    val (pruned, total, kept) = sink.prunedRead(spark, Seq(("qty", 0L, 10L)))
    assert(pruned.select("id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("lo0", "lo1", "lo2", "lo3"))
    assert(kept < total,
      s"clustered compaction must keep pruning selective ($kept of $total)")
  }

  test("a crash between expiry's deletes and its log rewrite stays safe") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    assert(sink.write(df(v1, row3("a", 1)), batchId = 0)) // snapshot 1
    assert(sink.write(df(v1, row3("b", 2)), batchId = 1)) // snapshot 2
    assert(sink.compactBatches(spark).contains(3L))       // replaces 0, 1
    // simulate the crash window: expiry deleted the orphaned (replaced)
    // dirs but was killed before truncating the log
    for (id <- Seq(0L, 1L)) {
      graft.engine.util.Fs.deleteRecursively(
        java.nio.file.Paths.get(dir, s"_batch_id=$id"))
      graft.engine.util.Fs.deleteRecursively(
        java.nio.file.Paths.get(dir, "_manifest", s"_batch_id=$id"))
    }
    // the CURRENT table is untouched (orphans were replaced-excluded)
    assert(sink.read(spark).select("id").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
    assert(sink.readAsOf(spark, 3).count() == 2)
    // a DOOMED snapshot answers with a throw, never partial rows
    val e = intercept[IllegalStateException] { sink.readAsOf(spark, 1) }
    assert(e.getMessage.contains("partially expired"))
    // the expiry retry is idempotent and truncates the log
    sink.expireSnapshots(keepLast = 1)
    val e2 = intercept[IllegalStateException] { sink.readAsOf(spark, 1) }
    assert(e2.getMessage.contains("expired"))
    assert(sink.read(spark).count() == 2)
  }

  test("orphan cleanup deletes only stale UNCOMMITTED dirs past the grace window") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    assert(sink.write(df(v1, row3("a", 1)), batchId = 0))
    // a dead uncommitted attempt: data dir exists, never committed
    val orphan = java.nio.file.Paths.get(dir, "_batch_id=7")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("part-dead.parquet"), Array[Byte](1, 2, 3))
    // fresh orphan survives the grace window (could be in-flight)
    assert(sink.removeOrphanDirs(graceMs = 60000L).isEmpty)
    assert(Files.isDirectory(orphan))
    // aged past the grace: deleted; the committed dir is never touched
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 120000L))
    assert(sink.removeOrphanDirs(graceMs = 60000L) == Seq(7L))
    assert(!Files.exists(orphan))
    assert(sink.read(spark).count() == 1)
    assert(sink.readAsOf(spark, 1).count() == 1)
  }

  test("an empty committed batch keeps its dir (the as-of guard invariant)") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    assert(sink.write(df(v1, row3("a", 1)), batchId = 0))
    assert(sink.write(df(v1), batchId = 1)) // zero rows, still a commit
    assert(new java.io.File(s"$dir/_batch_id=1").isDirectory,
      "empty batch must leave its dir so missing-dir means expired")
    assert(sink.read(spark).count() == 1)
    assert(sink.readAsOf(spark, 2).count() == 1) // no partial-expiry throw
    assert(sink.snapshots.map(_._1) == Seq(1L, 2L))
  }
}
