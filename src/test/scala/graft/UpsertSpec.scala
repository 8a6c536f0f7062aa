package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.stream.Upsert

/** Keyed upsert (CDC last-write-wins merge) semantics: batch merge
  * replacement/insert rules, checkpoint-replay no-op, version pruning,
  * and exactly-once across a stream restart on the same checkpoint.
  */
class UpsertSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, "graft-test")

  private def df(rows: (Long, String, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "status", "seq")
  }

  private def tmp(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft_upsert_spec_")
    graft.engine.util.Fs.deleteOnExit(p)
    p.toString
  }

  private def state(dir: String): Map[Long, (String, Long)] =
    Upsert.current(spark, dir).get.collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("status"), r.getAs[Long]("seq"))).toMap

  test("merge keeps the highest-ord row per key, inserts new keys") {
    val base = df((1L, "new", 1L), (2L, "new", 2L))
    val updates = df((1L, "active", 3L), (3L, "new", 4L), (1L, "churned", 5L))
    val out = Upsert.merge(base, updates, Seq("user_id"), "seq").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("status"), r.getAs[Long]("seq")))
      .toSet
    assert(out === Set((1L, "churned", 5L), (2L, "new", 2L), (3L, "new", 4L)))
  }

  test("stale updates (lower ord than the table row) lose") {
    val base = df((1L, "active", 10L))
    val updates = df((1L, "new", 1L))
    val out = Upsert.merge(base, updates, Seq("user_id"), "seq").collect()
    assert(out.length === 1 && out.head.getAs[String]("status") === "active")
  }

  test("applyBatch replay of a committed version is a no-op; old versions pruned") {
    val dir = tmp() + "/t"
    Upsert.applyBatch(df((1L, "new", 1L)), dir, Seq("user_id"), "seq", 0L)
    Upsert.applyBatch(df((1L, "active", 2L), (2L, "new", 3L)), dir, Seq("user_id"), "seq", 1L)
    assert(Upsert.currentVersion(dir) === Some(1L))
    assert(state(dir) === Map(1L -> ("active", 2L), 2L -> ("new", 3L)))
    // replay of version 1 (crash-after-commit, checkpoint re-delivers)
    Upsert.applyBatch(df((1L, "active", 2L), (2L, "new", 3L)), dir, Seq("user_id"), "seq", 1L)
    assert(Upsert.currentVersion(dir) === Some(1L))
    assert(state(dir) === Map(1L -> ("active", 2L), 2L -> ("new", 3L)))
    // a third batch prunes v0 (keeps v1, the superseded back-version)
    Upsert.applyBatch(df((3L, "new", 4L)), dir, Seq("user_id"), "seq", 2L)
    val versions = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.matches("v\\d+")).toSet
    assert(versions === Set("v1", "v2"))
    assert(state(dir).keySet === Set(1L, 2L, 3L))
  }

  test("stream restart on the same checkpoint does not re-apply committed batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp()
    val dir = s"$root/table"

    val in1 = MemoryStream[(Long, String, Long)]
    val q1 = Upsert.stream(in1.toDF().toDF("user_id", "status", "seq"),
      dir, Seq("user_id"), "seq", s"$root/chk")
    try {
      in1.addData((1L, "new", 1L), (2L, "new", 2L))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(state(dir) === Map(1L -> ("new", 1L), 2L -> ("new", 2L)))

    // restart: a fresh source on the SAME checkpoint; only the new batch
    // mutates the table (the committed batch replays as a no-op)
    val in2 = MemoryStream[(Long, String, Long)]
    in2.addData((1L, "new", 1L), (2L, "new", 2L)) // replayed input
    val q2 = Upsert.stream(in2.toDF().toDF("user_id", "status", "seq"),
      dir, Seq("user_id"), "seq", s"$root/chk")
    try {
      in2.addData((1L, "churned", 3L))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(state(dir) === Map(1L -> ("churned", 3L), 2L -> ("new", 2L)))
  }
}
