package graft

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Catalogs
import graft.engine.sinks.EvolvingTableSink

/** D1/D2 catalog parity: namespace creation, external-table registration
  * over the sink layout, existence probe, SQL readback.
  */
class CatalogsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, "graft-test")

  test("namespace + table registration over a bronze sink") {
    val dir = Files.createTempDirectory("graft_cat").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    val schema = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("event_timestamp", TimestampType, nullable = false)))
    val rows = java.util.Arrays.asList(
      Row("a", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      Row("b", java.sql.Timestamp.valueOf("2024-01-02 11:00:00")))
    sink.write(spark.createDataFrame(rows, schema), batchId = 0)

    Catalogs.ensureNamespace(spark, "graft_bronze")
    assert(!Catalogs.tableExists(spark, "graft_bronze.events"))
    Catalogs.registerTable(spark, "graft_bronze.events", sink)
    assert(Catalogs.tableExists(spark, "graft_bronze.events"))

    val back = spark.sql(
      "SELECT id, _event_date FROM graft_bronze.events ORDER BY id").collect()
    assert(back.length == 2)
    assert(back.map(_.getString(0)).sameElements(Array("a", "b")))
    // partition pruning works through the registered table
    assert(spark.sql(
      "SELECT count(*) FROM graft_bronze.events WHERE _event_date = DATE'2024-01-01'")
      .collect().head.getLong(0) == 1)

    // an UNCOMMITTED partial batch dir (crash between data append and
    // sidecar commit) must be invisible through the registered name
    val orphanRows = java.util.Arrays.asList(
      Row("zz", java.sql.Timestamp.valueOf("2024-01-03 12:00:00")))
    spark.createDataFrame(orphanRows, schema)
      .write.parquet(s"$dir/_batch_id=7/_event_date=2024-01-03")
    Catalogs.registerTable(spark, "graft_bronze.events", sink)
    assert(spark.sql("SELECT count(*) FROM graft_bronze.events")
      .collect().head.getLong(0) == 2,
      "uncommitted batch dir leaked through the catalog view")

    spark.sql("DROP VIEW graft_bronze.events")
    spark.sql("DROP TABLE graft_bronze.events_files")
  }

  test("SQL time travel: per-snapshot views carry historical rows AND schema") {
    val dir = Files.createTempDirectory("graft_cat_tt").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    val v1 = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("qty", IntegerType, nullable = true),
      StructField("event_timestamp", TimestampType, nullable = false)))
    sink.write(spark.createDataFrame(java.util.Arrays.asList(
      Row("a", Integer.valueOf(1),
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))), v1), batchId = 0)
    // snapshot 2 widens qty and adds a column
    val v2 = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("qty", LongType, nullable = true),
      StructField("source", StringType, nullable = true),
      StructField("event_timestamp", TimestampType, nullable = false)))
    sink.write(spark.createDataFrame(java.util.Arrays.asList(
      Row("b", java.lang.Long.valueOf(2L), "web",
        java.sql.Timestamp.valueOf("2024-01-02 10:00:00"))), v2), batchId = 1)

    Catalogs.ensureNamespace(spark, "graft_tt")
    Catalogs.registerTable(spark, "graft_tt.events", sink)
    val views = Catalogs.registerSnapshots(spark, "graft_tt.events", sink)
    assert(views == Seq("graft_tt.events_at_1", "graft_tt.events_at_2"))

    // two different snapshots read back through plain spark.sql
    val at1 = spark.table("graft_tt.events_at_1")
    assert(!at1.columns.contains("source"),
      "snapshot-1 view must carry the historical schema")
    assert(at1.schema("qty").dataType == IntegerType)
    assert(spark.sql("SELECT id FROM graft_tt.events_at_1 ORDER BY id")
      .collect().map(_.getString(0)).toSeq == Seq("a"))
    assert(spark.sql(
      "SELECT id, source FROM graft_tt.events_at_2 ORDER BY id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", null), ("b", "web")))
    assert(spark.table("graft_tt.events_at_2").schema("qty").dataType == LongType)

    // after a compaction, re-registration keeps both current and as-of
    // SQL surfaces consistent with the sink's own readers
    assert(sink.compactBatches(spark).isDefined)
    Catalogs.registerTable(spark, "graft_tt.events", sink)
    Catalogs.registerSnapshots(spark, "graft_tt.events", sink)
    assert(spark.sql("SELECT count(*) FROM graft_tt.events")
      .collect().head.getLong(0) == 2,
      "replaced dirs leaked through the current view after compaction")
    assert(spark.sql("SELECT id FROM graft_tt.events_at_1")
      .collect().map(_.getString(0)).toSeq == Seq("a"))
    assert(spark.sql("SELECT count(*) FROM graft_tt.events_at_3")
      .collect().head.getLong(0) == 2)

    // after EXPIRY, registerSnapshots enumerates only the retained
    // snapshots — no view is (re)published for an expired seq, the
    // retained one still answers through SQL after dirs were deleted,
    // and the STALE views from the pre-expiry registration are DROPPED
    // (r14): a pinned view over deleted batch dirs would silently
    // return zero/partial rows after MSCK, the exact failure readAsOf
    // throws for. Querying an expired snapshot must fail loudly.
    assert(sink.expireSnapshots(keepLast = 1).nonEmpty)
    Catalogs.registerTable(spark, "graft_tt.events", sink)
    val retained = Catalogs.registerSnapshots(spark, "graft_tt.events", sink)
    assert(retained == Seq("graft_tt.events_at_3"))
    assert(spark.sql("SELECT count(*) FROM graft_tt.events_at_3")
      .collect().head.getLong(0) == 2)
    assert(spark.sql("SELECT count(*) FROM graft_tt.events")
      .collect().head.getLong(0) == 2)
    assert(!Catalogs.tableExists(spark, "graft_tt.events_at_1"),
      "expired snapshot view must be dropped by re-registration")
    assert(!Catalogs.tableExists(spark, "graft_tt.events_at_2"),
      "expired snapshot view must be dropped by re-registration")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT count(*) FROM graft_tt.events_at_1").collect()
    }

    retained.foreach(v => spark.sql(s"DROP VIEW IF EXISTS $v"))
    spark.sql("DROP VIEW IF EXISTS graft_tt.events_at_3")
    spark.sql("DROP VIEW graft_tt.events")
    spark.sql("DROP TABLE graft_tt.events_files")
  }
}
