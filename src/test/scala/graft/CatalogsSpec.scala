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
}
