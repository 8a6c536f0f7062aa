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
    spark.sql("DROP TABLE graft_bronze.events")
  }
}
