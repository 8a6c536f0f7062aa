package graft.engine

import org.apache.spark.sql.SparkSession

import graft.engine.sinks.EvolvingTableSink

/** Catalog surface of the reference's Iceberg sink (reference:
  * src/consumer/data_sinks.py:86-101): namespace creation with
  * quoted identifiers (D1), table registration, and the
  * existence probe (D2). Here the catalog is Spark's built-in
  * session catalog over the sink's parquet layout.
  */
object Catalogs {

  /** D1: CREATE NAMESPACE IF NOT EXISTS (identifier quoted, as the
    * reference does).
    */
  def ensureNamespace(spark: SparkSession, namespace: String): Unit =
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS `$namespace`")

  /** D2: existence probe via the catalog (the reference probes with
    * session.table + catching AnalysisException; spark.catalog.tableExists
    * is the idiomatic Scala form).
    */
  def tableExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** Register (or re-register) a sink's table under a catalog name as an
    * external partitioned parquet table and sync its partitions, so
    * downstream SQL reads `ns.table` like the reference's DuckDB reads
    * bronze.default.events. Re-registering after the sink evolved
    * refreshes the catalog schema (a CREATE IF NOT EXISTS would pin the
    * stale one forever).
    */
  def registerTable(spark: SparkSession, name: String, sink: EvolvingTableSink): Unit = {
    val schema = sink.tableSchema.getOrElse(
      throw new IllegalStateException(s"no table at ${sink.path}"))
    val dataCols = schema.fields
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(
      s"""CREATE TABLE $name ($dataCols,
         |  `_batch_id` BIGINT, `_event_date` DATE)
         |USING parquet
         |PARTITIONED BY (`_batch_id`, `_event_date`)
         |LOCATION '${sink.path}'""".stripMargin)
    spark.sql(s"MSCK REPAIR TABLE $name")
  }
}
