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

  /** Register (or re-register) a sink's table under a catalog name, so
    * downstream SQL reads `ns.table` like the reference's DuckDB reads
    * bronze.default.events. Two catalog objects are created:
    *
    *   - `<name>_files`: the external partitioned parquet table over the
    *     sink layout (partitions synced via MSCK);
    *   - `<name>`: a view over it filtered to the sink's COMMITTED
    *     `_batch_id` range — the same visibility `EvolvingTableSink.read`
    *     enforces. Without the filter, an uncommitted partial batch dir
    *     left by a crash (data written, sidecar not yet updated) would be
    *     readable through the catalog as partial/duplicate rows.
    *
    * Re-registering after the sink evolved or committed more batches
    * refreshes both schema and visible range (a CREATE IF NOT EXISTS
    * would pin the stale ones forever); the view swap is CREATE OR
    * REPLACE, so readers of `<name>` never observe a dropped state.
    */
  def registerTable(spark: SparkSession, name: String, sink: EvolvingTableSink): Unit = {
    val schema = sink.tableSchema.getOrElse(
      throw new IllegalStateException(s"no table at ${sink.path}"))
    val (lo, hi) = sink.committedBatchRange.get
    val filesTable = s"${name}_files"
    val dataCols = schema.fields
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    spark.sql(s"DROP TABLE IF EXISTS $filesTable")
    spark.sql(
      s"""CREATE TABLE $filesTable ($dataCols,
         |  `_batch_id` BIGINT, `_event_date` DATE)
         |USING parquet
         |PARTITIONED BY (`_batch_id`, `_event_date`)
         |LOCATION '${sink.path}'""".stripMargin)
    spark.sql(s"MSCK REPAIR TABLE $filesTable")
    // dirs a committed compaction replaced stay on disk for as-of reads
    // until expiry — the current-table view must exclude them exactly
    // like EvolvingTableSink.read does (empty for never-compacted sinks,
    // so the steady-path view keeps the plain range predicate)
    val replaced = sink.replacedBatchIds
    val notReplaced =
      if (replaced.isEmpty) ""
      else replaced.mkString(" AND `_batch_id` NOT IN (", ", ", ")")
    spark.sql(
      s"""CREATE OR REPLACE VIEW $name AS
         |SELECT * FROM $filesTable
         |WHERE `_batch_id` BETWEEN $lo AND $hi$notReplaced""".stripMargin)
  }

  /** SQL time travel (r13, the r12 verdict's catalog gap): publish one
    * view per retained snapshot — `<name>_at_<seq>` — over the same
    * `<name>_files` external table [[registerTable]] maintains (call it
    * first; partitions must be synced). Each view pins the snapshot's
    * visible batch dirs AND its HISTORICAL schema: columns added after
    * the snapshot are absent, columns widened after it are cast back to
    * their historical type (value-exact — every visible row predates
    * the widening). The underscore naming (not Iceberg's `VERSION AS
    * OF`) is a session-catalog constraint: the in-memory catalog
    * rejects `$`-style identifiers and Spark's parser has no extension
    * hook for time-travel syntax over plain views.
    *
    * Expiry propagates to the SQL surface (r14): views published by an
    * earlier call whose seq is no longer publishable — expired, or
    * caught mid-expiry — are DROPPED, so a stale `_at_` view can never
    * answer with the silently-partial rows `readAsOf` throws to
    * prevent (after MSCK drops the deleted partitions, a pinned view
    * would return zero/partial rows without error).
    *
    * Returns the view names, oldest snapshot first.
    */
  def registerSnapshots(spark: SparkSession, name: String,
      sink: EvolvingTableSink): Seq[String] = {
    val filesTable = s"${name}_files"
    // skip partially-expired snapshots (a crash between expiry's dir
    // deletes and its log truncation): readAsOf THROWS for them, and
    // the SQL surface must not answer with silently-partial rows either
    val publishable = sink.snapshotSeqs.filter(sink.snapshotIntact)
    // drop views of UNpublishable seqs left by a previous registration
    val cut = name.lastIndexOf('.')
    val (nsPrefix, base) =
      if (cut < 0) ("", name) else (name.substring(0, cut), name.substring(cut + 1))
    val showViews =
      if (nsPrefix.isEmpty) s"SHOW VIEWS LIKE '${base}_at_*'"
      else s"SHOW VIEWS IN `$nsPrefix` LIKE '${base}_at_*'"
    val atSeqRe = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(base) + "_at_(\\d+)",
      java.util.regex.Pattern.CASE_INSENSITIVE)
    val publishableSet = publishable.toSet
    spark.sql(showViews).collect().foreach { row =>
      val v = row.getAs[String]("viewName")
      val m = atSeqRe.matcher(v)
      if (m.matches() && !publishableSet.contains(m.group(1).toLong)) {
        val qualified = if (nsPrefix.isEmpty) s"`$v`" else s"`$nsPrefix`.`$v`"
        spark.sql(s"DROP VIEW IF EXISTS $qualified")
      }
    }
    publishable.map { seq =>
      val viewName = s"${name}_at_$seq"
      val hist = sink.schemaAt(seq)
      val cols = hist.fields
        .map(f => s"CAST(`${f.name}` AS ${f.dataType.sql}) AS `${f.name}`")
        .mkString(", ")
      val visible = sink.visibleIdsAsOf(seq)
      val pred =
        if (visible.isEmpty) "FALSE"
        else visible.mkString("`_batch_id` IN (", ", ", ")")
      spark.sql(
        s"""CREATE OR REPLACE VIEW $viewName AS
           |SELECT $cols, `_batch_id`, `_event_date` FROM $filesTable
           |WHERE $pred""".stripMargin)
      viewName
    }
  }
}
