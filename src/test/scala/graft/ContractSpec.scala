package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: pack keys must not collide (the flattening
  * into one Map would silently drop a query), every oracle key must have a
  * query, and every query must at least pass analysis (resolve columns,
  * types) against the smallest testdata.
  */
class ContractSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, "graft-test")

  private val packs = Seq(
    "Relational" -> queries.Relational.defs,
    "TextOps" -> queries.TextOps.defs,
    "Dedup" -> queries.Dedup.defs,
    "Similarity" -> queries.Similarity.defs,
    "Curate" -> queries.Curate.defs,
    "SourceFormats" -> queries.SourceFormats.defs,
    "Ingest" -> queries.Ingest.defs)

  test("query names are globally unique across packs") {
    val all = packs.flatMap { case (_, defs) => defs.keys }
    val dups = all.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(all.size == SparkEntry.queries.size)
  }

  test("every oracle has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty)
  }

  test("every query resolves (analysis passes) on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").schema; None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
