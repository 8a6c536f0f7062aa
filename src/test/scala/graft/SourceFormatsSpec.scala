package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SourceFormatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, "graft-test")
  private val d = "/root/testdata/sf0.001"

  test("csv and jsonl round-trips reproduce the parquet-direct aggregate") {
    import org.apache.spark.sql.functions._
    val direct = graft.engine.Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(expr(queries.Q.scaledLong("l_quantity", 2))).as("qty_cents"))
      .orderBy(col("l_returnflag"))
      .collect().map(_.toSeq).toSeq
    for (q <- Seq("source_csv_roundtrip", "source_jsonl_roundtrip")) {
      val rt = SparkEntry.queries(q)(spark, d).collect().map(_.toSeq).toSeq
      assert(rt == direct, s"$q must preserve values through the format")
    }
  }

  test("sharded HLL union estimates within sketch error of the exact count") {
    // the query itself now emits the sketch-contract boolean (the r8
    // oracle gate); the spec checks it came out TRUE with a real exact
    // count behind it — lgK=12 HLL relative error ~1.6%, bound 5%, so a
    // broken merge (e.g. double counting across shards) flips it
    val row = SparkEntry.queries("agg_hll_shards")(spark, d).collect().head
    val exact = row.getLong(row.fieldIndex("exact_parts"))
    assert(exact > 0, "exact cardinality must be positive")
    assert(row.getBoolean(row.fieldIndex("within_bound")),
      s"HLL union estimate out of its published 5% bound (exact=$exact)")
  }

  test("binaryFile fixture collect is hard-capped independent of corpus size") {
    // the fixture-collect contract (r12): the driver-side file write is
    // bounded by BinFixtureCap rows no matter how large the documents
    // table grows — the roundtrip result itself can therefore never
    // exceed the cap, and at test SF it matches the full 1-in-50 subset
    // (cap not binding), proving the cap doesn't distort small-SF results
    val rows = SparkEntry.queries("source_binaryfile_roundtrip")(spark, d).collect()
    assert(rows.length <= queries.SourceFormats.BinFixtureCap,
      s"fixture collect exceeded the cap: ${rows.length}")
    val subset = graft.engine.Tables.documents(spark, d)
      .where("doc_id % 50 = 0").count()
    assert(rows.length == math.min(subset, queries.SourceFormats.BinFixtureCap.toLong),
      "cap must keep the smallest-doc_id prefix of the subset")
  }
}
