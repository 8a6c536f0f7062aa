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
    val row = SparkEntry.queries("agg_hll_shards")(spark, d).collect().head
    val approx = row.getLong(row.fieldIndex("approx_parts"))
    val exact = row.getLong(row.fieldIndex("exact_parts"))
    // lgK=12 HLL relative error ~1.6%; 5% leaves margin without letting a
    // broken merge (e.g. double counting across shards) pass
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"estimate $approx too far from exact $exact")
  }
}
