package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ops.PageRank

/** Semantics of the integer PageRank on known graph shapes (the declared
  * query gates it value-for-value against DuckDB on the real dup graph;
  * these pin the structural properties on synthetic graphs).
  */
class PageRankSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, "graft-test")

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sp = spark
    import sp.implicits._
    PageRank.run(edges.toDF("a", "b"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("star graph: the hub outranks every leaf, leaves tie exactly") {
    val star = (1L to 6L).map(l => (0L, l))
    val r = ranks(star, 3)
    assert(r.keySet == (0L to 6L).toSet)
    val leaves = (1L to 6L).map(r)
    assert(leaves.distinct.size == 1, "symmetric leaves must tie exactly")
    assert(r(0L) > leaves.head, "hub must outrank leaves")
  }

  test("symmetric pair: both vertices keep exactly the full scaled mass") {
    // two vertices exchanging their whole rank each round: rank stays
    // damp + 85% of the neighbor's rank; deterministic fixed values
    val r = ranks(Seq((1L, 2L)), 3)
    assert(r(1L) == r(2L), "symmetric pair must tie exactly")
    // iteration 1: 0.15S + 0.85S = S (no division loss on degree 1)
    assert(r(1L) == PageRank.Scale,
      s"degree-1 pair must conserve exactly S, got ${r(1L)}")
  }

  test("ranks are identical across repeated runs (deterministic integer arithmetic)") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    assert(ranks(g, 3) == ranks(g, 3))
  }
}
