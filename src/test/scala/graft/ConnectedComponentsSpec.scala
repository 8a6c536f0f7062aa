package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ops.ConnectedComponents

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, "graft-test")

  test("min-label propagation finds components, including chains") {
    val s = spark
    import s.implicits._
    // component {1,2,3,4} as a chain (worst diameter), {10,11} as a pair,
    // {20,21,22} as a triangle; 30-31 isolated pair
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (31L, 30L)).toDF("src", "dst")
    val got = ConnectedComponents.run(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L)
    assert(got == want)
  }

  test("pointer jumping converges a 400-vertex chain within the round budget (r15)") {
    // the r15 candidate window thins a k-member dup family's clique to a
    // ~k/W-diameter chain — plain propagation needs `diameter` rounds
    // (the 100× corpus blew the 50-round budget); lbl ← lbl(lbl) makes
    // it O(log diameter). 400 vertices in a path must converge well
    // under the default budget — and to the right labels
    val s = spark
    import s.implicits._
    val chain = (1L until 400L).map(i => (i, i + 1)).toDF("a", "b")
    val got = ConnectedComponents.run(chain, maxIter = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 400 && got.values.forall(_ == 1L),
      s"chain must collapse to component-min 1, got ${got.filter(_._2 != 1L).take(5)}")
  }

  test("a single edge converges in one round and is deterministic") {
    val s = spark
    import s.implicits._
    val got = ConnectedComponents.run(Seq((7L, 5L)).toDF("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 5L, 7L -> 5L))
  }
}
