package graft.engine.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list by iterative
  * min-label propagation WITH POINTER JUMPING — the clustering step that
  * turns near-duplicate PAIRS into duplicate GROUPS (keep min-id doc per
  * group, drop the rest).
  *
  * Each iteration is one shuffle on vertex id for the neighbor-min
  * (map-side partial agg, joined via the self-loop trick) plus one
  * label-on-label self-join that applies `lbl ← lbl(lbl)` (r15): the
  * jump halves the remaining label-tree depth every round, so
  * convergence is O(log diameter) instead of O(diameter) — the
  * hash-to-min recipe (Rastogi et al. 2013). Dup clusters used to be
  * near-cliques (diameter 1-2, where propagation alone was enough), but
  * the r15 rank-proximity candidate window deliberately thins a
  * k-member family's clique to a chain of diameter ~k/W, and a 100×
  * corpus's 400-member blocks exceeded the old 50-round propagation
  * budget. The jump invariant is safe: a label is always the id of a
  * vertex in the same component, monotonically non-increasing, so the
  * unique fixpoint (component-min everywhere) is unchanged. Labels are
  * truncated with localCheckpoint per round, so the plan does not grow
  * with the iteration count (on a cluster, set a checkpoint dir and use
  * checkpoint() instead).
  *
  * Deterministic: the fixpoint (min vertex id per component) is unique.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame (src, dst) of undirected edges
    * @return (v, lbl): every vertex appearing in an edge, labelled with
    *         the minimum vertex id of its component
    */
  def run(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // the edge list feeds THREE scans (symmetric closure twice + vertex
    // extraction); persist it or the upstream pipeline that produced the
    // pairs (e.g. the whole MinHash verify) re-executes per scan
    val e = edges.toDF("a", "b").persist()
    val verts = e.select(col("a")).union(e.select(col("b"))).distinct()
    // symmetric closure PLUS a self-loop per vertex: the self-loop row
    // carries each vertex's own (old) label through the neighbor-min
    // aggregation, so one round is exactly ONE join + ONE aggregation —
    // no left-join back to the previous labels, no separate
    // change-detection join (per-round stage count is what dominates
    // wall time on small graphs, and shuffle count at 100 TB)
    val sym = e.union(e.select(col("b"), col("a")))
      .union(verts.select(col("a"), col("a")))
      .distinct().persist()
    var labels = verts.select(col("a").as("v"), col("a").as("lbl"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // neighbor-min propagation (checkpointed: the jump self-join below
      // reads it twice, and the lineage must not stack across rounds)
      val prop = sym.join(labels, sym("b") === labels("v"))
        .groupBy(sym("a").as("v"))
        .agg(min(col("lbl")).as("nlbl"),
          min(when(sym("b") === sym("a"), col("lbl"))).as("old"))
        .localCheckpoint(true)
      // pointer jump: lbl ← lbl(lbl). Every label is a component-member
      // vertex id, so the lookup hits (left join only guards the row
      // whose label is itself)
      val next = prop
        .join(prop.select(col("v").as("_jv"), col("nlbl").as("_jl")),
          prop("nlbl") === col("_jv"), "left")
        .select(prop("v"),
          coalesce(col("_jl"), prop("nlbl")).as("nlbl"), prop("old"))
        .select(col("v"), col("nlbl"), (col("nlbl") =!= col("old")).as("chg"))
        .localCheckpoint(true)
      changed = next.where(col("chg")).count() // counts the cached round
      labels = next.select(col("v"), col("nlbl").as("lbl"))
      iter += 1
    }
    sym.unpersist()
    e.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          s"($changed labels still changing) — graph diameter exceeds maxIter; " +
          "raise maxIter or switch to a star-contraction variant")
    labels
  }
}
