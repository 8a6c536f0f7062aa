package graft.engine.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix-array construction by prefix doubling
  * (Manber–Myers), the backbone of `dedup_suffix_repeats` — the Lee et
  * al. 2021 exact-substring dedup method. Round k ranks every suffix by
  * its 2^k-token prefix as the pair (rank of self, rank at p + 2^(k-1),
  * −1 past the end); `rounds` rounds fully resolve documents of up to
  * 2^rounds tokens.
  *
  * Scale notes: positions travel as (doc, p, rank) integer triples —
  * never text; each round is one keyed self-join on (doc, p + off) plus
  * one DISTRIBUTED global dense_rank ([[rangeDenseRank]]). Rounds cut
  * lineage with eager `localCheckpoint` (the ConnectedComponents
  * discipline): each round references its predecessor twice (self +
  * shifted), so without truncation the logical plan doubles per round.
  */
object SuffixArray {

  /** Distributed global dense_rank over (c1, c2): bucket by a
    * DETERMINISTIC monotone function of c1 (c1 must be a previous dense
    * rank, so ((c1−1)·32) div max(c1) yields 32 contiguous blocks of the
    * global order; equal keys share a bucket by construction — no
    * range-sampling, no partition ids), rank each bucket in parallel,
    * then add the cumulative distinct count of the buckets before it.
    * The rank VALUES are identical to a single-task global window; the
    * work is spread across buckets. Result column: `_grk`.
    */
  def rangeDenseRank(df: DataFrame, c1: String, c2: String): DataFrame = {
    val mx = df.agg(max(col(c1)).as("_mx"))
    val local = df.crossJoin(broadcast(mx))
      .withColumn("_b", expr(s"(($c1 - 1) * 32) div _mx"))
      .withColumn("_lrk", dense_rank().over(
        Window.partitionBy(col("_b")).orderBy(col(c1), col(c2))).cast("long"))
    val offs = local.groupBy(col("_b"))
      .agg(max(col("_lrk")).as("_cnt"))
      .withColumn("_off", coalesce(sum(col("_cnt")).over(
        Window.orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_b"), col("_off"))
    local.join(broadcast(offs), Seq("_b"))
      .withColumn("_grk", col("_lrk") + col("_off"))
      .drop("_b", "_lrk", "_off", "_mx")
  }

  /** Prefix-doubling ranks. Input: (doc_id, p, gid, rk) with `rk` the
    * round-0 token rank (any order-isomorphic integer). Returns the
    * final frame (doc_id, p, gid, rk) plus the `boundRound` frame —
    * whose rank identifies the 2^boundRound-token prefix — for
    * candidate filtering.
    */
  def ranks(pos0: DataFrame, rounds: Int, boundRound: Int): (DataFrame, DataFrame) = {
    var cur = pos0.localCheckpoint()
    var bound: DataFrame = null
    for (k <- 1 to rounds) {
      val off = 1 << (k - 1)
      val shifted = cur.selectExpr("doc_id", s"p - $off AS p", "rk AS rkb")
      val paired = cur.join(shifted, Seq("doc_id", "p"), "left")
        .withColumn("rkb", coalesce(col("rkb"), lit(-1L)))
      cur = rangeDenseRank(paired, "rk", "rkb")
        .selectExpr("doc_id", "p", "gid", "_grk AS rk")
      // each round references its predecessor twice, so an uncut plan
      // doubles per round; cutting every SECOND round bounds the
      // blowup at 4 copies of a checkpointed leaf while halving the
      // eager materialization jobs (the bound round always cuts, since
      // it is retained and re-read later)
      if (k % 2 == 0 || k == rounds || k == boundRound)
        cur = cur.localCheckpoint()
      if (k == boundRound) bound = cur
    }
    (cur, bound)
  }
}
