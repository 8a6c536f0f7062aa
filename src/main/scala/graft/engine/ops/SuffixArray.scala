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
    * round-0 token rank (any order-isomorphic integer) and `p` DENSE
    * 1..n within each doc (the posexplode contract) — density is what
    * lets each round fetch the rank at p+2^(k-1) with a per-doc
    * `lead(rk, off)` window instead of a keyed self-join on (doc,
    * p+off): value-identical (a missing position past the doc end is
    * NULL either way), one fewer exchange per round, and no join
    * build side. Returns the final frame (doc_id, p, gid, rk) plus the
    * `boundRound` frame — whose rank identifies the 2^boundRound-token
    * prefix — for candidate filtering. The bound ranks come back as a
    * FROZEN COLUMN `rk_bound` riding along through the later rounds
    * (r11; returning the round-boundRound frame separately forced the
    * caller into a gid-keyed self-join of two corpus-position frames
    * just to line the two ranks up again).
    *
    * Per-round execution discipline (r11 — the r10 bench showed this
    * query paying ~9 s at sf0.1, mostly REDUNDANT executions of the
    * per-round self-join): the join + in-bucket window materialize
    * EXACTLY ONCE per round, via an eager localCheckpoint of the
    * windowed frame; everything else that used to cost a corpus pass is
    * driver-side arithmetic over the checkpointed result —
    *
    *   - the bucket divisor (the previous round's max rank) is carried
    *     forward in the driver instead of re-aggregated from the join
    *     output (the old `mx` agg executed the whole round a 2nd time);
    *   - the 32-row per-bucket distinct counts are COLLECTED (a narrow
    *     agg over cached partitions) and prefix-summed in Scala; the
    *     stitch adds a literal lookup map — no offs window job, no
    *     broadcast exchange (the old offs path executed the round a 3rd
    *     time to build the broadcast);
    *   - the next round's max rank is the counts' sum — free.
    *
    * Rounds stop at the prefix-doubling FIXPOINT: when a round splits no
    * rank class (distinct count unchanged), no later round can (round
    * k+1's refinement pairs round-k classes; an unchanged partition
    * yields the same pairs), so remaining rounds are identity — skipping
    * them is value-identical (Manber–Myers' standard early exit).
    *
    * Each round's checkpointed blocks stay referenced only by the next
    * round's plan; the context cleaner releases them as the frames are
    * garbage collected (same lifecycle as ConnectedComponents' rounds).
    */
  def ranks(pos0: DataFrame, rounds: Int, boundRound: Int): DataFrame = {
    val debug = sys.env.contains("GRAFT_SUFFIX_DEBUG")
    def tlog(name: String, t0: Long): Unit =
      if (debug) println(f"[suffix-ranks] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val tInit = System.nanoTime()
    var cur = pos0.localCheckpoint()
    tlog("pos0 checkpoint", tInit)
    var curMax = Option(cur.agg(max(col("rk"))).head.get(0))
      .map(_.asInstanceOf[Number].longValue).getOrElse(0L)
    var stable = false
    val wdoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))

    // One ranking pass: bucket by the current rank, dense-rank by
    // (rk, extra sort columns) within buckets in parallel, stitch with
    // driver-side offsets (32-row collect, literal-map lookup), update
    // curMax/stable. `extraSort` columns are consumed and dropped.
    def pass(input: DataFrame, extraSort: Seq[String]): DataFrame = {
      val mx = math.max(curMax, 1L)
      val local = input
        .withColumn("_b", expr(s"((rk - 1) * 32) div $mx"))
        .withColumn("_lrk", dense_rank().over(
          Window.partitionBy(col("_b"))
            .orderBy(col("rk") +: extraSort.map(col): _*)).cast("long"))
        .localCheckpoint()
      val cnts = local.groupBy(col("_b")).agg(max(col("_lrk")).as("_cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val offsets = cnts.map(_._1)
        .zip(cnts.scanLeft(0L)(_ + _._2).init).toSeq
      val newMax = cnts.map(_._2).sum
      val offExpr =
        if (offsets.isEmpty) lit(0L)
        else coalesce(element_at(
          map(offsets.flatMap { case (b, o) => Seq(lit(b), lit(o)) }: _*),
          col("_b")), lit(0L))
      stable = newMax == curMax
      curMax = newMax
      // drop-based projection keeps carried columns (rk_bound) in place
      local.withColumn("rk", col("_lrk") + offExpr)
        .drop(extraSort ++ Seq("_b", "_lrk"): _*)
    }

    // WIDE BASE PASS (r11): rank 2^start-word prefixes directly — the
    // leads at offsets 1..2^start-1 all come from the SAME per-doc
    // window, so an 8-word base costs one pass and replaces `start`
    // doubling rounds (the classic larger-base-radix construction).
    // The fixpoint argument extends: if the span-2^start partition
    // equals the word partition, tied positions match word-for-word
    // under every shift by induction, so the suffixes are identical
    // and no later round can split them.
    val start = math.min(3, math.min(rounds, boundRound))
    var spanLog = 0
    if (start > 0 && !stable) {
      val t0 = System.nanoTime()
      val nLead = (1 << start) - 1
      var paired = cur
      for (i <- 1 to nLead)
        paired = paired.withColumn(s"_rkb$i",
          coalesce(lead(col("rk"), i).over(wdoc), lit(-1L)))
      cur = pass(paired, (1 to nLead).map(i => s"_rkb$i"))
      spanLog = start
      if (spanLog == boundRound) cur = cur.withColumn("rk_bound", col("rk"))
      tlog(s"base pass span ${1 << start} (ranks $curMax" +
        s"${if (stable) ", stable" else ""})", t0)
    }

    // doubling rounds continue from span 2^spanLog
    var k = spanLog + 1
    while (k <= rounds && !stable) {
      val tRound = System.nanoTime()
      val off = 1 << (k - 1)
      val paired = cur.withColumn("_rkb1",
        coalesce(lead(col("rk"), off).over(wdoc), lit(-1L)))
      cur = pass(paired, Seq("_rkb1"))
      if (k == boundRound)
        cur = cur.withColumn("rk_bound", col("rk"))
      tlog(s"round $k (ranks $curMax${if (stable) ", stable" else ""})", tRound)
      k += 1
    }
    // stable-early (ranks final, so the bound rank equals the final
    // rank) or rounds < boundRound: freeze now
    if (!cur.columns.contains("rk_bound"))
      cur = cur.withColumn("rk_bound", col("rk"))
    cur
  }
}
