package graft.engine.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed replacements for unpartitioned corpus-scale windows —
  * `Window.orderBy(...)` with no partitionBy funnels the ENTIRE input
  * through one task, the classic 100 TB scale-killer that looks fine at
  * test SF. Every helper here computes value-identical results to the
  * single-task window by the histogram-bucket two-pass scheme:
  *
  *   1. bucket each row by a DETERMINISTIC monotone integer function of
  *      its first sort key (histogram-equalized: span-scale into 1024
  *      fine bins, then map each fine bin to the coarse bucket of its
  *      cumulative row share, so buckets stay BALANCED under clustered
  *      key distributions; equal keys land in the same bucket by
  *      construction, so bucket boundaries never split ties of the
  *      PRIMARY key);
  *   2. run the window WITHIN each bucket in parallel
  *      (`Window.partitionBy(_gb)`);
  *   3. stitch buckets with a per-bucket offset frame — at most 32 rows,
  *      one per non-empty bucket — which is the only place an
  *      unpartitioned window remains (bounded by construction; the
  *      global-window plan sweep whitelists exactly this `_gb`/`_grn`
  *      shape).
  *
  * Companion of [[SuffixArray.rangeDenseRank]] (which buckets by a
  * previous dense rank); these generalize to any long-typed sort key.
  * Degenerate distributions (all keys equal) collapse to one bucket —
  * the data has no order information to parallelize over; callers with
  * such keys should bucket on a different column.
  */
object GlobalOrder {

  private val Buckets = 32

  /** Internal cut point: each helper consumes its keyed/windowed frame
    * two-to-three times (min/max pass, offset aggregate, final stitch
    * join, seam extraction), and DataFrame plans are TREES — every
    * reference clones the whole subtree, so a chained call compounds
    * both re-execution and Catalyst re-analysis geometrically (measured:
    * three chained ntileCol calls cost ~10 s of pure planning on a
    * 0.2 s query when left uncut). Two regimes:
    *
    *   - SHALLOW plan (<= 24 analyzed nodes): lazy persist through the
    *     engine registry — execution runs once, the cloned subtrees are
    *     cheap to re-analyze, and no eager job is paid (a chained
    *     helper's input is the previous helper's already-shallow
    *     output, so chains stay in this regime);
    *   - DEEP plan: eager localCheckpoint (the ConnectedComponents /
    *     suffix-array discipline) — executes once AND replaces every
    *     downstream reference with a LogicalRDD leaf, cutting the
    *     re-analysis. Blocks are released by the context cleaner when
    *     the result is garbage collected.
    */
  private def cut(df: DataFrame): DataFrame = {
    val nodes = df.queryExecution.analyzed.collect { case p => p }.size
    if (nodes > 24) df.localCheckpoint()
    else graft.engine.Persisted.add(df)
  }

  private val FineBins = 1024

  /** Overflow-safe monotone binning of `v` over [lo, hi] into <= 1025
    * bins: divide by the ceil-ish bin width instead of multiplying by
    * the bin count (a span near 2^63 would overflow the multiply).
    */
  private def fineBin(v: String, lo: String, hi: String): String =
    s"($v - $lo) div ((($hi - $lo) div $FineBins) + 1)"

  /** Adds `_gb` (bucket) and `_gok` (the long key) over a [[cut]] keyed
    * frame (one evaluation, bounded re-analysis). Bucketing is
    * HISTOGRAM-EQUALIZED with TWO-LEVEL adaptive refinement (r9, was
    * plain span scaling): a clustered key distribution — scores piling
    * near one value, zipf-ish counts — would put most rows in a few
    * span buckets and re-create the straggler task the helpers exist to
    * avoid. Level 1 span-scales into <= 1025 fine bins; any OVERLOADED
    * fine bin (> 1/32 of the rows) re-bins its rows by its OWN
    * min/max — so clusters up to ~10^6x narrower than the span still
    * spread — and the (level1, level2) histogram's cumulative row share
    * assigns each composite bin its coarse bucket: every bucket holds
    * ~1/32 of the ROWS up to key-VALUE granularity (one ultra-hot tied
    * value is irreducible: equal keys must share a bucket, or tie-break
    * ordering would split across the seam). The composite bin is a
    * monotone deterministic function of the key, so bucket boundaries
    * never split the primary-key order; everything stays in-plan (three
    * tiny broadcasts, histograms <= 33k rows worst case; no driver
    * collect on any declared query's data path).
    */
  private def bucketed(df: DataFrame, key: Column): DataFrame = {
    val keyed = cut(df.withColumn("_gok", key.cast("long")))
    val mm = keyed.agg(min(col("_gok")).as("_gmn"), max(col("_gok")).as("_gmx"))
    val fine = keyed
      .crossJoin(broadcast(mm))
      .withColumn("_gf1", expr(fineBin("_gok", "_gmn", "_gmx")))
      .drop("_gmn", "_gmx")
    // level-1 stats: count + local key range per fine bin (<= 1025 rows)
    val s1 = fine.groupBy(col("_gf1"))
      .agg(count(lit(1)).as("_gc1"),
        min(col("_gok")).as("_gn1"), max(col("_gok")).as("_gx1"))
    val s1t = s1.crossJoin(broadcast(s1.agg(sum(col("_gc1")).as("_gt"))))
      .select(col("_gf1"), col("_gc1"), col("_gn1"), col("_gx1"), col("_gt"))
    val fine2 = fine.join(broadcast(s1t), Seq("_gf1"))
      .withColumn("_gf2",
        expr(s"CASE WHEN _gc1 * $Buckets > _gt " +
          s"THEN ${fineBin("_gok", "_gn1", "_gx1")} ELSE CAST(0 AS BIGINT) END"))
      .drop("_gc1", "_gn1", "_gx1", "_gt")
    val hist = cut(fine2.groupBy(col("_gf1"), col("_gf2"))
      .agg(count(lit(1)).as("_gfc"))
      .withColumn("_gcum", sum(col("_gfc")).over(
        Window.orderBy(col("_gf1"), col("_gf2"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    val fineToCoarse = hist
      .crossJoin(broadcast(hist.agg(sum(col("_gfc")).as("_gt2"))))
      .select(col("_gf1"), col("_gf2"),
        expr(s"((_gcum - 1) * $Buckets) div _gt2").as("_gb"))
    fine2.join(broadcast(fineToCoarse), Seq("_gf1", "_gf2"))
      .drop("_gf1", "_gf2")
  }

  /** Test/diagnostic hook: the per-bucket row counts [[bucketed]] would
    * produce for (df, key) — the balance evidence under skew.
    */
  private[graft] def bucketCounts(df: DataFrame, key: Column): DataFrame =
    bucketed(df, key).groupBy(col("_gb")).agg(count(lit(1)).as("n"))

  /** Distributed global `row_number()` ordered by (key, ties...) — the
    * (key, ties) sort must totally order the rows for a deterministic
    * result, exactly as the single-task window requires. Result column:
    * `out` (BIGINT, 1-based).
    */
  def rowNumber(df: DataFrame, key: Column, ties: Seq[Column],
      out: String = "_grn"): DataFrame =
    rowNumberWith(bucketed(df, key), col("_gok") +: ties, out)
      .drop("_gok", "_gb")

  /** Distributed global `row_number()` with a CALLER-SUPPLIED bucket
    * column `_gb` already present: `_gb` must be a deterministic
    * monotone non-decreasing function of the sort prefix (so bucket
    * boundaries never split the sort order) — e.g. the span-scaled
    * integer key ([[rowNumber]]) or the first-character code of a
    * lexicographically sorted string key. Leaves `_gb` in place for the
    * caller to drop.
    */
  def rowNumberWith(df: DataFrame, sort: Seq[Column],
      out: String): DataFrame = {
    val wloc = Window.partitionBy(col("_gb")).orderBy(sort: _*)
    val local = cut(
      df.withColumn("_glrn", row_number().over(wloc).cast("long")))
    val offs = local.groupBy(col("_gb")).agg(count(lit(1)).as("_gcnt"))
      .withColumn("_goff", coalesce(sum(col("_gcnt")).over(
        Window.orderBy(col("_gb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_gb"), col("_goff"))
    local.join(broadcast(offs), Seq("_gb"))
      .withColumn(out, col("_glrn") + col("_goff"))
      .drop("_glrn", "_goff")
  }

  /** Distributed global running sum of `value` over the (key, ties...)
    * order, INCLUSIVE of the current row (`rowsBetween(unboundedPreceding,
    * currentRow)` semantics). Result column: `out` (BIGINT).
    */
  def runningSum(df: DataFrame, key: Column, ties: Seq[Column],
      value: Column, out: String = "_gcum"): DataFrame = {
    val wloc = Window.partitionBy(col("_gb")).orderBy(col("_gok") +: ties: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = cut(bucketed(df, key)
      .withColumn("_glcs", sum(value).over(wloc).cast("long"))
      .withColumn("_glv", value.cast("long")))
    val offs = local.groupBy(col("_gb")).agg(sum(col("_glv")).as("_gcnt"))
      .withColumn("_goff", coalesce(sum(col("_gcnt")).over(
        Window.orderBy(col("_gb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_gb"), col("_goff"))
    local.join(broadcast(offs), Seq("_gb"))
      .withColumn(out, col("_glcs") + col("_goff"))
      .drop("_gok", "_gb", "_glcs", "_glv", "_goff")
  }

  /** Distributed global `ntile(n)` over the (key, ties...) order — exact
    * SQL ntile semantics reproduced arithmetically from the distributed
    * row number: with N rows, the first N mod n tiles hold ceil(N/n)
    * rows, the rest floor(N/n). Result column: `out` (BIGINT, 1-based).
    */
  def ntileCol(df: DataFrame, n: Int, key: Column, ties: Seq[Column],
      out: String): DataFrame = {
    val rn = rowNumber(df, key, ties, "_gntrn")
    val tot = rn.agg(count(lit(1)).as("_gtot"))
    rn.crossJoin(broadcast(tot))
      .withColumn(out, expr(
        s"""CASE WHEN _gntrn <= (_gtot % $n) * (_gtot div $n + 1)
              THEN (_gntrn - 1) div (_gtot div $n + 1) + 1
              ELSE (_gtot % $n) + (_gntrn - 1 - (_gtot % $n) * (_gtot div $n + 1))
                     div greatest(_gtot div $n, 1) + 1 END"""))
      .drop("_gntrn", "_gtot")
  }

  /** Distributed global `lead(c, 1)` for each column in `leadCols` over
    * the (key, ties...) order: in-bucket lead in parallel, then the seam
    * rows (each bucket's LAST row) take their successor from the next
    * non-empty bucket's FIRST row — one boundary row exchanged per
    * bucket, never a global sort. The globally last row keeps NULL
    * leads, exactly as the single-task window would. Appends
    * `<col><suffix>` for each lead column.
    */
  def lead1(df: DataFrame, key: Column, ties: Seq[Column],
      leadCols: Seq[String], suffix: String = "_nx"): DataFrame = {
    val wloc = Window.partitionBy(col("_gb")).orderBy(col("_gok") +: ties: _*)
    val base0 = bucketed(df, key)
      .withColumn("_grn", row_number().over(wloc))
      // sentinel marking "has an in-bucket successor" — leadCols
      // themselves may legitimately hold NULLs
      .withColumn("_ghn", lead(lit(1), 1).over(wloc))
    val base = cut(leadCols.foldLeft(base0) { (b, c) =>
      b.withColumn(c + suffix, lead(col(c), 1).over(wloc))
    })
    // first row of each bucket, keyed by the PREVIOUS non-empty bucket
    // (lag over the <=32-row per-bucket frame bridges empty buckets)
    val firsts = base.where(col("_grn") === 1)
      .select(col("_gb") +: leadCols.map(c => col(c).as(c + "_gfx")): _*)
      .withColumn("_gpb", lag(col("_gb"), 1).over(Window.orderBy(col("_gb"))))
      .where(col("_gpb").isNotNull)
      .drop("_gb")
    val inner = base.where(col("_ghn").isNotNull)
    val seams = base.where(col("_ghn").isNull)
      .join(firsts, col("_gb") === col("_gpb"), "left")
    val patched = leadCols.foldLeft(seams) { (b, c) =>
      b.withColumn(c + suffix, col(c + "_gfx"))
    }.select(inner.columns.map(col): _*)
    inner.unionByName(patched)
      .drop("_gok", "_gb", "_grn", "_ghn")
  }
}
