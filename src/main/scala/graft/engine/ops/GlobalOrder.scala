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
  *   1. bucket each row by a monotone integer function of its first
  *      sort key (quantile-equalized: the count of approx-quantile
  *      boundaries below the key, so buckets stay BALANCED under any
  *      key distribution; equal keys land in the same bucket by
  *      construction, so bucket boundaries never split ties of the
  *      PRIMARY key);
  *   2. run the window WITHIN each bucket in parallel
  *      (`Window.partitionBy(_gb)`);
  *   3. stitch buckets with a per-bucket offset frame — at most `fan`
  *      rows, one per non-empty bucket — which is the only place an
  *      unpartitioned window remains (bounded by construction; the
  *      global-window plan sweep whitelists exactly this `_gb`/`_grn`
  *      shape).
  *
  * Companion of [[SuffixArray.ranks]]'s internal pass (which buckets by a
  * previous dense rank); these generalize to any long-typed sort key.
  * Degenerate distributions (all keys equal) collapse to one bucket —
  * the data has no order information to parallelize over; callers with
  * such keys should bucket on a different column.
  */
object GlobalOrder {

  /** Conf override for the bucket fan (tests pin it; unset/<=0 falls
    * back to `spark.sql.shuffle.partitions`).
    */
  val FanConf = "spark.graft.order.fan"

  /** Bucket fan (r12, r11 VERDICT #2): proportional to the session's
    * shuffle parallelism instead of a fixed 32 — a fixed fan means
    * per-task volume grows linearly with corpus size. The offset/stitch
    * frames stay bounded at `fan` rows (thousands at cluster scale —
    * still trivially driver/broadcast-sized). Values are identical for
    * ANY fan: every helper's correctness argument only needs the
    * bucketing to be a monotone tie-preserving function of the key
    * (GlobalOrderSpec pins value-identity at fan 32 and 256).
    */
  private[graft] def fanOf(df: DataFrame): Int = {
    val conf = df.sparkSession.sessionState.conf
    val o = conf.getConfString(FanConf, "0").toInt
    if (o > 0) o else math.max(2, conf.numShufflePartitions)
  }

  /** Internal cut point: each helper's keyed frame is consumed twice
    * (the driver-side offset/boundary action, then the windowed result),
    * and DataFrame plans are TREES — every reference clones the whole
    * subtree, so a chained call compounds both re-execution and Catalyst
    * re-analysis geometrically (measured: three chained ntileCol calls
    * cost ~10 s of pure planning on a 0.2 s query when left uncut).
    * Two regimes:
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
    val plan = df.queryExecution.analyzed
    val nodes = plan.collect { case p => p }.size
    // PASSTHROUGH (r18, guide §5): a plan that is nothing but row-local
    // projections/filters over already-materialized checkpoint leaves
    // (the suffix-array output feeding lead1With) re-executes as a cheap
    // block re-read — persisting it would hold a second full copy of
    // the corpus frame in the storage pool for zero avoided work
    val passthrough = plan.collectFirst {
      case p if !(p.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD] ||
        p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project] ||
        p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter] ||
        p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias]) => p
    }.isEmpty
    if (passthrough) df
    else if (nodes > 24) df.localCheckpoint()
    else graft.engine.Persisted.add(df)
  }

  /** Bucket column over a pre-projected `_gok` long key from a
    * DRIVER-LITERAL boundary array (r18, guide §2.4/§1.2 — the
    * SuffixArray.bucketBy discipline): the count of boundaries strictly
    * below the key, by codegen'd binary search over the sorted literal
    * array (graft_bucket — O(log fan) per row at any fan, where a
    * straight-line CASE sum stops being JIT-compiled past ~128 terms).
    * Value-identical to the old broadcast-array filter fold.
    */
  private def bucketLit(bnds: Seq[Long]): Column =
    if (bnds.isEmpty) lit(0L)
    else expr(s"graft_bucket(_gok, array(${bnds.map(_ + "L").mkString(",")}))")

  /** Per-bucket offset rows inlined as a literal-map lookup (the
    * SuffixArray.stitchPass1 discipline): `coalesce(map[_gb], 0)`.
    * At most `fan` entries — driver-trivial at any corpus size.
    */
  private def offsetLit(offs: Seq[(Long, Long)]): Column =
    if (offs.isEmpty) lit(0L)
    else coalesce(element_at(
      map(offs.flatMap { case (b, o) => Seq(lit(b), lit(o)) }: _*),
      col("_gb").cast("long")), lit(0L))

  /** Exclusive prefix sums over per-bucket totals sorted by bucket id. */
  private def prefixOffsets(cnts: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val sorted = cnts.sortBy(_._1)
    sorted.map(_._1).zip(sorted.map(_._2).scanLeft(0L)(_ + _).init)
  }

  /** Adds `_gb` (bucket) and `_gok` (the long key) over a [[cut]] keyed
    * frame (one evaluation, bounded re-analysis). Bucketing is
    * QUANTILE-EQUALIZED (r9; plain span scaling re-creates the
    * straggler task under clustered keys — scores piling near one
    * value, zipf counts, one busy second inside a decade of epoch
    * micros): ONE approx_percentile pass yields the fan-1 key values at
    * the i/fan row-share quantiles — collected to the driver and
    * re-embedded as literals (r18; the broadcast-crossJoin form paid an
    * extra AQE exchange job per helper) — and each row's bucket is the
    * count of boundaries strictly below its key ([[bucketLit]]). Buckets
    * therefore hold ~1/fan of the ROWS for ANY key distribution, up to key-VALUE
    * granularity (an ultra-hot tied value is irreducible: equal keys
    * must share a bucket, or tie-break ordering would split across the
    * seam — the 10M-row zipf stress leg measures 4% hottest-bucket
    * share against a 90% value cluster).
    *
    * The bucket is a monotone function of the key VALUE alone, so
    * boundaries never split ties and never reorder keys — which is the
    * entire correctness contract: the helpers' RESULTS are provably
    * identical for any monotone tie-preserving bucketing (the offset
    * stitch corrects any split), so the sketch's merge-order wobble in
    * WHERE boundaries land affects load balance only, never values
    * (GlobalOrderSpec pins value-identity on tie-heavy, gappy,
    * degenerate, and zipf keys).
    */
  private def bucketed(df: DataFrame, key: Column): DataFrame = {
    // graft_bucket lives in the session function registry (idempotent)
    graft.functions.GraftFunctions.register(df.sparkSession)
    val buckets = fanOf(df)
    val keyed = cut(df.withColumn("_gok", key.cast("long")))
    val bnds = if (buckets < 2) Seq.empty[Long] else {
      val qs = (1 until buckets).map(i => i.toDouble / buckets).mkString(", ")
      val row = keyed.agg(
        expr(s"approx_percentile(_gok, array($qs), 10000)")).head
      if (row.isNullAt(0)) Seq.empty[Long] else row.getSeq[Long](0)
    }
    keyed.withColumn("_gb", bucketLit(bnds))
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
    // offsets from the PRE-window frame (r18, guide §2.4/§1.2): windows
    // preserve cardinality, so per-bucket row counts computed before the
    // window equal those computed after — one bounded collect replaces
    // the old eager checkpoint of the WINDOWED frame plus a broadcast
    // join (two jobs and a full materialization per helper call), and
    // the stitched result is then consumed exactly once, streaming into
    // its consumer. `df` is consumed twice (the counts action + the
    // result); internal callers pass a [[cut]] frame, and the public
    // contract requires a deterministic input (as any two-pass
    // consumption always has).
    val wloc = Window.partitionBy(col("_gb")).orderBy(sort: _*)
    val cnts = df.groupBy(col("_gb").cast("long").as("_gb"))
      .agg(count(lit(1)).as("_gcnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    df.withColumn("_glrn", row_number().over(wloc).cast("long"))
      .withColumn(out, col("_glrn") + offsetLit(prefixOffsets(cnts)))
      .drop("_glrn")
  }

  /** Distributed global running sum of `value` over the (key, ties...)
    * order, INCLUSIVE of the current row (`rowsBetween(unboundedPreceding,
    * currentRow)` semantics). Result column: `out` (BIGINT).
    */
  def runningSum(df: DataFrame, key: Column, ties: Seq[Column],
      value: Column, out: String = "_gcum"): DataFrame =
    runningSums(df, key, ties, Seq(value -> out))

  /** As [[runningSum]], additionally returning the GRAND TOTAL of the
    * summed value — already known on the driver from the per-bucket
    * offset collect (r18), so callers that previously re-aggregated the
    * cumulative frame (or the corpus) for the total can embed it as a
    * literal and consume the stitched frame exactly once.
    */
  def runningSumTotal(df: DataFrame, key: Column, ties: Seq[Column],
      value: Column, out: String = "_gcum"): (DataFrame, Long) = {
    val (res, totals) = runningSumsTotals(df, key, ties, Seq(value -> out))
    (res, totals.head)
  }

  /** Multi-column [[runningSum]]: every (value -> out) pair's inclusive
    * running sum over the SAME (key, ties...) order in one bucketed
    * pass — one window over literal per-bucket offsets (the two-sample
    * EDF shape: both samples' cumulatives ride together).
    */
  def runningSums(df: DataFrame, key: Column, ties: Seq[Column],
      values: Seq[(Column, String)]): DataFrame =
    runningSumsTotals(df, key, ties, values)._1

  /** [[runningSums]] + every value's grand total (see
    * [[runningSumTotal]]). Offsets come from the PRE-window frame (r18):
    * windows preserve cardinality, so per-bucket value sums computed
    * before the window equal those computed after — one bounded collect
    * replaces the old eager checkpoint of the windowed frame plus a
    * broadcast join, and the stitched frame streams into its consumer.
    */
  def runningSumsTotals(df: DataFrame, key: Column, ties: Seq[Column],
      values: Seq[(Column, String)]): (DataFrame, Seq[Long]) = {
    val wloc = Window.partitionBy(col("_gb")).orderBy(col("_gok") +: ties: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val idx = values.indices
    val b = bucketed(df, key)
    val rows = b.groupBy(col("_gb"))
      .agg(sum(values.head._1.cast("long")).as("_gbs0"),
        idx.drop(1).map(i => sum(values(i)._1.cast("long")).as(s"_gbs$i")): _*)
      .collect()
    // per-bucket sums may be NULL (all-null values in a bucket): the SQL
    // running sum skips nulls, so a null bucket contributes 0 to every
    // later bucket's offset — exactly the old coalesce'd window stitch
    val perBucket = idx.map { i =>
      rows.map(r =>
        (r.getLong(0), if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1))).toSeq
    }
    val res = idx.foldLeft(b) { (r, i) =>
      r.withColumn(values(i)._2,
        sum(values(i)._1).over(wloc).cast("long") +
          offsetLit(prefixOffsets(perBucket(i))))
    }.drop("_gok", "_gb")
    (res, idx.map(i => perBucket(i).map(_._2).sum))
  }

  /** Distributed global running MAX of `value` over the (key, ties...)
    * order, EXCLUSIVE of the current row (`rowsBetween(unboundedPreceding,
    * -1)` semantics — the skyline/dominance shape); the globally first
    * row gets NULL, exactly as the single-task window would. Result
    * column: `out` (BIGINT).
    */
  def runningMaxExclusive(df: DataFrame, key: Column, ties: Seq[Column],
      value: Column, out: String = "_gmax"): DataFrame = {
    // per-bucket maxes from the PRE-window frame (r18, same argument as
    // [[runningSumsTotals]]: the window does not change which rows a
    // bucket holds); the prior-bucket running max folds on the driver
    val wlocX = Window.partitionBy(col("_gb")).orderBy(col("_gok") +: ties: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val b = bucketed(df, key)
    // one bounded collect: every OBSERVED bucket id, with its value max
    // (NULL when the bucket's values are all null — it still needs the
    // prior max of EARLIER buckets, so presence matters)
    val maxes = b.groupBy(col("_gb")).agg(max(value.cast("long")).as("_gbm"))
      .collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq.sortBy(_._1)
    // exclusive prefix max per bucket: only buckets with a non-null
    // PRIOR max get an entry (element_at misses = NULL, matching the
    // old left-join's NULL for first/all-null-prior buckets)
    val priorAll = maxes.zipWithIndex.flatMap { case ((bk, _), i) =>
      val before = maxes.take(i).flatMap(_._2)
      if (before.isEmpty) None else Some((bk, before.max))
    }
    val pmExpr =
      if (priorAll.isEmpty) lit(null).cast("long")
      else element_at(
        map(priorAll.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
        col("_gb"))
    // greatest skips NULLs (bucket-first rows, first bucket), returning
    // NULL only when both sides are — the global first row
    b.withColumn("_glmx", max(value).over(wlocX).cast("long"))
      .withColumn(out, greatest(col("_glmx"), pmExpr))
      .drop("_gok", "_gb", "_glmx")
  }

  /** Distributed global `ntile(n)` over the (key, ties...) order — exact
    * SQL ntile semantics reproduced arithmetically from the distributed
    * row number: with N rows, the first N mod n tiles hold ceil(N/n)
    * rows, the rest floor(N/n). Result column: `out` (BIGINT, 1-based).
    */
  def ntileCol(df: DataFrame, n: Int, key: Column, ties: Seq[Column],
      out: String): DataFrame =
    ntileCols(df, ties, Seq((n, key, out)))

  /** Multi-metric [[ntileCol]]: every (n, key, out) spec's global ntile
    * over the SAME tie columns, sharing the expensive corpus-scale work
    * across metrics — ONE [[cut]] of the input, ONE aggregate producing
    * every metric's 31-boundary array AND the total row count, ONE
    * broadcast crossJoin attaching them (the RFM shape: three chained
    * ntileCol calls each paid their own boundary pass, count pass, and
    * two crossJoins — ~6 corpus passes where this makes 1 + one window
    * per metric; the per-metric bucket window + fan-row offset stitch
    * are irreducible because each metric orders the frame differently).
    * Value-identical to chaining [[ntileCol]]: each spec's ntile depends
    * only on its own (key, ties) order, never on another spec's output.
    */
  def ntileCols(df: DataFrame, ties: Seq[Column],
      specs: Seq[(Int, Column, String)]): DataFrame = {
    // graft_bucket lives in the session function registry (idempotent)
    graft.functions.GraftFunctions.register(df.sparkSession)
    val idx = specs.indices
    val buckets = fanOf(df)
    val keyed = cut(idx.foldLeft(df) { (b, i) =>
      b.withColumn(s"_gok$i", specs(i)._2.cast("long"))
    })
    // action 1: every metric's boundary array + the global row count,
    // collected once and re-embedded as literals (r18 — the broadcast
    // crossJoin form paid an AQE exchange job, and each metric's stitch
    // paid an eager checkpoint plus a broadcast-join: two jobs per
    // metric; offsets now come from the pre-window bucket counts, which
    // the window cannot change)
    val qs = (1 until buckets).map(i => i.toDouble / buckets).mkString(", ")
    val bndRow = keyed.agg(
      expr(s"approx_percentile(_gok0, array($qs), 10000)").as("_gbnd0"),
      idx.drop(1).map(i =>
        expr(s"approx_percentile(_gok$i, array($qs), 10000)").as(s"_gbnd$i")) :+
        count(lit(1)).as("_gtot"): _*).head
    val tot = bndRow.getLong(idx.size)
    val withBuckets = idx.foldLeft(keyed) { (b, i) =>
      val bnds =
        if (bndRow.isNullAt(i)) Seq.empty[Long] else bndRow.getSeq[Long](i)
      b.withColumn(s"_gb$i",
        if (bnds.isEmpty) lit(0L)
        else expr(
          s"graft_bucket(_gok$i, array(${bnds.map(_ + "L").mkString(",")}))"))
    }
    // action 2: every metric's per-bucket counts in ONE exploded pass
    // over the cached keyed frame (fan x specs rows to the driver)
    val cnts = withBuckets.select(explode(array(idx.map(i =>
        struct(lit(i).as("_gsp"), col(s"_gb$i").as("_gbv"))): _*)).as("_ge"))
      .groupBy(col("_ge._gsp").as("_gsp"), col("_ge._gbv").as("_gbv"))
      .agg(count(lit(1)).as("_gcnt"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2))))
    val offsBySpec = idx.map(i =>
      prefixOffsets(cnts.collect { case (sp, e) if sp == i => e }.toSeq))
    val banded = idx.foldLeft(withBuckets) { (cur, i) =>
      val n = specs(i)._1
      val wloc = Window.partitionBy(col(s"_gb$i"))
        .orderBy(col(s"_gok$i") +: ties: _*)
      val offExpr =
        if (offsBySpec(i).isEmpty) lit(0L)
        else coalesce(element_at(
          map(offsBySpec(i).flatMap { case (b, o) => Seq(lit(b), lit(o)) }: _*),
          col(s"_gb$i")), lit(0L))
      cur.withColumn("_gntrn",
          row_number().over(wloc).cast("long") + offExpr)
        .withColumn(specs(i)._3, expr(
          // BIGINT literals: a bare INT literal would fold the
          // (tot % n) * (tot div n + 1) product in 32-bit arithmetic
          // and silently wrap for corpus-scale totals
          s"""CASE WHEN _gntrn <= (${tot}L % $n) * (${tot}L div $n + 1)
                THEN (_gntrn - 1) div (${tot}L div $n + 1) + 1
                ELSE (${tot}L % $n) + (_gntrn - 1 - (${tot}L % $n) * (${tot}L div $n + 1))
                       div greatest(${tot}L div $n, 1) + 1 END"""))
        .drop("_gntrn")
    }
    banded.drop(idx.flatMap(i => Seq(s"_gok$i", s"_gb$i")): _*)
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
      leadCols: Seq[String], suffix: String = "_nx"): DataFrame =
    lead1Impl(bucketed(df, key), col("_gok") +: ties, leadCols, suffix)

  /** As [[lead1]], but with a CALLER-SUPPLIED bucket column instead of
    * the quantile sketch — for keys the caller knows to be near-uniform
    * (e.g. suffix-array ranks over 1..N, whose producer exports `_sab`),
    * where the approx_percentile pass is a pure extra corpus aggregate.
    * The caller owns the contract: `bucket` must be a monotone function
    * of the (key, ties) order that never splits key ties.
    */
  def lead1With(df: DataFrame, bucket: Column, sort: Seq[Column],
      leadCols: Seq[String], suffix: String = "_nx"): DataFrame =
    lead1Impl(cut(df.withColumn("_gok", lit(0L))
      .withColumn("_gb", bucket.cast("long"))), sort, leadCols, suffix)

  private def lead1Impl(bdf: DataFrame, sort: Seq[Column],
      leadCols: Seq[String], suffix: String): DataFrame = {
    val wloc = Window.partitionBy(col("_gb")).orderBy(sort: _*)
    // SINGLE-PASS seam patch for atomic lead columns (r18, guide §5/§2.4):
    // each bucket's first row — the value the previous bucket's LAST row
    // needs as its lead — is min_by over the sort tuple on the PRE-window
    // frame, one bounded collect; the seam substitution is then a
    // row-local literal CASE evaluated only on seam rows. The old shape
    // checkpointed the whole WINDOWED frame (at the 300x suffix corpus a
    // multi-GB materialization) and re-read it three times through a
    // union + broadcast join. min_by's struct ordering is ascending
    // lexicographic — exactly the orderBy(sort) contract (all helpers
    // pass plain ascending columns; a SortOrder inside struct() fails
    // analysis loudly, never silently misorders).
    val atomic = {
      import org.apache.spark.sql.types._
      leadCols.forall(c => bdf.schema(c).dataType match {
        case LongType | IntegerType | ShortType | ByteType | BooleanType |
             StringType | DoubleType | FloatType | DateType |
             TimestampType => true
        case _: DecimalType => true
        case _ => false
      })
    }
    if (atomic) {
      val firstRows = bdf
        .groupBy(col("_gb").cast("long").as("_gbl"))
        .agg(min_by(struct(leadCols.map(col): _*), struct(sort: _*)).as("_gfx"))
        .collect().map(r => (r.getLong(0), r.getStruct(1))).sortBy(_._1)
      // bucket -> the NEXT non-empty bucket's first row (empty buckets
      // have no seam rows, so consecutive-present pairing bridges them)
      val nexts = firstRows.sliding(2).collect {
        case Array((b, _), (_, nxt)) => (b, nxt)
      }.toSeq
      // literal-MAP lookup, not a CASE chain (r18): fan-1 whens per lead
      // column blew the generated method past the 64KB Janino limit at a
      // 256 fan and the whole stage fell back to interpreted execution;
      // a constant-folded map is one expression node, and element_at
      // only evaluates on seam rows. NULL next-values are simply absent
      // from the map — an element_at miss IS null.
      def patchFor(c: String, j: Int): Column = {
        val dt = bdf.schema(c).dataType
        val entries = nexts.collect { case (b, row) if !row.isNullAt(j) =>
          Seq(lit(b), lit(row.get(j)).cast(dt))
        }.flatten
        if (entries.isEmpty) lit(null).cast(dt)
        else element_at(map(entries: _*), col("_gb").cast("long"))
      }
      val withSent = bdf.withColumn("_ghn", lead(lit(1), 1).over(wloc))
      leadCols.zipWithIndex.foldLeft(withSent) { case (b, (c, j)) =>
        b.withColumn(c + suffix,
          when(col("_ghn").isNotNull, lead(col(c), 1).over(wloc))
            .otherwise(patchFor(c, j)))
      }.drop("_gok", "_gb", "_ghn")
    } else {
      // legacy union/join shape for non-atomic lead columns (arrays,
      // structs — literal re-embedding is not type-safe for those)
      val base0 = bdf
        .withColumn("_grn", row_number().over(wloc))
        // sentinel marking "has an in-bucket successor" — leadCols
        // themselves may legitimately hold NULLs
        .withColumn("_ghn", lead(lit(1), 1).over(wloc))
      val base = cut(leadCols.foldLeft(base0) { (b, c) =>
        b.withColumn(c + suffix, lead(col(c), 1).over(wloc))
      })
      // first row of each bucket, keyed by the PREVIOUS non-empty bucket
      // (lag over the <=fan-row per-bucket frame bridges empty buckets)
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
}
