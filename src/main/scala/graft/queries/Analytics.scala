package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables

/** Decision-analytics operators: rank statistics, Pareto frontiers,
  * forecasting smoothers, sequence mining, CDC merge and privacy audits.
  *
  * The reference pipeline's analytical surface is count/group-by/limit
  * (reference: demos/duckdb.tape:10-34); these queries extend the engine
  * with the statistics an experimentation / data-governance team runs on
  * the same tables, following the repo-wide oracle-parity contract: every
  * derived double leaves as a Q.scaledLong BIGINT or is produced by an
  * identical expression tree in both engines, every output ordering is a
  * total order.
  *
  * Scale notes (100 TB design): each query aggregates the fact table to a
  * bounded domain FIRST (distinct metric values, the 31-day grid, the
  * digit domain, QI groups) and runs its windows/joins on that bounded
  * frame — never a window over the raw fact. The one global-order window
  * (skyline, Mann-Whitney) is over the bounded domain; at cluster scale
  * that frame is range-partitioned with per-range prefix merges, and the
  * declared plan keeps that swap local to the window stage.
  */
object Analytics extends QueryPack {
  import Q._

  /** 2*pi as ONE literal shared by both dialects (the periodogram's
    * cos/sin arguments must be the identical expression text).
    */
  private val TwoPi = "6.283185307179586"

  def defs: Map[String, QueryDef] = Map(

    // EXACT two-sample Mann-Whitney U (rank-sum) between the value
    // distributions of two event types — the nonparametric A/B test an
    // experimentation pipeline runs when the metric is skewed and a
    // t-test's normality assumption fails. Complements stats_ks_two_sample
    // (sup-distance) with the rank statistic, and its normalization
    // U/(n1*n2) IS the AUC of "does a click value exceed a view value" —
    // the probabilistic effect size. Entirely integer via the doubled-rank
    // trick: with ties, the average rank of a tied block is
    // (2*c_prev + cnt + 1)/2, so TWICE the rank-sum stays a BIGINT
    // (2*R1 = sum a*(2*c_prev + cnt + 1)) and 2*U1 = 2*R1 - n1*(n1+1)
    // is exact; ties are handled by construction, not approximation.
    //
    // Scale shape: one groupBy(value) of the filtered fact (values
    // quantize to cents, so the domain is bounded), then the cumulative
    // runs DISTRIBUTED over distinct values via GlobalOrder.runningSum
    // — the same contract as the KS test next to it.
    "stats_mann_whitney" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "view"))
          .select(expr(Q.scaledLong("value", 2)).as("v"),
            (col("event_type") === "click").cast("long").as("isa"))
        val byV = ev.groupBy(col("v"))
          .agg(sum(col("isa")).as("a"), sum(lit(1L) - col("isa")).as("b"))
          .persistScoped()
        // distributed cumulative; n1/n2 = the running sums' grand totals,
        // already on the driver from the per-bucket offset collect (r18)
        // — the old broadcast `tot` aggregate and its crossJoin drop
        // out. call = c1 + c2 exactly (BIGINT addition is associative,
        // so the split cumulatives sum to the old a+b cumulative).
        val (cum, totals) = graft.engine.ops.GlobalOrder
          .runningSumsTotals(byV, col("v"), Nil,
            Seq(col("a") -> "c1", col("b") -> "c2"))
        val (n1, n2) = (totals.head, totals(1))
        cum
          .withColumn("call", col("c1") + col("c2"))
          // doubled rank-sum contribution of this tied block to sample A:
          // block spans ranks (call-a-b, call]; avg rank doubled is
          // 2*(call-a-b) + (a+b) + 1
          .withColumn("r2c",
            col("a") * (lit(2L) * (col("call") - col("a") - col("b"))
              + col("a") + col("b") + lit(1L)))
          .agg(sum(col("r2c")).as("r1x2"))
          // empty-input faithfulness: min(n1)/min(n2) were NULL over an
          // empty frame (r1x2 IS NULL iff the frame was empty)
          .selectExpr(
            s"CASE WHEN r1x2 IS NULL THEN CAST(NULL AS BIGINT) ELSE ${n1}L END AS n1",
            s"CASE WHEN r1x2 IS NULL THEN CAST(NULL AS BIGINT) ELSE ${n2}L END AS n2",
            s"r1x2 - ${n1}L * (${n1}L + 1) AS u2",
            s"${Q.scaledLong(
              s"CAST(r1x2 - ${n1}L * (${n1}L + 1) AS DOUBLE) / (2.0 * CAST(${n1}L AS DOUBLE) * CAST(${n2}L AS DOUBLE))",
              6)} AS auc_e6")
      },
      Some(s"""
        WITH ev AS (
          SELECT ${Q.scaledLong("value", 2)} AS v,
                 CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa
          FROM events WHERE event_type IN ('click', 'view')),
        byv AS (
          SELECT v, CAST(sum(isa) AS BIGINT) AS a,
                 CAST(sum(1 - isa) AS BIGINT) AS b
          FROM ev GROUP BY v),
        cum AS (
          SELECT a, b,
                 CAST(sum(a + b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS BIGINT) AS call,
                 CAST(sum(a) OVER () AS BIGINT) AS n1,
                 CAST(sum(b) OVER () AS BIGINT) AS n2
          FROM byv),
        agg AS (
          SELECT CAST(min(n1) AS BIGINT) AS n1, CAST(min(n2) AS BIGINT) AS n2,
                 CAST(sum(a * (2 * (call - a - b) + a + b + 1)) AS BIGINT) AS r1x2
          FROM cum)
        SELECT n1, n2, CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u2,
               ${Q.scaledLong(
          "CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))",
          6)} AS auc_e6
        FROM agg""")),

    // 2-D Pareto frontier (skyline) of parts on (cheaper price, larger
    // size): a part survives iff no other part is at-least-as-good on
    // both axes and strictly better on one — the multi-objective shortlist
    // operator behind "best tradeoff" product queries. The textbook
    // formulation is a quadratic NOT EXISTS self-join; the declared plan
    // is the O(n log n) sweep: aggregate to per-price max size, one
    // cumulative-max window over DISTINCT prices ascending, and a part is
    // dominated iff a strictly cheaper price already reached its size
    // (run >= size) or its own price group holds a strictly larger size
    // (mx > size). Equal (price, size) twins survive together — no strict
    // improvement either way.
    //
    // Scale shape: one groupBy(price) of parts, the window runs over the
    // distinct-price frame, and the final join back to parts is an
    // equi-join on price — nothing quadratic anywhere; the prefix-max
    // sweep runs range-bucketed with per-range max merges
    // (GlobalOrder.runningMaxExclusive, r9) in the declared plan.
    "skyline_parts" -> QueryDef(
      (s, d) => {
        val p = Tables.part(s, d)
          .selectExpr("p_partkey",
            s"${Q.scaledLong("p_retailprice", 2)} AS price_c",
            "CAST(p_size AS BIGINT) AS size")
          .persistScoped()
        // distributed exclusive-prior running max (r9, was an
        // unpartitioned window over the distinct-price frame)
        val perPrice = graft.engine.ops.GlobalOrder.runningMaxExclusive(
          p.groupBy(col("price_c")).agg(max(col("size")).as("mx")),
          col("price_c"), Nil, col("mx"), "run")
        p.join(perPrice, Seq("price_c"))
          .where(coalesce(col("run"), lit(Long.MinValue)) < col("size") &&
            col("mx") <= col("size"))
          .select(col("p_partkey"), col("price_c"), col("size"))
          .orderBy(col("price_c"), col("p_partkey"))
      },
      Some(s"""
        WITH p AS (
          SELECT p_partkey, ${Q.scaledLong("p_retailprice", 2)} AS price_c,
                 CAST(p_size AS BIGINT) AS size
          FROM part),
        pp AS (
          SELECT price_c, CAST(max(size) AS BIGINT) AS mx
          FROM p GROUP BY price_c),
        sweep AS (
          SELECT price_c, mx,
                 CAST(max(mx) OVER (ORDER BY price_c ROWS BETWEEN UNBOUNDED
                   PRECEDING AND 1 PRECEDING) AS BIGINT) AS run
          FROM pp)
        SELECT p.p_partkey, p.price_c, p.size
        FROM p JOIN sweep s ON p.price_c = s.price_c
        WHERE coalesce(s.run, ${Long.MinValue}) < p.size AND s.mx <= p.size
        ORDER BY p.price_c, p.p_partkey""")),

    // Benford first-digit audit of order totals — the fraud / synthetic-
    // data detector finance and data-quality teams run on monetary
    // columns: naturally-occurring amounts follow P(d) = log10(1 + 1/d),
    // and a uniform generator (like this synthetic corpus) visibly does
    // not — the per-digit deviation IS the signal the audit reports. The
    // first digit comes from the decimal rendering of the exact cents
    // BIGINT (substr of an integer string is portable; no float log10 on
    // the data path), and observed share, expected share, and the chi2
    // contribution leave as e6-scaled BIGINTs.
    //
    // Scale shape: one 9-group aggregation of orders; the expected-share
    // join is against a constant 9-row frame. Nothing else.
    "quality_benford" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d)
          .selectExpr(s"CAST(substr(CAST(${Q.scaledLong("o_totalprice", 2)} AS STRING), 1, 1) AS BIGINT) AS digit")
        val n = o.groupBy(col("digit")).agg(count(lit(1)).as("n"))
        val tot = n.agg(sum(col("n")).as("total"))
        n.crossJoin(broadcast(tot))
          .selectExpr("digit", "n",
            s"${Q.scaledLong("CAST(n AS DOUBLE) / CAST(total AS DOUBLE)", 6)} AS p_e6",
            s"${Q.scaledLong("log10(1.0 + 1.0 / CAST(digit AS DOUBLE))", 6)} AS benford_e6",
            s"${Q.scaledLong(
              "pow(CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 2.0) / (CAST(total AS DOUBLE) * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))",
              2)} AS chi2_e2")
          .orderBy(col("digit"))
      },
      Some(s"""
        WITH o AS (
          SELECT CAST(substr(CAST(${Q.scaledLong("o_totalprice", 2)} AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM orders),
        n AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM o GROUP BY digit),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM n)
        SELECT digit, n,
               ${Q.scaledLong("CAST(n AS DOUBLE) / CAST(total AS DOUBLE)", 6)} AS p_e6,
               ${Q.scaledLong("log10(1.0 + 1.0 / CAST(digit AS DOUBLE))", 6)} AS benford_e6,
               ${Q.scaledLong(
          "pow(CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 2.0) / (CAST(total AS DOUBLE) * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))",
          2)} AS chi2_e2
        FROM n CROSS JOIN t ORDER BY digit""")),

    // EXACT double exponential smoothing (Brown's method, alpha = 1/2)
    // of the daily count series per event type — the trend + level
    // forecaster one step up from time_ema_counts' single smoother: the
    // second-order series S2 closes to M_t / 2^(t+1) where M_t is the
    // prefix sum of time_ema's shifted-count numerators N_t, so BOTH
    // smoothers are exact BIGINT prefix sums divided by powers of two
    // (exact in binary floating point), and the derived level
    // (2*S1 - S2) and trend (S1 - S2) hash-match across engines with no
    // tolerance — the property that makes a forecast regression-testable.
    //
    // Scale shape: one fact aggregation to the bounded days-x-types grid;
    // two stacked prefix windows run on the grid, never the fact.
    "time_holt_trend" -> QueryDef(
      (s, d) => {
        val spine = s.range(1)
          .select(explode(expr(
            "sequence(DATE'2024-01-01', DATE'2024-01-31', INTERVAL 1 DAY)"))
            .as("day"))
          .crossJoin(Tables.events(s, d).select(col("event_type")).distinct())
        val daily = Tables.events(s, d)
          .groupBy(to_date(col("ts").cast("timestamp")).as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("c"))
        val wCum = Window.partitionBy(col("event_type")).orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine
          .join(broadcast(daily), Seq("day", "event_type"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
          .withColumn("k", expr("datediff(day, DATE'2024-01-01') + 1"))
          .withColumn("num",
            sum(expr("c * shiftleft(CAST(1 AS BIGINT), k - 1)")).over(wCum))
          .withColumn("m", sum(col("num")).over(wCum))
          .selectExpr("day", "event_type", "c",
            s"${Q.scaledLong(
              "2.0 * CAST(num AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), k) AS DOUBLE) - CAST(m AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), k + 1) AS DOUBLE)",
              6)} AS level_e6",
            s"${Q.scaledLong(
              "CAST(num AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), k) AS DOUBLE) - CAST(m AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), k + 1) AS DOUBLE)",
              6)} AS trend_e6")
          .orderBy(col("day"), col("event_type"))
      },
      Some(s"""
        WITH spine AS (
          SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31',
                        INTERVAL 1 DAY))::DATE AS day),
        grid AS (
          SELECT day, event_type FROM spine
          CROSS JOIN (SELECT DISTINCT event_type FROM events)),
        daily AS (
          SELECT CAST(ts AS DATE) AS day, event_type,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        g AS (
          SELECT gr.day, gr.event_type, coalesce(d.c, 0) AS c,
                 datediff('day', DATE '2024-01-01', gr.day) + 1 AS k
          FROM grid gr LEFT JOIN daily d
            ON gr.day = d.day AND gr.event_type = d.event_type),
        s1 AS (
          SELECT day, event_type, c, k,
                 CAST(sum(c * (CAST(1 AS BIGINT) << (k - 1))) OVER (
                   PARTITION BY event_type ORDER BY k ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS BIGINT) AS num
          FROM g),
        s2 AS (
          SELECT day, event_type, c, k, num,
                 CAST(sum(num) OVER (PARTITION BY event_type ORDER BY k ROWS
                   BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS m
          FROM s1)
        SELECT day, event_type, c,
               ${Q.scaledLong(
          "2.0 * CAST(num AS DOUBLE) / CAST((CAST(1 AS BIGINT) << k) AS DOUBLE) - CAST(m AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (k + 1)) AS DOUBLE)",
          6)} AS level_e6,
               ${Q.scaledLong(
          "CAST(num AS DOUBLE) / CAST((CAST(1 AS BIGINT) << k) AS DOUBLE) - CAST(m AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (k + 1)) AS DOUBLE)",
          6)} AS trend_e6
        FROM s2 ORDER BY day, event_type""")),

    // Top user journey prefixes: each user's first four events (by event
    // time, event_id tie-break) joined into a path string, counted across
    // users, top 20 — the "how do users start" sequence-mining view that
    // complements events_markov_transition's one-step matrix with ordered
    // multi-step prefixes. concat_ws skips the missing slots of users
    // with fewer than four events, exactly like the oracle's ordered
    // string_agg over present rows.
    //
    // Scale shape: the rank window partitions by user (high cardinality,
    // bounded state), the path aggregation is one user-keyed groupBy of
    // four-row groups, and the final count feeds TakeOrderedAndProject —
    // never a global sort of the paths frame.
    "events_top_paths" -> QueryDef(
      (s, d) => {
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("tus"), col("event_id"))
        val firsts = Tables.events(s, d)
          .select(col("user_id"), epochUs(col("ts")).as("tus"),
            col("event_id"), col("event_type"))
          .withColumn("rn", row_number().over(wOrd))
          .where(col("rn") <= 4)
        firsts.groupBy(col("user_id"))
          .agg(concat_ws(">",
            max(when(col("rn") === 1, col("event_type"))),
            max(when(col("rn") === 2, col("event_type"))),
            max(when(col("rn") === 3, col("event_type"))),
            max(when(col("rn") === 4, col("event_type")))).as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("path"))
          .limit(20)
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS tus, event_id, event_type FROM events),
        r AS (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY tus, event_id) AS rn
          FROM e),
        p AS (
          SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
          FROM r WHERE rn <= 4 GROUP BY user_id)
        SELECT path, CAST(count(*) AS BIGINT) AS n_users
        FROM p GROUP BY path ORDER BY n_users DESC, path LIMIT 20""")),

    // Batch CDC MERGE (SCD1 upsert): apply a deterministic changeset —
    // updates (key % 97), deletes (key % 101, winning over update on
    // collision), inserts (key % 103, shifted to fresh keys) — to the
    // customer snapshot in ONE full-outer join, the engine-agnostic MERGE
    // INTO shape (reference's streaming upsert is the same last-write-wins
    // semantics per micro-batch, src/consumer/data_sinks.py; this is its
    // batch twin over a whole changeset). The post-merge state exits as a
    // per-nation rowcount + balance checksum.
    //
    // Scale shape: both sides shuffle once on the merge key (at 100 TB:
    // co-bucket snapshot and changeset on key to make this a zero-shuffle
    // sort-merge); the verdict logic is a row-local CASE.
    "merge_scd1_batch" -> QueryDef(
      (s, d) => {
        val snap = Tables.customer(s, d)
          .selectExpr("c_custkey AS k", "CAST(c_nationkey AS BIGINT) AS nk",
            s"${Q.scaledLong("c_acctbal", 2)} AS bal_c")
        val del = snap.where(col("k") % 101 === 0)
          .selectExpr("k", "'D' AS op", "CAST(NULL AS BIGINT) AS nbal",
            "CAST(NULL AS BIGINT) AS ink")
        val upd = snap.where(col("k") % 97 === 0 && col("k") % 101 =!= 0)
          .selectExpr("k", "'U' AS op", "k * 100 AS nbal",
            "CAST(NULL AS BIGINT) AS ink")
        // Insert keys are NEGATED snapshot keys: c_custkey >= 1 at every
        // scale factor, so -k is a keyspace disjoint from the snapshot by
        // construction — a fixed "+10M" offset would collide with real
        // keys from roughly sf67 and silently turn inserts into
        // overwrites in the full-outer merge.
        val ins = snap.where(col("k") % 103 === 0)
          .selectExpr("-k AS k", "'I' AS op", "k AS nbal", "nk AS ink")
        val merged = snap
          .join(del.unionByName(upd).unionByName(ins), Seq("k"), "full_outer")
          .where(coalesce(col("op"), lit("_")) =!= "D")
          .selectExpr("coalesce(nk, ink) AS nk",
            "CASE WHEN op IN ('U', 'I') THEN nbal ELSE bal_c END AS bal")
        merged.groupBy(col("nk"))
          .agg(count(lit(1)).as("n_rows"), sum(col("bal")).as("bal_c"))
          .orderBy(col("nk"))
      },
      Some(s"""
        WITH snap AS (
          SELECT c_custkey AS k, CAST(c_nationkey AS BIGINT) AS nk,
                 ${Q.scaledLong("c_acctbal", 2)} AS bal_c
          FROM customer),
        ch AS (
          SELECT k, 'D' AS op, CAST(NULL AS BIGINT) AS nbal,
                 CAST(NULL AS BIGINT) AS ink
          FROM snap WHERE k % 101 = 0
          UNION ALL
          SELECT k, 'U', k * 100, CAST(NULL AS BIGINT)
          FROM snap WHERE k % 97 = 0 AND k % 101 <> 0
          UNION ALL
          SELECT -k, 'I', k, nk FROM snap WHERE k % 103 = 0),
        m AS (
          SELECT coalesce(s.nk, c.ink) AS nk,
                 CASE WHEN c.op IN ('U', 'I') THEN c.nbal ELSE s.bal_c END AS bal
          FROM snap s FULL OUTER JOIN ch c ON s.k = c.k
          WHERE c.op IS NULL OR c.op <> 'D')
        SELECT nk, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(bal) AS BIGINT) AS bal_c
        FROM m GROUP BY nk ORDER BY nk""")),

    // Welch's unequal-variance t-test between the click and view value
    // distributions — the parametric companion to stats_mann_whitney
    // (ranks) and stats_ks_two_sample (CDF distance): the trio is the
    // standard A/B readout. Every moment is an EXACT BIGINT sufficient
    // statistic of the cents-quantized metric (n, sum, sum-of-squares
    // accumulate associatively — the two-phase shape that makes the test
    // mergeable across partitions and across days at 100 TB), and the t
    // statistic plus the Welch-Satterthwaite degrees of freedom are
    // computed from those integers through one identical expression tree
    // in both engines, leaving e6-scaled.
    "stats_ttest_welch" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "view"))
          .select(expr(Q.scaledLong("value", 2)).as("v"),
            (col("event_type") === "click").cast("long").as("isa"))
        val stats = ev.groupBy(col("isa"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sx"),
            sum(col("v") * col("v")).as("sxx"))
        val a = stats.where(col("isa") === 1)
          .selectExpr("n AS n1", "sx AS sx1", "sxx AS sxx1")
        val b = stats.where(col("isa") === 0)
          .selectExpr("n AS n2", "sx AS sx2", "sxx AS sxx2")
        val se1 = "((CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)"
        val se2 = "((CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE)"
        a.crossJoin(broadcast(b))
          .selectExpr("n1", "n2",
            s"${Q.scaledLong(
              s"(CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / sqrt($se1 + $se2)",
              6)} AS t_e6",
            s"${Q.scaledLong(
              s"pow($se1 + $se2, 2.0) / (pow($se1, 2.0) / (CAST(n1 AS DOUBLE) - 1.0) + pow($se2, 2.0) / (CAST(n2 AS DOUBLE) - 1.0))",
              3)} AS df_e3")
      },
      Some {
        val se1 = "((CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)"
        val se2 = "((CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE)"
        s"""
        WITH ev AS (
          SELECT ${Q.scaledLong("value", 2)} AS v,
                 CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa
          FROM events WHERE event_type IN ('click', 'view')),
        st AS (
          SELECT isa, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sx,
                 CAST(sum(v * v) AS BIGINT) AS sxx
          FROM ev GROUP BY isa),
        ab AS (
          SELECT a.n AS n1, a.sx AS sx1, a.sxx AS sxx1,
                 b.n AS n2, b.sx AS sx2, b.sxx AS sxx2
          FROM (SELECT * FROM st WHERE isa = 1) a
          CROSS JOIN (SELECT * FROM st WHERE isa = 0) b)
        SELECT n1, n2,
               ${Q.scaledLong(
          s"(CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / sqrt($se1 + $se2)",
          6)} AS t_e6,
               ${Q.scaledLong(
          s"pow($se1 + $se2, 2.0) / (pow($se1, 2.0) / (CAST(n1 AS DOUBLE) - 1.0) + pow($se2, 2.0) / (CAST(n2 AS DOUBLE) - 1.0))",
          3)} AS df_e3
        FROM ab"""
      }),

    // Lag-k autocorrelation (k = 1 and 7) of the daily event-count
    // series per event type — the seasonality probe a forecasting
    // pipeline runs before choosing a model (lag-7 spikes = weekly
    // cycle; lag-1 = momentum). Counts live on the zero-filled 31-day
    // calendar grid (a silent day is a real observation, same contract
    // as time_ema_counts), every Pearson moment over the (x_t, x_{t-k})
    // pairs is an exact BIGINT (n*sxy - sx*sy etc.), and r leaves as the
    // integer-moment ratio through one identical expression tree,
    // e6-scaled.
    //
    // Scale shape: one fact aggregation to the bounded grid; the lag
    // window and the per-(type, lag) Pearson fold both run on the grid.
    "time_autocorr" -> QueryDef(
      (s, d) => {
        val spine = s.range(1)
          .select(explode(expr(
            "sequence(DATE'2024-01-01', DATE'2024-01-31', INTERVAL 1 DAY)"))
            .as("day"))
          .crossJoin(Tables.events(s, d).select(col("event_type")).distinct())
        val daily = Tables.events(s, d)
          .groupBy(to_date(col("ts").cast("timestamp")).as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("c"))
        val grid = spine
          .join(broadcast(daily), Seq("day", "event_type"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
        val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
        val lagged = Seq(1, 7).map { k =>
          grid.withColumn("x", lag(col("c"), k).over(wOrd))
            .where(col("x").isNotNull)
            .withColumn("lag", lit(k.toLong))
        }.reduce(_ unionByName _)
        val rNum = "CAST(n * sxy - sx * sy AS DOUBLE)"
        val rDen = "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))"
        lagged.groupBy(col("event_type"), col("lag"))
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sy"),
            sum(col("x")).as("sx"), sum(col("c") * col("c")).as("syy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("c")).as("sxy"))
          .selectExpr("event_type", "lag", "n",
            s"${Q.scaledLong(s"$rNum / $rDen", 6)} AS r_e6")
          .orderBy(col("event_type"), col("lag"))
      },
      Some {
        val rNum = "CAST(n * sxy - sx * sy AS DOUBLE)"
        val rDen = "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))"
        s"""
        WITH spine AS (
          SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31',
                        INTERVAL 1 DAY))::DATE AS day),
        grid AS (
          SELECT day, event_type FROM spine
          CROSS JOIN (SELECT DISTINCT event_type FROM events)),
        daily AS (
          SELECT CAST(ts AS DATE) AS day, event_type,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        g AS (
          SELECT gr.day, gr.event_type, coalesce(d.c, 0) AS c
          FROM grid gr LEFT JOIN daily d
            ON gr.day = d.day AND gr.event_type = d.event_type),
        lagged AS (
          SELECT event_type, CAST(k AS BIGINT) AS lag, c,
                 lag(c, k) OVER (PARTITION BY event_type, k ORDER BY day) AS x
          FROM g CROSS JOIN (SELECT unnest([1, 7]) AS k)),
        mo AS (
          SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(c) AS BIGINT) AS sy, CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(c * c) AS BIGINT) AS syy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(x * c) AS BIGINT) AS sxy
          FROM lagged WHERE x IS NOT NULL GROUP BY event_type, lag)
        SELECT event_type, lag, n, ${Q.scaledLong(s"$rNum / $rDen", 6)} AS r_e6
        FROM mo ORDER BY event_type, lag"""
      }),

    // RFM segmentation — the classic customer-value grid: per user,
    // Recency (days from last event to the 2024-02-01 reference),
    // Frequency (event count) and Monetary (cents sum) each quintile-
    // banded, the three quintiles concatenated into the 111..555 segment
    // code, and the cohort sizes + monetary mass reported per segment.
    // Quintile assignment orders by the integer metric with user_id
    // tie-break, so banding is deterministic and engine-identical.
    //
    // Scale shape: one user-keyed aggregation of the fact, then three
    // DISTRIBUTED quintile assignments over the per-USER frame via
    // GlobalOrder.ntileCol (r9, was three unpartitioned ntile windows —
    // users grow with the corpus, so each window was a single-task
    // funnel at 100x; descending orders ride key negation, ntile
    // semantics reproduced exactly).
    "events_rfm_segmentation" -> QueryDef(
      (s, d) => {
        val u = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(
            expr("datediff(DATE'2024-02-01', max(to_date(CAST(ts AS TIMESTAMP))))")
              .as("r_days"),
            count(lit(1)).as("f"),
            sum(expr(Q.scaledLong("value", 2))).as("m_c"))
        // fused r10: one boundary/count pass + one broadcast for all
        // three quintiles (was three chained ntileCol calls, each with
        // its own corpus passes)
        val banded = graft.engine.ops.GlobalOrder.ntileCols(
          u, Seq(col("user_id")),
          Seq((5, col("r_days"), "rq"), (5, -col("f"), "fq"),
            (5, -col("m_c"), "mq")))
        banded
          .selectExpr("CAST(rq * 100 + fq * 10 + mq AS BIGINT) AS segment", "m_c")
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n_users"), sum(col("m_c")).as("m_sum_c"))
          .orderBy(col("segment"))
      },
      Some(s"""
        WITH u AS (
          SELECT user_id,
                 datediff('day', CAST(max(ts) AS DATE), DATE '2024-02-01') AS r_days,
                 CAST(count(*) AS BIGINT) AS f,
                 CAST(sum(${Q.scaledLong("value", 2)}) AS BIGINT) AS m_c
          FROM events GROUP BY user_id),
        b AS (
          SELECT m_c,
                 ntile(5) OVER (ORDER BY r_days, user_id) AS rq,
                 ntile(5) OVER (ORDER BY f DESC, user_id) AS fq,
                 ntile(5) OVER (ORDER BY m_c DESC, user_id) AS mq
          FROM u)
        SELECT CAST(rq * 100 + fq * 10 + mq AS BIGINT) AS segment,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(m_c) AS BIGINT) AS m_sum_c
        FROM b GROUP BY 1 ORDER BY segment""")),

    // ABC / Pareto classification of parts by revenue — the 80/95 cut
    // inventory and curation teams run to split a catalog into the vital
    // few (A: first 80% of cumulative revenue), the moderate middle (B:
    // to 95%) and the long tail (C). The cumulative share test is pure
    // BIGINT cross-multiplication (cum*5 <= total*4, cum*20 <= total*19)
    // — no division on the classification path, so the boundary part is
    // classified identically in both engines.
    //
    // Scale shape: one part-keyed aggregation of lineitem, then the
    // cumulative revenue comes from GlobalOrder.runningSum (r9, was an
    // unpartitioned cumulative window — parts grow with the corpus, so
    // the single-task window dies at 100x; descending order rides key
    // negation) and a 3-row rollup; the grand total joins in as a
    // broadcast 1-row frame.
    "orders_abc_pareto" -> QueryDef(
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .groupBy(col("l_partkey"))
          .agg(sum(expr(Q.scaledLong("l_extendedprice", 2))).as("rev_c"))
        // total = the running sum's grand total, already on the driver
        // from the per-bucket offset collect (r18; the r17 max(cum)
        // branch re-executed the whole cumulative plan for one scalar
        // once runningSum stopped checkpointing internally) — embedded
        // as a literal, so the stitched frame is consumed exactly once.
        // Same BIGINT (the inclusive monotone cumulative ends at the
        // grand sum), same output values.
        val (cum, total) = graft.engine.ops.GlobalOrder
          .runningSumTotal(rev, -col("rev_c"), Seq(col("l_partkey")), col("rev_c"), "cum")
        cum
          .selectExpr(
            s"CASE WHEN cum * 5 <= ${total}L * 4 THEN 'A' WHEN cum * 20 <= ${total}L * 19 THEN 'B' ELSE 'C' END AS cls",
            "rev_c")
          .groupBy(col("cls"))
          .agg(count(lit(1)).as("n_parts"), sum(col("rev_c")).as("rev_c"))
          .selectExpr("cls", "n_parts", "rev_c",
            s"${Q.scaledLong(s"CAST(rev_c AS DOUBLE) / CAST(${total}L AS DOUBLE)", 6)} AS share_e6")
          .orderBy(col("cls"))
      },
      Some(s"""
        WITH rev AS (
          SELECT l_partkey,
                 CAST(sum(${Q.scaledLong("l_extendedprice", 2)}) AS BIGINT) AS rev_c
          FROM lineitem GROUP BY l_partkey),
        c AS (
          SELECT l_partkey, rev_c,
                 CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey ROWS
                   BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                 CAST(sum(rev_c) OVER () AS BIGINT) AS total
          FROM rev),
        cls AS (
          SELECT CASE WHEN cum * 5 <= total * 4 THEN 'A'
                      WHEN cum * 20 <= total * 19 THEN 'B'
                      ELSE 'C' END AS cls, rev_c, total
          FROM c)
        SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(rev_c) AS BIGINT) AS rev_c,
               ${Q.scaledLong("CAST(sum(rev_c) AS DOUBLE) / CAST(min(total) AS DOUBLE)", 6)} AS share_e6
        FROM cls GROUP BY cls ORDER BY cls""")),

    // Longest consecutive-day activity streak per user (gaps-and-islands
    // via the day-number minus row-number trick: consecutive days share
    // one island id), reported as the streak-length histogram — the
    // engagement-depth metric next to cohort_retention's calendar view.
    // Entirely integer: day numbers, island ids, streak lengths.
    //
    // Scale shape: one distinct over (user, day) — bounded by users x
    // 31 days — then a user-partitioned rank window and two bounded
    // aggregations; the fact is scanned once.
    "events_activity_streaks" -> QueryDef(
      (s, d) => {
        val days = Tables.events(s, d)
          .select(col("user_id"),
            expr("datediff(to_date(CAST(ts AS TIMESTAMP)), DATE'2024-01-01')")
              .as("dnum"))
          .distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("dnum"))
        days.withColumn("grp", col("dnum") - row_number().over(w))
          .groupBy(col("user_id"), col("grp")).agg(count(lit(1)).as("len"))
          .groupBy(col("user_id")).agg(max(col("len")).as("best"))
          .groupBy(col("best").as("streak_len"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("streak_len"))
      },
      Some("""
        WITH days AS (
          SELECT DISTINCT user_id,
                 datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dnum
          FROM events),
        isl AS (
          SELECT user_id, dnum,
                 dnum - row_number() OVER (PARTITION BY user_id ORDER BY dnum) AS grp
          FROM days),
        st AS (
          SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
          FROM isl GROUP BY user_id, grp),
        best AS (
          SELECT user_id, CAST(max(len) AS BIGINT) AS best FROM st GROUP BY user_id)
        SELECT best AS streak_len, CAST(count(*) AS BIGINT) AS n_users
        FROM best GROUP BY best ORDER BY streak_len""")),

    // Gini coefficient of the per-user event-count distribution — the
    // concentration number behind "do power users dominate the corpus":
    // training-data pipelines run the same statistic on per-source and
    // per-domain token counts before deciding caps. Computed by the
    // sorted-rank formula G = 2*Σ(i*c_i)/(n*Σc) - (n+1)/n with ranks
    // assigned by (count, user_id) — every moment is a BIGINT (rank
    // products bounded by n²*max_c), the final expression is one
    // identical tree, e6-scaled.
    //
    // Scale shape: one user-keyed aggregation of the fact, one
    // DISTRIBUTED rank over the per-USER frame via GlobalOrder.rowNumber
    // (r9, was an unpartitioned row_number window — users grow with the
    // corpus), one fold — same contract as the RFM quintiles next to it.
    "events_power_gini" -> QueryDef(
      (s, d) => {
        val u = Tables.events(s, d)
          .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
        graft.engine.ops.GlobalOrder
          .rowNumber(u, col("c"), Seq(col("user_id")), "rk")
          .agg(count(lit(1)).as("n_users"), sum(col("c")).as("total_events"),
            sum(col("rk") * col("c")).as("s1"))
          .selectExpr("n_users", "total_events",
            s"${Q.scaledLong(
              "2.0 * CAST(s1 AS DOUBLE) / (CAST(n_users AS DOUBLE) * CAST(total_events AS DOUBLE)) - (CAST(n_users AS DOUBLE) + 1.0) / CAST(n_users AS DOUBLE)",
              6)} AS gini_e6")
      },
      Some(s"""
        WITH u AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY user_id),
        r AS (
          SELECT c, CAST(row_number() OVER (ORDER BY c, user_id) AS BIGINT) AS rk
          FROM u),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(c) AS BIGINT) AS total_events,
                 CAST(sum(rk * c) AS BIGINT) AS s1
          FROM r)
        SELECT n_users, total_events,
               ${Q.scaledLong(
          "2.0 * CAST(s1 AS DOUBLE) / (CAST(n_users AS DOUBLE) * CAST(total_events AS DOUBLE)) - (CAST(n_users AS DOUBLE) + 1.0) / CAST(n_users AS DOUBLE)",
          6)} AS gini_e6
        FROM m""")),

    // Week-over-week growth per event type — the trend delta a weekly
    // business review reads. Weeks are integer day-number buckets from
    // the fixed 2024-01-01 Monday anchor (datediff div 7: no engine
    // week-numbering convention involved), the previous week arrives by
    // lag over the bounded (type x week) frame, and growth leaves as an
    // e6-scaled ratio (NULL for the first week — no denominator).
    //
    // The day number is shifted +70000 days before the integer division
    // and the week re-based by -10000 after: Spark's `div` truncates
    // toward zero while DuckDB's `//` floors, so a pre-anchor timestamp
    // (negative datediff) would land in different week buckets per
    // engine. On a positive dividend the two agree (same guard as
    // privacy_k_anonymity's bucketing).
    // Multi-touch attribution — the credit-assignment table a marketing
    // warehouse derives from the event stream: for each user's FIRST
    // purchase, the preceding touch events (click/view/signup) split the
    // conversion credit under the three standard models — first-touch
    // (100% to the earliest), last-touch (100% to the latest), linear
    // (1/n each). Touch identity resolves through struct-ordering
    // aggregates (min/max of (tus, event_id, type)) — lexicographic
    // struct comparison gives deterministic ties with NO per-user
    // window; linear credit stays integral as 1000000 div n per touch
    // (truncation is deterministic and engine-identical; the dropped
    // remainder is the documented cost of exactness). Scale shape: two
    // user-keyed aggregates of the fact and one channel-keyed rollup —
    // no windows, no joins wider than user.
    "events_attribution_credit" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), epochUs(col("ts")).as("tus"),
            col("event_id"), col("event_type"))
        val fp = ev.where(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(min(col("tus")).as("p_us"))
        val touches = ev
          .where(col("event_type").isin("click", "view", "signup"))
          .join(fp, Seq("user_id"))
          .where(col("tus") < col("p_us"))
        val perUser = touches
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            min(struct(col("tus"), col("event_id"), col("event_type")))
              .getField("event_type").as("first_ch"),
            max(struct(col("tus"), col("event_id"), col("event_type")))
              .getField("event_type").as("last_ch"))
        val firsts = perUser.groupBy(col("first_ch").as("channel"))
          .agg(count(lit(1)).as("first_touch"))
        val lasts = perUser.groupBy(col("last_ch").as("channel"))
          .agg(count(lit(1)).as("last_touch"))
        val linear = touches
          .join(perUser.select(col("user_id"), col("n")), Seq("user_id"))
          .groupBy(col("event_type").as("channel"))
          .agg(sum(expr("1000000 div n")).as("linear_e6"))
        firsts.join(lasts, Seq("channel"), "full")
          .join(linear, Seq("channel"), "full")
          .selectExpr("channel",
            "CAST(coalesce(first_touch, 0) AS BIGINT) AS first_touch",
            "CAST(coalesce(last_touch, 0) AS BIGINT) AS last_touch",
            "CAST(coalesce(linear_e6, 0) AS BIGINT) AS linear_e6")
          .orderBy(col("channel"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
          FROM events),
        fp AS (
          SELECT user_id, min(tus) AS p_us FROM ev
          WHERE event_type = 'purchase' GROUP BY user_id),
        touches AS (
          SELECT ev.user_id, tus, event_id, event_type
          FROM ev JOIN fp USING (user_id)
          WHERE event_type IN ('click', 'view', 'signup') AND tus < p_us),
        pu AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                 min(struct_pack(t := tus, e := event_id, c := event_type)) AS fr,
                 max(struct_pack(t := tus, e := event_id, c := event_type)) AS lr
          FROM touches GROUP BY user_id),
        f AS (SELECT struct_extract(fr, 'c') AS channel, count(*) AS first_touch
              FROM pu GROUP BY 1),
        l AS (SELECT struct_extract(lr, 'c') AS channel, count(*) AS last_touch
              FROM pu GROUP BY 1),
        lin AS (
          SELECT t.event_type AS channel,
                 CAST(sum(1000000 // n) AS BIGINT) AS linear_e6
          FROM touches t JOIN pu USING (user_id)
          GROUP BY 1)
        SELECT channel,
               CAST(coalesce(first_touch, 0) AS BIGINT) AS first_touch,
               CAST(coalesce(last_touch, 0) AS BIGINT) AS last_touch,
               CAST(coalesce(linear_e6, 0) AS BIGINT) AS linear_e6
        FROM f FULL JOIN l USING (channel) FULL JOIN lin USING (channel)
        ORDER BY channel""")),

    // DFT periodogram over the daily event-count series — the
    // frequency-domain scan (Schuster 1898's periodogram; the classic
    // seasonality detector) complementing time_stl_decompose's fixed
    // weekly model: power at harmonics k = 1..8 of the observation
    // window, reported as the exact-integer day-count series' spectral
    // SHARE per harmonic (ppm of total band power), so the dominant
    // cycle is read off the argmax row. cos/sin ride one identical
    // literal-2-pi expression string in both dialects (the
    // transcendental ULP contract); the ratio rounds once. Scale shape:
    // the fact aggregates to the bounded day grid FIRST; the 8-harmonic
    // cross join and folds run over <= 31 x 8 rows.
    "time_fourier_periodogram" -> QueryDef(
      (s, d) => {
        val byDay = Tables.events(s, d)
          .selectExpr(
            "datediff(to_date(CAST(ts AS TIMESTAMP)), DATE '2024-01-01') AS dd")
          .groupBy(col("dd")).agg(count(lit(1)).as("c"))
        val span = byDay.agg(min(col("dd")).as("d0"),
          (max(col("dd")) - min(col("dd")) + 1).as("nd"))
        val ks = s.range(1, 9).selectExpr("CAST(id AS BIGINT) AS k")
        val pw = byDay.crossJoin(broadcast(span)).crossJoin(broadcast(ks))
          .selectExpr("k",
            s"CAST(c AS DOUBLE) * cos($TwoPi * CAST(k AS DOUBLE) * CAST(dd - d0 AS DOUBLE) / CAST(nd AS DOUBLE)) AS cc",
            s"CAST(c AS DOUBLE) * sin($TwoPi * CAST(k AS DOUBLE) * CAST(dd - d0 AS DOUBLE) / CAST(nd AS DOUBLE)) AS ss")
          .groupBy(col("k"))
          .agg(sum(col("cc")).as("a"), sum(col("ss")).as("b"))
          .selectExpr("k", "a * a + b * b AS p")
        val tot = pw.agg(sum(col("p")).as("ptot"))
        pw.crossJoin(broadcast(tot))
          .selectExpr("k",
            s"${Q.scaledLong("p / ptot", 6)} AS power_ppm")
          .orderBy(col("k"))
      },
      Some(s"""
        WITH byday AS (
          SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dd,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1),
        span AS (
          SELECT min(dd) AS d0, max(dd) - min(dd) + 1 AS nd FROM byday),
        pw AS (
          SELECT k,
                 sum(CAST(c AS DOUBLE) * cos($TwoPi * CAST(k AS DOUBLE) * CAST(dd - d0 AS DOUBLE) / CAST(nd AS DOUBLE))) AS a,
                 sum(CAST(c AS DOUBLE) * sin($TwoPi * CAST(k AS DOUBLE) * CAST(dd - d0 AS DOUBLE) / CAST(nd AS DOUBLE))) AS b
          FROM byday CROSS JOIN span
               CROSS JOIN (SELECT unnest(range(1, 9)) AS k) ks
          GROUP BY k),
        pp AS (SELECT k, a * a + b * b AS p FROM pw),
        tot AS (SELECT sum(p) AS ptot FROM pp)
        SELECT CAST(k AS BIGINT) AS k, ${Q.scaledLong("p / ptot", 6)} AS power_ppm
        FROM pp CROSS JOIN tot ORDER BY k""")),

    "time_wow_growth" -> QueryDef(
      (s, d) => {
        val wk = Tables.events(s, d)
          .groupBy(col("event_type"),
            expr("(datediff(to_date(CAST(ts AS TIMESTAMP)), DATE'2024-01-01') + 70000) div 7 - 10000")
              .as("wk"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("wk"))
        wk.withColumn("prev", lag(col("n"), 1).over(w))
          .selectExpr("event_type", "CAST(wk AS BIGINT) AS wk", "n",
            s"CASE WHEN prev IS NULL THEN NULL ELSE ${Q.scaledLong(
              "CAST(n AS DOUBLE) / CAST(prev AS DOUBLE)", 6)} END AS growth_e6")
          .orderBy(col("event_type"), col("wk"))
      },
      Some(s"""
        WITH wkc AS (
          SELECT event_type,
                 (datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) + 70000) // 7 - 10000 AS wk,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        g AS (
          SELECT event_type, CAST(wk AS BIGINT) AS wk, n,
                 lag(n) OVER (PARTITION BY event_type ORDER BY wk) AS prev
          FROM wkc)
        SELECT event_type, wk, n,
               CASE WHEN prev IS NULL THEN NULL ELSE ${Q.scaledLong(
          "CAST(n AS DOUBLE) / CAST(prev AS DOUBLE)", 6)} END AS growth_e6
        FROM g ORDER BY event_type, wk""")),

    // Two-proportion z-test: weekend vs weekday click-through rate
    // (clicks over clicks+views), pooled-variance z from exact BIGINT
    // counts — the conversion-rate significance readout completing the
    // A/B family (Welch = means, Mann-Whitney = ranks, KS = shape,
    // this = proportions). Weekend-ness is integer day arithmetic from
    // the 2024-01-01 Monday anchor (dow 5,6), no engine dayofweek
    // convention involved.
    "stats_prop_ztest" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "view"))
          .selectExpr(
            "CASE WHEN datediff(to_date(CAST(ts AS TIMESTAMP)), DATE'2024-01-01') % 7 IN (5, 6) THEN 1 ELSE 0 END AS wknd",
            "CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isclick")
        val g = ev.groupBy(col("wknd"))
          .agg(count(lit(1)).as("n"), sum(col("isclick")).as("x"))
        val a = g.where(col("wknd") === 1).selectExpr("n AS n1", "x AS x1")
        val b = g.where(col("wknd") === 0).selectExpr("n AS n2", "x AS x2")
        val pp = "(CAST(x1 AS DOUBLE) + CAST(x2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))"
        a.crossJoin(broadcast(b))
          .selectExpr("n1", "x1", "n2", "x2",
            s"${Q.scaledLong(
              s"(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / sqrt($pp * (1.0 - $pp) * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))",
              6)} AS z_e6")
      },
      Some {
        val pp = "(CAST(x1 AS DOUBLE) + CAST(x2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))"
        s"""
        WITH ev AS (
          SELECT CASE WHEN datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
                        IN (5, 6) THEN 1 ELSE 0 END AS wknd,
                 CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isclick
          FROM events WHERE event_type IN ('click', 'view')),
        g AS (
          SELECT wknd, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(isclick) AS BIGINT) AS x
          FROM ev GROUP BY wknd),
        ab AS (
          SELECT a.n AS n1, a.x AS x1, b.n AS n2, b.x AS x2
          FROM (SELECT * FROM g WHERE wknd = 1) a
          CROSS JOIN (SELECT * FROM g WHERE wknd = 0) b)
        SELECT n1, x1, n2, x2,
               ${Q.scaledLong(
          s"(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / sqrt($pp * (1.0 - $pp) * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))",
          6)} AS z_e6
        FROM ab"""
      }),

    // Exact per-group MODE with a deterministic tie rule (highest count,
    // then smallest value) — the categorical summary statistic the
    // profiler family lacked; computed as one count aggregation plus a
    // rank window over the bounded (group x value) frame, never a sort
    // of the fact.
    "agg_mode_quantity" -> QueryDef(
      (s, d) => {
        val c = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"),
            expr("CAST(l_quantity AS BIGINT)").as("qty"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("c").desc, col("qty"))
        c.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .selectExpr("l_returnflag", "qty AS mode_qty", "c AS n")
          .orderBy(col("l_returnflag"))
      },
      Some("""
        WITH c AS (
          SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
                 CAST(count(*) AS BIGINT) AS c
          FROM lineitem GROUP BY 1, 2),
        r AS (
          SELECT l_returnflag, qty, c,
                 row_number() OVER (PARTITION BY l_returnflag
                   ORDER BY c DESC, qty) AS rn
          FROM c)
        SELECT l_returnflag, qty AS mode_qty, c AS n
        FROM r WHERE rn = 1 ORDER BY l_returnflag""")),

    // NEAREST-neighbor as-of alignment: each signup pairs with the
    // closest click of the same user within +/-1 hour, |delta| ties
    // breaking toward the EARLIER click — the bidirectional variant of
    // the forward-only asof_next_click. The candidate set is the
    // user-keyed equi-join with the window as a residual range predicate
    // (never a time-only cross join), then one rank per signup.
    "join_asof_nearest" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            epochUs(col("ts")).as("tus"), col("event_type"))
        val su = ev.where(col("event_type") === "signup")
          .selectExpr("user_id", "event_id AS s_id", "tus AS s_us")
        val cl = ev.where(col("event_type") === "click")
          .selectExpr("user_id", "event_id AS c_id", "tus AS c_us")
        val w = Window.partitionBy(col("s_id"))
          .orderBy(abs(col("c_us") - col("s_us")), col("c_us"), col("c_id"))
        su.join(cl, Seq("user_id"))
          .where(abs(col("c_us") - col("s_us")) <= 3600000000L)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .selectExpr("user_id", "s_id", "c_id", "c_us - s_us AS delta_us")
          .orderBy(col("user_id"), col("s_id"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, epoch_us(ts) AS tus, event_type FROM events),
        su AS (SELECT user_id, event_id AS s_id, tus AS s_us FROM ev
               WHERE event_type = 'signup'),
        cl AS (SELECT user_id, event_id AS c_id, tus AS c_us FROM ev
               WHERE event_type = 'click'),
        cand AS (
          SELECT su.user_id, s_id, c_id, c_us - s_us AS delta_us,
                 row_number() OVER (PARTITION BY s_id
                   ORDER BY abs(c_us - s_us), c_us, c_id) AS rn
          FROM su JOIN cl ON su.user_id = cl.user_id
          WHERE abs(c_us - s_us) <= 3600000000)
        SELECT user_id, s_id, c_id, delta_us
        FROM cand WHERE rn = 1 ORDER BY user_id, s_id""")),

    // k-anonymity / l-diversity audit over the quasi-identifier
    // (nation, $1000 balance band) with market segment as the sensitive
    // attribute — the privacy gate a training-data release runs before
    // shipping user-derived tables: rows in groups of size k are
    // re-identifiable with probability 1/k, and a group where every
    // member shares one sensitive value leaks it outright (l = 1). Bands
    // shift cents positive BEFORE the integer division so Spark's
    // truncating div and DuckDB's flooring // agree on every row.
    //
    // Scale shape: one QI-keyed aggregation of the dimension, then a
    // 4-row tier rollup; the total joins in as a broadcast 1-row frame.
    "privacy_k_anonymity" -> QueryDef(
      (s, d) => {
        val c = Tables.customer(s, d)
          .selectExpr("CAST(c_nationkey AS BIGINT) AS nat",
            s"(${Q.scaledLong("c_acctbal", 2)} + 100000) div 100000 AS band",
            "c_mktsegment AS seg")
        val g = c.groupBy(col("nat"), col("band"))
          .agg(count(lit(1)).as("k"), expr("count(DISTINCT seg)").as("l"))
        val tot = c.agg(count(lit(1)).as("total"))
        g.selectExpr(
          "CASE WHEN k = 1 THEN '1:unique' WHEN k < 5 THEN '2:k_lt_5' WHEN k < 10 THEN '3:k_lt_10' ELSE '4:k_ge_10' END AS tier",
          "k", "l")
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_rows"),
            min(col("l")).as("min_l"))
          .crossJoin(broadcast(tot))
          .selectExpr("tier", "n_groups", "n_rows", "min_l",
            s"${Q.scaledLong("CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE)", 6)} AS share_e6")
          .orderBy(col("tier"))
      },
      Some(s"""
        WITH c AS (
          SELECT CAST(c_nationkey AS BIGINT) AS nat,
                 (${Q.scaledLong("c_acctbal", 2)} + 100000) // 100000 AS band,
                 c_mktsegment AS seg
          FROM customer),
        g AS (
          SELECT nat, band, CAST(count(*) AS BIGINT) AS k,
                 CAST(count(DISTINCT seg) AS BIGINT) AS l
          FROM c GROUP BY nat, band),
        t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM c),
        tiers AS (
          SELECT CASE WHEN k = 1 THEN '1:unique' WHEN k < 5 THEN '2:k_lt_5'
                      WHEN k < 10 THEN '3:k_lt_10' ELSE '4:k_ge_10' END AS tier,
                 k, l
          FROM g)
        SELECT tier, CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(k) AS BIGINT) AS n_rows, CAST(min(l) AS BIGINT) AS min_l,
               ${Q.scaledLong("CAST(sum(k) AS DOUBLE) / CAST(min(total) AS DOUBLE)", 6)} AS share_e6
        FROM tiers CROSS JOIN t GROUP BY tier ORDER BY tier""")),

    // Per-nation OLS regression of order value against order date — the
    // "is this market growing" trend line, fitted from EXACT BIGINT
    // sufficient statistics (n, Σx, Σy, Σxx, Σxy, Σyy with x = day
    // number, y = whole-dollar price): the normal-equations closed form
    // is then one rational expression tree (+,-,*,/ only — no
    // transcendental), so slope, intercept and R² are bit-identical
    // across engines before scaling. The suff stats are associative, so
    // at 100 TB the aggregation partials map-side and merges in one
    // shuffle on nationkey; the fact-dim join shuffles on custkey
    // (co-bucket orders and customer on custkey to eliminate it).
    // BIGINT headroom: Σy² ≤ rows_per_nation * 3.6e11 — safe beyond
    // sf100; the quantization unit is the dial if that ever tightens.
    "stats_ols_regression" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d).selectExpr("o_custkey",
          "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1995-01-01') AS BIGINT) AS x",
          s"${Q.scaledLong("o_totalprice", 0)} AS y")
        val c = Tables.customer(s, d)
          .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT) AS nk")
        val st = o.join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("nk"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("y") * col("y")).as("syy"))
        st.selectExpr("nk", "n",
            s"${Q.scaledLong(olsSlope, 6)} AS slope_e6",
            s"${Q.scaledLong(olsIntercept, 2)} AS intercept_e2",
            s"${Q.scaledLong(olsR2, 6)} AS r2_e6")
          .orderBy(col("nk"))
      },
      Some(s"""
        WITH st AS (
          SELECT CAST(c.c_nationkey AS BIGINT) AS nk,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM (
            SELECT o_custkey,
                   CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
                   ${Q.scaledLong("o_totalprice", 0)} AS y
            FROM orders) o
          JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1)
        SELECT nk, n,
               ${Q.scaledLong(olsSlope, 6)} AS slope_e6,
               ${Q.scaledLong(olsIntercept, 2)} AS intercept_e2,
               ${Q.scaledLong(olsR2, 6)} AS r2_e6
        FROM st ORDER BY nk""")),

    // One-way ANOVA F across the five event types on cents-quantized
    // value — "does ANY variant differ" before pairwise tests. Per-group
    // EXACT BIGINT moments (n, Σv, Σv²) pivot into ONE row via CASE
    // pinned to the five known types, so every double fold below has a
    // FIXED association order written in the expression tree — no
    // engine-dependent double-sum ordering anywhere (the same discipline
    // as the sorted folds elsewhere, done here by enumeration because
    // the group domain is static). F and η² are rational in the moments
    // → bit-identical. Scale shape: one map-side-combinable aggregation
    // of the fact, then a 5-row pivot; nothing else touches the data.
    "stats_anova_oneway" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(expr(Q.scaledLong("value", 2)).as("v"), col("event_type"))
        val g = ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
            sum(col("v") * col("v")).as("ss"))
        g.groupBy().agg(expr(anovaPivot.head), anovaPivot.tail.map(expr): _*)
          .selectExpr(s"CAST(${AnovaTypes.size} AS BIGINT) AS k",
            s"$anovaN AS n",
            s"${Q.scaledLong(anovaF, 6)} AS f_e6",
            s"${Q.scaledLong(anovaEta2, 6)} AS eta2_e6")
      },
      Some(s"""
        WITH g AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS ss
          FROM (SELECT ${Q.scaledLong("value", 2)} AS v, event_type FROM events)
          GROUP BY event_type),
        p AS (SELECT ${anovaPivot.mkString(", ")} FROM g)
        SELECT CAST(${AnovaTypes.size} AS BIGINT) AS k, $anovaN AS n,
               ${Q.scaledLong(anovaF, 6)} AS f_e6,
               ${Q.scaledLong(anovaEta2, 6)} AS eta2_e6
        FROM p""")),

    // Lead-lag cross-correlation between the daily click and purchase
    // series (lags -3..+3) — "do purchases follow clicks, and by how
    // many days": the causality-screening readout run before building
    // an attribution model. Day counts are exact BIGINTs on the bounded
    // 31-day grid; each lag's Pearson correlation comes from BIGINT
    // sufficient statistics through a rational-plus-sqrt tree (IEEE
    // sqrt is correctly rounded, so still bit-identical). Scale shape:
    // the fact aggregates to the day grid FIRST; the 7-lag self-join
    // runs on that bounded frame — never on raw events.
    "time_cross_corr" -> QueryDef(
      (s, d) => {
        val g = Tables.events(s, d)
          .selectExpr(
            "datediff(to_date(CAST(ts AS TIMESTAMP)), DATE'2024-01-01') AS day",
            "CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isx",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isy")
          .groupBy(col("day"))
          .agg(sum(col("isx")).as("x"), sum(col("isy")).as("y"))
        val lags = g.sparkSession.range(1)
          .selectExpr("explode(sequence(-3, 3)) AS lag")
        val a = g.selectExpr("day AS da", "x")
        val b = g.selectExpr("day AS db", "y")
        val st = broadcast(lags).crossJoin(a)
          .join(b, col("db") === col("da") + col("lag"))
          .groupBy(col("lag"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"),
            sum(col("x") * col("y")).as("sxy"))
        st.selectExpr("CAST(lag AS BIGINT) AS lag", "n AS n_days",
            s"${Q.scaledLong(corrExpr, 6)} AS corr_e6")
          .orderBy(col("lag"))
      },
      Some(s"""
        WITH g AS (
          SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
                 CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM events GROUP BY 1),
        st AS (
          SELECT t.lag, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(a.x) AS BIGINT) AS sx, CAST(sum(b.y) AS BIGINT) AS sy,
                 CAST(sum(a.x * a.x) AS BIGINT) AS sxx,
                 CAST(sum(b.y * b.y) AS BIGINT) AS syy,
                 CAST(sum(a.x * b.y) AS BIGINT) AS sxy
          FROM range(-3, 4) t(lag)
          CROSS JOIN g a JOIN g b ON b.day = a.day + t.lag
          GROUP BY t.lag)
        SELECT CAST(lag AS BIGINT) AS lag, n AS n_days,
               ${Q.scaledLong(corrExpr, 6)} AS corr_e6
        FROM st ORDER BY lag""")),

    // STL-style seasonal decomposition of the daily event count:
    // trend = centered 7-day moving mean (emitted only where the full
    // window exists), weekly seasonal = per-day-of-week mean deviation,
    // residual = remainder. The trick that keeps it bit-identical: the
    // trend window SUM and the deviation 7y - trend7 stay INTEGER; the
    // only doubles are single divisions at the very end, one identical
    // tree per output column. Day-of-week is day-number % 7 from the
    // Monday anchor (non-negative domain — no floor/trunc divergence).
    // Scale shape: the fact aggregates to the bounded day grid first;
    // windows and the 7-row seasonal join run on that grid. The grid is
    // DENSIFIED (r7 ADVICE): days with zero events are materialized with
    // y = 0 via a sequence over [min(day), max(day)], so the ROWS-based
    // 7-row window really is 7 CALENDAR days even on sparse inputs —
    // without it the declared "centered 7-day" semantics silently
    // widened across gaps (identically in both engines, but wrongly).
    "time_stl_decompose" -> QueryDef(
      (s, d) => {
        val observed = Tables.events(s, d)
          .selectExpr(
            "datediff(to_date(CAST(ts AS TIMESTAMP)), DATE'2024-01-01') AS day")
          .groupBy(col("day")).agg(count(lit(1)).as("y"))
        val grid = observed
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .selectExpr("explode(sequence(d0, d1)) AS day")
        val g = grid.join(observed, Seq("day"), "left")
          .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
        val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
        val t = g
          .withColumn("trend7",
            when(count(lit(1)).over(w7) === 7, sum(col("y")).over(w7)))
          .withColumn("dow", col("day") % 7)
          .withColumn("dev7", lit(7) * col("y") - col("trend7"))
        val seas = t.where(col("dev7").isNotNull)
          .groupBy(col("dow"))
          .agg(sum(col("dev7")).as("sdev"), count(lit(1)).as("cdev"))
        t.join(broadcast(seas), Seq("dow"), "left")
          .selectExpr("CAST(day AS BIGINT) AS day", "y",
            s"CASE WHEN trend7 IS NULL THEN NULL ELSE ${Q.scaledLong(stlTrend, 2)} END AS trend_e2",
            s"${Q.scaledLong(stlSeason, 2)} AS seasonal_e2",
            s"CASE WHEN trend7 IS NULL THEN NULL ELSE ${Q.scaledLong(stlResid, 2)} END AS resid_e2")
          .orderBy(col("day"))
      },
      Some(s"""
        WITH observed AS (
          SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
                 CAST(count(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        grid AS (
          SELECT unnest(range(d0, d1 + 1)) AS day
          FROM (SELECT min(day) AS d0, max(day) AS d1 FROM observed)),
        g AS (
          SELECT grid.day AS day, CAST(coalesce(y, 0) AS BIGINT) AS y
          FROM grid LEFT JOIN observed ON grid.day = observed.day),
        t AS (
          SELECT day, y,
                 CASE WHEN count(*) OVER w = 7
                      THEN CAST(sum(y) OVER w AS BIGINT) END AS trend7,
                 day % 7 AS dow
          FROM g WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        t2 AS (SELECT *, 7 * y - trend7 AS dev7 FROM t),
        seas AS (
          SELECT dow, CAST(sum(dev7) AS BIGINT) AS sdev,
                 CAST(count(*) AS BIGINT) AS cdev
          FROM t2 WHERE dev7 IS NOT NULL GROUP BY dow)
        SELECT CAST(day AS BIGINT) AS day, y,
               CASE WHEN trend7 IS NULL THEN NULL ELSE ${Q.scaledLong(stlTrend, 2)} END AS trend_e2,
               ${Q.scaledLong(stlSeason, 2)} AS seasonal_e2,
               CASE WHEN trend7 IS NULL THEN NULL ELSE ${Q.scaledLong(stlResid, 2)} END AS resid_e2
        FROM t2 LEFT JOIN seas USING (dow) ORDER BY day""")),

    // Kaplan-Meier survival: days from signup to first purchase, users
    // with no purchase censored at the study end (day 29) — the
    // time-to-convert readout a growth team tracks, with censoring
    // handled correctly instead of dropped. The counting process is
    // entirely integer (events d, censorings c, at-risk n per distinct
    // duration via one cumulative window over the bounded duration
    // grid); the survival curve is the cumulative product Π(1 - d/n),
    // computed as exp of an ORDERED window sum of ln factors — sequential
    // association in both engines, so only the documented ln-ulp risk
    // remains. Scale shape: two event-type filters aggregate per user
    // (one shuffle on user_id), then everything runs on the ≤31-row
    // duration grid.
    "events_survival_km" -> QueryDef(
      (s, d) => {
        val e = Tables.events(s, d).selectExpr("user_id", "event_type",
          "datediff(to_date(CAST(ts AS TIMESTAMP)), DATE'2024-01-01') AS dday")
        val su = e.where(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("dday")).as("s0"))
        val pu = e.where(col("event_type") === "purchase")
          .selectExpr("user_id", "dday AS pday")
        val subj = su.join(pu, Seq("user_id"), "left")
          .groupBy(col("user_id"), col("s0"))
          .agg(min(when(col("pday") >= col("s0"), col("pday"))).as("pd"))
          .selectExpr(
            "CASE WHEN pd IS NOT NULL THEN pd - s0 ELSE 29 - s0 END AS dur",
            "CASE WHEN pd IS NOT NULL THEN 1 ELSE 0 END AS ev")
        val byDur = subj.groupBy(col("dur"))
          .agg(sum(col("ev")).as("d"), sum(lit(1) - col("ev")).as("c"))
        val wAll = Window.partitionBy(lit(1))
        val wCum = Window.orderBy(col("dur"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wPrev = Window.orderBy(col("dur"))
          .rowsBetween(Window.unboundedPreceding, -1)
        byDur
          .withColumn("n_total", sum(col("d") + col("c")).over(wAll))
          .withColumn("n_risk",
            col("n_total") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
          // Spark's ln(0) is NULL while DuckDB's is -inf: a duration
          // where EVERY remaining subject events (n_risk = d) is kept
          // out of the log-sum entirely and survival is pinned to 0 from
          // that row on via the cumulative zero flag — identical CASE
          // trees in both engines, no ln(0) evaluated in either.
          .withColumn("lnf",
            expr("CASE WHEN d = 0 THEN 0.0 WHEN n_risk > d THEN " +
              "ln((CAST(n_risk AS DOUBLE) - CAST(d AS DOUBLE)) / CAST(n_risk AS DOUBLE)) END"))
          .withColumn("lsum", sum(col("lnf")).over(wCum))
          .withColumn("zero", max(when(col("n_risk") === col("d"), 1).otherwise(0)).over(wCum))
          .selectExpr("CAST(dur AS BIGINT) AS dur", "n_risk", "d AS d_events",
            "c AS c_censored",
            s"CASE WHEN zero = 1 THEN CAST(0 AS BIGINT) ELSE ${Q.scaledLong("exp(lsum)", 6)} END AS surv_e6")
          .orderBy(col("dur"))
      },
      Some(s"""
        WITH e AS (
          SELECT user_id, event_type,
                 datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dday
          FROM events),
        su AS (
          SELECT user_id, min(dday) AS s0 FROM e
          WHERE event_type = 'signup' GROUP BY user_id),
        subj AS (
          SELECT su.user_id, su.s0,
                 min(CASE WHEN p.dday >= su.s0 THEN p.dday END) AS pd
          FROM su LEFT JOIN (
            SELECT user_id, dday FROM e WHERE event_type = 'purchase') p
            ON su.user_id = p.user_id
          GROUP BY su.user_id, su.s0),
        durs AS (
          SELECT CASE WHEN pd IS NOT NULL THEN pd - s0 ELSE 29 - s0 END AS dur,
                 CASE WHEN pd IS NOT NULL THEN 1 ELSE 0 END AS ev
          FROM subj),
        byd AS (
          SELECT dur, CAST(sum(ev) AS BIGINT) AS d,
                 CAST(sum(1 - ev) AS BIGINT) AS c
          FROM durs GROUP BY dur),
        km AS (
          SELECT dur, d, c,
                 CAST(sum(d + c) OVER () AS BIGINT)
                   - CAST(coalesce(sum(d + c) OVER (ORDER BY dur
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS n_risk
          FROM byd),
        km2 AS (
          SELECT dur, n_risk, d, c,
                 sum(CASE WHEN d = 0 THEN 0.0 WHEN n_risk > d THEN
                       ln((CAST(n_risk AS DOUBLE) - CAST(d AS DOUBLE)) / CAST(n_risk AS DOUBLE)) END)
                   OVER cum AS lsum,
                 max(CASE WHEN n_risk = d THEN 1 ELSE 0 END) OVER cum AS zero
          FROM km
          WINDOW cum AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT CAST(dur AS BIGINT) AS dur, n_risk, d AS d_events,
               c AS c_censored,
               CASE WHEN zero = 1 THEN CAST(0 AS BIGINT)
                    ELSE ${Q.scaledLong("exp(lsum)", 6)} END AS surv_e6
        FROM km2 ORDER BY dur""")),

    // Theil-Sen robust trend: the MEDIAN of all pairwise day-grid slopes
    // — the estimator that shrugs off the outlier days OLS gets dragged
    // by (29% breakdown point vs 0). Key scale fact: the pairwise
    // quadratic is in the GRID (31 days -> 435 pairs), never in the
    // fact — the raw events aggregate to the bounded day grid first,
    // exactly the stats_ols/cross-corr contract. Each slope leaves as an
    // e6-scaled BIGINT through one identical division tree; the median
    // is the exact lower-median row of the (slope, d1, d2) total order —
    // integer row_number arithmetic, no percentile_approx anywhere.
    "stats_theil_sen" -> QueryDef(
      (s, d) => {
        val g = Tables.events(s, d)
          .selectExpr(
            "datediff(to_date(CAST(ts AS TIMESTAMP)), DATE'2024-01-01') AS day")
          .groupBy(col("day")).agg(count(lit(1)).as("y"))
        val pairs = g.toDF("d1", "y1")
          .join(g.toDF("d2", "y2"), col("d2") > col("d1"))
          .selectExpr("d1", "d2",
            s"${Q.scaledLong(
              "(CAST(y2 AS DOUBLE) - CAST(y1 AS DOUBLE)) / (CAST(d2 AS DOUBLE) - CAST(d1 AS DOUBLE))",
              6)} AS slope_e6")
        val w = Window.orderBy(col("slope_e6"), col("d1"), col("d2"))
        val wAll = Window.partitionBy(lit(1))
        pairs.withColumn("rn", row_number().over(w))
          .withColumn("np", count(lit(1)).over(wAll))
          .where(expr("rn = (np + 1) div 2"))
          .selectExpr("np AS n_pairs", "slope_e6")
      },
      Some(s"""
        WITH g AS (
          SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
                 CAST(count(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        pairs AS (
          SELECT a.day AS d1, b.day AS d2,
                 ${Q.scaledLong(
          "(CAST(b.y AS DOUBLE) - CAST(a.y AS DOUBLE)) / (CAST(b.day AS DOUBLE) - CAST(a.day AS DOUBLE))",
          6)} AS slope_e6
          FROM g a JOIN g b ON b.day > a.day),
        r AS (
          SELECT slope_e6,
                 row_number() OVER (ORDER BY slope_e6, d1, d2) AS rn,
                 count(*) OVER () AS np
          FROM pairs)
        SELECT CAST(np AS BIGINT) AS n_pairs, slope_e6
        FROM r WHERE rn = (np + 1) // 2""")),

    // Kendall's tau-b between the daily click and purchase series — the
    // rank-concordance companion to Pearson (time_cross_corr) and the
    // rank-sum test (stats_mann_whitney): robust to any monotone
    // transform of either series. Concordant/discordant/tie counts are
    // exact integers over the bounded day-grid pair frame (the
    // stats_theil_sen quadratic-in-the-GRID contract), and tau-b is
    // rational + IEEE sqrt — bit-identical.
    "stats_kendall_tau" -> QueryDef(
      (s, d) => {
        val g = Tables.events(s, d)
          .selectExpr(
            "datediff(to_date(CAST(ts AS TIMESTAMP)), DATE'2024-01-01') AS day",
            "CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isx",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isy")
          .groupBy(col("day"))
          .agg(sum(col("isx")).as("x"), sum(col("isy")).as("y"))
        val st = g.toDF("d1", "x1", "y1")
          .join(g.toDF("d2", "x2", "y2"), col("d2") > col("d1"))
          .agg(count(lit(1)).as("n0"),
            sum(expr("CASE WHEN (x2 - x1) * (y2 - y1) > 0 THEN 1 ELSE 0 END")).as("c"),
            sum(expr("CASE WHEN (x2 - x1) * (y2 - y1) < 0 THEN 1 ELSE 0 END")).as("dd"),
            sum(expr("CASE WHEN x1 = x2 THEN 1 ELSE 0 END")).as("tx"),
            sum(expr("CASE WHEN y1 = y2 THEN 1 ELSE 0 END")).as("ty"))
        st.selectExpr("n0 AS n_pairs", "c AS concordant", "dd AS discordant",
          s"${Q.scaledLong(kendallTauB, 6)} AS tau_e6")
      },
      Some(s"""
        WITH g AS (
          SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
                 CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM events GROUP BY 1),
        st AS (
          SELECT CAST(count(*) AS BIGINT) AS n0,
                 CAST(sum(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
                 CAST(sum(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS dd,
                 CAST(sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
                 CAST(sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS ty
          FROM g a JOIN g b ON b.day > a.day)
        SELECT n0 AS n_pairs, c AS concordant, dd AS discordant,
               ${Q.scaledLong(kendallTauB, 6)} AS tau_e6
        FROM st""")),

    // Differentially-private histogram release with DERANDOMIZED Laplace
    // noise: per-nation customer counts plus Lap(1/eps) noise whose
    // uniform draw comes from a Knuth-hash of the group key instead of a
    // RNG — the standard trick for making a DP pipeline TESTABLE (same
    // release every run and in the oracle) while keeping the exact
    // noise shape (inverse-CDF transform of the uniform). eps = 1,
    // sensitivity 1 (each customer contributes to one nation bucket).
    // In production the hash input would be key + a secret per-release
    // salt; the mechanism, sensitivity bound and inverse-CDF transform
    // are what this operator declares. Scale shape: one aggregation,
    // then row-local noise — nothing joins, nothing re-shuffles.
    "privacy_dp_counts" -> QueryDef(
      (s, d) => {
        val g = Tables.customer(s, d)
          .groupBy(expr("CAST(c_nationkey AS BIGINT)").as("nat"))
          .agg(count(lit(1)).as("c"))
        g.selectExpr("nat", "c", s"$dpU AS u")
          .selectExpr("nat",
            s"${Q.scaledLong(s"CAST(c AS DOUBLE) + $dpLaplace", 2)} AS noisy_e2")
          .orderBy(col("nat"))
      },
      Some(s"""
        WITH g AS (
          SELECT CAST(c_nationkey AS BIGINT) AS nat,
                 CAST(count(*) AS BIGINT) AS c
          FROM customer GROUP BY 1),
        u AS (SELECT nat, c, $dpU AS u FROM g)
        SELECT nat,
               ${Q.scaledLong(s"CAST(c AS DOUBLE) + $dpLaplace", 2)} AS noisy_e2
        FROM u ORDER BY nat"""))
  )

  /** Kendall tau-b from the exact concordance counts: (C - D) /
    * sqrt((n0 - Tx)(n0 - Ty)); rational + IEEE sqrt, bit-identical.
    */
  private val kendallTauB =
    "(CAST(c AS DOUBLE) - CAST(dd AS DOUBLE)) / sqrt((CAST(n0 AS DOUBLE) - CAST(tx AS DOUBLE)) * (CAST(n0 AS DOUBLE) - CAST(ty AS DOUBLE)))"

  /** Derandomized-Laplace pieces: u in (0,1) from a Knuth multiplicative
    * hash of the group key; Lap(b=1/eps=1) via the inverse CDF
    * -sign(u-1/2) * ln(1 - 2|u-1/2|). u is never exactly 0/0.5/1 (odd
    * numerator over 2e6), so the log argument stays in (0, 1].
    */
  private val dpU = "((CAST((nat * 2654435761) % 1000000 AS DOUBLE) * 2.0 + 1.0) / 2000000.0)"
  private val dpLaplace =
    "(-(CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END) * ln(1.0 - 2.0 * abs(u - 0.5)))"

  // ---- shared engine-identical expression trees (see QueryPack doc) ----

  /** OLS normal-equation pieces over the (n, sx, sy, sxx, sxy, syy)
    * sufficient-statistic row; rational in BIGINTs, so bit-identical.
    */
  private val olsVx =
    "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
  private val olsVy =
    "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
  private val olsCv =
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
  private val olsSlope = s"$olsCv / $olsVx"
  private val olsIntercept =
    s"(CAST(sy AS DOUBLE) - ($olsSlope) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)"
  private val olsR2 = s"($olsCv * $olsCv) / ($olsVx * $olsVy)"

  /** The five event types, pinned: the ANOVA pivot and every fold below
    * enumerate them in THIS order so the double association order is part
    * of the declared expression tree.
    */
  private val AnovaTypes = Seq("click", "error", "purchase", "signup", "view")

  private val anovaPivot: Seq[String] =
    AnovaTypes.flatMap { t =>
      Seq(s"CAST(max(CASE WHEN event_type = '$t' THEN n END) AS BIGINT) AS n_$t",
        s"CAST(max(CASE WHEN event_type = '$t' THEN sv END) AS BIGINT) AS sv_$t",
        s"CAST(max(CASE WHEN event_type = '$t' THEN ss END) AS BIGINT) AS ss_$t")
    }

  private val anovaN =
    AnovaTypes.map(t => s"n_$t").mkString("(", " + ", ")")
  private val anovaS =
    AnovaTypes.map(t => s"sv_$t").mkString("(CAST(", " + ", " AS DOUBLE))")
  private val anovaSS =
    AnovaTypes.map(t => s"ss_$t").mkString("(CAST(", " + ", " AS DOUBLE))")
  /** Σ s_g²/n_g folded in the pinned type order. */
  private val anovaB = AnovaTypes
    .map(t => s"CAST(sv_$t AS DOUBLE) * CAST(sv_$t AS DOUBLE) / CAST(n_$t AS DOUBLE)")
    .mkString("(", " + ", ")")
  private val anovaSsb = s"($anovaB - $anovaS * $anovaS / CAST($anovaN AS DOUBLE))"
  private val anovaSsw = s"($anovaSS - $anovaB)"
  private val anovaSst = s"($anovaSS - $anovaS * $anovaS / CAST($anovaN AS DOUBLE))"
  private val anovaF =
    s"($anovaSsb / ${AnovaTypes.size - 1}.0) / ($anovaSsw / (CAST($anovaN AS DOUBLE) - ${AnovaTypes.size}.0))"
  private val anovaEta2 = s"$anovaSsb / $anovaSst"

  /** Pearson correlation from the per-lag suff-stat row; rational + IEEE
    * sqrt → bit-identical.
    */
  private val corrExpr = {
    val vx = "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    val vy = "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    val cv = "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    s"$cv / sqrt($vx * $vy)"
  }

  /** STL output pieces: single divisions of integer moments. */
  private val stlTrend = "CAST(trend7 AS DOUBLE) / 7.0"
  private val stlSeason = "CAST(sdev AS DOUBLE) / (7.0 * CAST(cdev AS DOUBLE))"
  private val stlResid =
    s"(7.0 * CAST(y AS DOUBLE) - CAST(trend7 AS DOUBLE)) / 7.0 - $stlSeason"
}
