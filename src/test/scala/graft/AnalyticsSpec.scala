package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the Analytics pack, beyond the DuckDB
  * value-parity gate: rank-statistic bounds, skyline dominance soundness
  * and completeness, Benford mass conservation, smoother identities,
  * merge row accounting, and k-anonymity partition accounting.
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, "graft-test")
  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  test("mann-whitney: U bounds and AUC consistency") {
    val r = q("stats_mann_whitney").collect().head
    val (n1, n2, u2, auc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n1 > 0 && n2 > 0)
    assert(u2 >= 0 && u2 <= 2 * n1 * n2, s"u2=$u2 outside [0, ${2 * n1 * n2}]")
    val expect = math.floor(u2.toDouble / (2.0 * n1 * n2) * 1e6 + 0.5).toLong
    assert(auc == expect, s"auc_e6=$auc != derived $expect")
  }

  test("skyline: sound (no dominated member) and complete (every part dominated or in)") {
    val sky = q("skyline_parts").collect()
      .map(r => (r.getLong(1), r.getLong(2))) // (price_c, size)
    // soundness: no member dominates another
    for (a <- sky; b <- sky if a != b)
      assert(!(b._1 <= a._1 && b._2 >= a._2 && (b._1 < a._1 || b._2 > a._2)),
        s"$b dominates $a inside the skyline")
    // completeness: every part is in the skyline or dominated by a member
    val parts = graft.engine.Tables.part(spark, d)
      .selectExpr("CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT) AS pc",
        "CAST(p_size AS BIGINT) AS sz")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val skySet = sky.toSet
    parts.foreach { p =>
      assert(skySet.contains(p) || sky.exists(b =>
        b._1 <= p._1 && b._2 >= p._2 && (b._1 < p._1 || b._2 > p._2)),
        s"part $p neither on skyline nor dominated")
    }
  }

  test("benford: digit mass accounts for every order") {
    val rows = q("quality_benford").collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == graft.engine.Tables.orders(spark, d).count())
    assert(rows.map(_.getLong(0)).toSet.subsetOf((1L to 9L).toSet))
    val pSum = rows.map(_.getLong(2)).sum
    assert(math.abs(pSum - 1000000L) <= rows.length,
      s"observed shares sum to $pSum, expected ~1e6")
  }

  test("holt trend: level - trend recovers the single smoother (time_ema)") {
    val holt = q("time_holt_trend")
      .selectExpr("day", "event_type", "level_e6 - trend_e6 AS s1_e6")
    val ema = q("time_ema_counts").selectExpr("day", "event_type", "ema_e6")
    val off = holt.join(ema, Seq("day", "event_type"))
      .where(abs(col("s1_e6") - col("ema_e6")) > 2)
      .count()
    assert(off == 0, s"$off grid rows where 2*S1-S2 - (S1-S2) drifts from S1")
  }

  test("top paths: bounded output, positive counts, users accounted") {
    val rows = q("events_top_paths").collect()
    assert(rows.length <= 20)
    assert(rows.forall(_.getLong(1) > 0))
    val users = graft.engine.Tables.events(spark, d)
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(rows.map(_.getLong(1)).sum <= users)
  }

  test("scd1 merge: exact row accounting (snapshot - deletes + inserts)") {
    val snap = graft.engine.Tables.customer(spark, d)
      .selectExpr("c_custkey AS k")
    val nDel = snap.where(col("k") % 101 === 0).count()
    val nIns = snap.where(col("k") % 103 === 0).count()
    val merged = q("merge_scd1_batch").agg(sum("n_rows")).collect().head.getLong(0)
    assert(merged == snap.count() - nDel + nIns,
      s"merged=$merged, expected ${snap.count()} - $nDel + $nIns")
  }

  test("welch t-test: sign matches the mean difference, df within classical bounds") {
    val r = q("stats_ttest_welch").collect().head
    val (n1, n2, t, df3) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val ev = graft.engine.Tables.events(spark, d)
      .filter(col("event_type").isin("click", "view"))
      .groupBy("event_type")
      .agg(avg(expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)")).as("m"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.signum(t.toDouble) == math.signum(ev("click") - ev("view")))
    val df = df3 / 1000.0
    assert(df >= math.min(n1, n2) - 1 && df <= n1 + n2 - 2,
      s"Welch df=$df outside [min(n)-1, n1+n2-2]")
  }

  test("autocorr: correlation bounds and exact pair counts per lag") {
    val rows = q("time_autocorr").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, lag, n, r6) =>
      assert(n == 31 - lag, s"$et lag=$lag should have ${31 - lag} pairs, got $n")
      assert(r6 >= -1000000L && r6 <= 1000000L, s"$et lag=$lag r_e6=$r6")
    }
    assert(rows.map(_._2).distinct.sorted.toSeq == Seq(1L, 7L))
  }

  test("ccnet buckets: terciles partition the scored docs evenly") {
    val rows = q("curate_ccnet_buckets").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val scoredDocs = graft.engine.Tables.documents(spark, d)
      .where("size(filter(split(lower(text), ' '), w -> w <> '')) > 0").count()
    assert(rows.map(_._3).sum == scoredDocs)
    val perBucket = rows.groupBy(_._2).map { case (b, g) => b -> g.map(_._3).sum }
    assert(perBucket.keySet == Set(1L, 2L, 3L))
    assert(perBucket.values.max - perBucket.values.min <= 1,
      s"ntile terciles must differ by at most one doc: $perBucket")
  }

  test("rfm: quintile digits in range, user mass conserved") {
    val rows = q("events_rfm_segmentation").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (seg, _, _) =>
      val (rq, fq, mq) = (seg / 100, seg / 10 % 10, seg % 10)
      assert(Seq(rq, fq, mq).forall(x => x >= 1 && x <= 5), s"segment $seg")
    }
    val users = graft.engine.Tables.events(spark, d)
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(rows.map(_._2).sum == users)
  }

  test("abc pareto: classes partition parts, shares ordered A >= B") {
    val rows = q("orders_abc_pareto").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq("A", "B", "C"))
    val parts = graft.engine.Tables.lineitem(spark, d)
      .select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    assert(rows.map(_._2).sum == parts)
    val share = rows.map(r => r._1 -> r._4).toMap
    // A carries ~80% of revenue with far fewer parts than its share
    assert(share("A") >= 700000L && share("A") <= 800000L)
    assert(rows.map(_._4).sum >= 999998L && rows.map(_._4).sum <= 1000002L)
  }

  test("activity streaks: histogram mass = users, lengths within the 31-day window") {
    val rows = q("events_activity_streaks").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val users = graft.engine.Tables.events(spark, d)
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(rows.map(_._2).sum == users)
    assert(rows.forall { case (len, _) => len >= 1 && len <= 31 })
  }

  test("dsir: 50-doc manifest, raw-pool only, deterministic descending scores") {
    val rows = q("curate_dsir_select").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 50)
    val scores = rows.map(_._3)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "manifest must be score-descending")
    val enDocs = graft.engine.Tables.documents(spark, d)
      .where(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => !enDocs.contains(r._1)),
      "target-domain docs must not appear in the raw-pool manifest")
  }

  test("gini: bounds [0,1), mass accounting") {
    val r = q("events_power_gini").collect().head
    val (n, tot, g) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(g >= 0 && g < 1000000L, s"gini_e6=$g outside [0, 1e6)")
    val events = graft.engine.Tables.events(spark, d).count()
    assert(tot == events && n > 0)
  }

  test("wow growth: first week NULL, ratios consistent with counts") {
    val rows = q("time_wow_growth").collect()
    val byType = rows.groupBy(_.getString(0))
    byType.values.foreach { g =>
      val sorted = g.sortBy(_.getLong(1))
      assert(sorted.head.isNullAt(3), "first week must have NULL growth")
      sorted.toSeq.sliding(2).foreach {
        case Seq(prev, cur) if !cur.isNullAt(3) =>
          val expect = math.floor(
            cur.getLong(2).toDouble / prev.getLong(2) * 1e6 + 0.5).toLong
          assert(cur.getLong(3) == expect)
        case _ =>
      }
    }
  }

  test("proportion z-test: counts partition the click/view population") {
    val r = q("stats_prop_ztest").collect().head
    val total = graft.engine.Tables.events(spark, d)
      .filter(col("event_type").isin("click", "view")).count()
    assert(r.getLong(0) + r.getLong(2) == total)
    assert(r.getLong(1) <= r.getLong(0) && r.getLong(3) <= r.getLong(2))
  }

  test("mode: the reported value really is the argmax count") {
    q("agg_mode_quantity").collect().foreach { r =>
      val flag = r.getString(0)
      val top = graft.engine.Tables.lineitem(spark, d)
        .where(col("l_returnflag") === flag)
        .groupBy(expr("CAST(l_quantity AS BIGINT)").as("q"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("q")).limit(1)
        .collect().head
      assert(r.getLong(1) == top.getLong(0) && r.getLong(2) == top.getLong(1))
    }
  }

  test("asof nearest: one row per matched signup, |delta| within the window") {
    val rows = q("join_asof_nearest").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).distinct.length == rows.length,
      "each signup must match at most once")
    assert(rows.forall(r => math.abs(r.getLong(3)) <= 3600000000L))
  }

  test("epoch mix: budget conservation within rounding, shares sum to ~1") {
    val rows = q("curate_mix_epochs").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val shareSum = rows.map(_._2).sum
    assert(math.abs(shareSum - 1000000L) <= rows.length)
    rows.foreach { case (avail, _, target, full, frac) =>
      val reconstructed = full * avail + frac * avail / 1000000L
      assert(math.abs(reconstructed - target) <= avail / 1000000L + 1,
        s"epochs*avail + frac*avail must reconstruct the target: $reconstructed vs $target")
    }
  }

  test("k-anonymity: tiers partition the QI groups and the rows") {
    val rows = q("privacy_k_anonymity").collect()
    val c = graft.engine.Tables.customer(spark, d)
      .selectExpr("c_nationkey AS nat",
        "(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) + 100000) div 100000 AS band")
    assert(rows.map(_.getLong(2)).sum == c.count())
    assert(rows.map(_.getLong(1)).sum == c.distinct().count())
    assert(rows.forall(_.getLong(3) >= 1)) // min_l >= 1 always
  }

  test("OLS: R2 bounds and suff-stats match a driver recomputation") {
    val rows = q("stats_ols_regression").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val r2 = r.getLong(4)
      assert(r2 >= 0L && r2 <= 1000000L, s"r2_e6=$r2 outside [0, 1e6]")
    }
    // one nation recomputed from raw rows: slope from exact BIGINT stats
    val raw = graft.engine.Tables.orders(spark, d)
      .join(graft.engine.Tables.customer(spark, d),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_nationkey") === 0)
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1995-01-01') AS BIGINT) AS x",
        "CAST(floor(o_totalprice + 0.5) AS BIGINT) AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = raw.length.toLong
    val (sx, sy) = (raw.map(_._1).sum, raw.map(_._2).sum)
    val sxx = raw.map(t => t._1 * t._1).sum
    val sxy = raw.map(t => t._1 * t._2).sum
    val slope = (n.toDouble * sxy - sx.toDouble * sy) /
      (n.toDouble * sxx - sx.toDouble * sx)
    val got = rows.find(_.getLong(0) == 0L).get.getLong(2)
    assert(got == math.floor(slope * 1e6 + 0.5).toLong,
      s"nation-0 slope_e6 $got != recomputed")
  }

  test("ANOVA: F positive-definite pieces and eta2 in [0,1]") {
    val r = q("stats_anova_oneway").collect().head
    assert(r.getLong(0) == 5L) // k groups
    assert(r.getLong(1) == graft.engine.Tables.events(spark, d).count())
    val eta2 = r.getLong(3)
    assert(eta2 >= 0L && eta2 <= 1000000L, s"eta2_e6=$eta2 outside [0, 1e6]")
  }

  test("cross-correlation: lag-0 covers the full grid, corr bounded") {
    val rows = q("time_cross_corr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(-3L, -2L, -1L, 0L, 1L, 2L, 3L))
    val byLag = rows.map(t => t._1 -> t._2).toMap
    // |lag| days fall off each end of the overlap window
    rows.foreach { case (lag, nd, corr) =>
      assert(nd == byLag(0L) - math.abs(lag), s"lag $lag day count")
      assert(corr >= -1000000L && corr <= 1000000L)
    }
  }

  test("STL: decomposition reassembles the series where trend exists") {
    q("time_stl_decompose").collect().foreach { r =>
      if (!r.isNullAt(2)) {
        val y = r.getLong(1).toDouble
        val sum = (r.getLong(2) + r.getLong(3) + r.getLong(4)).toDouble / 100.0
        // three independently rounded e2 terms: at most 1.5 cents apart
        assert(math.abs(sum - y) <= 0.03, s"day ${r.getLong(0)}: $sum != $y")
      }
    }
  }

  test("Kaplan-Meier: risk-set accounting and monotone survival") {
    val rows = q("events_survival_km").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // n_risk drops by exactly d + c at each step
    rows.sliding(2).foreach {
      case Array((_, n1, d1, c1, _), (_, n2, _, _, _)) =>
        assert(n2 == n1 - d1 - c1, s"risk set must shrink by removals")
      case _ =>
    }
    // survival is non-increasing and within [0, 1]
    val surv = rows.map(_._5)
    assert(surv.head <= 1000000L && surv.forall(_ >= 0L))
    surv.sliding(2).foreach {
      case Array(a, b) => assert(b <= a, "survival must be non-increasing")
      case _ =>
    }
  }

  test("DP counts: noise matches the declared inverse-CDF recomputation") {
    val truth = graft.engine.Tables.customer(spark, d)
      .groupBy(col("c_nationkey")).count().collect()
      .map(r => (r.get(0).toString.toLong, r.getLong(1))).toMap
    q("privacy_dp_counts").collect().foreach { r =>
      val (nat, noisy) = (r.getLong(0), r.getLong(1))
      val u = (((nat * 2654435761L) % 1000000L).toDouble * 2.0 + 1.0) / 2000000.0
      val lap = -(if (u >= 0.5) 1.0 else -1.0) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
      val expect = math.floor((truth(nat).toDouble + lap) * 100.0 + 0.5).toLong
      assert(noisy == expect, s"nation $nat: $noisy != $expect")
    }
  }
}
