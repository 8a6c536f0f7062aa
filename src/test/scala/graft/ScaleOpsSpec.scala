package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ops.Scale
import graft.engine.Tables

/** Physical-layout tools: bucketed co-located joins (no Exchange in the
  * joined plan) and salted aggregation equivalence.
  */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, "graft-test")
  private val d = "/root/testdata/sf0.001"

  test("bucketed tables join with zero shuffle") {
    // the in-memory catalog forgets tables between JVMs but their files
    // survive in the warehouse dir — clear both before writing
    for (t <- Seq("graft_orders_b", "graft_lineitem_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Scale.writeBucketed(Tables.orders(spark, d), "graft_orders_b", "o_orderkey", 8)
    Scale.writeBucketed(Tables.lineitem(spark, d), "graft_lineitem_b", "l_orderkey", 8)
    // force the shuffle-join path (at this tiny SF the optimizer would
    // broadcast instead, hiding what bucketing buys at scale)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_lineitem_b")
        .join(spark.table("graft_orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      // co-located scans: a sort-merge join with NO exchange on either
      // join key (the only exchange left is the final tiny aggregation)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle on the join keys:\n$plan")

      // and it computes the same result as the unbucketed join
      val want = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      assert(joined.collect().toSet == want.collect().toSet)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("z-ordered layout narrows per-file ranges on the second dimension too") {
    val dir = java.nio.file.Files.createTempDirectory("graft_z").toString
    // a full 256x256 grid: both dimensions wide enough that per-file
    // clustering is measurable (the sf0.001 tables have too few distinct
    // users to show a span difference)
    val grid = spark.range(65536).selectExpr("id % 256 AS a", "id div 256 AS b")
    Scale.writeZOrdered(grid, "a", "b", s"$dir/z", files = 16)
    // single-dimension layout for comparison: range-sorted by b, a left
    // unclustered
    grid.repartitionByRange(16, col("b")).sortWithinPartitions(col("b"))
      .write.parquet(s"$dir/plain")
    def avgASpan(path: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max(col("a")) - min(col("a"))).as("span"))
        .agg(avg(col("span"))).collect().head.getDouble(0)
    val zSpan = avgASpan(s"$dir/z")
    val plainSpan = avgASpan(s"$dir/plain")
    // same rows either way
    assert(spark.read.parquet(s"$dir/z").count() == 65536L)
    // z-order must cluster `a` while the plain b-sort cannot: parquet
    // min/max stats on `a` are then selective for a-filtered scans
    assert(zSpan < plainSpan / 2,
      s"z-order a-span $zSpan not narrower than plain layout $plainSpan")
  }

  test("content-sharded export is stable under input repartitioning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shard").toString
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    Scale.writeContentSharded(docs, s"$dir/a", 8, "text")
    // a reprocessing run with a completely different input layout must
    // produce the identical shard membership
    Scale.writeContentSharded(docs.repartition(13), s"$dir/b", 8, "text")
    def membership(path: String): Set[(Long, Long)] =
      spark.read.parquet(path).select(col("doc_id"), col("_shard").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = membership(s"$dir/a")
    assert(a == membership(s"$dir/b"))
    assert(a.size == docs.count())
    assert(a.map(_._2).size > 1, "rows must actually spread over shards")
  }

  test("salted aggregation equals direct aggregation") {
    val li = Tables.lineitem(spark, d)
    val got = Scale.saltedSumCount(li, col("l_returnflag"), col("l_orderkey"), 16)
      .withColumnRenamed("_key", "l_returnflag")
    val want = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_orderkey")).as("sum_value"), count(lit(1)).as("n"))
    assert(got.collect().toSet == want.collect().toSet)
  }

  test("salted join actually spreads a hot key across many salt groups") {
    // a pathological fixture: ONE join key carries every fact row. The
    // oracle gate already proves saltedJoin is semantics-preserving; this
    // asserts the mechanism — the hot key's rows must occupy well over
    // half of the 8 salt buckets, so no single task inherits the whole
    // key at scale
    val fact = spark.range(10000).selectExpr("CAST(1 AS BIGINT) AS k", "id AS payload")
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(struct(fact.columns.map(col).toSeq: _*)), lit(8)).cast("int"))
    val used = salted.select(col("_salt")).distinct().count()
    assert(used >= 6, s"hot key must spread over most salt buckets, used=$used")
    // and the join through Scale.saltedJoin still matches the plain join
    val dim = spark.range(1).selectExpr("CAST(1 AS BIGINT) AS k", "'d' AS tag")
    val got = Scale.saltedJoin(fact, dim, "k", 8).count()
    assert(got == 10000L, s"salted join must preserve the multiset, got=$got")
  }

  // At 100 TB the difference between scanning one day and scanning the
  // table is the whole game: a filter on the partition column must become
  // a PartitionFilter (directory-level pruning, no file even opened), not
  // a post-scan predicate.
  test("hive-partitioned layout prunes partitions at the scan") {
    val root = java.nio.file.Files.createTempDirectory("graft_part_")
    graft.engine.util.Fs.deleteOnExit(root)
    val days = 10
    spark.range(1000)
      .selectExpr("id", s"concat('2024-01-', lpad(CAST(id % $days + 1 AS STRING), 2, '0')) AS d")
      .write.partitionBy("d").mode("overwrite").parquet(root.toString)
    val one = spark.read.parquet(root.toString).filter(col("d") === "2024-01-03")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-03"),
      s"partition predicate must prune at directory level:\n$plan")
    // pruning is observable, not just planned: the executed scan reads
    // exactly 1 of the 10 partition directories
    assert(one.collect().length === 100)
    val scan = finalPlan(one.queryExecution.executedPlan).collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.get
    assert(scan.metrics("numPartitions").value === 1,
      s"scan must read 1 partition dir, read ${scan.metrics("numPartitions").value}")
  }

  // Nested-schema pruning: projecting one field of a struct column must
  // narrow the parquet ReadSchema to that leaf — at 100 TB a multimodal
  // metadata struct (dims, codec, checksums, provenance) can be wider
  // than the payload pointer, and reading all of it for a width histogram
  // is the nested-column version of SELECT *.
  test("struct field projection prunes the parquet ReadSchema to the leaf") {
    val root = java.nio.file.Files.createTempDirectory("graft_nested_")
    graft.engine.util.Fs.deleteOnExit(root)
    spark.range(100)
      .selectExpr("id",
        "named_struct('width', CAST(id % 16 AS INT), 'height', CAST(id % 9 AS INT), 'codec', 'png') AS meta")
      .write.mode("overwrite").parquet(root.toString)
    val widths = spark.read.parquet(root.toString)
      .groupBy(col("meta.width")).agg(count(lit(1)).as("n"))
    val p = widths.queryExecution.executedPlan.toString
    val read = "ReadSchema: struct<([^>]*>?[^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(read.contains("width"), s"ReadSchema must include the projected leaf:\n$p")
    assert(!read.contains("height") && !read.contains("codec"),
      s"ReadSchema must NOT include unprojected struct leaves, got: $read")
    assert(widths.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap.apply(0) === 7L)
  }

  private def finalPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : org.apache.spark.sql.execution.SparkPlan = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def withConfs[A](kvs: (String, String)*)(f: => A): A = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // Hot keys are the other 100 TB failure mode (one reducer gets the
  // whale partition and the stage never finishes). Salting (above) is
  // the manual tool; AQE's skew-join split is the automatic one — the
  // engine must actually trigger it, not just ship with AQE on.
  test("AQE splits a skewed join partition at runtime") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2") {
      import spark.implicits._
      val left = spark.range(200000).select(lit(0L).as("k"), col("id").as("v"))
        .union(spark.range(900).select((col("id") % 9 + 1).as("k"), col("id").as("v")))
      val right = spark.range(10).select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = left.join(right, Seq("k"))
      // AQE replans at execution time, so execute THIS dataset's plan
      assert(j.collect().length === 200900)
      val plan = finalPlan(j.queryExecution.executedPlan).toString
      assert(plan.contains("skew=true"),
        s"the whale key must trigger an AQE skew split:\n$plan")
    }
  }

  // Runtime bloom-filter pushdown: a selective dim filter whose matching
  // keys are only known at runtime gets compiled into a bloom filter
  // probed on the fact side BEFORE the shuffle — the row-level
  // counterpart of dynamic partition pruning, and the difference between
  // shuffling 100 TB and shuffling the 0.1% that can match.
  test("a selective dim filter injects a runtime bloom filter on the fact side") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val root = java.nio.file.Files.createTempDirectory("graft_bloom_")
      graft.engine.util.Fs.deleteOnExit(root)
      spark.range(100000).selectExpr("id AS fk", "id % 7 AS pay")
        .write.mode("overwrite").parquet(s"$root/fact")
      spark.range(1000).selectExpr("id AS dk", "id % 13 AS attr")
        .write.mode("overwrite").parquet(s"$root/dim")
      val fact = spark.read.parquet(s"$root/fact")
      val dim = spark.read.parquet(s"$root/dim").filter(col("attr") === 3)
      val j = fact.join(dim, col("fk") === col("dk"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("bloom_filter_agg") || opt.contains("might_contain"),
        s"selective join must inject a runtime bloom filter:\n$opt")
      assert(j.count() === 77L) // 1000/13 -> 77 dim keys, 1 fact row each
    }
  }

  // Dynamic partition pruning: when the partition keys worth reading are
  // only known from a filtered dimension, the broadcast of that dimension
  // must be REUSED as a runtime partition filter on the fact scan —
  // otherwise a 100 TB fact table is read in full to join against 2 days.
  test("dynamic partition pruning injects the dim filter into the fact scan") {
    val root = java.nio.file.Files.createTempDirectory("graft_dpp_")
    graft.engine.util.Fs.deleteOnExit(root)
    spark.range(1000)
      .selectExpr("id", "CAST(id % 10 AS LONG) AS day_id")
      .write.partitionBy("day_id").mode("overwrite").parquet(root.toString)
    val fact = spark.read.parquet(root.toString)
    val dim = spark.range(10).selectExpr("id AS day_id", "id % 5 = 0 AS keep")
    val joined = fact.join(dim.filter(col("keep")), Seq("day_id"))
      .groupBy(col("day_id")).agg(count(lit(1)).as("n"))
    val planned = joined.queryExecution.executedPlan.toString
    assert(planned.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a dynamic pruning subquery:\n$planned")
    // the partition column reads back as its inferred (integer) type
    val rows = joined.collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getAs[Number](1).longValue()).toMap
    assert(rows === Map(0L -> 100L, 5L -> 100L))
  }

  // Hot-key cap: the r8 1M-doc LSH episode is the precedent that
  // documented fanout bounds rot — capHotKeys ENFORCES them. Inject a
  // pathological key and assert the pair stage stays linear.
  test("capHotKeys keeps candidate pairs linear when a hot key is injected") {
    import spark.implicits._
    // background: 1000 keys x 4 actors each -> 1000 * C(4,2) = 6000 pairs
    val bg = (1 to 1000).flatMap(k => (1 to 4).map(a => (k.toLong, (k * 10000 + a).toLong)))
    // hot key 0: 2000 actors -> C(2000,2) ~ 2M pairs uncapped (333x the
    // background) — one key dominating the whole stage
    val hot = (1 to 2000).map(a => (0L, 90000000L + a))
    val df = (bg ++ hot).toDF("p", "c")
    val capped = Scale.capHotKeys(df, col("p"), 256)
    assert(capped.where(col("p") === 0).count() == 0, "over-cap key must be dropped")
    assert(capped.count() == bg.size.toLong, "under-cap keys must be untouched")
    val pairs = capped.select(col("p"), col("c").as("ca"))
      .join(capped.select(col("p").as("p2"), col("c").as("cb")),
        col("p") === col("p2") && col("ca") < col("cb"))
    assert(pairs.count() == 6000L, "capped pair count must be the linear background")
    // plan shape: aggregate + anti-join, never a per-key count window
    // (the windowed form would materialize the hot partition first)
    val plan = capped.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("LeftAnti"), s"cap must drop hot keys via anti-join:\n$plan")
    assert(!"(?m)^\\(\\d+\\) Window".r.findFirstIn(plan).isDefined,
      s"cap must not use a window operator:\n$plan")
  }

  test("stats manifest prunes files under a selective box and preserves values") {
    import graft.engine.ops.StatsManifest
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_manifest_")
    graft.engine.util.Fs.deleteOnExit(out)
    // two clustered dimensions so z-order gives each file narrow bounds
    val df = (1 to 4000).map { i =>
      val h = (i * 2654435761L) % 1000003L
      (h % 256L, (h / 7) % 256L, i.toLong)
    }.toDF("a", "b", "v")
    StatsManifest.writeZOrderedWithStats(df, "a", "b", out.toString, files = 8)
    // the manifest covers every file with both columns' bounds
    val m = StatsManifest.manifest(spark, out.toString)
    assert(m.count() == 8)
    assert(m.columns.toSet ==
      Set("file", "n", "a_min", "a_max", "b_min", "b_max"))
    // selective box: values equal the full-scan filter, and the planner
    // provably opened fewer files than the table holds
    val scan = StatsManifest.prunedRead(spark, out.toString,
      Seq(("a", 0L, 31L), ("b", 0L, 31L)))
    assert(scan.filesTotal == 8)
    assert(scan.filesRead < scan.filesTotal,
      s"selective box must skip files: read ${scan.filesRead} of ${scan.filesTotal}")
    val got = scan.df.orderBy("v").collect().map(_.toSeq).toSeq
    val want = spark.read.parquet(out.toString)
      .where(col("a").between(0, 31) && col("b").between(0, 31))
      .orderBy("v").collect().map(_.toSeq).toSeq
    assert(got == want, "pruned read must be value-identical to the full scan")
    assert(got.nonEmpty, "fixture must select something or the test is vacuous")
    // out-of-range box: zero files read, empty result, schema preserved
    val none = StatsManifest.prunedRead(spark, out.toString,
      Seq(("a", 10000L, 20000L)))
    assert(none.filesRead == 0 && none.df.count() == 0)
    assert(none.df.columns.toSeq == Seq("a", "b", "v"))
  }

  test("property: manifest-pruned reads equal full-scan filters on random boxes") {
    // randomized value-identity sweep: for arbitrary data (negative
    // keys, ties, NULL stripes) and arbitrary boxes — including empty,
    // point, and everything boxes — the pruned read must return exactly
    // the full scan's rows; skipping is load shedding, never semantics
    import graft.engine.ops.StatsManifest
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val out = java.nio.file.Files.createTempDirectory("graft_manifest_p_")
    graft.engine.util.Fs.deleteOnExit(out)
    val df = (1 to 3000).map { i =>
      val h = (i * 2654435761L) % 1000003L
      val a = (h % 400L) - 200L                       // negative + ties
      val b = if (h % 11 == 0) null
              else java.lang.Long.valueOf((h / 3) % 500L) // NULL stripe
      (a, b, i.toLong)
    }.toDF("a", "b", "v")
    StatsManifest.writeZOrderedWithStats(df, "a", "v", out.toString, files = 6)
    val full = spark.read.parquet(out.toString)
    for (trial <- 1 to 8) {
      val (lo, hi) = {
        val x = rnd.nextLong() % 500L; val y = rnd.nextLong() % 500L
        (math.min(x, y), math.max(x, y))
      }
      val ranges =
        if (trial % 3 == 0) Seq(("a", lo, hi), ("v", 1L, 1500L))
        else Seq(("a", lo, hi))
      val scan = StatsManifest.prunedRead(spark, out.toString, ranges)
      val residual = ranges.map { case (c, l, h) =>
        col(c) >= l && col(c) <= h }.reduce(_ && _)
      val got = scan.df.orderBy("v").collect().map(_.toSeq).toSeq
      val want = full.where(residual).orderBy("v").collect().map(_.toSeq).toSeq
      assert(got == want, s"trial $trial box $ranges: pruned != full")
      assert(scan.filesRead <= scan.filesTotal)
    }
  }
}
