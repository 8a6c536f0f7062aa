package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Edge cases for the native expressions, including agreement between the
  * interpreted eval path and whole-stage codegen (both exist and a config
  * flip can switch them — they must never drift).
  */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, "graft-test")

  private def viaDf(exprStr: String): Any = {
    val r = spark.range(1).selectExpr(s"$exprStr AS v").collect().head
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("graft_strhash matches the HOF fold and the known vector") {
    assert(viaDf("graft_strhash('hello')") == 99162322L)
    assert(viaDf("graft_strhash('')") == 0L)
    assert(viaDf("graft_strhash(CAST(NULL AS STRING))") == null)
    // codegen result == interpreted fold result on arbitrary strings
    for (s <- Seq("a", "zz 9!", "the quick brown fox", "x" * 500)) {
      assert(viaDf(s"graft_strhash('$s')") == GraftFunctions.strHash(s))
    }
    // equals the portable HOF formulation evaluated by Spark itself
    val hof = graft.queries.Portable.sparkStrHashHof("'spark graft'")
    assert(viaDf("graft_strhash('spark graft')") == viaDf(hof))
  }

  test("graft_shingles edge cases") {
    assert(viaDf("size(graft_shingles(array('a','b','c','d')))") == 2)
    assert(viaDf("size(graft_shingles(array('a','b','c')))") == 1)
    assert(viaDf("size(graft_shingles(array('a','b')))") == 0)
    assert(viaDf("size(graft_shingles(array()))") == 0)
    // first shingle of [a b c] == combine of the three word hashes
    val ha = GraftFunctions.strHash("a")
    val hb = GraftFunctions.strHash("b")
    val hc = GraftFunctions.strHash("c")
    val want = ((ha * 37 + hb) % GraftFunctions.Mod * 37 + hc) % GraftFunctions.Mod
    assert(viaDf("element_at(graft_shingles(array('a','b','c')), 1)") == want)
  }

  test("graft_minhash equals per-coefficient array_min folds") {
    val arr = "array(CAST(5 AS BIGINT), CAST(123456789 AS BIGINT), CAST(999999999 AS BIGINT))"
    val sig = spark.range(1).selectExpr(s"graft_minhash($arr) AS sig")
      .selectExpr((0 until graft.queries.Portable.MinHashK)
        .map(i => s"element_at(sig, ${i + 1}) AS s$i"): _*)
      .collect().head
    for (i <- 0 until graft.queries.Portable.MinHashK) {
      val a = graft.queries.Portable.minHashA(i)
      val b = graft.queries.Portable.minHashB(i)
      val want = viaDf(s"array_min(transform($arr, x -> ($a * x + $b) % ${GraftFunctions.Mod}))")
      assert(sig.getAs[Long](s"s$i") == want, s"coefficient $i")
    }
  }

  test("graft_simhash equals the conditional-sum formulation") {
    val raw = Seq(5L, 123456789L, 999999999L, 5L) // duplicate counts twice
    val arr = raw.map(v => s"CAST($v AS BIGINT)").mkString("array(", ", ", ")")
    // the vote runs over the MIXED hashes (r17, see GraftFunctions.mix64:
    // raw mod-1e9+7 values have bits 30+ identically zero) — the
    // reference formulation embeds the driver-computed mixed values
    val mixedArr = raw.map(v => s"CAST(${GraftFunctions.mix64(v)} AS BIGINT)")
      .mkString("array(", ", ", ")")
    // full ladder width (r15): the expression always computes
    // SimHashMaxBits; consumers mask down to the corpus dial
    val bits = graft.queries.Portable.SimHashMaxBits
    val sums = (0 until bits).map(j =>
      s"aggregate(transform($mixedArr, x -> CASE WHEN (shiftright(x, $j) & 1) = 1 THEN 1 ELSE -1 END), 0, (a, x) -> a + x)")
    val packed = sums.zipWithIndex
      .map { case (sj, j) => s"(CASE WHEN ($sj) > 0 THEN ${1L << j} ELSE CAST(0 AS BIGINT) END)" }
      .mkString(" + ")
    assert(viaDf(s"graft_simhash($arr)") == viaDf(s"CAST($packed AS BIGINT)"))
    // the anchor-width mask reproduces the historical 32-bit signature
    assert((viaDf(s"graft_simhash($arr)").asInstanceOf[Long] &
      ((1L << graft.queries.Portable.SimHashBits) - 1)) ==
      viaDf(s"graft_simhash($arr) & ${(1L << graft.queries.Portable.SimHashBits) - 1}L"))
    assert(viaDf("graft_simhash(array())") == 0L)
    assert(viaDf("graft_simhash(CAST(NULL AS ARRAY<BIGINT>))") == null)
  }

  test("graft_phash is bit-identical to the staged HOF pipeline on real docs") {
    val d = "/root/testdata/sf0.001"
    val expr = graft.queries.TextOps.phashHashes(spark, d)
      .orderBy(org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val hof = graft.queries.TextOps.phashHashesHof(spark, d)
      .orderBy(org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    graft.queries.Persisted.drain()
    assert(expr.nonEmpty && expr == hof,
      s"codegen phash diverged from the HOF twin (first rows: " +
        s"${expr.take(3)} vs ${hof.take(3)})")
    assert(viaDf("graft_phash(CAST(NULL AS ARRAY<STRING>))") == null)
    assert(viaDf("graft_phash(CAST(array() AS ARRAY<STRING>))") == 0L)
  }

  test("graft_dot edge cases and HOF agreement") {
    assert(viaDf("graft_dot(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT)))") == 3.0)
    assert(viaDf("graft_dot(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))") == null,
      "length mismatch must be NULL")
    assert(viaDf("graft_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))") == null)
    val a = "array(CAST(0.1 AS FLOAT), CAST(-2.5 AS FLOAT), CAST(3.25 AS FLOAT))"
    val hof = graft.queries.Portable.sparkDotHof(a, a)
    assert(viaDf(s"graft_dot($a, $a)") == viaDf(hof))
  }

  test("graft_morton matches the 16-term portable Z expression and known vectors") {
    // interleave(0b11, 0b01) = a bits at even positions, b at odd:
    // a=3 -> 0b0101, b=1 -> 0b0010 => 0b0111 = 7
    assert(viaDf("graft_morton(CAST(3 AS BIGINT), CAST(1 AS BIGINT))") == 7L)
    assert(viaDf("graft_morton(CAST(0 AS BIGINT), CAST(0 AS BIGINT))") == 0L)
    // low-16-bit mask is the caller's job; the expression reads 16 bits
    assert(viaDf("graft_morton(CAST(65535 AS BIGINT), CAST(0 AS BIGINT))") == 0x55555555L)
    for ((a, b) <- Seq((12345L, 54321L), (65535L, 65535L), (1L, 32768L))) {
      val twin = graft.queries.Portable.sparkZ(s"CAST($a AS BIGINT)", s"CAST($b AS BIGINT)")
      assert(viaDf(s"graft_morton(CAST($a AS BIGINT), CAST($b AS BIGINT))") == viaDf(twin),
        s"graft_morton($a, $b) must equal the portable expression")
    }
  }

  test("bloom surface: no false negatives, scalar-subquery probe, arity-2 sizing") {
    // every inserted key MUST probe true (bloom guarantees no false
    // negatives); the probe side takes the bloom as a scalar subquery —
    // the shape join_bloom_prefilter plants
    spark.range(0, 1000).selectExpr("id * 7 AS k")
      .createOrReplaceTempView("bloom_keys")
    val missed = spark.sql("""
      SELECT count(*) AS miss FROM bloom_keys
      WHERE NOT graft_might_contain(
        (SELECT graft_bloom_agg(xxhash64(k)) FROM bloom_keys), xxhash64(k))
    """).collect().head.getLong(0)
    assert(missed == 0, s"bloom filters must never false-negative, missed $missed")
    // explicit estimated-items arity parses and still covers all keys
    val missed2 = spark.sql("""
      SELECT count(*) AS miss FROM bloom_keys
      WHERE NOT graft_might_contain(
        (SELECT graft_bloom_agg(xxhash64(k), CAST(2000 AS BIGINT)) FROM bloom_keys),
        xxhash64(k))
    """).collect().head.getLong(0)
    assert(missed2 == 0)
  }

  test("graft_minus_sorted equals the HOF filter on sorted hot sets") {
    // deterministic pseudo-random cases: duplicates, empty arr, empty
    // hot, all-hot, none-hot — the binary search must match the linear
    // array_contains filter element-for-element (order + multiplicity)
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 30) {
      val arr = Seq.fill(rnd.nextInt(12))(rnd.nextInt(20).toLong)
      val hot = Seq.fill(rnd.nextInt(8))(rnd.nextInt(20).toLong).distinct.sorted
      val arrSql = if (arr.isEmpty) "CAST(array() AS ARRAY<BIGINT>)"
        else arr.mkString("array(CAST(", " AS BIGINT), CAST(", " AS BIGINT))")
      val hotSql = if (hot.isEmpty) "CAST(array() AS ARRAY<BIGINT>)"
        else hot.mkString("array(CAST(", " AS BIGINT), CAST(", " AS BIGINT))")
      val fast = viaDf(s"graft_minus_sorted($arrSql, $hotSql)")
      val slow = viaDf(s"filter($arrSql, x -> NOT array_contains($hotSql, x))")
      assert(fast == slow, s"trial $trial: arr=$arr hot=$hot")
    }
    assert(viaDf("graft_minus_sorted(CAST(NULL AS ARRAY<BIGINT>), array(CAST(1 AS BIGINT)))") == null)
  }

  test("graft_bucket equals the strictly-below count on sorted boundaries") {
    // the quantile-bucket binary search must match the linear filter
    // count element-for-element — duplicates in the boundary array
    // included (approx_percentile can emit repeated quantiles on
    // tie-heavy keys), keys below/above every boundary included
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 30) {
      val bnds = Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(30).toLong).sorted
      val x = rnd.nextInt(40).toLong - 5
      val arrSql = bnds.mkString("array(CAST(", " AS BIGINT), CAST(", " AS BIGINT))")
      val fast = viaDf(s"graft_bucket(CAST($x AS BIGINT), $arrSql)")
      val slow = viaDf(s"CAST(size(filter($arrSql, b -> b < CAST($x AS BIGINT))) AS BIGINT)")
      assert(fast == slow, s"trial $trial: x=$x bnds=$bnds")
    }
    assert(viaDf("graft_bucket(CAST(NULL AS BIGINT), array(CAST(1 AS BIGINT)))") == null)
  }

  test("graft_topk_sum equals the collect_list/sort/slice fold, bounded buffer") {
    // the r18 bitext rewrite: sum of the k largest BIGINTs per group
    // must match the unbounded collect_list form value-for-value on
    // grouped data — ties included (equal values make tie-breaks
    // sum-invariant), groups smaller than k included, single-row
    // groups included. Partial (map-side) merge is exercised by the
    // multi-partition frame.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      (rnd.nextInt(23).toLong, rnd.nextInt(40).toLong - 10L)
    }
    val df = rows.toDF("key", "v").repartition(7)
    for (k <- Seq(1, 4, 9)) {
      val fast = df.groupBy(col("key"))
        .agg(expr(s"graft_topk_sum(v, $k)").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val slow = df.groupBy(col("key"))
        .agg(expr(
          s"""aggregate(
                slice(array_sort(collect_list(struct(-v AS nv, v AS v))), 1, $k),
                CAST(0 AS BIGINT), (a, x) -> a + x.v)""").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(fast == slow, s"k=$k")
    }
    // nulls are skipped; an all-null group yields NULL
    val withNulls = Seq((1L, Some(5L)), (1L, None), (2L, None))
      .toDF("key", "v")
    val got = withNulls.groupBy(col("key"))
      .agg(expr("graft_topk_sum(v, 3)").as("s"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got == Map(1L -> 5L, 2L -> null))
  }

  test("expressions survive with codegen disabled (interpreted path)") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      assert(viaDf("graft_strhash('hello')") == 99162322L)
      assert(viaDf("size(graft_shingles(array('a','b','c','d')))") == 2)
      assert(viaDf("graft_dot(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT)))") == 3.0)
      assert(viaDf("graft_morton(CAST(3 AS BIGINT), CAST(1 AS BIGINT))") == 7L)
      assert(viaDf("graft_minus_sorted(array(CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)), array(CAST(1 AS BIGINT)))") == Seq(2L, 2L))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
