package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (with whole-stage codegen) for the hot
  * paths of the dedup/similarity operators. Each is semantically
  * IDENTICAL to the higher-order-function formulation in
  * graft.queries.Portable — same left-to-right fold order, same modulus —
  * so the DuckDB oracle comparison stays exact; they exist purely to
  * replace per-element lambda evaluation with a tight generated loop.
  *
  * (The reference itself needs no custom expressions — its whole pipeline
  * is built-ins, SURVEY.md §2.11 — these serve the §7.6 extension
  * operators at 100 TB scale.)
  */
object GraftFunctions {

  val Mod = 1000000007L

  /** Register SQL-callable names on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_strhash", es => PolyHash(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_dot", es => FloatDot(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_shingles", es => ShingleHashes(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash", es => MinHashSig(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash", es => SimHashSig(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_phash", es => PHashSig(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_morton", es => MortonInterleave(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_minus_sorted", es => MinusSorted(es.head, es(1)), "built-in")
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its
    // runtime-filter rule (SPARK-32268) but does NOT expose them in the
    // SQL registry; surfacing them under graft names turns the engine's
    // semi-join prefilter into a first-class operator (join_bloom_
    // prefilter). Arity: graft_bloom_agg(longCol[, estimatedItems]),
    // graft_might_contain(bloomBinary, longCol). Construction goes
    // through BloomShim — the internal constructors are the only
    // private-API surface in the library.
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      es => BloomShim.agg(es.head, es.drop(1).headOption), "built-in")
    reg.createOrReplaceTempFunction("graft_might_contain",
      es => BloomShim.mightContain(es.head, es(1)), "built-in")
    // quantile-boundary bucket id (r18, guide §2.5): the count of
    // sorted-ascending boundaries strictly below the key, by binary
    // search — O(log fan) per row where the straight-line CASE sum is
    // O(fan) AND stops being JIT-compiled past ~128 terms (HotSpot's
    // huge-method limit), which measured 3x slower at a 256 fan over
    // the 300x suffix corpus. Arity: graft_bucket(longCol, sortedArr).
    reg.createOrReplaceTempFunction("graft_bucket",
      es => BoundaryBucket(es.head, es(1)), "built-in")
    // bounded top-k sum (r18, guide §5): sum of the k largest BIGINT
    // values per group with an O(k) aggregation buffer — the
    // collect_list/array_sort/slice form buffers every row of a group
    // before discarding all but k, so one skewed key at 100 TB pays
    // executor memory proportional to its candidate count. Arity:
    // graft_topk_sum(longCol, k) with k a literal INT.
    reg.createOrReplaceTempFunction("graft_topk_sum",
      es => TopKSumAgg(es.head, es(1)), "built-in")
  }

  /** Single choke point for the Spark-INTERNAL bloom expressions
    * (`BloomFilterAggregate` / `BloomFilterMightContain`). Their
    * constructors are `private[sql]`-adjacent internal API with no
    * deprecation cycle and have changed signature across Spark minors —
    * so this shim is the ONLY place that names them (r7 ADVICE).
    *
    * PINNED: verified against Spark 4.1.x (the `/opt/spark/jars` this
    * build compiles and tests with; FunctionsSpec's no-false-negative
    * property is the behavioral gate). On a Spark bump: a source rebuild
    * surfaces a signature change here as a compile error; a binary swap
    * (running against newer jars than compiled) surfaces it as the
    * pinned IllegalStateException below instead of an opaque
    * LinkageError deep in query execution.
    */
  private object BloomShim {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain

    private def pinned(what: String, e: LinkageError): Nothing =
      throw new IllegalStateException(
        s"$what: Spark-internal constructor signature changed " +
          "(graft pins Spark 4.1.x) — update graft.functions.BloomShim " +
          "for this Spark version", e)

    def agg(child: Expression, estimatedItems: Option[Expression]): Expression =
      try estimatedItems match {
        case Some(n) => new BloomFilterAggregate(child, n)
        case None => new BloomFilterAggregate(child, 100000L)
      } catch { case e: LinkageError => pinned("graft_bloom_agg", e) }

    def mightContain(bloom: Expression, value: Expression): Expression =
      try BloomFilterMightContain(bloom, value)
      catch { case e: LinkageError => pinned("graft_might_contain", e) }
  }

  /** Shared scalar fold (the strhash semantics) for reuse in eval paths. */
  def strHash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) { acc = (acc * 31L + s.charAt(i)) % Mod; i += 1 }
    acc
  }

  /** Two-round xorshift64 (13, 7, 17) finalizer — spreads a mod-1e9+7
    * polynomial hash across all 64 bits (r17, found by the ladder recall
    * audit): shingle hashes are < 2^30, so a simhash voting on their raw
    * bits has bits 30..63 IDENTICALLY ZERO — every width-ladder rung
    * past 30 bits added constant bits, bucket space stopped doubling,
    * and per-bucket occupancy silently went linear in the corpus again
    * (the exact hot-bucket quadratic the ladder exists to prevent),
    * invisible to the gate because the oracle mirrored the same dead
    * bits. Two rounds because one round of (13,7,17) on < 2^30 inputs
    * still leaves bits 60..63 dead (the first pass only reaches bit
    * 29+13+17 = 59). Bijective on 64-bit ints, so distinct shingles stay
    * distinct; measured bit balance on mod-1e9+7 inputs: every bit
    * 0.498..0.503, pairwise-independent at the 1e-2 level. The DuckDB
    * twin (Dedup.duckSimHashMix) emulates the wrapping shifts in UBIGINT
    * with pre-masked multiplies, validated value-identical.
    */
  def mix64(x0: Long): Long = {
    var x = x0
    var r = 0
    while (r < 2) {
      x ^= x << 13
      x ^= x >>> 7
      x ^= x << 17
      r += 1
    }
    x
  }

  /** 8x8 DCT-II basis, e4-scaled to integers — the single source both the
    * [[PHashSig]] expression and the query packs' SQL-literal twins embed,
    * so the transform is exact BIGINT arithmetic with no per-engine cosine
    * evaluation (basis drift between the dialects would break the gate).
    */
  val PhashBasis: Array[Long] = (0 until 8).flatMap { u =>
    (0 until 8).map { i =>
      val c = math.cos((2 * i + 1) * u * math.Pi / 16.0)
      val norm = if (u == 0) math.sqrt(1.0 / 8.0) else math.sqrt(2.0 / 8.0)
      math.floor(norm * c * 10000.0 + 0.5).toLong
    }
  }.toArray
}

/** Count of elements of a SORTED-ascending long array strictly below a
  * long key, by binary search — the quantile-equalized bucket id of
  * GlobalOrder / SuffixArray (r18). Identical to the straight-line
  * `sum(CASE WHEN x > b THEN 1 ELSE 0 END)` fold and to
  * `size(filter(arr, b -> b < x))` for sorted input (duplicate
  * boundaries included: the search finds the FIRST element >= x, so
  * every strictly-smaller duplicate counts, exactly as the sum does).
  * Contract: `right` MUST be sorted ascending (approx_percentile output
  * is); a violation returns a monotone-but-shifted bucket, which the
  * offset stitch would still correct only if monotone — callers pass
  * sketch output, never data-dependent arrays.
  */
case class BoundaryBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bucket"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (left.dataType == LongType && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bucket expects (BIGINT, ARRAY<BIGINT>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[Long]
    val arr = r.asInstanceOf[ArrayData]
    var lo = 0
    var hi = arr.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getLong(mid) < x) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, arr) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0, $hi = $arr.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($arr.getLong($mid) < $x) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = (long) $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BoundaryBucket =
    copy(left = l, right = r)
}

/** Sum of the k LARGEST non-null BIGINT values per group, with an O(k)
  * aggregation buffer (r18, guide §5). Semantically identical to
  * `aggregate(slice(array_sort(collect_list(...)), 1, k), 0, sum)` over
  * any top-k-by-value ordering: the sum depends only on the MULTISET of
  * kept values, so tie-breaks among equal values cannot change it —
  * while collect_list buffers a group's every row before discarding all
  * but k (executor memory proportional to the hottest key's row count).
  * Buffer layout: element 0 = n (values kept), elements 1..n = the kept
  * values, ascending. NULL inputs are skipped (callers feed non-null
  * measures); an all-NULL/empty group yields NULL, matching the fold
  * over an empty slice... which cannot occur under groupBy (every group
  * has a row), so the NULL is defensive only.
  */
case class TopKSumAgg(child: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[Array[Long]] {

  private lazy val k: Int = kExpr match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _: IntegerType) =>
      v.asInstanceOf[Int]
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _: LongType) =>
      v.asInstanceOf[Long].toInt
    case other =>
      throw new IllegalArgumentException(
        s"graft_topk_sum: k must be an integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_topk_sum"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType && k > 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_topk_sum expects (BIGINT, positive INT literal), got " +
          s"(${child.dataType.simpleString}, $kExpr)")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](k + 1)

  /** Insert v keeping the k largest; buf(0) = n, buf(1..n) ascending. */
  private def insert(buf: Array[Long], v: Long): Array[Long] = {
    val n = buf(0).toInt
    if (n < k) {
      // insertion into the ascending prefix
      var i = n
      while (i > 0 && buf(i) > v) { buf(i + 1) = buf(i); i -= 1 }
      buf(i + 1) = v
      buf(0) = n + 1
    } else if (v > buf(1)) {
      // evict the minimum, re-place v
      var i = 1
      while (i < k && buf(i + 1) < v) { buf(i) = buf(i + 1); i += 1 }
      buf(i) = v
    }
    buf
  }

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else insert(buf, v.asInstanceOf[Long])
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 1
    val n = other(0).toInt
    var b = buf
    while (i <= n) { b = insert(b, other(i)); i += 1 }
    b
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(0).toInt
    if (n == 0) null
    else {
      var s = 0L
      var i = 1
      while (i <= n) { s += buf(i); i += 1 }
      s
    }
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSumAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** Polynomial rolling hash mod 1e9+7 over the characters of a string —
  * codegen twin of Portable.sparkStrHash (aggregate over ascii(substr)).
  * Character iteration is UTF-16 units, equal to per-character codepoints
  * for the BMP/ASCII corpus this engine hashes.
  */
case class PolyHash(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_strhash"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * 31L + s.charAt(i)) % GraftFunctions.Mod
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * 31L + $s.charAt($i)) % ${GraftFunctions.Mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** Word-3-gram shingle hashes of a string array in one generated loop:
  * per-word polynomial hashes (identical to PolyHash) combined as
  * ((h1*37 + h2) % P * 37 + h3) % P per consecutive triple. Returns an
  * empty array for fewer than 3 words. One codegen'd pass replaces a
  * words-explode + window-lead (shuffle) or an interpreted HOF lambda.
  */
case class ShingleHashes(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingles"

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) { wh(i) = GraftFunctions.strHash(arr.getUTF8String(i).toString); i += 1 }
    val m = math.max(n - 2, 0)
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      out(i) = ((wh(i) * 37 + wh(i + 1)) % GraftFunctions.Mod * 37 + wh(i + 2)) % GraftFunctions.Mod
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val wh = ctx.freshName("wh")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      s"""
         |int $n = $c.numElements();
         |long[] $wh = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  java.lang.String $s = $c.getUTF8String($i).toString();
         |  long $acc = 0L;
         |  for (int $j = 0; $j < $s.length(); $j++) {
         |    $acc = ($acc * 31L + $s.charAt($j)) % ${GraftFunctions.Mod}L;
         |  }
         |  $wh[$i] = $acc;
         |}
         |int $m = $n - 2 > 0 ? $n - 2 : 0;
         |long[] $out = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  $out[$i] = ($wh[$i] * 37L + $wh[$i + 1]) % ${GraftFunctions.Mod}L * 37L;
         |  $out[$i] = ($out[$i] + $wh[$i + 2]) % ${GraftFunctions.Mod}L;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** The 16 MinHash minima over a shingle-hash array in one generated
  * loop (coefficients baked in from Portable's family). NULL-free input
  * assumed (produced by ShingleHashes). Empty input yields an array of
  * Long.MaxValue — callers filter size >= 3 upstream.
  */
case class MinHashSig(child: Expression)
    extends UnaryExpression {

  // the same coefficient family the oracle SQL is generated from
  private val K = graft.queries.Portable.MinHashK
  private val A: Array[Long] = graft.queries.Portable.minHashA.toArray
  private val B: Array[Long] = graft.queries.Portable.minHashB.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash"

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = Array.fill(K)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var k = 0
      while (k < K) {
        val h = (A(k) * x + B(k)) % GraftFunctions.Mod
        if (h < out(k)) out(k) = h
        k += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      val as = ctx.freshName("as")
      val bs = ctx.freshName("bs")
      val aRef = ctx.addReferenceObj("minhashA", A, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", B, "long[]")
      s"""
         |int $n = $c.numElements();
         |long[] $as = $aRef;
         |long[] $bs = $bRef;
         |long[] $out = new long[$K];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $c.getLong($i);
         |  for (int $k = 0; $k < $K; $k++) {
         |    long $h = ($as[$k] * $x + $bs[$k]) % ${GraftFunctions.Mod}L;
         |    if ($h < $out[$k]) $out[$k] = $h;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** SimHash signature over a shingle-hash array in one generated loop:
  * per-bit +1/-1 counts over every element (duplicates count, matching
  * the exploded-row formulation), packed to the bits with positive count.
  * Replaces an explode + groupBy(doc_id) with 32 conditional-sum
  * aggregates — i.e. a full shuffle of the exploded shingle table — with
  * a row-local map over the document scan (signature extraction at
  * 100 TB must not shuffle).
  */
case class SimHashSig(child: Expression)
    extends UnaryExpression {

  // full-width signature (r15): consumers mask down to the corpus
  // ladder's width (Dedup.simhashBits), so one row-local pass serves
  // every scale — the anchor-width output is the masked low 32 bits
  private val Bits = graft.queries.Portable.SimHashMaxBits

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash"

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      // mix64: shingle hashes are mod-1e9+7 (< 2^30) — voting on their
      // raw bits leaves bits 30+ constant (r17, see GraftFunctions.mix64)
      val x = GraftFunctions.mix64(arr.getLong(i))
      var j = 0
      while (j < Bits) {
        counts(j) += (if (((x >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < Bits) { if (counts(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val r = ctx.freshName("r")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $c.numElements();
         |int[] $counts = new int[$Bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $c.getLong($i);
         |  for (int $r = 0; $r < 2; $r++) {
         |    $x ^= $x << 13; $x ^= $x >>> 7; $x ^= $x << 17;
         |  }
         |  for (int $j = 0; $j < $Bits; $j++) {
         |    $counts[$j] += ((($x >> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < $Bits; $j++) {
         |  if ($counts[$j] > 0) $sig |= 1L << $j;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

/** 63-bit perceptual hash of a word array in ONE generated loop — the
  * codegen twin of the staged HOF pipeline in TextOps (bins -> 64-bin
  * content histogram -> separable integer 2D DCT -> AC median -> sign
  * bits), stage-for-stage and fold-for-fold, so the DuckDB oracle twin
  * stays exact. Replaces SIX interpreted-HOF projection stages with
  * persist barriers between them (the barriers existed only to stop
  * CollapseProject re-evaluating the interpreted lambdas ~500,000x; a
  * single expression has nothing to collapse): signature extraction
  * becomes a narrow codegen'd map over the document scan, the 100 TB
  * shape, with zero caching.
  */
case class PHashSig(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_phash"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_phash expects ARRAY<STRING>, got ${t.simpleString}")
    }

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val bf = GraftFunctions.PhashBasis
    val gr = new Array[Long](64)
    var i = 0
    while (i < n) {
      gr((GraftFunctions.strHash(arr.getUTF8String(i).toString) % 64).toInt) += 1
      i += 1
    }
    val rt = new Array[Long](64)
    var t = 0
    while (t < 64) {
      var acc = 0L
      var j = 0
      while (j < 8) { acc += bf((t / 8) * 8 + j) * gr(j * 8 + (t % 8)); j += 1 }
      rt(t) = acc
      t += 1
    }
    val dc = new Array[Long](64)
    var k = 0
    while (k < 64) {
      var acc = 0L
      var j = 0
      while (j < 8) { acc += bf((k % 8) * 8 + j) * rt((k / 8) * 8 + j); j += 1 }
      dc(k) = acc
      k += 1
    }
    val tail = java.util.Arrays.copyOfRange(dc, 1, 64)
    java.util.Arrays.sort(tail)
    val med = tail(31)
    var h = 0L
    k = 1
    while (k < 64) { if (dc(k) > med) h |= 1L << (k - 1); k += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bf = ctx.addReferenceObj("phashBasis", GraftFunctions.PhashBasis, "long[]")
      val n = ctx.freshName("n")
      val gr = ctx.freshName("gr")
      val rt = ctx.freshName("rt")
      val dc = ctx.freshName("dc")
      val tail = ctx.freshName("tail")
      val med = ctx.freshName("med")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $c.numElements();
         |long[] $gr = new long[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  java.lang.String $s = $c.getUTF8String($i).toString();
         |  long $acc = 0L;
         |  for (int $j = 0; $j < $s.length(); $j++) {
         |    $acc = ($acc * 31L + $s.charAt($j)) % ${GraftFunctions.Mod}L;
         |  }
         |  $gr[(int) ($acc % 64L)] += 1L;
         |}
         |long[] $rt = new long[64];
         |for (int $k = 0; $k < 64; $k++) {
         |  long $acc = 0L;
         |  for (int $j = 0; $j < 8; $j++) {
         |    $acc += $bf[($k / 8) * 8 + $j] * $gr[$j * 8 + ($k % 8)];
         |  }
         |  $rt[$k] = $acc;
         |}
         |long[] $dc = new long[64];
         |for (int $k = 0; $k < 64; $k++) {
         |  long $acc = 0L;
         |  for (int $j = 0; $j < 8; $j++) {
         |    $acc += $bf[($k % 8) * 8 + $j] * $rt[($k / 8) * 8 + $j];
         |  }
         |  $dc[$k] = $acc;
         |}
         |long[] $tail = java.util.Arrays.copyOfRange($dc, 1, 64);
         |java.util.Arrays.sort($tail);
         |long $med = $tail[31];
         |long $h = 0L;
         |for (int $k = 1; $k < 64; $k++) {
         |  if ($dc[$k] > $med) $h |= 1L << ($k - 1);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PHashSig =
    copy(child = newChild)
}

/** Dot product of two float arrays accumulated left-to-right in double —
  * codegen twin of Portable.sparkDot (aggregate over zip_with), so
  * results are bit-identical to the HOF form and the DuckDB oracle fold.
  * NULL if either array is NULL or lengths differ (zip_with would pad
  * with NULLs and poison the fold the same way).
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      val n = a.numElements()
      while (i < n) {
        acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatDot =
    copy(left = l, right = r)
}

/** Morton (Z-order) interleave of the low 16 bits of two longs — codegen
  * twin of Portable.sparkZ (the 16-term shiftleft/shiftright sum). One
  * generated loop replaces 96 expression nodes in the layout path, which
  * matters because the z-key is computed for EVERY row being laid out.
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_morton"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_morton expects (BIGINT, BIGINT), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Long]
    val b = r.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val z = ctx.freshName("z")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < 16; $i++) {
         |  $z |= (($a >> $i) & 1L) << (2 * $i);
         |  $z |= (($b >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MortonInterleave =
    copy(left = l, right = r)
}

/** Order- and multiplicity-preserving subtraction of a SORTED long array
  * from a long array: returns the elements of `left` (in their original
  * order, duplicates kept) that do not occur in `right`, located by
  * binary search — O(|left| * log |right|) per row against the
  * O(|left| * |right|) linear scan of
  * `filter(arr, x -> NOT array_contains(hot, x))`.
  *
  * This is the stop-shingle cap's hot path: the broadcast hot set grows
  * with corpus size (the 1M-doc StressFunnel leg measured the HOF
  * linear scan dominating signature extraction), while the binary
  * search keeps the per-row cost flat in everything but log |hot|.
  * Contract: `right` MUST be sorted ascending (hotShingleArrFrom emits
  * sort_array(collect_list(..))); a violation silently keeps elements.
  * Semantically identical to the HOF filter for sorted `right` —
  * FunctionsSpec pins the equivalence property.
  */
case class MinusSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minus_sorted"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_minus_sorted expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val arr = l.asInstanceOf[ArrayData]
    val hot = r.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val h = hot.numElements()
    val out = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var lo = 0
      var hi = h - 1
      var found = false
      while (lo <= hi && !found) {
        val mid = (lo + hi) >>> 1
        val v = hot.getLong(mid)
        if (v == x) found = true
        else if (v < x) lo = mid + 1
        else hi = mid - 1
      }
      if (!found) { out(m) = x; m += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(out, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val v = ctx.freshName("v")
      val found = ctx.freshName("found")
      s"""
         |int $n = $a.numElements();
         |int $h = $b.numElements();
         |long[] $out = new long[$n];
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $a.getLong($i);
         |  int $lo = 0, $hi = $h - 1;
         |  boolean $found = false;
         |  while ($lo <= $hi && !$found) {
         |    int $mid = ($lo + $hi) >>> 1;
         |    long $v = $b.getLong($mid);
         |    if ($v == $x) $found = true;
         |    else if ($v < $x) $lo = $mid + 1;
         |    else $hi = $mid - 1;
         |  }
         |  if (!$found) $out[$m++] = $x;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  java.util.Arrays.copyOf($out, $m));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinusSorted =
    copy(left = l, right = r)
}
