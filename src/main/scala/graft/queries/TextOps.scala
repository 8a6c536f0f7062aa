package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables

/** Text-analysis operators over the documents table: language-ID
  * (stopword-profile heuristic), quality scoring, token counting
  * (BPE-ish regex), document fingerprinting (polynomial rolling hash) and
  * a multimodal binary-column pipeline (text bytes standing in for opaque
  * media payloads; see graft.engine.multimodal for the decode plumbing).
  *
  * The reference has no text analytics (its only analytical surface is
  * DuckDB count and group-by, reference: demos/duckdb.tape:22-34); these
  * are the training-data-pipeline extensions from SURVEY.md §7.6.
  *
  * Scale notes: every query here is a narrow map over documents followed
  * by at most one hash aggregation — no joins, no skew risk; at 100 TB the
  * scans partition by input splits and the only shuffle carries the small
  * aggregated result. Term explosion (text_top_terms) does map-side
  * partial aggregation before its single shuffle.
  */
object TextOps extends QueryPack {
  import Portable._

  /** Keyword profiles for the heuristic language scorer. The corpus is a
    * synthetic query-engine vocabulary, so the "languages" are profiles
    * over that vocabulary; the classifier machinery (score per profile,
    * argmax with fixed priority) is the real operator under test.
    */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "data", "value"),
    "es" -> Seq("query", "row", "table"),
    "de" -> Seq("join", "merge", "group"),
    "fr" -> Seq("filter", "sort", "order"),
    "zh" -> Seq("scan", "hash", "stream"))

  private[queries] val stopwords = Seq("the", "a", "or", "and")

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Count of words from ws that are in the given set — identical syntax
    * in Spark SQL and DuckDB except the size function name.
    */
  private def scoreExpr(words: Seq[String], sizeFn: String, filterFn: String): String =
    s"CAST($sizeFn($filterFn(ws, w -> w IN ${inList(words)})) AS BIGINT)"

  private[queries] def sparkScore(words: Seq[String]): String = scoreExpr(words, "size", "filter")
  private[queries] def duckScore(words: Seq[String]): String = scoreExpr(words, "len", "list_filter")

  /** argmax over profile scores with fixed priority order (first wins
    * ties) — a CASE chain valid in both dialects over columns s_en...
    */
  private val predCase: String = {
    val names = profiles.map(_._1)
    val whens = names.zipWithIndex.map { case (n, i) =>
      val later = names.drop(i + 1)
      val conds = (if (later.isEmpty) Seq("TRUE")
                   else later.map(o => s"s_$n >= s_$o")).mkString(" AND ")
      s"WHEN $conds THEN '$n'"
    }
    s"CASE ${whens.mkString(" ")} END"
  }

  private[graft] val TokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  private val PunctPattern = "[^.,!?;:]"

  /** PII patterns for text_pii_redact, written in the common subset of
    * Java regex (Spark) and RE2 (DuckDB): no backslash classes, no
    * lookaround — character classes and counted repetition only.
    */
  private val EmailRe = "[a-z0-9]+@[a-z0-9.]+"
  private val PhoneRe = "[+]1-555-[0-9]{4}"

  // ---- shared BPE machinery (text_bpe_encode + text_token_fertility) ----
  // The top-k corpus character-pair counts become the merge table (the
  // same ranking text_bpe_pairs reports); the encode applies each merge
  // row-locally with a greedy left-to-right whole-token fold. See the
  // text_bpe_encode Scaladoc for the fixpoint argument and the '|'
  // separator-collision contract.

  // ---- shared pHash machinery (multimodal_phash_pairs) ----

  /** 8x8 DCT-II basis, e4-scaled to integers — single source of truth in
    * GraftFunctions (the codegen'd graft_phash embeds the same array),
    * rendered as literals in both SQL dialects here.
    */
  private val PhashBasis: Seq[Long] =
    graft.functions.GraftFunctions.PhashBasis.toSeq

  /** Staged pHash expressions (grid over `ws` -> dct over `gr` ->
    * sign bits over `dc`), Spark dialect; the query chains them through
    * selectExprs. The grid is the payload's 64-bin CONTENT HISTOGRAM
    * (word counts binned by the portable polynomial hash) — the
    * perceptual-feature plane a real media decode produces (image
    * intensity histogram / pooled luma); raw byte taps were measured
    * useless here (near-dups landed at the random-hamming baseline,
    * ~31/63 bits, because text bytes have no smooth 2D structure and
    * length changes misalign every tap), while the histogram is
    * edit-robust: known near-dup pairs land at hamming 0-2.
    */
  private val phSparkBins: String = "transform(ws, w -> graft_strhash(w) % 64)"
  private val phSparkGrid: String =
    "transform(sequence(0, 63), m -> " +
      "CAST(size(filter(bs, b -> b = m)) AS BIGINT))"
  /** Basis as a per-row COLUMN (`bf`), not a literal inside the lambda:
    * HOFs are interpreted, and a literal array inside the innermost
    * lambda is re-constructed on EVERY evaluation — 64x64 evaluations x
    * two references made the hash minutes-slow; as a column it builds
    * once per row.
    */
  private val phashBasisSql: String = PhashBasis.mkString("array(", "L, ", "L)")
  /** SEPARABLE 2D DCT — row pass then column pass (512 integer ops each
    * instead of the naive 4096): rt[u*8+j] = sum_i B[u][i]*g[i*8+j],
    * C[u*8+v] = sum_j B[v][j]*rt[u*8+j]. Integer arithmetic, so the
    * regrouping is exactly the naive double sum.
    */
  private val phSparkRowT: String =
    "transform(sequence(0, 63), t -> " +
      "aggregate(sequence(0, 7), CAST(0 AS BIGINT), (acc, i) -> " +
      "acc + element_at(bf, CAST((t div 8) * 8 + i AS INT) + 1)" +
      " * element_at(gr, CAST(i * 8 + (t % 8) AS INT) + 1)))"
  private val phSparkDct: String =
    "transform(sequence(0, 63), k -> " +
      "aggregate(sequence(0, 7), CAST(0 AS BIGINT), (acc, j) -> " +
      "acc + element_at(bf, CAST((k % 8) * 8 + j AS INT) + 1)" +
      " * element_at(rt, CAST((k div 8) * 8 + j AS INT) + 1)))"
  private val phSparkMed: String = "element_at(array_sort(slice(dc, 2, 63)), 32)"
  private val phSparkBits: String =
    """aggregate(sequence(1, 63), CAST(0 AS BIGINT),
       (acc, k) -> acc + CASE WHEN element_at(dc, CAST(k AS INT) + 1) > med
         THEN shiftleft(CAST(1 AS BIGINT), CAST(k AS INT) - 1)
         ELSE CAST(0 AS BIGINT) END)"""

  /** DuckDB twins — identical taps, identical integer basis literals,
    * identical fold orders; the oracle chains them through CTEs.
    */
  private val phDuckBins: String =
    s"""list_transform(ws, w -> (${duckStrHash("w")}) % 64)"""
  private val phDuckGrid: String =
    "list_transform(range(0, 64), m -> " +
      "CAST(len(list_filter(bs, b -> b = m)) AS BIGINT))"
  private val phDuckBf: String = PhashBasis.mkString("[", ", ", "]")
  private val phDuckRowT: String =
    "list_transform(range(0, 64), t -> " +
      "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 8), i -> " +
      "bf[CAST((t // 8) * 8 + i AS INT) + 1]" +
      " * gr[CAST(i * 8 + (t % 8) AS INT) + 1])), (acc, x) -> acc + x))"
  private val phDuckDct: String =
    "list_transform(range(0, 64), k -> " +
      "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 8), j -> " +
      "bf[CAST((k % 8) * 8 + j AS INT) + 1]" +
      " * rt[CAST((k // 8) * 8 + j AS INT) + 1])), (acc, x) -> acc + x))"
  private val phDuckMed: String = "list_sort(dc[2:64])[32]"
  private val phDuckBits: String =
    """list_reduce(list_prepend(CAST(0 AS BIGINT),
       list_transform(range(1, 64), k ->
         CASE WHEN dc[CAST(k AS INT) + 1] > med
              THEN (CAST(1 AS BIGINT) << (CAST(k AS INT) - 1))
              ELSE CAST(0 AS BIGINT) END)), (acc, x) -> acc + x)"""

  /** The pHash pipeline: (doc_id, h) — ONE codegen'd expression over the
    * document scan (r11; was six interpreted-HOF projection stages with
    * load-bearing persist barriers between them — the barriers stopped
    * CollapseProject inlining the grid into the DCT lambda's 4096
    * references, a measured ~500,000x re-evaluation hang; the generated
    * loop has nothing to collapse and nothing to cache). Narrow map, no
    * shuffle, no persisted state: the 100 TB signature-extraction shape.
    * Exposed to the StressFunnel pHash leg (250k payloads); FunctionsSpec
    * pins bit-identity against [[phashHashesHof]].
    */
  private[graft] def phashHashes(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, d)
      .selectExpr("doc_id", s"${sparkWords("lower(text)")} AS ws")
      .selectExpr("doc_id", "graft_phash(ws) AS h")
  }

  /** The staged HOF formulation graft_phash replaced — retained as the
    * bit-identity twin the spec gate compares against (the same role
    * Portable's HOF folds play for the other codegen expressions).
    */
  private[graft] def phashHashesHof(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val grid = Tables.documents(s, d)
      .selectExpr("doc_id", s"${sparkWords("lower(text)")} AS ws")
      .selectExpr("doc_id", s"$phSparkBins AS bs")
      .persistScoped()
      .selectExpr("doc_id", s"$phSparkGrid AS gr", s"$phashBasisSql AS bf")
      .persistScoped()
    val rowT = grid
      .selectExpr("doc_id", s"$phSparkRowT AS rt", "bf").persistScoped()
    val dct = rowT.selectExpr("doc_id", s"$phSparkDct AS dc").persistScoped()
    val med = dct.selectExpr("doc_id", "dc", s"$phSparkMed AS med").persistScoped()
    med.selectExpr("doc_id", s"$phSparkBits AS h").persistScoped()
  }

  /** 8-bit pigeonhole chunk rows (doc_id, h, c, ck) of a hash frame. */
  private[graft] def phashChunks(hashes: DataFrame): DataFrame =
    hashes.selectExpr("doc_id", "h",
      "explode(transform(sequence(0, 7), c -> struct(c AS c, shiftright(h, CAST(8 * c AS INT)) & 255 AS ck))) AS p")
      .selectExpr("doc_id", "h", "p.c AS c", "p.ck AS ck")

  /** Stop-chunk cap: a (position, value) chunk bucket held by more than
    * this many payloads is dropped from the pigeonhole index — the
    * MinHash stop-shingle rule transplanted to Hamming space. Hot chunk
    * values are the SIGN PATTERNS nearly every histogram shares (low-
    * frequency AC signs are corpus-systematic, so their 8-bit chunks
    * collapse onto a handful of values): the r9 StressFunnel pHash leg
    * measured bucket 24%-of-corpus at 5k payloads and 602M candidates
    * (12k/doc, superlinear) at 50k — the identical failure mode the
    * stop-shingle cap fixed for text LSH in r8. Dropping a hot bucket
    * costs recall ONLY for pairs whose every other shared chunk is also
    * hot; near-dups (hamming <= 2) share >= 6 of 8 chunks, so they
    * survive unless ALL their chunks are corpus-typical — the standard
    * recall trade of every production multi-index (FAISS nprobe, LSH
    * band caps). Mirrored in the DuckDB oracle.
    */
  private[graft] val MaxChunkDocFreq = 1000

  /** The stop-chunk-capped pigeonhole index rows. */
  private[graft] def phashIndexChunks(hashes: DataFrame): DataFrame =
    graft.engine.ops.Scale.capHotKeys(
      phashChunks(hashes), expr("c * 256 + ck"), MaxChunkDocFreq)

  /** Pigeonhole candidates verified to hamming <= 7 — the full pair set
    * (the declared query takes top-25). Candidates come only from
    * stop-chunk-capped buckets, so per-payload candidate volume is
    * bounded by 8 * MaxChunkDocFreq at any corpus size.
    */
  private[graft] def phashPairsAll(hashes: DataFrame): DataFrame = {
    val chunks = phashIndexChunks(hashes)
    chunks.toDF("doc_a", "ha", "c", "ck")
      .join(chunks.toDF("doc_b", "hb", "c2", "ck2"),
        col("c") === col("c2") && col("ck") === col("ck2") &&
          col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("ha"), col("hb")).distinct()
      .selectExpr("doc_a", "doc_b",
        "CAST(bit_count(ha ^ hb) AS BIGINT) AS hamming")
      .where(col("hamming") <= 7)
  }

  /** Interpolated Kneser-Ney bigram probability over columns
    * (cxy, c1, f1, f2, tt), D = 0.75: ONE identical expression string in
    * both dialects (explicit DOUBLE casts, source-text-fixed
    * association, transcendental ULP contract).
    */
  private val KnProb: String =
    "((CAST(cxy AS DOUBLE) - 0.75) / CAST(c1 AS DOUBLE) + " +
      "0.75 * CAST(f1 AS DOUBLE) / CAST(c1 AS DOUBLE) * " +
      "(CAST(f2 AS DOUBLE) / CAST(tt AS DOUBLE)))"

  /** Cohen's kappa over confusion-matrix columns (n, n11, n10, n01,
    * n00): po = (n11+n00)/n, pe = marginal chance agreement,
    * kappa = (po - pe)/(1 - pe) — ONE identical expression string in
    * both dialects (explicit DOUBLE casts, source-text-fixed
    * association; nullif guards the degenerate all-agree-by-chance
    * corpus where pe = 1).
    */
  private val KappaExpr: String = {
    val po = "(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE))"
    val pe = "((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE) + " +
      "CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"
    s"($po - $pe) / nullif(1.0 - $pe, 0.0)"
  }

  /** NPMI of an adjacent pair, over columns (cxy, cx, cy, nb, nu): ONE
    * identical expression string in both dialects — every operand cast
    * to DOUBLE explicitly, association fixed by the source text, rounded
    * once through Q.scaledLong (the transcendental ULP contract).
    */
  private val NpmiExpr: String =
    "ln((CAST(cxy AS DOUBLE) * CAST(nu AS DOUBLE) * CAST(nu AS DOUBLE)) / " +
      "(CAST(nb AS DOUBLE) * CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))) / " +
      "(-ln(CAST(cxy AS DOUBLE) / CAST(nb AS DOUBLE)))"

  // ---- shared logistic-regression machinery (quality_logreg_train) ----

  /** GD steps; unrolled identically in the Spark loop and the oracle's
    * CTE chain. */
  private val LrSteps = 4


  /** The margin z = w·x as ONE fixed-order 5-term literal over
    * e6-int-derived doubles — identical text in both dialects, so both
    * engines evaluate the identical IEEE expression tree (each division
    * by 1e6 is one correctly-rounded op; left-assoc sum order is fixed
    * by the source text).
    */
  private val lrZ: String =
    "(CAST(w0_e6 AS DOUBLE) / 1000000.0)" +
      (1 to 4).map(j =>
        s" + (CAST(w${j}_e6 AS DOUBLE) / 1000000.0) * (CAST(x${j}_e6 AS DOUBLE) / 1000000.0)")
        .mkString

  /** e6-scaled weight delta for feature j: round-half-up of
    * eta * g_j / (n * 1e6) (eta = 2.0; the e6/e6 scale factors of
    * x_e6*(y_e6 - s) cancel to the 1e6 divisor). Same text both
    * dialects; floor(x + 0.5) is the house rounding.
    */
  private def lrDelta(j: Int): String =
    s"CAST(floor(2.0 * CAST(g$j AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) + 0.5) AS BIGINT)"

  /** Per-row log-loss, e6-rounded ONCE (the ulp contract); the e6 sigmoid
    * is clamped to [1, 999999] so ln never sees 0 even if a later step
    * saturates. Same text both dialects.
    */
  private val lrNll: String = Q.scaledLong(
    "-(CAST(y AS DOUBLE) * ln(CAST(greatest(least(s, 999999), 1) AS DOUBLE) / 1000000.0)" +
      " + (1.0 - CAST(y AS DOUBLE)) * ln(1.0 - CAST(greatest(least(s, 999999), 1) AS DOUBLE) / 1000000.0))",
    6)

  /** Label + e6-quantized feature frame shared by the classifier family
    * (train / calibration). SHARED-tier cached (r11, was per-query
    * scoped): both consumers are pure functions of the input dir, so
    * the corpus tokenizes once per SESSION — calibration previously
    * re-tokenized and re-ran the whole GD chain just to read the final
    * weights.
    */
  private def lrFeats(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.engine.Persisted.shared(s, s"lr_feats|$d")(lrFeatsBody(s, d))

  private def lrFeatsBody(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .selectExpr("doc_id", s"${sparkWords("lower(text)")} AS ws")
      .where(expr("size(ws) > 0"))
      .selectExpr("doc_id", "CAST(size(ws) AS BIGINT) AS nw",
        s"${sparkScore(stopwords)} AS stop",
        "CAST(size(array_distinct(ws)) AS BIGINT) AS uniq")
      .selectExpr("doc_id",
        "CASE WHEN nw >= 20 AND nw <= 90 AND stop > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y",
        s"${Q.scaledLong("(CAST(nw AS DOUBLE) - 55.0) / 100.0", 6)} AS x1_e6",
        s"${Q.scaledLong("((CAST(nw AS DOUBLE) - 55.0) / 100.0) * ((CAST(nw AS DOUBLE) - 55.0) / 100.0)", 6)} AS x2_e6",
        s"${Q.scaledLong("CAST(stop AS DOUBLE) / CAST(nw AS DOUBLE)", 6)} AS x3_e6",
        s"${Q.scaledLong("CAST(uniq AS DOUBLE) / CAST(nw AS DOUBLE)", 6)} AS x4_e6")

  /** The trained model as one 4-row shared-tier frame (step, metrics,
    * weights-after-step): the GD chain is sequential and data-dependent,
    * so letting each consumer rebuild it pays [[LrSteps]] corpus
    * aggregates per query — shared, the chain runs once per session and
    * calibration reads its final row.
    */
  private def lrSteps(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.engine.Persisted.shared(s, s"lr_steps|$d") {
      lrStepFrames(s, lrFeats(s, d))
        .map(_.selectExpr("step", "n_correct", "mean_nll_e6",
          "w0_e6", "w1_e6", "w2_e6", "w3_e6", "w4_e6"))
        .reduce(_ union _)
    }

  /** Doc-level term counts — the shared root of the unigram family
    * (r11): a dozen declared queries each re-tokenized the corpus and
    * re-aggregated term counts before their own per-term / per-source /
    * per-doc math. Every unigram-count aggregate over any subset of
    * {doc, lang, source} derives LOSSLESSLY from this frame (counts are
    * exact integers; summing per-doc counts equals counting raw
    * occurrences), so it lives in the cross-query shared tier and the
    * corpus tokenizes once per session. Queries that need positions or
    * adjacency (bigrams, BPE pair statistics, windows) are NOT
    * derivable from counts and keep their own tokenize.
    */
  private[graft] def docTermCounts(
      s: org.apache.spark.sql.SparkSession, d: String) =
    graft.engine.Persisted.shared(s, s"doc_term_counts|$d") {
      Tables.documents(s, d)
        .selectExpr("doc_id", "lang", "source",
          s"explode(${sparkWords("lower(text)")}) AS term")
        .groupBy(col("doc_id"), col("lang"), col("source"), col("term"))
        .agg(count(lit(1)).as("tc"))
    }

  /** Bench hook, mirroring Dedup.warmShared: materialize the classifier
    * family's and the unigram family's shared frames outside the timed
    * region.
    */
  private[graft] def warmShared(s: org.apache.spark.sql.SparkSession, d: String): Unit =
    warmItems(s, d).foreach(_())

  /** Independent warm chains (see Dedup.warmItems). */
  private[graft] def warmItems(
      s: org.apache.spark.sql.SparkSession, d: String): Seq[() => Unit] = Seq(
    () => { lrSteps(s, d).count(); () }, // pulls lrFeats too
    () => { docTermCounts(s, d).count(); () },
    // one thunk per independent root: Bench warms thunks as concurrent
    // futures, so the setup line costs max-of-chains, not sum
    () => { docBigramCounts(s, d).count(); () },
    () => { d2UnigramCounts(s, d).count(); () },
    () => { bpeMergesFrame(s, d).count(); () })

  /** The BIGRAM ROOT of the adjacency family (r12, the docTermCounts
    * precedent for unigrams): `(w1, w2, cxy)` counts over size>=2 docs.
    * Four declared queries (top_bigrams, bigram_logprob, kn_bigram,
    * collocations_npmi) each re-ran the identical corpus tokenize +
    * adjacent-pair explode + count — adjacency that per-doc unigram
    * counts cannot express IS expressible as a corpus-level bigram
    * count, so the root lives in the shared tier (vocab^2-bounded by
    * observed bigrams, far smaller than the positions it summarizes).
    * Queries needing per-doc bigram ROWS (bigram_logprob's scoring
    * side) still tokenize their per-doc frame; only the corpus-level
    * count aggregates ride the root.
    */
  private[graft] def docBigramCounts(
      s: org.apache.spark.sql.SparkSession, d: String) =
    graft.engine.Persisted.shared(s, s"bigramCounts|$d") {
      Tables.documents(s, d)
        .selectExpr(s"${sparkWords("lower(text)")} AS ws")
        .where("size(ws) >= 2")
        .selectExpr(
          "explode(transform(sequence(1, size(ws) - 1), i -> " +
            "struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))) AS b")
        .selectExpr("b.w1 AS w1", "b.w2 AS w2")
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cxy"))
    }

  /** Unigram counts over the SAME size>=2 doc subset the bigram root
    * uses — shared by bigram_logprob and collocations_npmi (NOT
    * derivable from [[docTermCounts]], whose counts cover all docs, nor
    * from the bigram root, which misses each doc's last word).
    */
  private[graft] def d2UnigramCounts(
      s: org.apache.spark.sql.SparkSession, d: String) =
    graft.engine.Persisted.shared(s, s"d2UnigramCounts|$d") {
      Tables.documents(s, d)
        .selectExpr(s"${sparkWords("lower(text)")} AS ws")
        .where("size(ws) >= 2")
        .selectExpr("explode(ws) AS w")
        .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    }

  /** The [[LrSteps]] GD step frames: each carries (step, n_correct,
    * mean_nll_e6, w0_e6..w4_e6) with the weights AFTER that step's
    * update. 1-row frames, scoped-persisted so step t+1 reads a
    * materialized t instead of replaying the whole chain.
    */
  private def lrStepFrames(
      s: org.apache.spark.sql.SparkSession,
      feats: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.DataFrame] = {
    var w = s.range(1).selectExpr(
      "CAST(0 AS BIGINT) AS w0_e6", "CAST(0 AS BIGINT) AS w1_e6",
      "CAST(0 AS BIGINT) AS w2_e6", "CAST(0 AS BIGINT) AS w3_e6",
      "CAST(0 AS BIGINT) AS w4_e6")
    (1 to LrSteps).map { t =>
      val scored = feats.crossJoin(broadcast(w))
        .selectExpr("y", "x1_e6", "x2_e6", "x3_e6", "x4_e6",
          s"${Q.scaledLong(s"1.0 / (1.0 + exp(-($lrZ)))", 6)} AS s")
        .selectExpr("y", "x1_e6", "x2_e6", "x3_e6", "x4_e6", "s",
          s"$lrNll AS nll_e6")
      val g = scored.agg(
        count(lit(1)).cast("bigint").as("n"),
        sum(expr("1000000 * (y * 1000000 - s)")).as("g0"),
        sum(expr("x1_e6 * (y * 1000000 - s)")).as("g1"),
        sum(expr("x2_e6 * (y * 1000000 - s)")).as("g2"),
        sum(expr("x3_e6 * (y * 1000000 - s)")).as("g3"),
        sum(expr("x4_e6 * (y * 1000000 - s)")).as("g4"),
        sum(expr("CASE WHEN (s >= 500000) = (y = 1) THEN 1 ELSE 0 END")).cast("bigint").as("n_correct"),
        sum(col("nll_e6")).as("snll"))
      val st = w.crossJoin(broadcast(g)).selectExpr(
        (s"CAST($t AS BIGINT) AS step" +: "n_correct" +:
          "CAST(floor(CAST(snll AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS mean_nll_e6" +:
          (0 to 4).map(j => s"w${j}_e6 + ${lrDelta(j)} AS w${j}_e6")): _*)
        .persistScoped()
      w = st.selectExpr("w0_e6", "w1_e6", "w2_e6", "w3_e6", "w4_e6")
      st
    }
  }

  /** DuckDB CTE chain shared by the classifier family: feats + w0t +
    * sc1/g1/st1 ... sc[[LrSteps]]/g/st — st_t mirrors [[lrStepFrames]]'
    * t-th frame.
    */
  private val duckLrCtes: String = {
    val stepCtes = (1 to LrSteps).map { t =>
      val prev = if (t == 1) "w0t" else s"st${t - 1}"
      s"""sc$t AS (
            SELECT y, x1_e6, x2_e6, x3_e6, x4_e6, s, $lrNll AS nll_e6
            FROM (
              SELECT y, x1_e6, x2_e6, x3_e6, x4_e6,
                     ${Q.scaledLong(s"1.0 / (1.0 + exp(-($lrZ)))", 6)} AS s
              FROM feats, $prev) b$t),
        g$t AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(1000000 * (y * 1000000 - s)) AS BIGINT) AS g0,
                   CAST(sum(x1_e6 * (y * 1000000 - s)) AS BIGINT) AS g1,
                   CAST(sum(x2_e6 * (y * 1000000 - s)) AS BIGINT) AS g2,
                   CAST(sum(x3_e6 * (y * 1000000 - s)) AS BIGINT) AS g3,
                   CAST(sum(x4_e6 * (y * 1000000 - s)) AS BIGINT) AS g4,
                   CAST(sum(CASE WHEN (s >= 500000) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
                   CAST(sum(nll_e6) AS BIGINT) AS snll
            FROM sc$t),
        st$t AS (
            SELECT CAST($t AS BIGINT) AS step, g$t.n_correct AS n_correct,
                   CAST(floor(CAST(snll AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS mean_nll_e6,
                   ${(0 to 4).map(j => s"w${j}_e6 + ${lrDelta(j)} AS w${j}_e6").mkString(", ")}
            FROM $prev, g$t)"""
    }.mkString(",\n        ")
    s"""raw AS (
          SELECT doc_id, ${duckWords("lower(text)")} AS ws FROM documents),
        ft AS (
          SELECT doc_id, CAST(len(ws) AS BIGINT) AS nw,
                 ${duckScore(stopwords)} AS stop,
                 CAST(len(list_distinct(ws)) AS BIGINT) AS uniq
          FROM raw WHERE len(ws) > 0),
        feats AS MATERIALIZED (
          SELECT doc_id,
                 CASE WHEN nw >= 20 AND nw <= 90 AND stop > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y,
                 ${Q.scaledLong("(CAST(nw AS DOUBLE) - 55.0) / 100.0", 6)} AS x1_e6,
                 ${Q.scaledLong("((CAST(nw AS DOUBLE) - 55.0) / 100.0) * ((CAST(nw AS DOUBLE) - 55.0) / 100.0)", 6)} AS x2_e6,
                 ${Q.scaledLong("CAST(stop AS DOUBLE) / CAST(nw AS DOUBLE)", 6)} AS x3_e6,
                 ${Q.scaledLong("CAST(uniq AS DOUBLE) / CAST(nw AS DOUBLE)", 6)} AS x4_e6
          FROM ft),
        w0t AS (
          SELECT CAST(0 AS BIGINT) AS w0_e6, CAST(0 AS BIGINT) AS w1_e6,
                 CAST(0 AS BIGINT) AS w2_e6, CAST(0 AS BIGINT) AS w3_e6,
                 CAST(0 AS BIGINT) AS w4_e6),
        $stepCtes"""
  }

  /** Merge table: one broadcastable row holding the top-[[BpeMerges]]
    * pairs in priority order. */
  private val BpeMerges = 8
  private def bpeMergesFrame(s: org.apache.spark.sql.SparkSession, d: String) =
    // shared tier (r11): both BPE consumers (encode, token-fertility)
    // re-ran the corpus char-pair count to rebuild this one-row table
    graft.engine.Persisted.shared(s, s"bpe_merges|$d")(bpeMergesBody(s, d))

  private def bpeMergesBody(s: org.apache.spark.sql.SparkSession, d: String) = {
    val w = Window.orderBy(col("n").desc, col("pair"))
    Tables.documents(s, d)
      .selectExpr(s"explode(${sparkWords("lower(text)")}) AS wd")
      .where(length(col("wd")) >= 2)
      .selectExpr(
        "explode(transform(sequence(1, length(wd) - 1), i -> substring(wd, i, 2))) AS pair")
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= BpeMerges)
      .agg(expr("transform(sort_array(collect_list(struct(rnk, pair))), x -> x.pair)").as("ms"))
  }

  /** Spark expression: '|'-separated token string of word array `ws` under
    * merge array `ms`. */
  private val sparkBpeTs: String =
    """array_join(transform(ws, w0 ->
         aggregate(ms,
           array_join(transform(sequence(1, length(w0)), ci -> substring(w0, ci, 1)), '|'),
           (s0, m) ->
             aggregate(split(s0, '[|]'), '',
               (acc, t) -> concat(acc,
                 CASE WHEN acc <> '' AND t = substring(m, 2, 1)
                           AND (acc = substring(m, 1, 1)
                                OR right(acc, 2) = concat('|', substring(m, 1, 1)))
                      THEN ''
                      ELSE CASE WHEN acc = '' THEN '' ELSE '|' END END,
                 t)))), ' ')"""

  /** DuckDB CTE chain ending in `tok(<extra>, ws, ts)`; `extra` is a
    * comma-led projection of documents columns carried through. */
  private def duckBpeTokCtes(extra: String): String = s"""
        wd AS (
          SELECT unnest(${duckWords("lower(text)")}) AS wd FROM documents),
        prs AS (
          SELECT unnest(list_transform(range(1, length(wd)),
                 i -> substr(wd, CAST(i AS INT), 2))) AS pair
          FROM wd WHERE length(wd) >= 2),
        cnt AS (SELECT pair, count(*) AS n FROM prs GROUP BY pair),
        rnk AS (SELECT pair, row_number() OVER (ORDER BY n DESC, pair) AS rnk
                FROM cnt),
        mrg AS (SELECT list(pair ORDER BY rnk) AS ms FROM rnk WHERE rnk <= $BpeMerges),
        docs AS (
          SELECT $extra ${duckWords("lower(text)")} AS ws FROM documents),
        tok AS (
          SELECT $extra ws,
            array_to_string(list_transform(ws, w0 ->
              list_reduce(
                list_prepend(array_to_string(string_split(w0, ''), '|'), ms),
                (s0, m) ->
                  list_reduce(
                    list_prepend('', string_split(s0, '|')),
                    (acc, t) -> acc ||
                      CASE WHEN acc <> '' AND t = substr(m, 2, 1)
                                AND (acc = substr(m, 1, 1)
                                     OR right(acc, 2) = '|' || substr(m, 1, 1))
                           THEN ''
                           ELSE CASE WHEN acc = '' THEN '' ELSE '|' END END
                      || t))), ' ') AS ts
          FROM docs, mrg)"""

  def defs: Map[String, QueryDef] = Map(
    "text_fingerprint" -> QueryDef(
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables.documents(s, d)
          .selectExpr("doc_id", s"${sparkStrHash("text")} AS fp")
          .orderBy(col("doc_id"))
      },
      Some(s"""
        SELECT doc_id, ${duckStrHash("text")} AS fp
        FROM documents ORDER BY doc_id""")),

    // Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    // local-document-fingerprinting algorithm): hash every char 6-gram,
    // slide a window of 4 hashes, keep each window's minimum — the
    // selected set is guaranteed to share fingerprints with any document
    // that shares a run of >= 9 chars, which is the partial-overlap
    // detector text_fingerprint's whole-string hash cannot be (one edited
    // byte changes the whole-string hash; winnowing still matches every
    // untouched region). The doc exits as its fingerprint-set size plus
    // an order-canonical fold hash of the sorted distinct set, so the
    // SELECTION ITSELF is what the oracle verifies.
    //
    // Scale shape: entirely row-local higher-order functions — O(len * w)
    // arithmetic per document inside whole-stage codegen, no explode, no
    // shuffle; the downstream dedup join on shared fingerprints is the
    // same band-join shape as MinHash LSH.
    "text_winnow_fingerprint" -> QueryDef(
      (s, d) => {
        val grams =
          "transform(sequence(1, length(t) - 5), p -> " +
            "aggregate(transform(sequence(0, 5), j -> CAST(ascii(substr(t, p + j, 1)) AS BIGINT)), " +
            s"CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % $P))"
        Tables.documents(s, d)
          .where(length(col("text")) >= 9)
          .selectExpr("doc_id", "lower(text) AS t")
          .selectExpr("doc_id", s"$grams AS hs")
          .selectExpr("doc_id", "CAST(size(hs) AS BIGINT) AS n_grams",
            "array_sort(array_distinct(transform(sequence(1, size(hs) - 3), q -> array_min(slice(hs, q, 4))))) AS fps")
          .selectExpr("doc_id", "n_grams",
            "CAST(size(fps) AS BIGINT) AS n_fp",
            s"aggregate(fps, CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % $P) AS fp_hash")
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, lower(text) AS t FROM documents
          WHERE length(text) >= 9),
        hs AS (
          SELECT doc_id, list_transform(range(1, length(t) - 4), p ->
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(0, 6), j -> CAST(ascii(substr(t, p + j, 1)) AS BIGINT))),
              (acc, x) -> (acc * 31 + x) % $P)) AS hs
          FROM t),
        fp AS (
          SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_grams,
                 list_sort(list_distinct(list_transform(range(1, len(hs) - 2), q ->
                   list_min(list_slice(hs, q, q + 3))))) AS fps
          FROM hs)
        SELECT doc_id, n_grams, CAST(len(fps) AS BIGINT) AS n_fp,
               list_reduce(list_prepend(CAST(0 AS BIGINT), fps),
                 (acc, x) -> (acc * 31 + x) % $P) AS fp_hash
        FROM fp ORDER BY doc_id""")),

    "text_tokens" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .selectExpr(
          "doc_id",
          s"CAST(size(regexp_extract_all(text, '$TokenPattern', 0)) AS BIGINT) AS n_tokens",
          s"CAST(size(array_distinct(regexp_extract_all(text, '$TokenPattern', 0))) AS BIGINT) AS n_unique")
        .orderBy(col("doc_id")),
      Some(s"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '$TokenPattern')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(regexp_extract_all(text, '$TokenPattern'))) AS BIGINT) AS n_unique
        FROM documents ORDER BY doc_id""")),

    // Ordinal-position generator (posexplode): §2.4's indexed variant of
    // explode — the row index survives the flattening, which explode
    // alone loses. DuckDB mirrors with generate_subscripts (1-based).
    "gen_posexplode_words" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .where(col("doc_id") < 5)
        .selectExpr("doc_id", s"${sparkWords("lower(text)")} AS ws")
        .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "term")))
        .selectExpr("doc_id", "CAST(pos AS BIGINT) AS pos", "term")
        .orderBy(col("doc_id"), col("pos")),
      Some(s"""
        SELECT doc_id, CAST(generate_subscripts(ws, 1) - 1 AS BIGINT) AS pos,
               unnest(ws) AS term
        FROM (SELECT doc_id, ${duckWords("lower(text)")} AS ws
              FROM documents WHERE doc_id < 5) t
        ORDER BY doc_id, pos""")),

    // Per-document term-frequency FEATURE MAP — the map-typed column a
    // training pipeline ships to a trainer. Spark-side the map is real
    // (map_from_entries over the per-term counts) and every output
    // scalar is computed THROUGH map functions (map_keys, map_filter,
    // aggregate over map_values), so their values gate the map ops; the
    // oracle re-derives the same scalars relationally without ever
    // building a map. Scale: explode -> two-level agg is one shuffle on
    // (doc_id, term) then one on doc_id; per-doc maps are vocabulary-
    // bounded, never corpus-bounded.
    "map_term_features" -> QueryDef(
      (s, d) => {
        val terms = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(expr(s"regexp_extract_all(lower(text), '[a-z]+', 0)")).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("cnt"))
        terms
          .groupBy(col("doc_id"))
          .agg(map_from_entries(collect_list(struct(col("term"), col("cnt")))).as("tf"))
          .select(col("doc_id"),
            size(map_keys(col("tf"))).cast("long").as("n_terms"),
            size(map_filter(col("tf"), (_, v) => v > 1)).cast("long").as("n_repeated"),
            expr("aggregate(map_values(tf), 0L, (a, x) -> a + x)").as("n_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
          FROM documents),
        g AS (SELECT doc_id, term, count(*) AS cnt FROM t GROUP BY 1, 2)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
               CAST(count(*) FILTER (cnt > 1) AS BIGINT) AS n_repeated,
               CAST(sum(cnt) AS BIGINT) AS n_tokens
        FROM g GROUP BY doc_id ORDER BY doc_id""")),

    "text_top_terms" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .selectExpr(s"${sparkWords("text")} AS ws")
        .select(explode(col("ws")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term"))
        .limit(20),
      Some(s"""
        SELECT term, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(${duckWords("text")}) AS term FROM documents) t
        GROUP BY term ORDER BY n DESC, term LIMIT 20""")),

    // Zipf-slope corpus diagnostic: the log-log regression of frequency
    // against rank over the top-100 terms — natural text sits near -1,
    // and drift is a standard corpus-health signal (boilerplate floods
    // flatten the head; template spam steepens it). One vocabulary-
    // bounded term count (the same shuffle text_top_terms pays), a
    // TakeOrdered top-100, then the regression runs on 100 rows:
    // ln(rank)/ln(count) are computed PER ROW and scaled to e6 BIGINTs,
    // so the cross-row suffstat sums are exact integers (the QueryPack
    // exit policy — no double ever crosses a partial-agg boundary) and
    // the final slope/intercept are single divisions of exact integers,
    // identical IEEE ops in both engines.
    "text_zipf_slope" -> QueryDef(
      (s, d) => {
        // term counts from the shared unigram root (r11)
        val top = docTermCounts(s, d)
          .groupBy(col("term")).agg(sum(col("tc")).as("c"))
          .orderBy(col("c").desc, col("term"))
          .limit(100)
        top
          .withColumn("r", row_number().over(
            Window.orderBy(col("c").desc, col("term"))))
          .selectExpr(s"${Q.scaledLong("ln(r)", 6)} AS x",
            s"${Q.scaledLong("ln(c)", 6)} AS y")
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"))
          .selectExpr("n",
            Q.scaledLong("CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)", 6) + " AS slope_e6",
            // x/y are already e6-scaled, so (sy - slope*sx)/n IS the
            // e6-scaled intercept: round-half-up without rescaling
            Q.scaledLong(
              "(CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)",
              0) + " AS intercept_e6")
      },
      Some(s"""
        WITH top AS (
          SELECT term, CAST(count(*) AS BIGINT) AS c
          FROM (SELECT unnest(${duckWords("lower(text)")}) AS term FROM documents) t
          GROUP BY term ORDER BY c DESC, term LIMIT 100),
        xy AS (
          SELECT ${Q.scaledLong("ln(CAST(row_number() OVER (ORDER BY c DESC, term) AS DOUBLE))", 6)} AS x,
                 ${Q.scaledLong("ln(CAST(c AS DOUBLE))", 6)} AS y
          FROM top),
        st AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(x * y) AS BIGINT) AS sxy
          FROM xy)
        SELECT n,
               ${Q.scaledLong("CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)", 6)} AS slope_e6,
               ${Q.scaledLong(
          "(CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)",
          0)} AS intercept_e6
        FROM st""")),

    "text_top_bigrams" -> QueryDef(
      (s, d) => {
        // derives from the shared bigram root (r12): the pair string is
        // just concat of the root's keys and the frequency is its count
        docBigramCounts(s, d)
          .selectExpr("concat(w1, ' ', w2) AS bigram", "cxy AS n")
          .orderBy(col("n").desc, col("bigram"))
          .limit(20)
      },
      Some(s"""
        SELECT bigram, CAST(count(*) AS BIGINT) AS n
        FROM (
          SELECT unnest(list_transform(range(1, len(ws)),
                 i -> ws[i] || ' ' || ws[i + 1])) AS bigram
          FROM (SELECT ${duckWords("lower(text)")} AS ws FROM documents) t
          WHERE len(ws) >= 2) u
        GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""")),

    // Ratio columns leave as scaled BIGINTs (value * 10^4): every input is
    // an exact integer count, the divisions/weighted sum are correctly
    // rounded IEEE ops identical in both engines, and the integer output
    // hashes identically across driver builds (Q.scaledLong).
    "text_quality" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .selectExpr("doc_id", "text", s"${sparkWords("text")} AS ws")
        .selectExpr(
          "doc_id",
          "CAST(size(ws) AS BIGINT) AS n_words",
          s"${Q.scaledLong(s"CAST(length(regexp_replace(text, '$PunctPattern', '')) AS DOUBLE) / length(text)", 4)} AS punct_ratio_e4",
          s"${Q.scaledLong(s"CAST(${sparkScore(stopwords)} AS DOUBLE) / size(ws)", 4)} AS stop_ratio_e4",
          s"""${Q.scaledLong(
            s"""0.3 * least(CAST(size(ws) AS DOUBLE) / 100.0, 1.0)
               + 0.3 * (1.0 - CAST(length(regexp_replace(text, '$PunctPattern', '')) AS DOUBLE) / length(text))
               + 0.4 * (CAST(${sparkScore(stopwords)} AS DOUBLE) / size(ws))""", 4)} AS quality_e4""")
        .orderBy(col("doc_id")),
      Some(s"""
        SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_words,
               ${Q.scaledLong(s"CAST(length(regexp_replace(text, '$PunctPattern', '', 'g')) AS DOUBLE) / length(text)", 4)} AS punct_ratio_e4,
               ${Q.scaledLong(s"CAST(${duckScore(stopwords)} AS DOUBLE) / len(ws)", 4)} AS stop_ratio_e4,
               ${Q.scaledLong(
                 s"""0.3 * least(CAST(len(ws) AS DOUBLE) / 100.0, 1.0)
                 + 0.3 * (1.0 - CAST(length(regexp_replace(text, '$PunctPattern', '', 'g')) AS DOUBLE) / length(text))
                 + 0.4 * (CAST(${duckScore(stopwords)} AS DOUBLE) / len(ws))""", 4)} AS quality_e4
        FROM (SELECT doc_id, text, ${duckWords("text")} AS ws FROM documents) t
        ORDER BY doc_id""")),

    // TF-IDF top terms per document with a PORTABLE integer score:
    // score_e6 = (tf * N * 10^6) div df — linear idf (N/df) instead of
    // ln(N/df), because libm log implementations are not bit-identical
    // across engines while integer arithmetic is; the ranking it induces
    // is what matters for term selection. df is computed over the WHOLE
    // corpus (one shuffle on term with map-side partial agg — the
    // classic tf-idf shape); tf is filtered to the reported docs early so
    // only df pays the full-corpus cost.
    "text_tfidf_terms" -> QueryDef(
      (s, d) => {
        // tf and df are direct reads of the shared unigram root (r11):
        // the root is distinct at (doc, term), so its per-term row count
        // IS the document frequency and tc IS the tf — no explode, no
        // re-aggregation. Only the total doc count still scans the
        // table (zero-word docs are absent from the root but count in n)
        val dtc = docTermCounts(s, d)
        val tf = dtc.where(col("doc_id") < 20)
          .select(col("doc_id"), col("term"), col("tc").as("tf"))
        val dfreq = dtc.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = Tables.documents(s, d).agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("score_e6").desc, col("term"))
        tf.join(dfreq, "term").crossJoin(broadcast(n))
          .withColumn("score_e6", expr("(tf * n * 1000000) div df"))
          .withColumn("rnk", row_number().over(w))
          .where(col("rnk") <= 3)
          .selectExpr("doc_id", "CAST(rnk AS BIGINT) AS rnk", "term",
            "CAST(score_e6 AS BIGINT) AS score_e6")
          .orderBy(col("doc_id"), col("rnk"))
      },
      Some(s"""
        WITH dw AS (SELECT doc_id, ${duckWords("lower(text)")} AS ws FROM documents),
        terms AS (SELECT doc_id, unnest(ws) AS term FROM dw),
        tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM terms WHERE doc_id < 20 GROUP BY doc_id, term),
        dfreq AS (
          SELECT term, CAST(count(*) AS BIGINT) AS df
          FROM (SELECT DISTINCT doc_id, term FROM terms) t GROUP BY term),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dw),
        scored AS (
          SELECT t.doc_id, t.term, (t.tf * n.n * 1000000) // f.df AS score_e6
          FROM tf t JOIN dfreq f USING (term) CROSS JOIN n),
        ranked AS (
          SELECT doc_id, term, score_e6,
                 CAST(row_number() OVER (PARTITION BY doc_id
                     ORDER BY score_e6 DESC, term) AS BIGINT) AS rnk
          FROM scored)
        SELECT doc_id, rnk, term, CAST(score_e6 AS BIGINT) AS score_e6
        FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""")),

    // BM25 retrieval (Robertson-Sparck Jones) — the sparse-retrieval
    // scorer a data pipeline runs for "find training docs about X"
    // selection and RAG indexing. The query is the corpus's own terms at
    // df-ranks 10-12 (mid-frequency: high enough to match many docs, low
    // enough that idf isn't ~0) — fully deterministic, no literal terms
    // to drift from the corpus. k1 = 1.2, b = 0.75.
    //
    // Scale shape: the (doc, term) tf frame is the inverted-index shuffle
    // every retrieval system pays once; df/idf and the 3 query terms are
    // vocabulary-bounded broadcasts; per-doc scores touch only the ~3
    // matched rows, folded in term-sorted order (sort_array + HOF
    // aggregate) so the double sum has ONE association order in both
    // engines; the final top-15 is a TakeOrdered over scaled-integer
    // scores. At 100 TB the tf frame is the persisted index table and
    // each query is a broadcast probe of it — nothing here scans text
    // twice.
    "text_bm25_topk" -> QueryDef(
      (s, d) => {
        // the inverted-index pieces are direct reads of the shared
        // unigram root (r11): tf = tc, df = per-term row count, doc
        // length = per-doc sum(tc); the doc COUNT still scans the table
        // (zero-word docs are absent from the root but count in n, and
        // they contribute 0 to tl either way)
        val dtc = docTermCounts(s, d)
        val dl = dtc.groupBy(col("doc_id")).agg(sum(col("tc")).as("dl"))
        val nTot = Tables.documents(s, d).agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(dl.agg(sum(col("dl")).as("tl"))))
        val dfreq = dtc.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val wq = org.apache.spark.sql.expressions.Window
          .orderBy(col("df").desc, col("term"))
        val qterms = dfreq.withColumn("qrnk", row_number().over(wq))
          .where("qrnk BETWEEN 10 AND 12").select(col("term"), col("df"))
        val tf = dtc.select(col("doc_id"), col("term"), col("tc").as("tf"))
        val contrib = tf.join(broadcast(qterms), "term")
          .join(dl, "doc_id").crossJoin(broadcast(nTot))
          .selectExpr("doc_id", "term",
            """ln(1.0 + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
               * (CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) * CAST(n AS DOUBLE) / CAST(tl AS DOUBLE))) AS contrib""")
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("score_e6").desc, col("doc_id"))
        contrib.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_terms"),
            sort_array(collect_list(struct(col("term"), col("contrib")))).as("arr"))
          .selectExpr("doc_id", "CAST(n_terms AS BIGINT) AS n_terms",
            s"${Q.scaledLong(
              "aggregate(arr, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.contrib)", 6)} AS score_e6")
          .withColumn("rnk", row_number().over(w))
          .where("rnk <= 15")
          .selectExpr("CAST(rnk AS BIGINT) AS rnk", "doc_id", "n_terms", "score_e6")
          .orderBy(col("rnk"))
      },
      Some(s"""
        WITH dw AS (SELECT doc_id, ${duckWords("lower(text)")} AS ws FROM documents),
        terms AS (SELECT doc_id, unnest(ws) AS term FROM dw),
        dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM dw),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS tl FROM dl),
        dfreq AS (
          SELECT term, CAST(count(*) AS BIGINT) AS df
          FROM (SELECT DISTINCT doc_id, term FROM terms) t GROUP BY term),
        qterms AS (
          SELECT term, df FROM (
            SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS qrnk
            FROM dfreq) t
          WHERE qrnk BETWEEN 10 AND 12),
        tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM terms GROUP BY doc_id, term),
        contrib AS (
          SELECT t.doc_id, t.term,
                 ln(1.0 + (CAST(n AS DOUBLE) - CAST(q.df AS DOUBLE) + 0.5) / (CAST(q.df AS DOUBLE) + 0.5))
                 * (CAST(t.tf AS DOUBLE) * 2.2)
                 / (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) * CAST(n AS DOUBLE) / CAST(tl AS DOUBLE))) AS contrib
          FROM tf t JOIN qterms q USING (term)
                    JOIN dl ON dl.doc_id = t.doc_id CROSS JOIN nt),
        folds AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
                 ${Q.scaledLong(
          """list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(contrib ORDER BY term)), (acc, x) -> acc + x)""", 6)} AS score_e6
          FROM contrib GROUP BY doc_id),
        ranked AS (
          SELECT doc_id, n_terms, score_e6,
                 CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS BIGINT) AS rnk
          FROM folds)
        SELECT rnk, doc_id, n_terms, score_e6
        FROM ranked WHERE rnk <= 15 ORDER BY rnk""")),

    // Corpus-LM quality score in the CCNet style (Wenzek et al. 2020:
    // filter/bucket web text by language-model perplexity): a unigram LM
    // is fit on the corpus itself and each document is scored by its mean
    // token log-probability (= negative cross-entropy per token; exp(-x)
    // is the familiar perplexity). Templated/repetitive docs score high,
    // rare-token docs low — the standard cheap quality dial before an
    // expensive model-based filter. Scale: one groupBy(term) shuffle
    // builds the vocabulary-bounded LM, which then BROADCASTS to score
    // the corpus scan in place (plan mirrors text_tfidf_terms); per-doc
    // agg is the only other shuffle. Floats appear only in the final
    // ln()/avg — round(6) absorbs sub-ULP libm drift, the precedent the
    // cosine queries set.
    "text_unigram_logprob" -> QueryDef(
      (s, d) => {
        // tc-weighted form over the shared unigram root (r11): a doc's
        // mean token log-probability sums tc * ln(c/n) over its DISTINCT
        // terms instead of ln(c/n) per occurrence — algebraically equal,
        // fewer float addends (the oracle mirrors the weighted form so
        // both engines fold the identical addend multiset)
        val dt = docTermCounts(s, d).select("doc_id", "term", "tc")
        val lm = dt.groupBy(col("term")).agg(sum(col("tc")).as("c"))
        val tot = dt.agg(sum(col("tc")).as("n"))
        dt.join(broadcast(lm), "term").crossJoin(broadcast(tot))
          .groupBy(col("doc_id"))
          .agg(sum(col("tc")).as("n_tokens"),
            (sum(expr("tc * ln(c * 1.0 / n)")) / sum(col("tc"))).as("lp"))
          .selectExpr("doc_id", "CAST(n_tokens AS BIGINT) AS n_tokens",
            "round(lp, 6) AS avg_logprob")
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH dt AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tc
          FROM (SELECT doc_id, unnest(${duckWords("lower(text)")}) AS term
                FROM documents) t
          GROUP BY doc_id, term),
        lm AS (SELECT term, CAST(sum(tc) AS BIGINT) AS c FROM dt GROUP BY term),
        tot AS (SELECT CAST(sum(tc) AS BIGINT) AS n FROM dt)
        SELECT doc_id, CAST(sum(tc) AS BIGINT) AS n_tokens,
               round(sum(tc * ln(c * 1.0 / n)) / sum(tc), 6) AS avg_logprob
        FROM dt JOIN lm USING (term) CROSS JOIN tot
        GROUP BY doc_id ORDER BY doc_id""")),

    // Interpolated BIGRAM LM scoring (Jelinek-Mercer smoothing, the
    // fixed-weight case of Chen & Goodman 1999): per-document mean log
    // probability under p(w2|w1) = 0.75*c(w1 w2)/c(w1) + 0.25*c(w2)/N.
    // The perplexity-style fluency signal curation pipelines threshold
    // on — repeated boilerplate scores high, shuffled-word noise scores
    // low, and unlike the unigram score it is word-ORDER sensitive.
    // Bigram extraction is row-local (an index transform over the word
    // array, no self-join on position); both count tables are
    // vocabulary-bounded and broadcast to the scoring scan, so the
    // corpus never shuffles by term — the same 100 TB shape as
    // text_unigram_logprob with one more broadcast.
    "text_bigram_logprob" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .selectExpr("doc_id", s"${sparkWords("lower(text)")} AS ws")
          .where("size(ws) >= 2")
        val bigrams = docs.selectExpr("doc_id",
          "explode(transform(sequence(1, size(ws) - 1), i -> " +
            "struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))) AS bg")
          .selectExpr("doc_id", "bg.w1 AS w1", "bg.w2 AS w2")
        // corpus-level count sides ride the shared roots (r12); only
        // the per-doc scoring rows above re-tokenize
        val uni = d2UnigramCounts(s, d)
        val bg = docBigramCounts(s, d).withColumnRenamed("cxy", "cb")
        val tot = uni.agg(sum(col("cu")).as("n"))
        bigrams
          .join(broadcast(bg), Seq("w1", "w2"))
          .join(broadcast(uni.toDF("w1", "cprefix")), Seq("w1"))
          .join(broadcast(uni.toDF("w2", "cw2")), Seq("w2"))
          .crossJoin(broadcast(tot))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            avg(expr("ln(0.75 * cb / cprefix + 0.25 * cw2 / n)")).as("lp"))
          .selectExpr("doc_id", "CAST(n_bigrams AS BIGINT) AS n_bigrams",
            "round(lp, 6) AS avg_logprob")
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH w AS (
          SELECT doc_id, ${duckWords("lower(text)")} AS ws FROM documents),
        d2 AS (SELECT doc_id, ws FROM w WHERE len(ws) >= 2),
        bgr AS (
          SELECT doc_id, ws[CAST(p AS INT)] AS w1, ws[CAST(p AS INT) + 1] AS w2
          FROM d2, LATERAL unnest(range(1, len(ws))) AS u(p)),
        uni AS (
          SELECT w, count(*) AS cu
          FROM (SELECT unnest(ws) AS w FROM d2) GROUP BY w),
        bgc AS (SELECT w1, w2, count(*) AS cb FROM bgr GROUP BY 1, 2),
        tot AS (SELECT count(*) AS n FROM (SELECT unnest(ws) AS w FROM d2))
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(ln(0.75 * cb / u1.cu + 0.25 * u2.cu / n)), 6) AS avg_logprob
        FROM bgr JOIN bgc USING (w1, w2)
                 JOIN uni u1 ON u1.w = bgr.w1
                 JOIN uni u2 ON u2.w = bgr.w2
                 CROSS JOIN tot
        GROUP BY doc_id ORDER BY doc_id""")),

    // C4-style wordlist filter (Raffel et al. 2020 §2.2 dropped any page
    // containing a "bad words" list hit; the list here is a stand-in
    // drawn from the fixture vocabulary): flag documents containing ANY
    // blocklisted token and report per-source exposure — flagged docs,
    // total hits, exact ppm rate — the table that decides which feeds
    // need scrubbing vs dropping. The list is a literal array inside a
    // ROW-LOCAL set-intersection (a real 400-term list still rides the
    // expression; nothing joins), so the corpus scan never shuffles and
    // only the per-source aggregate exits. Integer logic end to end.
    "text_blocklist_filter" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .selectExpr("source", s"${sparkWords("lower(text)")} AS ws")
        .selectExpr("source",
          "CASE WHEN size(array_intersect(ws, array('slow', 'dup', 'stale'))) > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS flagged",
          "CAST(size(filter(ws, w -> w IN ('slow', 'dup', 'stale'))) AS BIGINT) AS hits")
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("flagged")).as("n_flagged"),
          sum(col("hits")).as("n_hits"))
        .selectExpr("source", "n_docs", "n_flagged", "n_hits",
          "CAST(n_flagged * 1000000 DIV n_docs AS BIGINT) AS flagged_ppm")
        .orderBy(col("source")),
      Some(s"""
        WITH w AS (
          SELECT source, ${duckWords("lower(text)")} AS ws FROM documents),
        f AS (
          SELECT source,
                 CASE WHEN len(list_intersect(ws, ['slow', 'dup', 'stale'])) > 0
                      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS flagged,
                 CAST(len(list_filter(ws, w -> w IN ('slow', 'dup', 'stale'))) AS BIGINT) AS hits
          FROM w)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(flagged) AS BIGINT) AS n_flagged,
               CAST(sum(hits) AS BIGINT) AS n_hits,
               CAST(sum(flagged) * 1000000 // count(*) AS BIGINT) AS flagged_ppm
        FROM f GROUP BY source ORDER BY source""")),

    // Collocation mining by normalized pointwise mutual information
    // (Church & Hanks 1990 PMI; Bouma 2009 NPMI normalization) — the
    // phrase-discovery pass tokenizer pipelines run before deciding
    // multi-word merge candidates, and the statistic behind word2vec's
    // phrase pass. For adjacent word pairs with count >= 20:
    // npmi = ln(p(xy)/(p(x)p(y))) / -ln p(xy), with p(xy) over bigram
    // tokens and p(x) over unigram tokens. Top-15 by NPMI, exact
    // integer counts carried alongside, ratio e6-scaled through ONE
    // identical expression string in both dialects (the transcendental
    // ULP contract). Scale shape: the corpus makes two vocab-bounded
    // aggregates (bigram-type and unigram counts); all arithmetic runs
    // over the <= |V|^2 type frame; top-15 exits via sort+limit.
    "text_collocations_npmi" -> QueryDef(
      (s, d) => {
        val bg = docBigramCounts(s, d)
        val uni = d2UnigramCounts(s, d)
        val nb = bg.agg(sum(col("cxy")).as("nb"))
        val nu = uni.agg(sum(col("cu")).as("nu"))
        bg.where(col("cxy") >= 20)
          .join(broadcast(uni.toDF("w1", "cx")), Seq("w1"))
          .join(broadcast(uni.toDF("w2", "cy")), Seq("w2"))
          .crossJoin(broadcast(nb)).crossJoin(broadcast(nu))
          .selectExpr("w1", "w2", "cxy",
            s"${Q.scaledLong(NpmiExpr, 6)} AS npmi_e6")
          .orderBy(col("npmi_e6").desc, col("w1"), col("w2"))
          .limit(15)
      },
      Some(s"""
        WITH w AS (
          SELECT ${duckWords("lower(text)")} AS ws FROM documents),
        d2 AS (SELECT ws FROM w WHERE len(ws) >= 2),
        bg AS (
          SELECT ws[CAST(p AS INT)] AS w1, ws[CAST(p AS INT) + 1] AS w2,
                 CAST(count(*) AS BIGINT) AS cxy
          FROM d2, LATERAL unnest(range(1, len(ws))) AS u(p)
          GROUP BY 1, 2),
        uni AS (
          SELECT w, CAST(count(*) AS BIGINT) AS cu
          FROM (SELECT unnest(ws) AS w FROM d2) GROUP BY w),
        nbt AS (SELECT CAST(sum(cxy) AS BIGINT) AS nb FROM bg),
        nut AS (SELECT CAST(sum(cu) AS BIGINT) AS nu FROM uni)
        SELECT w1, w2, cxy, ${Q.scaledLong(NpmiExpr, 6)} AS npmi_e6
        FROM (
          SELECT bg.w1, bg.w2, cxy, ux.cu AS cx, uy.cu AS cy, nb, nu
          FROM bg JOIN uni ux ON ux.w = bg.w1
                  JOIN uni uy ON uy.w = bg.w2
                  CROSS JOIN nbt CROSS JOIN nut
          WHERE cxy >= 20) t
        ORDER BY npmi_e6 DESC, w1, w2 LIMIT 15""")),

    // Interpolated Kneser-Ney bigram language model (Kneser & Ney 1995;
    // Chen & Goodman 1999's interpolated form with fixed discount
    // D = 0.75) — the smoothing every KenLM-style corpus-quality filter
    // actually ships, upgrading text_bigram_logprob's naive mixture:
    // the lower-order weight is the CONTINUATION probability (in how
    // many distinct contexts does w2 appear) rather than raw frequency,
    // which is what stops "francisco" outscoring "the" after unseen
    // contexts. p(w2|w1) = (c(w1w2) - D)/c(w1)
    //            + D * N1+(w1.)/c(w1) * N1+(.w2)/T
    // over bigram types (every seen bigram has c >= 1 > D, so the max()
    // is vacuous and the formula is one branch-free expression).
    // Reports the corpus-level aggregate: token count, type count,
    // average token logprob, perplexity. Scale shape: ONE corpus pass
    // makes the bigram-type counts; every other frame (prefix fanouts,
    // continuation fanouts, totals) derives from that vocab-bounded
    // type table, and the final fold is over types weighted by counts —
    // the corpus is never touched again.
    "text_kn_bigram_logprob" -> QueryDef(
      (s, d) => {
        val bg = docBigramCounts(s, d)
        val pre = bg.groupBy(col("w1"))
          .agg(sum(col("cxy")).as("c1"), count(lit(1)).cast("bigint").as("f1"))
        val cont = bg.groupBy(col("w2"))
          .agg(count(lit(1)).cast("bigint").as("f2"))
        val tots = bg.agg(count(lit(1)).cast("bigint").as("tt"),
          sum(col("cxy")).as("nn"))
        bg.join(broadcast(pre), Seq("w1"))
          .join(broadcast(cont), Seq("w2"))
          .crossJoin(broadcast(tots))
          .agg(
            min(col("nn")).as("n_bigrams"),
            min(col("tt")).as("n_types"),
            expr(s"round(sum(CAST(cxy AS DOUBLE) * ln($KnProb)) / CAST(min(nn) AS DOUBLE), 6)")
              .as("avg_logprob"),
            expr(Q.scaledLong(
              s"exp(-(sum(CAST(cxy AS DOUBLE) * ln($KnProb)) / CAST(min(nn) AS DOUBLE)))", 6))
              .as("ppl_e6"))
      },
      Some(s"""
        WITH w AS (
          SELECT ${duckWords("lower(text)")} AS ws FROM documents),
        d2 AS (SELECT ws FROM w WHERE len(ws) >= 2),
        bg AS MATERIALIZED (
          SELECT ws[CAST(p AS INT)] AS w1, ws[CAST(p AS INT) + 1] AS w2,
                 CAST(count(*) AS BIGINT) AS cxy
          FROM d2, LATERAL unnest(range(1, len(ws))) AS u(p)
          GROUP BY 1, 2),
        pre AS (
          SELECT w1, CAST(sum(cxy) AS BIGINT) AS c1,
                 CAST(count(*) AS BIGINT) AS f1
          FROM bg GROUP BY w1),
        cont AS (
          SELECT w2, CAST(count(*) AS BIGINT) AS f2 FROM bg GROUP BY w2),
        tots AS (
          SELECT CAST(count(*) AS BIGINT) AS tt,
                 CAST(sum(cxy) AS BIGINT) AS nn FROM bg)
        SELECT CAST(min(nn) AS BIGINT) AS n_bigrams,
               CAST(min(tt) AS BIGINT) AS n_types,
               round(sum(CAST(cxy AS DOUBLE) * ln($KnProb)) / CAST(min(nn) AS DOUBLE), 6) AS avg_logprob,
               ${Q.scaledLong(
          s"exp(-(sum(CAST(cxy AS DOUBLE) * ln($KnProb)) / CAST(min(nn) AS DOUBLE)))", 6)} AS ppl_e6
        FROM bg JOIN pre USING (w1) JOIN cont USING (w2)
                CROSS JOIN tots""")),

    // Inter-labeler agreement by Cohen's kappa (Cohen 1960) between two
    // independent heuristic quality labelers — the annotation-quality
    // gate run before trusting any auto-labeled training set (raw
    // percent agreement flatters labelers that both say "keep" to
    // everything; kappa discounts chance agreement). Labeler A is the
    // docs_quality_filter keep rule (length window + stopword
    // presence); labeler B is a stopword-share threshold (>= 4%). One
    // map-side-combinable aggregate builds the 2x2 confusion matrix in
    // exact BIGINTs; po/pe/kappa evaluate through one identical
    // expression tree, e6-scaled.
    "quality_kappa_agreement" -> QueryDef(
      (s, d) => {
        Tables.documents(s, d)
          .selectExpr(s"${sparkWords("lower(text)")} AS ws")
          .where(expr("size(ws) > 0"))
          .selectExpr("CAST(size(ws) AS BIGINT) AS nw",
            s"CAST(${sparkScore(stopwords)} AS BIGINT) AS stop")
          .selectExpr(
            "CASE WHEN nw >= 20 AND nw <= 90 AND stop > 0 THEN 1 ELSE 0 END AS la",
            "CASE WHEN stop * 25 >= nw THEN 1 ELSE 0 END AS lb")
          .agg(count(lit(1)).cast("bigint").as("n"),
            sum(expr("la * lb")).as("n11"),
            sum(expr("la * (1 - lb)")).as("n10"),
            sum(expr("(1 - la) * lb")).as("n01"),
            sum(expr("(1 - la) * (1 - lb)")).as("n00"))
          .selectExpr("n", "n11", "n10", "n01", "n00",
            s"${Q.scaledLong(KappaExpr, 6)} AS kappa_e6")
      },
      Some(s"""
        WITH w AS (
          SELECT ${duckWords("lower(text)")} AS ws FROM documents),
        f AS (
          SELECT CAST(len(ws) AS BIGINT) AS nw,
                 CAST(${duckScore(stopwords)} AS BIGINT) AS stop
          FROM w WHERE len(ws) > 0),
        l AS (
          SELECT CASE WHEN nw >= 20 AND nw <= 90 AND stop > 0 THEN 1 ELSE 0 END AS la,
                 CASE WHEN stop * 25 >= nw THEN 1 ELSE 0 END AS lb
          FROM f),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(la * lb) AS BIGINT) AS n11,
                 CAST(sum(la * (1 - lb)) AS BIGINT) AS n10,
                 CAST(sum((1 - la) * lb) AS BIGINT) AS n01,
                 CAST(sum((1 - la) * (1 - lb)) AS BIGINT) AS n00
          FROM l)
        SELECT n, n11, n10, n01, n00, ${Q.scaledLong(KappaExpr, 6)} AS kappa_e6
        FROM m""")),

    // Feature-hashing collision profile (Weinberger et al. 2009, the
    // "hashing trick" behind sklearn's HashingVectorizer and VW): map
    // every distinct vocabulary term into k = 256 hash buckets through
    // the portable polynomial hash and report the collision histogram —
    // how many buckets hold 1, 2, 3... distinct terms — plus the load
    // summary. This is the table that decides the feature width before
    // committing to hashed features (collisions alias gradients; the
    // histogram quantifies how much signal a width-k model gives up).
    // Scale shape: one vocab-bounded distinct + one 256-bucket
    // aggregate; the corpus is touched once.
    "text_feature_hashing" -> QueryDef(
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        // distinct vocabulary from the shared unigram root (r11)
        val perBucket = docTermCounts(s, d)
          .select(col("term").as("w")).distinct()
          .selectExpr("pmod(graft_strhash(w), 256) AS bkt")
          .groupBy(col("bkt")).agg(count(lit(1)).as("c"))
        perBucket.groupBy(col("c"))
          .agg(count(lit(1)).cast("bigint").as("n_buckets"))
          .selectExpr("CAST(c AS BIGINT) AS n_terms", "n_buckets")
          .orderBy(col("n_terms"))
      },
      Some(s"""
        WITH terms AS (
          SELECT DISTINCT w FROM (
            SELECT unnest(${duckWords("lower(text)")}) AS w FROM documents) q),
        pb AS (
          SELECT (${duckStrHash("w")}) % 256 AS bkt,
                 CAST(count(*) AS BIGINT) AS c
          FROM terms GROUP BY bkt)
        SELECT CAST(c AS BIGINT) AS n_terms,
               CAST(count(*) AS BIGINT) AS n_buckets
        FROM pb GROUP BY c ORDER BY n_terms""")),

    // Corpus diversity by distinct-n ratios (the Self-BLEU/"distinct-n"
    // diversity family, Li et al. 2016): per source and n-gram order
    // n = 1, 2, 3, the share of n-gram TOKENS that are distinct TYPES —
    // the degenerate-repetition dashboard a synthetic-data pipeline
    // watches (model-generated corpora collapse this ratio long before
    // eyeballs notice). Exact distinct via the two-stage aggregate
    // (groupBy (source, gram) then groupBy source) — one shuffle per
    // order, the standard exact-distinct cost, map-side combinable; no
    // windows anywhere.
    "text_distinct_ngrams" -> QueryDef(
      (s, d) => {
        def level(n: Int) = {
          val grams =
            if (n == 1) Tables.documents(s, d)
              .selectExpr("source", s"explode(${sparkWords("lower(text)")}) AS g")
            else Tables.documents(s, d)
              .selectExpr("source", s"${sparkWords("lower(text)")} AS ws")
              .where(s"size(ws) >= $n")
              .selectExpr("source",
                s"explode(transform(sequence(1, size(ws) - ${n - 1}), i -> " +
                  s"concat_ws(' ', slice(ws, i, $n)))) AS g")
          grams.groupBy(col("source"), col("g")).agg(count(lit(1)).as("c"))
            .groupBy(col("source"))
            .agg(count(lit(1)).cast("bigint").as("n_types"),
              sum(col("c")).as("n_tokens"))
            .selectExpr("source", s"CAST($n AS BIGINT) AS n", "n_types", "n_tokens",
              s"${Q.scaledLong("CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)", 6)} AS distinct_e6")
        }
        level(1).unionByName(level(2)).unionByName(level(3))
          .orderBy(col("source"), col("n"))
      },
      Some(s"""
        WITH w AS MATERIALIZED (
          SELECT source, ${duckWords("lower(text)")} AS ws FROM documents),
        ${(1 to 3).map { n =>
          val grams =
            if (n == 1) "SELECT source, unnest(ws) AS g FROM w"
            else
              s"""SELECT source, array_to_string(ws[CAST(p AS INT):CAST(p AS INT) + ${n - 1}], ' ') AS g
                  FROM (SELECT source, ws FROM w WHERE len(ws) >= $n) q,
                       LATERAL unnest(range(1, len(ws) - ${n - 2})) AS u(p)"""
          s"""l$n AS (
            SELECT source, CAST($n AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS n_types,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   ${Q.scaledLong("CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE)", 6)} AS distinct_e6
            FROM (SELECT source, g, count(*) AS c FROM ($grams) gg GROUP BY 1, 2) t
            GROUP BY source)"""
        }.mkString(",\n        ")}
        SELECT * FROM l1 UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3
        ORDER BY source, n""")),

    // Composite document filter in the Gopher/C4 style: precedence chain
    // of cheap quality rules producing a keep/drop REASON per doc (the
    // same routing shape the ingest Router applies to events, here for
    // corpus curation). Thresholds sit inside the corpus distribution
    // (words 10-99, median 56) so every class appears; all rules are
    // integer/string logic — no float divergence possible.
    "docs_quality_filter" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .selectExpr("doc_id", s"${sparkWords("lower(text)")} AS ws")
        .selectExpr("doc_id", "CAST(size(ws) AS BIGINT) AS nw",
          s"CAST(${sparkScore(stopwords)} AS BIGINT) AS stop")
        .selectExpr("doc_id",
          """CASE WHEN nw < 20 THEN 'too_short'
                  WHEN nw > 90 THEN 'too_long'
                  WHEN stop = 0 THEN 'no_stopwords'
                  ELSE 'ok' END AS verdict""")
        .groupBy(col("verdict"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("verdict")),
      Some(s"""
        WITH w AS (
          SELECT doc_id, ${duckWords("lower(text)")} AS ws FROM documents),
        c AS (
          SELECT doc_id, CAST(len(ws) AS BIGINT) AS nw,
                 CAST(${duckScore(stopwords)} AS BIGINT) AS stop
          FROM w),
        v AS (
          SELECT doc_id,
                 CASE WHEN nw < 20 THEN 'too_short'
                      WHEN nw > 90 THEN 'too_long'
                      WHEN stop = 0 THEN 'no_stopwords'
                      ELSE 'ok' END AS verdict
          FROM c)
        SELECT verdict, CAST(count(*) AS BIGINT) AS n,
               CAST(min(doc_id) AS BIGINT) AS first_doc
        FROM v GROUP BY verdict ORDER BY verdict""")),

    "text_langid" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .selectExpr(Seq("doc_id", "lang", s"${sparkWords("text")} AS ws"): _*)
        .selectExpr(Seq("doc_id", "lang") ++
          profiles.map { case (n, ws) => s"${sparkScore(ws)} AS s_$n" }: _*)
        .selectExpr("lang", s"$predCase AS pred_lang")
        .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred_lang")),
      Some(s"""
        SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
        FROM (
          SELECT lang, $predCase AS pred_lang
          FROM (
            SELECT lang,
                   ${profiles.map { case (n, ws) => s"${duckScore(ws)} AS s_$n" }.mkString(", ")}
            FROM (SELECT lang, ${duckWords("text")} AS ws FROM documents) t1) t2) t3
        GROUP BY lang, pred_lang ORDER BY lang, pred_lang""")),

    // TRAINED language classifier — multinomial Naive Bayes with add-one
    // smoothing over the df-top-256 vocabulary, the model-based sibling of
    // text_langid's fixed keyword profiles (the GPT-3/CCNet pattern:
    // curation filters are trained classifiers, not hand rules; Brown et
    // al. 2020 §A "quality filtering"). Train and score run in ONE plan
    // over the corpus's own (term, lang) counts; output is the 5x5
    // confusion matrix of true vs predicted language.
    //
    // Determinism: each log-probability cell ln((c+1)/(tot+V)) and each
    // log-prior rounds to an e6-scaled BIGINT ONCE (the documented ulp
    // contract — one libm rounding per cell, nothing accumulated in
    // floats); after the L-table, scoring is EXACT integer arithmetic
    // (sum of tc*lw BIGINTs, bounded |score| < 2^31), so the per-doc
    // argmax (score DESC, lang ASC) can never flip on float noise even
    // between near-indistinguishable classes.
    //
    // Scale shape: the ONLY corpus-scale shuffle is the (doc_id, term)
    // count (map-side combinable, session-shared); vocabulary (top-256
    // by df), the (lang x term) L-table grid (<= 5*256 rows) and the
    // priors are bounded frames that broadcast into the scoring joins;
    // the grid pivots wide so per-doc scores for ALL langs come from
    // one doc-keyed aggregation, and the argmax is a row-local
    // struct-array min — no window, no row fanout. At 100 TB the model
    // is still < 2k rows; only the term counts scale.
    "quality_nb_langid" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        // per-doc term counts (multiplicity) — the shared unigram root
        // (r11): this IS docTermCounts minus the source column, so the
        // corpus-scale tokenize+shuffle comes from the session-shared
        // cache instead of rebuilding per query
        val dt = docTermCounts(s, d)
          .select(col("doc_id"), col("lang"), col("term"), col("tc"))
        // JOB-COLLAPSED orchestration (r16, verdict #4): the NB model
        // is driver-bounded by construction (|langs| × 256 cells), but
        // the old shape derived it through seven broadcast exchanges
        // (vocab, vs, langs, ndall, tot, cnt, the grid) and a persisted
        // intermediate — 28 jobs for a 10-row result, 5.1× the
        // millisecond oracle twin on orchestration latency alone. The
        // three BOUNDED frames (vocab ≤ 256 terms, per-(lang, term)
        // counts ≤ |langs|·256, per-lang doc counts) now collect once
        // each; the L-table and priors are built as LOCAL frames with
        // the IDENTICAL scaledLong expressions (same arithmetic, same
        // association order → hash-identical results); and exactly ONE
        // corpus-scale job remains — the vocab-restricted per-doc score
        // aggregate feeding the confusion rollup.
        // job 1: df-top-256 vocabulary (dt is distinct at (doc_id,
        // term), so count(*) per term IS the document frequency)
        val vocabRows = dt.groupBy(col("term")).agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("term")).limit(256)
          .select("term").collect().map(_.getString(0))
        val dtv = dt.where(col("term").isin(vocabRows.toSeq: _*))
        // job 2: the (lang, term) count cells over the restricted frame;
        // per-lang token totals are their integer sums (exactly the old
        // tot aggregate)
        val cntRows = dtv.groupBy(col("lang"), col("term"))
          .agg(sum(col("tc")).as("c")).collect()
        val cMap = cntRows.map(r =>
          (Option(r.getString(0)), r.getString(1)) -> r.getLong(2)).toMap
        val ttMap = cntRows.groupBy(r => Option(r.getString(0)))
          .map { case (l, rs) => l -> rs.map(_.getLong(2)).sum }
        // job 3: per-lang doc counts (priors)
        val langRows = docs.groupBy(col("lang")).agg(count(lit(1)).as("nd"))
          .collect()
        val ndall = langRows.map(_.getLong(1)).sum
        // WIDE L-table + row-local argmax (r11): scoring per (doc, lang)
        // ROW fanned the vocab-restricted frame x|langs| through an
        // exchange and then a per-doc window. The lang list and priors
        // are driver-side, the grid pivots to one row per
        // term (positional toDF rename — immune to a lang value
        // colliding with a column name), all langs score in ONE
        // doc-keyed integer aggregation, and the argmax is array_min
        // over a per-row struct array — no window, no row fanout.
        // Scores stay exact BIGINT sums of tc*lw; ties break
        // (score DESC, slang ASC) exactly as the window did via the
        // (-score, slang) struct order; docs with only-OOV terms fall
        // back to the prior via the left join's null -> 0 coalesce.
        // NULL langs are dropped from the CANDIDATE set only (a null
        // class label is meaningless to predict, and pivot/sorted would
        // otherwise NPE); null-lang docs still score and group under
        // their own (null) truth key, and the priors' denominators are
        // unchanged
        val langList = langRows
          .map(_.getString(0)).filter(_ != null).sorted
        if (langList.isEmpty)
          docs.selectExpr("lang", "lang AS pred_lang",
              "CAST(0 AS BIGINT) AS n_docs")
            .where(lit(false))
        else {
          import s.implicits._
          // the full (lang × vocab-term) grid — so UNSEEN (term, lang)
          // pairs get the smoothed floor ln(1/(tt+V)) — is a LOCAL
          // frame over the collected cells, with the same scaledLong
          // expression the distributed grid used
          val v = vocabRows.length.toLong
          val grid = langList.toSeq.flatMap(l => vocabRows.toSeq.map(tm =>
              (l, tm, cMap.getOrElse((Some(l), tm), 0L),
                ttMap.getOrElse(Some(l), 0L))))
            .toDF("slang", "term", "c", "tt")
            .selectExpr("slang", "term",
              s"${Q.scaledLong(s"ln(CAST(c + 1 AS DOUBLE) / CAST(tt + ${v}L AS DOUBLE))", 6)} AS lw")
          val gridW = grid.groupBy(col("term"))
            .pivot("slang", langList).agg(first(col("lw")))
            .toDF("term" +: langList.map(l => s"_lw_$l"): _*)
          val sums = langList.map(l =>
            sum(col("tc") * col(s"_lw_$l")).as(s"_ts_$l"))
          val sco = dtv.select("doc_id", "term", "tc")
            .join(broadcast(gridW), Seq("term"))
            .groupBy(col("doc_id"))
            .agg(sums.head, sums.tail: _*)
          val lp = langRows.filter(_.getString(0) != null).toSeq
            .map(r => (r.getString(0), r.getLong(1)))
            .toDF("slang", "nd")
            .selectExpr("slang",
              s"${Q.scaledLong(s"ln(CAST(nd AS DOUBLE) / CAST(${ndall}L AS DOUBLE))", 6)} AS lp")
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          val cand = array(langList.map(l => struct(
            (-(lit(lp(l)) + coalesce(col(s"_ts_$l"), lit(0L)))).as("ns"),
            lit(l).as("slang"))): _*)
          docs.select("doc_id", "lang")
            .join(sco, Seq("doc_id"), "left")
            .withColumn("pred_lang", array_min(cand).getField("slang"))
            .groupBy(col("lang"), col("pred_lang"))
            .agg(count(lit(1)).as("n_docs"))
            .orderBy(col("lang"), col("pred_lang"))
        }
      },
      Some(s"""
        WITH dt AS (
          SELECT doc_id, lang, term, CAST(count(*) AS BIGINT) AS tc
          FROM (SELECT doc_id, lang, unnest(${duckWords("lower(text)")}) AS term
                FROM documents) t
          GROUP BY doc_id, lang, term),
        vocab AS (
          SELECT term FROM (
            SELECT term, count(*) AS df FROM dt GROUP BY term
            ORDER BY df DESC, term LIMIT 256) v),
        dtv AS (SELECT dt.* FROM dt JOIN vocab USING (term)),
        vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
        langs AS (SELECT lang, CAST(count(*) AS BIGINT) AS nd
                  FROM documents GROUP BY lang),
        ndt AS (SELECT CAST(sum(nd) AS BIGINT) AS ndall FROM langs),
        tot AS (SELECT lang, CAST(sum(tc) AS BIGINT) AS tt FROM dtv GROUP BY lang),
        cnt AS (SELECT lang, term, CAST(sum(tc) AS BIGINT) AS c
                FROM dtv GROUP BY lang, term),
        grid AS (
          SELECT l.lang AS slang, vb.term,
                 ${Q.scaledLong("ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE) / CAST(coalesce(t.tt, 0) + vs.v AS DOUBLE))", 6)} AS lw
          FROM langs l CROSS JOIN vocab vb CROSS JOIN vs
          LEFT JOIN tot t ON t.lang = l.lang
          LEFT JOIN cnt c ON c.lang = l.lang AND c.term = vb.term),
        prior AS (
          SELECT lang AS slang,
                 ${Q.scaledLong("ln(CAST(nd AS DOUBLE) / CAST(ndall AS DOUBLE))", 6)} AS lp
          FROM langs CROSS JOIN ndt),
        tsco AS (
          SELECT d.doc_id, g.slang, CAST(sum(d.tc * g.lw) AS BIGINT) AS ts
          FROM dtv d JOIN grid g ON g.term = d.term
          GROUP BY d.doc_id, g.slang),
        sco AS (
          SELECT dd.doc_id, dd.lang, p.slang,
                 p.lp + coalesce(t.ts, 0) AS score
          FROM (SELECT doc_id, lang FROM documents) dd
          CROSS JOIN prior p
          LEFT JOIN tsco t ON t.doc_id = dd.doc_id AND t.slang = p.slang),
        pred AS (
          SELECT lang, slang AS pred_lang,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, slang) AS rnk
          FROM sco)
        SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM pred WHERE rnk = 1
        GROUP BY lang, pred_lang ORDER BY lang, pred_lang""")),

    // Deterministic content-hash sampling: reproducible across runs and
    // engines, stable under repartitioning (unlike rand()-based
    // sampling) — the curation primitive for carving corpus subsets.
    "sample_stratified" -> QueryDef(
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables.documents(s, d)
          .where(s"${sparkStrHash("text")} % 100 < 10")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("lang"))
      },
      Some(s"""
        SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents WHERE ${duckStrHash("text")} % 100 < 10
        GROUP BY lang ORDER BY lang""")),

    // Weighted sampling WITHOUT replacement, Efraimidis-Spirakis A-ES
    // (the algorithm behind weighted data mixing when sources can't just
    // be concatenated): each doc draws u in (0,1) and ranks by
    // ln(u)/weight — the top-k by that key is a weighted sample, one
    // scan + one top-k, no per-source passes. The draw is the PORTABLE
    // hash of the doc text (content-addressed, so the sample survives
    // reprocessing exactly like split_train_eval's assignment), weight
    // is doc length in chars. Ranking uses the raw double key with a
    // doc_id tie-break; the reported key rounds to 6 places like every
    // float surface here.
    "sample_weighted" -> QueryDef(
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("k").desc, col("doc_id"))
        Tables.documents(s, d)
          .selectExpr("doc_id", "n_chars",
            s"(${sparkStrHash("text")} % 999983 + 1) / 999984.0 AS u")
          .withColumn("k", expr("ln(u) / n_chars"))
          .withColumn("rnk", row_number().over(w))
          .where(col("rnk") <= 20)
          .selectExpr("CAST(rnk AS BIGINT) AS rnk", "doc_id",
            "CAST(n_chars AS BIGINT) AS n_chars", "round(k, 6) AS key")
          .orderBy(col("rnk"))
      },
      Some(s"""
        WITH keyed AS (
          SELECT doc_id, n_chars,
                 ln((${duckStrHash("text")} % 999983 + 1) / 999984.0)
                   / n_chars AS k
          FROM documents),
        ranked AS (
          SELECT doc_id, n_chars, k,
                 row_number() OVER (ORDER BY k DESC, doc_id) AS rnk
          FROM keyed)
        SELECT CAST(rnk AS BIGINT) AS rnk, doc_id,
               CAST(n_chars AS BIGINT) AS n_chars, round(k, 6) AS key
        FROM ranked WHERE rnk <= 20 ORDER BY rnk""")),

    // One BPE merge-candidate round — the counting step of tokenizer
    // TRAINING (Sennrich et al. 2016) as corpus dataflow: every adjacent
    // character pair inside every word occurrence is counted corpus-wide
    // and the top candidates are the pairs BPE would merge next. The
    // expensive part of BPE at corpus scale is exactly this pair count;
    // it runs as one explode + one hash aggregation with map-side
    // partials, no joins. Top-10 by count with a pair tie-break keeps
    // the output deterministic.
    "text_bpe_pairs" -> QueryDef(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("pair"))
        Tables.documents(s, d)
          .selectExpr(s"explode(${sparkWords("lower(text)")}) AS wd")
          .where(length(col("wd")) >= 2)
          .selectExpr(
            "explode(transform(sequence(1, length(wd) - 1), i -> substring(wd, i, 2))) AS pair")
          .groupBy(col("pair")).agg(count(lit(1)).as("n"))
          .withColumn("rnk", row_number().over(w))
          .where(col("rnk") <= 10)
          .selectExpr("CAST(rnk AS BIGINT) AS rnk", "pair", "CAST(n AS BIGINT) AS n")
          .orderBy(col("rnk"))
      },
      Some(s"""
        WITH wd AS (
          SELECT unnest(${duckWords("lower(text)")}) AS wd FROM documents),
        pairs AS (
          SELECT unnest(list_transform(range(1, length(wd)),
                 i -> substr(wd, CAST(i AS INT), 2))) AS pair
          FROM wd WHERE length(wd) >= 2),
        counts AS (SELECT pair, CAST(count(*) AS BIGINT) AS n
                   FROM pairs GROUP BY pair),
        ranked AS (
          SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair) AS rnk
          FROM counts)
        SELECT CAST(rnk AS BIGINT) AS rnk, pair, n
        FROM ranked WHERE rnk <= 10 ORDER BY rnk""")),

    // BPE ENCODE — the tokenizer-side operator an LLM pipeline actually
    // runs over the corpus (text_bpe_pairs above is the TRAINING count;
    // this applies the learned merge table). The top-8 merges by corpus
    // pair count (same ranking as text_bpe_pairs) become the merge table;
    // each document is then tokenized ROW-LOCALLY: every word starts as
    // its character sequence and each merge (X,Y), in priority order,
    // fuses adjacent tokens X,Y left-to-right in one greedy pass — which
    // is the fixpoint for single-character merges, since merges only grow
    // tokens so a later pass can never re-expose an (X,Y) adjacency.
    // Token strings use '|' as the in-word separator (the corpus charset
    // is lowercase a-y + space, lint-checked in ContractSpec, so the
    // marker cannot collide) and the fold compares WHOLE tokens (exact
    // last-token match), so multi-char fused tokens can never be merged
    // by their prefix/suffix characters.
    //
    // Scale shape: the merge table is one map-side-combinable pair count
    // collapsed to a single 8-element array row and broadcast; the encode
    // itself is a narrow map over documents (nested HOF folds inside the
    // row — no explode, no shuffle, no UDF). The gate hashes the exact
    // per-doc tokenization (rolling hash over the token string), so both
    // engines must produce byte-identical token sequences, not just equal
    // counts.
    "text_bpe_encode" -> QueryDef(
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables.documents(s, d)
          .crossJoin(broadcast(bpeMergesFrame(s, d)))
          .selectExpr("doc_id", s"${sparkWords("lower(text)")} AS ws", "ms")
          .selectExpr("doc_id", "ws", s"$sparkBpeTs AS ts")
          .selectExpr("doc_id",
            "CAST(size(ws) AS BIGINT) AS n_words",
            "CAST(length(ts) - length(replace(ts, '|', '')) + size(ws) AS BIGINT) AS n_tokens",
            s"${sparkStrHash("ts")} AS fp")
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH ${duckBpeTokCtes("doc_id,")}
        SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_words,
               CAST(length(ts) - length(replace(ts, '|', '')) + len(ws) AS BIGINT) AS n_tokens,
               ${duckStrHash("ts")} AS fp
        FROM tok ORDER BY doc_id""")),

    // TOKENIZER FERTILITY by language — tokens-per-word and
    // characters-per-token of the learned BPE vocabulary, the standard
    // tokenizer-efficiency diagnostic (a language whose fertility is 2x
    // another's pays 2x the sequence length for the same text; tokenizer
    // papers report exactly these two ratios per language). Reuses the
    // text_bpe_encode machinery (same merge table, same row-local encode)
    // and aggregates per lang: sums of exact per-doc integer counts
    // (words, tokens, chars), then two single IEEE divisions leave as
    // e6-scaled BIGINTs. Scale shape: identical to text_bpe_encode (one
    // broadcast merge row, narrow map) with the per-doc counts collapsing
    // into a 5-row map-side-combinable aggregate.
    "text_token_fertility" -> QueryDef(
      (s, d) => {
        Tables.documents(s, d)
          .crossJoin(broadcast(bpeMergesFrame(s, d)))
          .selectExpr("lang", s"${sparkWords("lower(text)")} AS ws", "ms")
          .selectExpr("lang", "ws", s"$sparkBpeTs AS ts")
          .selectExpr("lang",
            "CAST(size(ws) AS BIGINT) AS nw",
            "CAST(length(ts) - length(replace(ts, '|', '')) + size(ws) AS BIGINT) AS nt",
            // chars = token-string length minus the size(ws)-1 word
            // separators and the (n_tokens - size(ws)) in-word '|' marks
            "CAST(length(replace(replace(ts, '|', ''), ' ', '')) AS BIGINT) AS nc")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nw")).as("n_words"), sum(col("nt")).as("n_tokens"),
            sum(col("nc")).as("n_chars"))
          .selectExpr("lang", "n_docs", "n_words", "n_tokens", "n_chars",
            s"${Q.scaledLong("CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE)", 6)} AS fertility_e6",
            s"${Q.scaledLong("CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)", 6)} AS chars_per_token_e6")
          .orderBy(col("lang"))
      },
      Some(s"""
        WITH ${duckBpeTokCtes("lang,")}
        , per AS (
          SELECT lang,
                 CAST(len(ws) AS BIGINT) AS nw,
                 CAST(length(ts) - length(replace(ts, '|', '')) + len(ws) AS BIGINT) AS nt,
                 CAST(length(replace(replace(ts, '|', ''), ' ', '')) AS BIGINT) AS nc
          FROM tok),
        agg AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(nw) AS BIGINT) AS n_words,
                 CAST(sum(nt) AS BIGINT) AS n_tokens,
                 CAST(sum(nc) AS BIGINT) AS n_chars
          FROM per GROUP BY lang)
        SELECT lang, n_docs, n_words, n_tokens, n_chars,
               ${Q.scaledLong("CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE)", 6)} AS fertility_e6,
               ${Q.scaledLong("CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)", 6)} AS chars_per_token_e6
        FROM agg ORDER BY lang""")),

    // TRAINED quality classifier — logistic regression by full-batch
    // gradient descent (the GPT-3 pattern at its most literal: Brown et
    // al. 2020 §A train a CLASSIFIER to score documents; CCNet and
    // LLaMA's quality filters are the same shape). The training target is
    // RULE DISTILLATION — the standard cheap-student-on-teacher-labels
    // move: labels come from the engine's own docs_quality_filter verdict
    // (keep = 20 <= words <= 90 AND has stopwords) and the student learns
    // them from continuous features [(words-55)/100 centered at the
    // in-band median, its square — the centered quadratic that makes a
    // length BAND linearly expressible, stopword share, distinct-word
    // ratio]. Output: per step, the updated e6-scaled weight vector, the
    // entering-weights accuracy, and the entering-weights mean log-loss —
    // the metric full-batch GD provably decreases at this step size
    // (measured 0.693 -> 0.534 over the four steps; accuracy needs more
    // steps than a 4-step demo to leave the majority-class plateau, which
    // is exactly what the loss column documents). Note the synthetic
    // corpus's lang/source columns are independent of the text by
    // construction, so the engine's own rule is the honest learnable
    // label here.
    //
    // Determinism (the house sufficient-statistics discipline applied to
    // a TRANSCENDENTAL model): each feature is one exact-integer division
    // rounded ONCE to an e6 BIGINT; each per-doc sigmoid rounds ONCE to
    // an e6 BIGINT (the documented ulp contract — z is a fixed-order
    // 5-term literal over e6-int-derived doubles); every gradient
    // component is then an EXACT BIGINT sum of x_e6 * (y_e6 - s) — no
    // float ever accumulates across rows, so Spark's partial-aggregation
    // order cannot flip a digit. The weight update rounds once per step.
    //
    // Scale shape: the textbook distributed GD — T passes over the
    // corpus, each ONE map-side-combinable integer aggregate with the
    // 1-row weight frame broadcast into the scoring map; the feature
    // frame persists scoped so the corpus tokenizes once, not T times.
    // |g_j| <= 6e12 per row bounds exact BIGINT sums to ~1e6 docs per
    // partition-tree level; past that the drop-in upgrade is the same
    // two-level Aggregator split embed_centroids uses.
    "quality_logreg_train" -> QueryDef(
      (s, d) => lrSteps(s, d).orderBy(col("step")),
      Some(s"""
        WITH $duckLrCtes
        SELECT step, n_correct, mean_nll_e6, w0_e6, w1_e6, w2_e6, w3_e6, w4_e6 FROM (
          ${(1 to LrSteps).map(t => s"SELECT * FROM st$t").mkString(" UNION ALL ")})
        ORDER BY step""")),

    // Calibration of the trained classifier — the reliability diagram
    // (Guo et al. 2017's calibration framing), with EQUAL-COUNT bins
    // (sklearn's strategy='quantile'): ntile(10) over the final-step
    // predicted probability, then mean predicted probability vs observed
    // positive rate per bin (a well-calibrated model's bins sit on the
    // diagonal; a distilled 4-step GD model's don't yet — that gap IS
    // the measurement; fixed-width deciles would collapse this model's
    // clustered probabilities into one bin and measure nothing).
    // Completes the classifier family: train (quality_logreg_train) ->
    // ranking quality (quality_score_auc) -> probability quality (this).
    // Determinism: ntile orders by (s, doc_id) so ties split identically
    // in both engines; counts/sums are exact BIGINTs and the two per-bin
    // divisions round once through the house rule. Scale shape: one more
    // broadcast-weights scoring pass over the cached feature frame; the
    // deciles come from GlobalOrder.ntileCol (r9, was a single-task
    // global ntile over every scored document) — bucketed distributed
    // row_number + the exact ntile arithmetic, value-identical to
    // SQL ntile(10) at any corpus size.
    "quality_calibration_bins" -> QueryDef(
      (s, d) => {
        val feats = lrFeats(s, d)
        val wFin = lrSteps(s, d).where(col("step") === lit(LrSteps.toLong))
          .selectExpr("w0_e6", "w1_e6", "w2_e6", "w3_e6", "w4_e6")
        val scored = feats.crossJoin(broadcast(wFin))
          .selectExpr("doc_id", "y",
            s"${Q.scaledLong(s"1.0 / (1.0 + exp(-($lrZ)))", 6)} AS s")
        graft.engine.ops.GlobalOrder
          .ntileCol(scored, 10, col("s"), Seq(col("doc_id")), "binx")
          .selectExpr("y", "s", "CAST(binx AS BIGINT) AS bin")
          .groupBy(col("bin"))
          .agg(count(lit(1)).cast("bigint").as("n"),
            sum(col("y")).as("n_pos"), sum(col("s")).as("ssum"))
          .selectExpr("bin", "n", "n_pos",
            "CAST(floor(CAST(ssum AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS mean_pred_e6",
            s"${Q.scaledLong("CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)", 6)} AS obs_rate_e6")
          .orderBy(col("bin"))
      },
      Some(s"""
        WITH $duckLrCtes,
        fin AS (
          SELECT doc_id, y, ${Q.scaledLong(s"1.0 / (1.0 + exp(-($lrZ)))", 6)} AS s
          FROM feats, st$LrSteps),
        binned AS (
          SELECT y, s,
                 CAST(ntile(10) OVER (ORDER BY s, doc_id) AS BIGINT) AS bin
          FROM fin),
        ag AS (
          SELECT bin, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS n_pos,
                 CAST(sum(s) AS BIGINT) AS ssum
          FROM binned GROUP BY bin)
        SELECT bin, n, n_pos,
               CAST(floor(CAST(ssum AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS mean_pred_e6,
               ${Q.scaledLong("CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)", 6)} AS obs_rate_e6
        FROM ag ORDER BY bin""")),

    // ROC-AUC of a quality score against a binary label via the
    // rank-statistic identity AUC = (sum of positive ranks - n1(n1+1)/2)
    // / (n1*n2) — the Mann-Whitney U relation (Hanley & McNeil 1982), the
    // standard eval for exactly the classifier family above. Score under
    // test: the stopword share (x3 above, e6-quantized); label: the
    // docs_quality_filter keep rule. Tie-aware: ties get average ranks via
    // 2*avg_rank = 2*rank() + count_ties - 1, which keeps EVERYTHING in
    // exact integers — u2 = 2*U is emitted as a pure-integer gate column
    // and auc_e6 is that one integer ratio rounded once. Scale shape
    // (r9, was a global rank over every document): the corpus makes ONE
    // map-side-combinable score-histogram aggregate — groupBy(sc) with
    // per-score (count, positives) — and the rank arithmetic runs over
    // the HISTOGRAM, whose row count is bounded by the e6-quantized
    // score DOMAIN (<= 1,000,001 rows at any corpus size); its running
    // sum distributes through GlobalOrder.runningSum (bucketed, no
    // single-task window). Per tied block at cumulative count `cum`
    // with c ties, each positive contributes 2*avg_rank = 2*(cum-c+1)
    // + c - 1 = 2*cum - c + 1 — the identical tie-average value the
    // row-level rank computed. nullif guards the all-one-class corpus
    // (n1*n2 = 0): NULL auc in both engines, not Infinity-saturation.
    "quality_score_auc" -> QueryDef(
      (s, d) => {
        val hist = Tables.documents(s, d)
          .selectExpr(s"${sparkWords("lower(text)")} AS ws")
          .where(expr("size(ws) > 0"))
          .selectExpr("CAST(size(ws) AS BIGINT) AS nw",
            s"${sparkScore(stopwords)} AS stop")
          .selectExpr(
            "CASE WHEN nw >= 20 AND nw <= 90 AND stop > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y",
            s"${Q.scaledLong("CAST(stop AS DOUBLE) / CAST(nw AS DOUBLE)", 6)} AS sc")
          .groupBy(col("sc"))
          .agg(count(lit(1)).cast("bigint").as("c"), sum(col("y")).as("p"))
        graft.engine.ops.GlobalOrder
          .runningSum(hist, col("sc"), Nil, col("c"), "cum")
          .agg(
            sum(col("p")).as("n1"),
            (sum(col("c")) - sum(col("p"))).cast("bigint").as("n2"),
            sum(expr("p * (2 * cum - c + 1)")).as("ranksum2"))
          .selectExpr("n1 AS n_pos", "n2 AS n_neg",
            "ranksum2 - n1 * (n1 + 1) AS u2",
            s"${Q.scaledLong("CAST(ranksum2 - n1 * (n1 + 1) AS DOUBLE) / CAST(nullif(2 * n1 * n2, 0) AS DOUBLE)", 6)} AS auc_e6")
      },
      Some(s"""
        WITH raw AS (
          SELECT ${duckWords("lower(text)")} AS ws FROM documents),
        ft AS (
          SELECT CAST(len(ws) AS BIGINT) AS nw,
                 ${duckScore(stopwords)} AS stop
          FROM raw WHERE len(ws) > 0),
        scd AS (
          SELECT CASE WHEN nw >= 20 AND nw <= 90 AND stop > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y,
                 ${Q.scaledLong("CAST(stop AS DOUBLE) / CAST(nw AS DOUBLE)", 6)} AS sc
          FROM ft),
        rk AS (
          SELECT y, sc,
                 CAST(rank() OVER (ORDER BY sc) AS BIGINT) AS r,
                 CAST(count(*) OVER (PARTITION BY sc) AS BIGINT) AS c
          FROM scd),
        ag AS (
          SELECT CAST(sum(y) AS BIGINT) AS n1,
                 CAST(count(*) - sum(y) AS BIGINT) AS n2,
                 CAST(sum(CASE WHEN y = 1 THEN 2 * r + c - 1 ELSE 0 END) AS BIGINT) AS ranksum2
          FROM rk)
        SELECT n1 AS n_pos, n2 AS n_neg,
               ranksum2 - n1 * (n1 + 1) AS u2,
               ${Q.scaledLong("CAST(ranksum2 - n1 * (n1 + 1) AS DOUBLE) / CAST(nullif(2 * n1 * n2, 0) AS DOUBLE)", 6)} AS auc_e6
        FROM ag""")),

    // TRUE sequential BPE training (Sennrich et al. 2016 "Neural Machine
    // Translation of Rare Words with Subword Units", Algorithm 1): unlike
    // text_bpe_pairs/encode — which take the top-k pairs of ONE counting
    // pass — each round here recomputes pair statistics over the
    // tokenization produced by all PREVIOUS merges, so later merges can
    // fuse multi-character tokens (the actual BPE vocabulary-growth
    // process; a single-shot count can only ever learn 2-char tokens).
    // Emits the learned merge table: per round the winning pair, its
    // frequency-weighted count, and the corpus token count after applying
    // the merge (monotonically decreasing by exactly n_pair).
    //
    // Scale shape — the reason BPE trains at 100 TB at all: the ONLY
    // corpus-scale work is the initial distinct-word frequency count
    // (map-side combinable, one shuffle); all R merge rounds run over the
    // VOCAB-BOUNDED word-frequency table on ONE executor task (exactly
    // how production trainers work: HuggingFace tokenizers /
    // SentencePiece count words distributed, then run the merge loop
    // locally on the counted table — the table is bounded by |vocab|,
    // not by corpus size, so it fits one task at any corpus scale).
    // r11: this replaced a 6-round declarative chain (per round: pair
    // explode + count + TakeOrdered(1) argmax + broadcast re-tokenize ≈
    // 13 fixed-latency jobs on a 31-row frame, ~3 s of pure scheduling
    // at sf0.1) with one mapPartitions over the single-partition vocab —
    // the same "bounded frame, inherently sequential algorithm" seam as
    // the multimodal byte decode; the declarative per-round shape lives
    // on in text_bpe_pairs/text_bpe_encode. Everything stays exact
    // integer arithmetic — no floats anywhere in the gate.
    //
    // The greedy left-to-right merge compares WHOLE tokens (exact
    // last-token match against the merge's left side), so a merged token
    // can never be re-merged by a prefix/suffix character — the Scala
    // loop is a statement-for-statement twin of the oracle's
    // list_reduce fold; ASCII-only tokens (ContractSpec) make Scala's
    // string ordering identical to both engines' binary collation for
    // the argmax tie-break (n DESC, a ASC, b ASC).
    "text_bpe_train" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val rounds = 6
        val vocab = Tables.documents(s, d)
          .selectExpr(s"explode(${sparkWords("lower(text)")}) AS wd")
          .groupBy(col("wd")).agg(count(lit(1)).as("freq"))
          .selectExpr("wd", "CAST(freq AS BIGINT) AS freq")
          .as[(String, Long)]
        val trained = vocab.coalesce(1).mapPartitions { it =>
          // Sennrich et al. 2016 Algorithm 1 over the in-memory table
          val words = it.map { case (wd, f) =>
            (f, wd.toCharArray.map(_.toString))
          }.toArray
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, String, String, Long, Long)]
          var step = 1
          var exhausted = false
          while (step <= rounds && !exhausted) {
            val counts = scala.collection.mutable.HashMap
              .empty[(String, String), Long]
            for ((f, ts) <- words; i <- 0 until ts.length - 1) {
              val k = (ts(i), ts(i + 1))
              counts(k) = counts.getOrElse(k, 0L) + f
            }
            if (counts.isEmpty) exhausted = true // oracle emits no row either
            else {
              val ((a, b), n) =
                counts.minBy { case ((a, b), n) => (-n, a, b) }
              var tokensAfter = 0L
              var wi = 0
              while (wi < words.length) {
                val (f, ts) = words(wi)
                val buf = scala.collection.mutable.ArrayBuffer.empty[String]
                for (t <- ts) {
                  if (buf.nonEmpty && t == b && buf.last == a)
                    buf(buf.length - 1) = a + b
                  else buf += t
                }
                words(wi) = (f, buf.toArray)
                tokensAfter += f * buf.length
                wi += 1
              }
              out += ((step.toLong, a, b, n, tokensAfter))
            }
            step += 1
          }
          out.iterator
        }
        trained.toDF("step", "tok_a", "tok_b", "n_pair", "corpus_tokens")
          .orderBy(col("step"))
      },
      Some {
        val duckApply =
          """list_reduce(list_prepend('', string_split(ts, '|')),
               (acc, t) -> CASE WHEN acc <> '' AND t = b
                                     AND (acc = a OR right(acc, length(a) + 1) = '|' || a)
                                THEN acc || t
                                ELSE acc || (CASE WHEN acc = '' THEN '' ELSE '|' END) || t END)"""
        val roundCtes = (1 to 6).map { r =>
          val p = r - 1
          s"""ex$r AS (SELECT freq, string_split(ts, '|') AS tk FROM v$p
                       WHERE len(string_split(ts, '|')) >= 2),
        pr$r AS (SELECT freq, list_extract(tk, CAST(i AS INT)) AS a,
                        list_extract(tk, CAST(i AS INT) + 1) AS b
                 FROM (SELECT freq, tk, unnest(range(1, len(tk))) AS i FROM ex$r) t$r),
        mg$r AS (SELECT a, b, CAST(sum(freq) AS BIGINT) AS n FROM pr$r
                 GROUP BY a, b ORDER BY n DESC, a, b LIMIT 1),
        v$r AS MATERIALIZED (SELECT freq, $duckApply AS ts FROM v$p, mg$r),
        st$r AS (SELECT CAST($r AS BIGINT) AS step, a AS tok_a, b AS tok_b,
                        CAST(n AS BIGINT) AS n_pair,
                        (SELECT CAST(sum(freq * len(string_split(ts, '|'))) AS BIGINT) FROM v$r) AS corpus_tokens
                 FROM mg$r)"""
        }.mkString(",\n        ")
        s"""
        WITH wd0 AS (
          SELECT unnest(${duckWords("lower(text)")}) AS wd FROM documents),
        v0 AS (
          SELECT CAST(count(*) AS BIGINT) AS freq,
                 array_to_string(string_split(wd, ''), '|') AS ts
          FROM wd0 GROUP BY wd),
        $roundCtes
        SELECT * FROM (
          ${(1 to 6).map(r => s"SELECT * FROM st$r").mkString(" UNION ALL ")})
        ORDER BY step"""
      }),

    // Hash-based train/val/test assignment: membership is a pure function
    // of content, so the split survives reprocessing and dedup.
    // Text normalization — the first pass of every curation pipeline:
    // lowercase, strip non-alphanumerics to spaces, collapse whitespace
    // runs, trim. Gated by the normalized length AND the rolling-hash
    // fingerprint of the normalized text, so both engines must produce
    // the identical cleaned string byte-for-byte.
    "text_normalize" -> QueryDef(
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables.documents(s, d)
          .selectExpr("doc_id",
            "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]', ' '), ' +', ' ')) AS norm")
          .selectExpr("doc_id",
            "CAST(length(norm) AS BIGINT) AS n_norm",
            s"${sparkStrHash("norm")} AS fp")
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH n AS (
          SELECT doc_id,
                 trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g'), ' +', ' ', 'g')) AS norm
          FROM documents)
        SELECT doc_id, CAST(length(norm) AS BIGINT) AS n_norm,
               ${duckStrHash("norm")} AS fp
        FROM n ORDER BY doc_id""")),

    // inline() generator over an array of structs built by an
    // index-aware transform lambda — the third generator shape
    // (explode, posexplode, inline) and the idiomatic way to fan a
    // struct column straight into rows without a nested select. A
    // deterministic 1/100 doc stratum keeps the row count bounded.
    "gen_inline_terms" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .where(col("doc_id") % 100 === 0)
        .selectExpr("doc_id", s"${sparkWords("lower(text)")} AS ws")
        .selectExpr("doc_id",
          "inline(transform(ws, (w, i) -> struct(i AS pos, w AS term)))")
        .orderBy(col("doc_id"), col("pos")),
      Some(s"""
        WITH w AS (
          SELECT doc_id, generate_subscripts(ws, 1) AS pos1, unnest(ws) AS term
          FROM (SELECT doc_id, ${duckWords("lower(text)")} AS ws
                FROM documents WHERE doc_id % 100 = 0) t)
        SELECT doc_id, CAST(pos1 - 1 AS INT) AS pos, term
        FROM w ORDER BY doc_id, pos""")),

    // The array higher-order-function surface (§2.3) declared explicitly:
    // filter / exists / forall / transform+array_max / sequence-indexed
    // adjacent comparison, each reduced to an integer so the whole HOF
    // family sits under the exact gate. Row-local over the scan — the
    // HOFs run inside the row, nothing shuffles but the output sort.
    "array_hof_words" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .selectExpr("doc_id", s"${sparkWords("lower(text)")} AS ws")
        .selectExpr("doc_id",
          "CAST(size(ws) AS BIGINT) AS n_words",
          "CAST(size(filter(ws, w -> length(w) > 4)) AS BIGINT) AS n_long",
          "CAST(CASE WHEN exists(ws, w -> w = 'the') THEN 1 ELSE 0 END AS BIGINT) AS has_the",
          "CAST(CASE WHEN forall(ws, w -> length(w) <= 12) THEN 1 ELSE 0 END AS BIGINT) AS all_short",
          "CAST(array_max(transform(ws, w -> length(w))) AS BIGINT) AS max_len",
          "CAST(size(filter(sequence(1, size(ws) - 1), i -> element_at(ws, i) = element_at(ws, i + 1))) AS BIGINT) AS n_adj_dup")
        .orderBy(col("doc_id")),
      Some(s"""
        SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_words,
               CAST(len(list_filter(ws, w -> length(w) > 4)) AS BIGINT) AS n_long,
               CAST(CASE WHEN len(list_filter(ws, w -> w = 'the')) > 0 THEN 1 ELSE 0 END AS BIGINT) AS has_the,
               CAST(CASE WHEN len(list_filter(ws, w -> length(w) > 12)) = 0 THEN 1 ELSE 0 END AS BIGINT) AS all_short,
               CAST(list_max(list_transform(ws, w -> length(w))) AS BIGINT) AS max_len,
               CAST(len(list_filter(range(1, len(ws)), i -> ws[i] = ws[i + 1])) AS BIGINT) AS n_adj_dup
        FROM (SELECT doc_id, ${duckWords("lower(text)")} AS ws FROM documents) t
        ORDER BY doc_id""")),

    // Count-Min sketch — the streaming-friendly frequency summary (d=3
    // hash rows x w=16 counters) built over the token stream, then probed
    // for every vocabulary term against its true count. Every cell is an
    // integer sum of integer hashes, so unlike HLL the whole sketch AND
    // its estimates are bit-portable and sit under the exact oracle gate
    // — est_n >= true_n always, with equality iff no colliding term
    // shares all three cells. Scale shape: the sketch build is one
    // map-side-combinable groupBy over (row, bucket) — d x w = 48 cells
    // total regardless of corpus size, the canonical sketch property;
    // the probe side joins the tiny cell table back to the vocabulary.
    "sketch_countmin_terms" -> QueryDef(
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val hash = (i: Int) => s"((${minHashA(i)} * th + ${minHashB(i)}) % $P) % $CmWidth"
        val stackExpr = (0 until CmDepth)
          .map(i => s"$i, ${hash(i)}").mkString(s"stack($CmDepth, ", ", ", ") AS (i, bucket)")
        // term totals from the shared unigram root (r11): each term
        // contributes its exact count to its d cells, so the cell sums
        // equal the per-occurrence build integer-for-integer
        val tCounts = docTermCounts(s, d).groupBy(col("term"))
          .agg(sum(col("tc")).as("true_n"))
          .selectExpr("term", "true_n", "graft_strhash(term) AS th")
          .persistScoped() // feeds the sketch build AND the probe side
        val sketch = tCounts.selectExpr("true_n", stackExpr)
          .groupBy(col("i"), col("bucket")).agg(sum(col("true_n")).as("cell_n"))
        val probes = tCounts.selectExpr("term", "true_n", stackExpr)
        probes.join(sketch, Seq("i", "bucket"))
          .groupBy(col("term"), col("true_n"))
          .agg(min(col("cell_n")).as("est_n"))
          .orderBy(col("term"))
      },
      Some {
        val hash = (i: Int, th: String) =>
          s"((${minHashA(i)} * $th + ${minHashB(i)}) % $P) % $CmWidth"
        val bkRows = (0 until CmDepth)
          .map(i => s"SELECT $i AS i, ${hash(i, "th")} AS bucket FROM th")
          .mkString(" UNION ALL ")
        val pbRows = (0 until CmDepth)
          .map(i => s"SELECT term, true_n, $i AS i, ${hash(i, "th")} AS bucket FROM tc")
          .mkString(" UNION ALL ")
        s"""
        WITH tm AS (
          SELECT unnest(${duckWords("lower(text)")}) AS term FROM documents),
        th AS (SELECT term, ${duckStrHash("term")} AS th FROM tm),
        sk AS (SELECT i, bucket, CAST(count(*) AS BIGINT) AS cell_n
               FROM ($bkRows) b GROUP BY 1, 2),
        tc AS (SELECT term, CAST(count(*) AS BIGINT) AS true_n, min(th) AS th
               FROM th GROUP BY term),
        pb AS ($pbRows)
        SELECT pb.term, pb.true_n, CAST(min(sk.cell_n) AS BIGINT) AS est_n
        FROM pb JOIN sk ON pb.i = sk.i AND pb.bucket = sk.bucket
        GROUP BY 1, 2 ORDER BY pb.term"""
      }),

    // PII redaction — the scrubbing pass a curation pipeline runs before
    // training: find and replace emails/phone numbers, count what was
    // redacted, and fingerprint the scrubbed text. The synthetic corpus
    // carries no PII, so deterministic fakes are injected first (an
    // email for every 7th doc, a phone for every 5th — both pure
    // functions of doc_id, mirrored in the oracle); the redaction
    // machinery (regex find/replace/count over full documents) is the
    // operator under test, and the rolling-hash fingerprint forces the
    // scrubbed bytes to match exactly. Row-local map over the scan — no
    // shuffle, the 100 TB shape for any per-document rewrite.
    "text_pii_redact" -> QueryDef(
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables.documents(s, d)
          .selectExpr("doc_id",
            "concat(text," +
              " CASE WHEN doc_id % 7 = 0 THEN concat(' contact user', CAST(doc_id AS STRING), '@example.com') ELSE '' END," +
              " CASE WHEN doc_id % 5 = 0 THEN concat(' call +1-555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END) AS txt")
          .selectExpr("doc_id",
            s"CAST(size(regexp_extract_all(txt, '$EmailRe', 0)) AS BIGINT) AS n_emails",
            s"CAST(size(regexp_extract_all(txt, '$PhoneRe', 0)) AS BIGINT) AS n_phones",
            s"regexp_replace(regexp_replace(txt, '$EmailRe', '<EMAIL>'), '$PhoneRe', '<PHONE>') AS red")
          .selectExpr("doc_id", "n_emails", "n_phones",
            "CAST(length(red) AS BIGINT) AS n_red_chars",
            s"${sparkStrHash("red")} AS fp")
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id,
                 text
                 || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
                 || CASE WHEN doc_id % 5 = 0 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS txt
          FROM documents),
        r AS (
          SELECT doc_id, txt,
                 regexp_replace(regexp_replace(txt, '$EmailRe', '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g') AS red
          FROM t)
        SELECT doc_id,
               CAST(len(regexp_extract_all(txt, '$EmailRe')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(txt, '$PhoneRe')) AS BIGINT) AS n_phones,
               CAST(length(red) AS BIGINT) AS n_red_chars,
               ${duckStrHash("red")} AS fp
        FROM r ORDER BY doc_id""")),

    // Training-sequence packing: documents stream into fixed token-budget
    // bins (budget 4096) in deterministic doc_id order per language —
    // bin = floor(tokens-before-me / budget), the linear packing a
    // sequence-packer uses when it concatenates documents up to the
    // context length. Exact on both engines (integer running sum via
    // window). Scale: one shuffle on lang, running sum within partition;
    // at 100 TB packing runs per shard (lang x content-shard) so no
    // partition carries a whole language.
    "pack_sequences" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.documents(s, d)
          .select(col("lang"), col("doc_id"), col("n_chars"))
          .withColumn("before", coalesce(sum(col("n_chars")).over(w), lit(0L)))
          .withColumn("bin", (col("before") / lit(4096L)).cast("long"))
          .groupBy(col("lang"), col("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bin_chars"))
          .orderBy(col("lang"), col("bin"))
      },
      Some("""
        WITH x AS (
          SELECT lang, doc_id, n_chars,
                 coalesce(sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
          FROM documents)
        SELECT lang, CAST(before // 4096 AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS bin_chars
        FROM x GROUP BY 1, 2 ORDER BY 1, 2""")),

    "split_train_eval" -> QueryDef(
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables.documents(s, d)
          .selectExpr("lang",
            s"""CASE WHEN ${sparkStrHash("text")} % 10 < 8 THEN 'train'
                     WHEN ${sparkStrHash("text")} % 10 < 9 THEN 'val'
                     ELSE 'test' END AS split""")
          .groupBy(col("lang"), col("split"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("split"))
      },
      Some(s"""
        SELECT lang,
               CASE WHEN ${duckStrHash("text")} % 10 < 8 THEN 'train'
                    WHEN ${duckStrHash("text")} % 10 < 9 THEN 'val'
                    ELSE 'test' END AS split,
               CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2 ORDER BY 1, 2""")),


    // Deterministic global corpus shuffle into trainer shards: every doc
    // gets a pseudo-random but SEEDED rank (an affine mod-prime hash of
    // its id — change the multiplier to reshuffle), the shard is the
    // rank's residue, and the position is the rank order within the
    // shard. This is the reproducible "shuffle the corpus before
    // training" step: independent of input file layout, restartable from
    // any (shard, pos) offset, and identical on every rerun — properties
    // a random() shuffle cannot give.
    //
    // Scale shape: the hash is row-local; at cluster scale the query IS
    // repartition-by-shard + sortWithinPartitions(h) — exactly one
    // shuffle keyed by the 8-way shard id (the per-shard window below
    // expresses the same semantics), which is the canonical tera-sort
    // trainer-shuffle cost and the floor for any global permutation.
    "shuffle_shards" -> QueryDef(
      (s, d) => {
        val h = s"(doc_id * 1103515245 + 12345) % ${P}"
        Tables.documents(s, d)
          .selectExpr("doc_id", s"$h AS h")
          .withColumn("shard", col("h") % lit(8L))
          .withColumn("pos", row_number().over(
            Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))))
          .select(col("doc_id"), col("shard"), col("pos"))
          .orderBy(col("shard"), col("pos"))
      },
      Some(s"""
        WITH x AS (
          SELECT doc_id, (doc_id * 1103515245 + 12345) % ${P} AS h
          FROM documents)
        SELECT doc_id, h % 8 AS shard,
               CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS INTEGER) AS pos
        FROM x ORDER BY shard, pos""")),

    // Quarter-mean byte features as scaled BIGINTs. The oracle sums bytes
    // with list_aggregate('sum') — an order-free INTEGER sum, exact in any
    // build — then does the single double division the decoder does; the
    // round-2 list_reduce double fold was build-sensitive on the driver.
    "multimodal_features" -> QueryDef(
      (s, d) => {
        import graft.engine.multimodal.Multimodal
        val feats = Multimodal.extractFeatures(Multimodal.mediaTable(Tables.documents(s, d)))
        feats.selectExpr(Seq("doc_id", "n_bytes") ++
          (1 to 4).map(i => s"${Q.scaledLong(s"element_at(features, $i)", 4)} AS f$i"): _*)
          .orderBy(col("doc_id"))
      },
      Some {
        def quarter(q: Int): String = {
          val from = s"(($q * length(text)) // 4)"
          val until = s"((${q + 1} * length(text)) // 4)"
          val byteSum = s"CAST(coalesce(list_aggregate(" +
            s"list_transform(range($from + 1, $until + 1), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)), " +
            s"'sum'), 0) AS BIGINT)"
          s"CASE WHEN $until > $from THEN " +
            s"${Q.scaledLong(s"CAST($byteSum AS DOUBLE) / ($until - $from)", 4)} " +
            s"ELSE CAST(0 AS BIGINT) END"
        }
        s"""
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
               ${(0 until 4).map(q => s"${quarter(q)} AS f${q + 1}").mkString(", ")}
        FROM documents ORDER BY doc_id"""
      }),

    // Decode -> featurize -> nearest-neighbor, composed through the
    // multimodal seam: the canonical multimodal training-data flow
    // (decode each payload via the mapPartitions decoder, reduce to a
    // fixed-dim feature vector, search neighbors in feature space). The
    // features are the e4-scaled quarter-mean BIGINTs multimodal_features
    // declares, so the 4-dim cosine runs on exact integers (dot and
    // norms are BIGINT folds; one deterministic division at the end).
    // Probe side is 5 docs broadcast against the corpus scan — the
    // brute-force map-side shape sim_topk_cosine pins — with top-3 by
    // cosine, deterministic tie-breaks.
    "multimodal_similar_docs" -> QueryDef(
      (s, d) => {
        import graft.engine.multimodal.Multimodal
        val feats = Multimodal
          .extractFeatures(Multimodal.mediaTable(Tables.documents(s, d)))
          .selectExpr(Seq("doc_id") ++
            (1 to 4).map(i => s"${Q.scaledLong(s"element_at(features, $i)", 4)} AS f$i"): _*)
        def dot(a: String, b: String) =
          (1 to 4).map(i => s"${a}$i * ${b}$i").mkString(" + ")
        val probes = feats.filter(col("doc_id") < 5)
          .toDF(Seq("qid") ++ (1 to 4).map(i => s"q$i"): _*)
        val scored = broadcast(probes)
          .join(feats.toDF(Seq("did") ++ (1 to 4).map(i => s"g$i"): _*),
            col("qid") =!= col("did"))
          .withColumn("dp", expr(dot("q", "g")))
          .withColumn("na", expr(dot("q", "q")))
          .withColumn("nb", expr(dot("g", "g")))
          .where(col("na") > 0 && col("nb") > 0)
          .withColumn("cos_e6", expr(Q.scaledLong(
            "CAST(dp AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))", 6)))
        scored.withColumn("rn", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("cos_e6").desc, col("did"))))
          .where(col("rn") <= 3)
          .selectExpr("qid", "CAST(rn AS BIGINT) AS rn", "did", "cos_e6")
          .orderBy(col("qid"), col("rn"))
      },
      Some {
        def quarter(q: Int): String = {
          val from = s"(($q * length(text)) // 4)"
          val until = s"((${q + 1} * length(text)) // 4)"
          val byteSum = s"CAST(coalesce(list_aggregate(" +
            s"list_transform(range($from + 1, $until + 1), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)), " +
            s"'sum'), 0) AS BIGINT)"
          s"CASE WHEN $until > $from THEN " +
            s"${Q.scaledLong(s"CAST($byteSum AS DOUBLE) / ($until - $from)", 4)} " +
            s"ELSE CAST(0 AS BIGINT) END"
        }
        val dotQG = (1 to 4).map(i => s"q.f$i * g.f$i").mkString(" + ")
        val dotQQ = (1 to 4).map(i => s"q.f$i * q.f$i").mkString(" + ")
        val dotGG = (1 to 4).map(i => s"g.f$i * g.f$i").mkString(" + ")
        s"""
        WITH feats AS (
          SELECT doc_id,
                 ${(0 until 4).map(q => s"${quarter(q)} AS f${q + 1}").mkString(", ")}
          FROM documents),
        sc AS (
          SELECT q.doc_id AS qid, g.doc_id AS did,
                 CAST($dotQG AS BIGINT) AS dp,
                 CAST($dotQQ AS BIGINT) AS na,
                 CAST($dotGG AS BIGINT) AS nb
          FROM feats q JOIN feats g ON q.doc_id < 5 AND q.doc_id <> g.doc_id),
        scored AS (
          SELECT qid, did,
                 ${Q.scaledLong(
          "CAST(dp AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))", 6)} AS cos_e6
          FROM sc WHERE na > 0 AND nb > 0),
        ranked AS (
          SELECT qid, did, cos_e6,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY cos_e6 DESC, did) AS rn
          FROM scored)
        SELECT qid, CAST(rn AS BIGINT) AS rn, did, cos_e6
        FROM ranked WHERE rn <= 3 ORDER BY qid, rn"""
      }),

    // Frame sampling through the multimodal seam: every 4th 16-byte
    // frame, integer byte-sum digest (order-free — exact in any build).
    // DuckDB mirrors the block arithmetic with range(start, stop, step)
    // and ascii(substr(...)) over the same payload bytes. Oracle parity
    // assumes an ASCII payload (engine walks UTF-8 bytes, oracle walks
    // characters — identical only when byte==codepoint; holds for the
    // driver corpus, as multimodal_features already relies on).
    "multimodal_framesample" -> QueryDef(
      (s, d) => {
        import graft.engine.multimodal.Multimodal
        Multimodal.sampleFrames(Multimodal.mediaTable(Tables.documents(s, d)))
          .selectExpr("doc_id", "n_bytes", "n_frames", "digest")
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_bytes,
               CAST(len(range(0, length(text) // 16, 4)) AS BIGINT) AS n_frames,
               CAST(coalesce(list_aggregate(flatten(
                 list_transform(range(0, length(text) // 16, 4), b ->
                   list_transform(range(1, 17), i ->
                     CAST(ascii(substr(text, b * 16 + i, 1)) AS BIGINT)))),
                 'sum'), 0) AS BIGINT) AS digest
        FROM documents ORDER BY doc_id""")),

    // Perceptual-hash near-dup pairs over opaque payloads — the
    // image-dedup shape every LAION-style multimodal pipeline runs:
    // resample the payload to 64 evenly-spaced taps (the stand-in for
    // the 8x8 luma resize; a real image pipeline decodes at the
    // mapPartitions seam and feeds the same grid), take the 2D DCT-II,
    // and fingerprint each payload by the SIGNS of its 63 AC
    // coefficients against their median — low-frequency structure
    // survives small local edits, so near-dup payloads land at small
    // Hamming distance. Pairs emerge via the SimHash pigeonhole: 8-bit
    // chunks equi-join (hamming <= 7 implies >= 1 of 8 chunks equal),
    // STOP-CHUNK-CAPPED (MaxChunkDocFreq — corpus-typical sign patterns
    // carry no near-dup signal and their buckets go quadratic; see the
    // constant's scaladoc for the measured collapse), then exact
    // bit_count verification.
    //
    // Determinism: the DCT basis is embedded as ONE set of e4-scaled
    // integer literals (printed once by the same Scala code into both
    // dialects), so every coefficient is an exact BIGINT sum — no
    // per-engine cosine calls, no float anywhere; median is element 32
    // of the sorted 63 ACs. Scale shape: hashing is a narrow row-local
    // map; only 8-byte (chunk, hash) rows shuffle for the bucket join;
    // verification touches candidates only.
    "multimodal_phash_pairs" -> QueryDef(
      (s, d) =>
        phashPairsAll(phashHashes(s, d))
          .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
          .limit(25),
      Some(s"""
        WITH w AS MATERIALIZED (SELECT doc_id, ${duckWords("lower(text)")} AS ws FROM documents),
        bn AS MATERIALIZED (SELECT doc_id, $phDuckBins AS bs FROM w),
        g AS MATERIALIZED (SELECT doc_id, $phDuckGrid AS gr, $phDuckBf AS bf FROM bn),
        rtf AS MATERIALIZED (SELECT doc_id, $phDuckRowT AS rt, bf FROM g),
        dcf AS MATERIALIZED (SELECT doc_id, $phDuckDct AS dc FROM rtf),
        mdf AS MATERIALIZED (SELECT doc_id, dc, $phDuckMed AS med FROM dcf),
        hs AS MATERIALIZED (SELECT doc_id, $phDuckBits AS h FROM mdf),
        ch0 AS MATERIALIZED (
          SELECT doc_id, h, c, (h >> CAST(8 * c AS INT)) & 255 AS ck
          FROM (SELECT doc_id, h, unnest(range(0, 8)) AS c FROM hs) q),
        ch AS MATERIALIZED (
          SELECT doc_id, h, c, ck FROM ch0 WHERE c * 256 + ck NOT IN (
            SELECT c * 256 + ck FROM ch0 GROUP BY c, ck
            HAVING count(*) > $MaxChunkDocFreq)),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.h AS ha, b.h AS hb
          FROM ch a JOIN ch b
            ON a.c = b.c AND a.ck = b.ck AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(ha, hb)) <= 7
        ORDER BY hamming, doc_a, doc_b LIMIT 25""")),

    "multimodal_meta" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          md5(encode(col("text"), "UTF-8")).as("digest"))
        .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS digest
        FROM documents ORDER BY doc_id""")),

    // Context-window chunking — the op that turns documents into
    // training samples: overlapping fixed-size windows (120 chars every
    // 100, i.e. 20 overlap so no boundary token loses context), one
    // output row per chunk. The chunker itself (engine/ops/Chunk.scala)
    // is row-local generate+explode over the scan — no shuffle until
    // the output sort — and is the same code path CuratePipeline feeds
    // trainers from, so the gated arithmetic IS the production one.
    "chunk_documents" -> QueryDef(
      (s, d) => graft.engine.ops.Chunk.chunks(Tables.documents(s, d))
        .selectExpr("doc_id", "chunk_idx",
          "CAST(length(chunk) AS BIGINT) AS chunk_len", "chunk")
        .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""
        SELECT doc_id, i AS chunk_idx,
               CAST(length(substr(t0.txt, CAST(i*100+1 AS INT), 120)) AS BIGINT) AS chunk_len,
               substr(t0.txt, CAST(i*100+1 AS INT), 120) AS chunk
        FROM (SELECT doc_id, coalesce(text, '') AS txt FROM documents) t0,
             LATERAL unnest(range(0,
             CAST(greatest(ceil(length(t0.txt)/100.0), 1) AS BIGINT))) AS t(i)
        ORDER BY doc_id, chunk_idx""")),

    // Boilerplate-line detection (the C4 pipeline's within-corpus line
    // dedup): lines appearing verbatim in many documents are template/
    // boilerplate, removed before training. The synthetic corpus has no
    // sentence punctuation, so the "line" unit is a 10-word tumbling
    // window over the word array (row-local generate+slice, the same
    // idiom as chunk_documents). One shuffle keyed by line text; at
    // corpus scale the line would hash to a 64-bit key first (the
    // text_fingerprint trick) so the exchange carries fixed-width keys,
    // not strings.
    "dedup_paragraphs" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .selectExpr("doc_id", s"${sparkWords("lower(text)")} AS ws")
        .withColumn("k",
          greatest(ceil(size(col("ws")) / lit(10.0)), lit(1.0)).cast("int"))
        .select(col("doc_id"), col("ws"),
          explode(sequence(lit(0), col("k") - 1)).as("i"))
        .selectExpr("doc_id",
          "array_join(slice(ws, i * 10 + 1, 10), ' ') AS line")
        .where(length(col("line")) > 20)
        .groupBy(col("line"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
        .where(col("n_docs") >= 3)
        .orderBy(col("n_docs").desc, col("line"))
        .limit(20),
      Some(s"""
        SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM (
          SELECT doc_id,
                 array_to_string(ws[i*10+1 : i*10+10], ' ') AS line
          FROM (SELECT doc_id, ${duckWords("lower(text)")} AS ws
                FROM documents),
               LATERAL unnest(range(0,
                 CAST(greatest(ceil(len(ws)/10.0), 1) AS BIGINT))) AS t(i))
        WHERE length(line) > 20
        GROUP BY line HAVING count(DISTINCT doc_id) >= 3
        ORDER BY n_docs DESC, line
        LIMIT 20""")),

    // Word-concentration (the Simpson/Rényi-2 numerator Σ c_w² over the
    // per-doc word counts): measures how skewed a document's word
    // distribution is — the type-token signal quality filters use that
    // distinct-count ratios miss (a doc repeating one word 50 times and
    // a doc cycling 10 words 5x each have the same distinct ratio but
    // very different concentration). Entirely row-local integer HOF
    // arithmetic (exact — the entropy variant would need cross-engine
    // transcendental log parity, which no engine pair guarantees);
    // -log2(conc_num/n²) IS the Rényi-2 entropy, derivable downstream.
    "text_word_concentration" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .selectExpr("doc_id", s"${sparkWords("lower(text)")} AS ws")
        .selectExpr("doc_id",
          "CAST(size(ws) AS BIGINT) AS n_words",
          """CAST(aggregate(
               transform(array_distinct(ws),
                 w -> CAST(size(filter(ws, x -> x = w)) AS BIGINT)),
               0L, (a, c) -> a + c * c) AS BIGINT) AS conc_num""")
        .orderBy(col("doc_id")),
      Some(s"""
        SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_words,
               -- c*c via an integer transform, NOT ** (DuckDB pow is
               -- DOUBLE — exactness would silently cap at 2^53); the
               -- CASE mirrors Spark's null propagation exactly: NULL ws
               -- -> NULL, empty ws -> 0 (list_sum([]) is NULL, Spark's
               -- aggregate seed makes it 0)
               CASE WHEN ws IS NULL THEN NULL
                    ELSE CAST(coalesce(list_sum(list_transform(
                      list_transform(list_distinct(ws),
                        w -> len(list_filter(ws, x -> x = w))),
                      c -> c * c)), 0) AS BIGINT) END AS conc_num
        FROM (SELECT doc_id, ${duckWords("lower(text)")} AS ws FROM documents) t
        ORDER BY doc_id""")),

    // Jensen-Shannon divergence of each source's unigram distribution
    // from the corpus distribution — the drift/contamination radar run
    // per-source (or per-crawl-snapshot) before mixing: symmetric,
    // bounded by ln 2, and zero only when the source looks exactly like
    // the corpus (quality_drift_psi is the binned two-sample variant;
    // this is the full-vocabulary information-theoretic one). The
    // decomposition keeps it scalable AND deterministic: only terms
    // PRESENT in the source carry a log term — the entire absent-vocab
    // q-side mass collapses to ln 2 * (1 - sum_present q) in closed
    // form — and the per-source double fold runs over a term-sorted
    // list (sequential association in both engines), so the only
    // cross-engine wiggle is the documented ln ulp. Scale shape: one
    // term-keyed aggregation per (source, term) with map-side combine,
    // global term counts broadcast, and the ordered fold runs per
    // source over its own vocabulary (at 100 TB: fixed-point integer
    // partial sums replace the sorted fold; the closed-form absent
    // mass is what makes "vs the whole corpus" affordable at all).
    "quality_js_divergence" -> QueryDef(
      (s, d) => {
        // the global counts, source totals and the grand total all
        // derive from the compact (source, term) counts, themselves
        // re-aggregated from the shared unigram root (r11)
        val st = docTermCounts(s, d)
          .groupBy(col("source"), col("term"))
          .agg(sum(col("tc")).as("c")).persistScoped()
        val stot = st.groupBy(col("source")).agg(sum(col("c")).as("stot"))
        val gt = st.groupBy(col("term")).agg(sum(col("c")).as("gc"))
        val tot = st.agg(sum(col("c")).as("t"))
        val contrib = st.join(stot, "source")
          .join(broadcast(gt), "term").crossJoin(broadcast(tot))
          .selectExpr("source", "term", s"$jsContrib AS contrib", s"$jsQ AS qv")
        contrib.groupBy(col("source"))
          .agg(count(lit(1)).as("n_terms"),
            sort_array(collect_list(struct(col("term"), col("contrib"), col("qv"))))
              .as("arr"))
          .selectExpr("source", "n_terms",
            s"""${Q.scaledLong(
              """0.5 * aggregate(arr, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.contrib)
                 + 0.5 * ln(2.0) * (1.0 - aggregate(arr, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.qv))""",
              6)} AS js_e6""")
          .orderBy(col("source"))
      },
      Some(s"""
        WITH terms AS (
          SELECT source, unnest(${duckWords("lower(text)")}) AS term FROM documents),
        st AS (
          SELECT source, term, CAST(count(*) AS BIGINT) AS c
          FROM terms GROUP BY source, term),
        stot AS (SELECT source, CAST(sum(c) AS BIGINT) AS stot FROM st GROUP BY source),
        gt AS (SELECT term, CAST(sum(c) AS BIGINT) AS gc FROM st GROUP BY term),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM st),
        contrib AS (
          SELECT st.source, st.term, $jsContrib AS contrib, $jsQ AS qv
          FROM st JOIN stot USING (source) JOIN gt USING (term) CROSS JOIN tot),
        folds AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(contrib ORDER BY term)), (acc, x) -> acc + x) AS csum,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(qv ORDER BY term)), (acc, x) -> acc + x) AS qsum
          FROM contrib GROUP BY source)
        SELECT source, n_terms,
               ${Q.scaledLong("0.5 * csum + 0.5 * ln(2.0) * (1.0 - qsum)", 6)} AS js_e6
        FROM folds ORDER BY source""")),

    // Flesch reading-ease per document — the classic readability score a
    // curation pipeline uses alongside stopword/punctuation quality
    // gates (easy text and degenerate text both score extreme): counts
    // of words, sentence-final punctuation, and vowel-group syllables
    // are exact integers from row-local regex folds, and the Flesch
    // formula 206.835 - 1.015*(W/S) - 84.6*(Syl/W) is rational — no
    // transcendental anywhere, so the e2-scaled score is bit-identical.
    // Scale shape: a pure narrow map over the document scan plus the
    // presentation sort; nothing shuffles.
    "text_readability" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .selectExpr("doc_id", "text", s"${sparkWords("lower(text)")} AS ws")
        .where("size(ws) > 0")
        .selectExpr("doc_id",
          "CAST(size(ws) AS BIGINT) AS n_words",
          // sentence terminators; a fragment with none counts as one sentence
          "greatest(CAST(1 AS BIGINT), CAST(length(regexp_replace(text, '[^.!?]', '')) AS BIGINT)) AS n_sents",
          // vowel groups approximate syllables; every word has at least one
          "CAST(aggregate(transform(ws, w -> greatest(1, size(regexp_extract_all(w, '[aeiouy]+', 0)))), 0, (a, x) -> a + x) AS BIGINT) AS n_syll")
        .selectExpr("doc_id", "n_words", "n_sents", "n_syll",
          s"${Q.scaledLong(fleschExpr, 2)} AS flesch_e2")
        .orderBy(col("doc_id")),
      Some(s"""
        WITH w AS (
          SELECT doc_id, text, ${duckWords("lower(text)")} AS ws FROM documents),
        c AS (
          SELECT doc_id,
                 CAST(len(ws) AS BIGINT) AS n_words,
                 greatest(CAST(1 AS BIGINT), CAST(length(regexp_replace(text, '[^.!?]', '', 'g')) AS BIGINT)) AS n_sents,
                 CAST(list_reduce(list_prepend(0, list_transform(ws,
                   w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))),
                   (a, x) -> a + x) AS BIGINT) AS n_syll
          FROM w WHERE len(ws) > 0)
        SELECT doc_id, n_words, n_sents, n_syll,
               ${Q.scaledLong(fleschExpr, 2)} AS flesch_e2
        FROM c ORDER BY doc_id"""))
  )

  /** JS-divergence per-term pieces over the (c, stot, gc, t) counts:
    * p = c/stot (source prob), q = gc/t (corpus prob), m = (p+q)/2;
    * contrib = p*ln(p/m) + q*ln(q/m). All inputs >= 1 so every log
    * argument is strictly positive.
    */
  /** Flesch reading ease over the exact (n_words, n_sents, n_syll) counts
    * — rational, so bit-identical across engines.
    */
  private val fleschExpr =
    "206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE)) " +
      "- 84.6 * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE))"

  private val jsP = "(CAST(c AS DOUBLE) / CAST(stot AS DOUBLE))"
  private val jsQ = "(CAST(gc AS DOUBLE) / CAST(t AS DOUBLE))"
  private val jsContrib =
    s"($jsP * ln($jsP / (0.5 * ($jsP + $jsQ))) + $jsQ * ln($jsQ / (0.5 * ($jsP + $jsQ))))"
}
