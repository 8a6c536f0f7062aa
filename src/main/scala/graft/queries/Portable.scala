package graft.queries

/** Deterministic text/hash arithmetic expressible identically in Spark SQL
  * and DuckDB SQL, so dedup / fingerprint / LSH queries can be verified
  * value-for-value against the DuckDB oracle. Everything is integer
  * arithmetic mod a 31-bit-safe prime: intermediate products stay under
  * 2^62, so no overflow under Spark ANSI mode and no HUGEINT promotion
  * surprises in DuckDB.
  *
  * Spark-side fragments are Spark SQL (used via expr/selectExpr): they use
  * sequence/transform/aggregate/element_at. DuckDB fragments use
  * range/list_transform/list_reduce/1-based indexing. Fold order is
  * left-to-right in both (`aggregate` with explicit zero vs `list_reduce`
  * over a zero-prepended list), so double folds are bit-identical too.
  */
object Portable {
  /** Modulus for all polynomial hashes. */
  val P = 1000000007L

  /** MinHash family size and LSH banding (4 bands x 4 rows). */
  val MinHashK = 16
  val Bands = 4
  val RowsPerBand = 4

  /** Deterministic MinHash coefficients, nonzero mod P. */
  val minHashA: Seq[Long] = (0 until MinHashK).map(i => (1234567L * (2 * i + 1)) % P)
  val minHashB: Seq[Long] = (0 until MinHashK).map(i => (7654321L * (i + 1) + 12345L) % P)

  /** SimHash ANCHOR width in bits — the bench-corpus configuration;
    * the declared pairs query widens it on the Dedup.simhashBits
    * doc-count ladder (r15). The codegen signature expression always
    * computes the full [[SimHashMaxBits]] and consumers mask to the
    * ladder width, so the anchor output is bit-identical by
    * construction.
    */
  val SimHashBits = 32

  /** Ladder ceiling: the shingle hashes feeding the per-bit majority
    * are 64-bit, but the signature stays a POSITIVE BIGINT on both
    * engines (bit 63 is the sign bit; DuckDB has no unsigned shift), so
    * the ladder tops out at 60 bits — still 15-bit chunks / 32k-bucket
    * pigeonhole space, reached only past ~640M documents per partition
    * of the dial's COUNT.
    */
  val SimHashMaxBits = 60

  /** Count-Min sketch geometry: depth hash rows (reusing the MinHash
    * coefficient family) x width counters per row. Width is deliberately
    * small relative to the test vocabulary so bucket collisions — and
    * therefore the sketch's one-sided overestimate — are visible in the
    * oracle-checked output.
    */
  val CmDepth = 3
  val CmWidth = 16

  // ---- Z-order (Morton) interleave -------------------------------------

  /** Bits per dimension interleaved into the z-value. */
  val ZBits = 16

  /** Morton/Z-order value of two non-negative keys (low ZBits bits each),
    * as pure integer bit arithmetic — identical in both engines, so the
    * layout key used for multi-dimensional file clustering is itself
    * oracle-checkable. Spark uses shiftright/shiftleft functions, DuckDB
    * the >> << operators.
    */
  def sparkZ(a: String, b: String): String =
    (0 until ZBits).map(i =>
      s"(shiftleft(shiftright($a, $i) & 1, ${2 * i}) + shiftleft(shiftright($b, $i) & 1, ${2 * i + 1}))")
      .mkString("CAST(", " + ", " AS BIGINT)")

  def duckZ(a: String, b: String): String =
    (0 until ZBits).map(i =>
      s"(((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1}))")
      .mkString("CAST(", " + ", " AS BIGINT)")

  // ---- character-level polynomial hash ---------------------------------
  def sparkChars(e: String): String =
    s"transform(sequence(1, length($e)), i -> CAST(ascii(substr($e, i, 1)) AS BIGINT))"
  def duckChars(e: String): String =
    s"list_transform(range(1, length($e)+1), i -> CAST(ascii(substr($e, i, 1)) AS BIGINT))"

  def sparkFoldHash(list: String): String =
    s"aggregate($list, CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % $P)"
  def duckFoldHash(list: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $list), (acc, x) -> (acc * 31 + x) % $P)"

  /** Polynomial rolling hash of a whole string, mod P. The Spark side
    * uses the native codegen expression (graft.functions.PolyHash) — a
    * bit-identical twin of the HOF fold kept in sparkStrHashHof below;
    * the DuckDB oracle keeps the list_reduce form.
    */
  def sparkStrHash(e: String): String = s"graft_strhash($e)"
  def sparkStrHashHof(e: String): String = sparkFoldHash(sparkChars(e))
  def duckStrHash(e: String): String = duckFoldHash(duckChars(e))

  // ---- tokenization ----------------------------------------------------
  /** Whitespace words with empties dropped (double spaces are real in the
    * corpus).
    */
  def sparkWords(e: String): String = s"filter(split($e, ' '), w -> w <> '')"
  def duckWords(e: String): String = s"list_filter(string_split($e, ' '), w -> w <> '')"

  /** Word 3-gram shingles from a words column named ws (guard size >= 3 at
    * the row level before using).
    */
  val sparkShingles: String =
    "transform(sequence(1, size(ws) - 2), i -> concat_ws(' ', element_at(ws, i), element_at(ws, i+1), element_at(ws, i+2)))"
  val duckShingles: String =
    "list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])"

  // ---- embeddings ------------------------------------------------------
  /** Fixed testdata embedding dimensionality. */
  val Dim = 64

  /** Left-to-right double fold of element-wise products of two vector
    * columns; bit-identical across engines. Inputs are float lists; cast
    * each element to double before multiplying. Spark side is the native
    * codegen expression (graft.functions.FloatDot); the HOF twin below
    * documents the identical fold.
    */
  def sparkDot(a: String, b: String): String = s"graft_dot($a, $b)"
  def sparkDotHof(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
  def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, $Dim + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, v) -> acc + v)"
}
