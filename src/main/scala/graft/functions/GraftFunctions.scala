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
  }
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
