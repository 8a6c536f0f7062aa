package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface demo (the one custom aggregator reserved in
  * SURVEY.md §2.11/§4.2): running centroid of float vectors. Buffer is
  * (per-dimension double sums, count); merge is element-wise — the
  * standard two-phase (partial + final) aggregation shape, so Spark
  * executes it with map-side combine and a single shuffle of small
  * buffers regardless of input size.
  */
object CentroidAggregator extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    while (i < v.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0L) Array.empty[Double] else r._1.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(Encoders.javaSerialization[Array[Double]], Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoderHelper.doubleArray
}

private[functions] object ExpressionEncoderHelper {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val doubleArray: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}
