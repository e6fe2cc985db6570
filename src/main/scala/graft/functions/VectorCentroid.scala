package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mutable aggregation buffer: per-dimension sums + row count. */
final case class CentroidBuf(var sums: Array[Double], var n: Long)

/** Typed Aggregator computing the elementwise mean of an
  * `Array[Float]` embedding column — the centroid primitive for IVF
  * coarse quantizer training and per-label cluster summaries.
  *
  * Runs as a proper two-phase aggregate (partial `reduce` map-side,
  * `merge` after the shuffle) so 100 TB of vectors reduce to
  * O(groups × dim) shuffled bytes.
  */
class VectorCentroid(dim: Int) extends Aggregator[Array[Float], CentroidBuf, Array[Double]] {

  override def zero: CentroidBuf = CentroidBuf(new Array[Double](dim), 0L)

  override def reduce(b: CentroidBuf, a: Array[Float]): CentroidBuf = {
    if (a != null && a.length == dim) {
      var i = 0
      while (i < dim) { b.sums(i) += a(i); i += 1 }
      b.n += 1
    }
    b
  }

  override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
    var i = 0
    while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
    x.n += y.n
    x
  }

  override def finish(b: CentroidBuf): Array[Double] =
    if (b.n == 0) new Array[Double](dim)
    else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object VectorCentroid {
  /** Column form: `centroid(dim)($"embedding")`. */
  def centroid(dim: Int): Column => Column = {
    val fn = udaf(new VectorCentroid(dim), org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    c => fn(c)
  }
}
