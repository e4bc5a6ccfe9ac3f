package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Running sums for [[CentroidAgg]]. */
final case class CentroidBuf(sx: Double, sy: Double, n: Long)

/** `centroid_agg([lon, lat])` — typed UDAF (`Aggregator[IN, BUF, OUT]`)
  * computing the arithmetic-mean centroid of point ROWS. The row-wise
  * aggregation analog of the per-row scalar G3 (`Geo.polygonCentroid`,
  * reference task.ts:364-372 mean fallback): the reference has no
  * row-group aggregation at all (SURVEY §2.8), so this is the engine's
  * UDAF surface demonstrator. Merge is associative/commutative —
  * partial aggregation (map-side combine) applies, one shuffle of
  * 24-byte buffers regardless of group size.
  */
object CentroidAgg extends Aggregator[Array[Double], CentroidBuf, Array[Double]] {

  override def zero: CentroidBuf = CentroidBuf(0.0, 0.0, 0L)

  override def reduce(b: CentroidBuf, p: Array[Double]): CentroidBuf =
    if (p == null || p.length < 2) b
    else CentroidBuf(b.sx + p(0), b.sy + p(1), b.n + 1)

  override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf =
    CentroidBuf(a.sx + b.sx, a.sy + b.sy, a.n + b.n)

  override def finish(b: CentroidBuf): Array[Double] =
    if (b.n == 0) Array(0.0, 0.0) else Array(b.sx / b.n, b.sy / b.n)

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
