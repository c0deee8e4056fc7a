package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Geometric mean as a typed `Aggregator` UDAF — the §2.9 custom-
  * aggregate path: log-domain partial sums merge associatively, so the
  * map-side combine / final-merge contract holds on any partitioning
  * (the property that makes a UDAF safe at 100 TB). Registered for SQL
  * via spark.udf.register (see SqlQueries.q97). */
final case class GeoMeanBuf(var logSum: Double, var n: Long)

object GeoMean extends Aggregator[Double, GeoMeanBuf, Double] {
  type Buf = GeoMeanBuf
  private def Buf(l: Double, n: Long) = GeoMeanBuf(l, n)

  override def zero: Buf = Buf(0.0, 0L)
  override def reduce(b: Buf, x: Double): Buf = {
    b.logSum += math.log(x); b.n += 1; b
  }
  override def merge(a: Buf, b: Buf): Buf = {
    a.logSum += b.logSum; a.n += b.n; a
  }
  override def finish(b: Buf): Double =
    if (b.n == 0) Double.NaN else math.exp(b.logSum / b.n)
  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
