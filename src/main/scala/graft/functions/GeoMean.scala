package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Geometric mean as a typed `Aggregator` UDAF — the §2.9 custom-
  * aggregate path: log-domain partial sums merge associatively, so the
  * map-side combine / final-merge contract holds on any partitioning
  * (the property that makes a UDAF safe at 100 TB). Registered for SQL
  * via spark.udf.register (see SqlQueries.q97). */
final case class GeoMeanBuf(var logSum: Double, var n: Long)

object GeoMean extends Aggregator[java.lang.Double, GeoMeanBuf, Double] {
  override def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)
  // Boxed input so SQL NULLs arrive as null (the primitive encoder
  // would coerce them to 0.0); NULL and non-positive values are skipped
  // like built-in aggregates ignore NULL — log of them would silently
  // poison the whole group to -Inf/NaN.
  override def reduce(b: GeoMeanBuf, x: java.lang.Double): GeoMeanBuf = {
    if (x != null && x > 0.0) { b.logSum += math.log(x); b.n += 1 }
    b
  }
  override def merge(a: GeoMeanBuf, b: GeoMeanBuf): GeoMeanBuf = {
    a.logSum += b.logSum; a.n += b.n; a
  }
  override def finish(b: GeoMeanBuf): Double =
    if (b.n == 0) Double.NaN else math.exp(b.logSum / b.n)
  override def bufferEncoder: Encoder[GeoMeanBuf] = Encoders.product[GeoMeanBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
