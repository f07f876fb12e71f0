package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** X3: custom loss aggregations as typed `Aggregator`s — the Spark
  * analog of the reference's custom Keras losses
  * (weather4cast/models.py:282-301). The plain-expression forms in
  * AggQueries (a6_mse_family) are preferred in queries (codegen,
  * oracle-checkable); these exist for callers that need a reusable
  * typed UDAF surface, and a test asserts both forms agree.
  */
object Udafs {

  /** (prediction, truth, weight) -> weighted MSE. */
  val weightedMse: Aggregator[(Double, Double, Double), (Double, Double), Double] =
    new Aggregator[(Double, Double, Double), (Double, Double), Double] {
      def zero: (Double, Double) = (0.0, 0.0)
      def reduce(b: (Double, Double), a: (Double, Double, Double)): (Double, Double) = {
        val d = a._1 - a._2
        (b._1 + a._3 * d * d, b._2 + a._3)
      }
      def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
        (x._1 + y._1, x._2 + y._2)
      def finish(r: (Double, Double)): Double = if (r._2 == 0) 0.0 else r._1 / r._2
      def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Rounded-MSE (models.py:283-285): errors measured after integer
    * rounding of both sides. */
  val roundedMse: Aggregator[(Double, Double), (Double, Long), Double] =
    new Aggregator[(Double, Double), (Double, Long), Double] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(b: (Double, Long), a: (Double, Double)): (Double, Long) = {
        val d = math.round(a._1).toDouble - math.round(a._2).toDouble
        (b._1 + d * d, b._2 + 1)
      }
      def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
        (x._1 + y._1, x._2 + y._2)
      def finish(r: (Double, Long)): Double = if (r._2 == 0) 0.0 else r._1 / r._2
      def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
