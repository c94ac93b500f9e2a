package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Distributed dense-vector elementwise sum — the faithful Spark-native
  * replacement for the reference's `AccumulatorParam<MatrixRow>`
  * (MatrixRowAccumulatorParam.java:12-39: zero = 0-vector, add/merge =
  * elementwise +). Unlike the reference's accumulator-updated-inside-a-
  * transformation (SVDMovieLensSparkJava.java:297,310,316 — not
  * exactly-once under task retry, a documented Spark hazard), an
  * `Aggregator` participates in the query plan and aggregates exactly
  * once with map-side partial merges.
  */
object VectorSumAggregator extends Aggregator[Array[Double], Array[Double], Array[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  private def add(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b.clone()
    else if (b.isEmpty) a
    else {
      require(a.length == b.length, s"vector length mismatch: ${a.length} vs ${b.length}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def reduce(buf: Array[Double], row: Array[Double]): Array[Double] = add(buf, row)
  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = add(b1, b2)
  override def finish(buf: Array[Double]): Array[Double] = buf

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
