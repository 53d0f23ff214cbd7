package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2 Part B, UDF/UDAF row): element-wise
  * mean of fixed-dimension vectors via `Aggregator[IN, BUF, OUT]` — the
  * buffer is (sum-per-dimension, count), merged associatively, so it runs
  * as a partial+final aggregate like any built-in. Used for embedding
  * centroids (e.g. per-label class centers for ANN routing). */
object VectorAgg {

  final case class MeanBuf(sums: Array[Double], n: Long)
  final case class Vec(values: Seq[Double])

  class VectorMean(dims: Int) extends Aggregator[Seq[Double], MeanBuf, Vec] {
    override def zero: MeanBuf = MeanBuf(new Array[Double](dims), 0L)
    override def reduce(b: MeanBuf, v: Seq[Double]): MeanBuf = {
      var i = 0
      while (i < dims && i < v.length) { b.sums(i) += v(i); i += 1 }
      MeanBuf(b.sums, b.n + 1)
    }
    override def merge(a: MeanBuf, b: MeanBuf): MeanBuf = {
      var i = 0
      while (i < dims) { a.sums(i) += b.sums(i); i += 1 }
      MeanBuf(a.sums, a.n + b.n)
    }
    override def finish(b: MeanBuf): Vec =
      if (b.n == 0) Vec(Seq.empty) else Vec(b.sums.map(_ / b.n).toSeq)
    override def bufferEncoder: Encoder[MeanBuf] = Encoders.product[MeanBuf]
    override def outputEncoder: Encoder[Vec] = Encoders.product[Vec]
  }
}
