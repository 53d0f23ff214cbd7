package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Distinct-union cardinality over string-array inputs — the bounded
  * accumulator a streaming screen needs for an exact COUNT(DISTINCT ...)
  * that Structured Streaming forbids as a builtin aggregate: the buffer
  * holds the distinct VALUES seen so far (kept sorted, so partial states
  * are canonical and merge order can't matter), bounded by the value
  * DOMAIN — for st15's leaking sources that is the corpus's source
  * inventory (single digits), never the stream. The TopKAgg precedent
  * one slot over: per-group state is what the semantics require, not
  * what flowed through the group. Null/absent inputs contribute nothing,
  * so a union of evidence kinds can route through one aggregation with
  * `when(kind === 'leak', srcs)`. */
object SetUnionAgg {
  final case class Buf(vals: Seq[String]) // sorted distinct

  class DistinctCount extends Aggregator[Seq[String], Buf, Long] {
    private def norm(s: Seq[String]): Seq[String] = s.distinct.sorted
    override def zero: Buf = Buf(Vector.empty)
    override def reduce(b: Buf, in: Seq[String]): Buf =
      if (in == null || in.isEmpty) b
      // subset fast path keeps the common repeated-source row allocation-light
      else if (in.forall(b.vals.contains)) b
      else Buf(norm(b.vals ++ in))
    override def merge(a: Buf, b: Buf): Buf = Buf(norm(a.vals ++ b.vals))
    override def finish(b: Buf): Long = b.vals.size.toLong
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
