package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregation by (dist, id) — the per-group accumulator a
  * streaming ANN serving aggregation needs to stay scale-honest: the
  * buffer holds AT MOST k candidate pairs no matter how many rows flow
  * through the group, where `collect_list` + sort + slice would buffer
  * the whole probed cell per query (n·nprobe/k rows of state at corpus
  * scale). Merged associatively like any partial+final aggregate, so the
  * map side already reduces each task to ≤ k pairs per query.
  *
  * Ordering is (dist asc, id asc) — the family's deterministic tie-break
  * — and the output is the two parallel arrays (ids, dists) in rank
  * order, the hashable form (a struct array would not norm through the
  * driver's compare). */
object TopKAgg {
  final case class Cand(dist: Long, id: Long)
  final case class Buf(items: Seq[Cand]) // sorted by (dist, id), size <= k
  final case class TopK(neighbor_ids: Seq[Long], dists: Seq[Long])

  class TopKByDist(k: Int) extends Aggregator[Cand, Buf, TopK] {
    private def bound(s: Seq[Cand]): Seq[Cand] =
      s.sortBy(c => (c.dist, c.id)).take(k)
    override def zero: Buf = Buf(Vector.empty)
    override def reduce(b: Buf, c: Cand): Buf = {
      // cheap reject keeps a full buffer allocation-free for the common
      // candidate that cannot displace anything
      if (b.items.size == k) {
        val l = b.items.last
        if (c.dist > l.dist || (c.dist == l.dist && c.id >= l.id)) return b
      }
      Buf(bound(b.items :+ c))
    }
    override def merge(a: Buf, b: Buf): Buf = Buf(bound(a.items ++ b.items))
    override def finish(b: Buf): TopK =
      TopK(b.items.map(_.id), b.items.map(_.dist))
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[TopK] = Encoders.product[TopK]
  }
}
