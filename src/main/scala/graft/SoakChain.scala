package graft

import scala.util.control.NonFatal

import graft.operators.Dedup

/** dd05-vs-dd09 soak on the long-CHAIN corpus (diagnostic main, not
  * driver contract; round-8 verdict ask #5). `tools/gen_soak.py` builds
  * soak/chain: a 20k-doc corpus whose dup graph is 10 disjoint paths of
  * diameter 250 — the corpus shape dd09 exists for. Expected here:
  *
  *  - dd05 (one-hop min-label propagation) moves a component's min one
  *    hop per round, so diameter 250 needs ~250 rounds and its
  *    maxIter-64 `require` MUST fire (loudly — never half-propagated
  *    labels);
  *  - dd09 (large-star/small-star contraction) roughly halves component
  *    height per round and must converge in ~⌈log₂ 250⌉ + c rounds.
  *
  * Run: runMain graft.SoakChain [dir=soak/chain]
  */
object SoakChain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("soak/chain")
    val spark = Sessions.build("graft-soak-chain")
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // Edge generation is shared by both forms; time it once, checkpoint
    // so each CC variant is timed on ITS stage only (edges already
    // materialized, exactly how the soak wants to attribute cost).
    val (edges, tEdges) = timed {
      Dedup.jaccardClusterEdges(spark, dir).localCheckpoint()
    }
    val nEdges = edges.count()
    println(f"CHAIN edges $nEdges%d wall ${tEdges}%.2f s")

    val (dd05Outcome, t05) = timed {
      try {
        val n = Dedup.propagateMinLabels(edges).count()
        s"CONVERGED ($n labels) - UNEXPECTED on diameter 250"
      } catch {
        case e: IllegalStateException =>
          s"REFUSED after ${Dedup.lastCcRounds.get} rounds: ${e.getMessage}"
      } finally graft.Caches.releaseAll()
    }
    println(f"CHAIN dd05 $dd05Outcome wall ${t05}%.2f s")

    val (n09, t09) = timed(Dedup.propagateMinLabelsLogN(edges).count())
    val r09 = Dedup.lastCcRounds.get
    println(f"CHAIN dd09 CONVERGED ($n09%d labels) rounds $r09%d wall ${t09}%.2f s")

    // sanity: 10 chains x 251 docs, labels = per-chain min
    val labels = Dedup.propagateMinLabelsLogN(edges)
    val byCluster = labels.groupBy("cluster_id").count().collect()
    println(s"CHAIN dd09 clusters ${byCluster.length} " +
      s"sizes ${byCluster.map(_.getLong(1)).sorted.mkString(",")}")

    try spark.stop() catch { case NonFatal(_) => () }
  }
}
