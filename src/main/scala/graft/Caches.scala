package graft

import org.apache.spark.sql.DataFrame

/** Ownership registry for `.cache()` calls made inside query builders.
  *
  * Some builders cache a frame their own plan reuses (dd06's capped
  * postings, ss05's cell assignment). The cache must outlive the builder —
  * the action runs on the returned plan — so the builder cannot unpersist
  * it. In the driver mains this is handled process-wide
  * (`spark.catalog.clearCache()` between queries in Verify/Bench); a
  * LONG-LIVED session embedding this library should call [[releaseAll]]
  * after consuming each such query's result, or the cached frames
  * accumulate in executor storage memory for the life of the session.
  * Sibling housekeeping for long-lived sessions — all keyed by corpus dir
  * with the same immutable-snapshot staleness contract (call after
  * appending to a dir; never needed for per-SF snapshot dirs):
  * [[graft.operators.Similarity.refreshCorpusCounts]] (ss08's plane-sizing
  * count), [[graft.operators.Similarity.refreshCodebooks]] (ss06/ss07's
  * trained PQ codebook), [[graft.operators.Similarity.refreshIvfCentroids]]
  * (ss05's coarse quantizer),
  * [[graft.operators.TextAnalysis.refreshBigramVocabs]] (tx15/tx16's
  * subword vocab),
  * [[graft.operators.Dedup.refreshBloomSketches]] (dd08's existing-corpus
  * Bloom — on a GROWING corpus this one is correctness-relevant, see its
  * staleness note), and
  * [[graft.operators.Layout.resetRefusedCounters]] (the refusal-metric
  * registry, which otherwise grows by one Observation per capped-builder
  * invocation).
  */
object Caches {
  private val registry = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Cache `df` and register it for later release. Returns the cached df. */
  def track(df: DataFrame): DataFrame = register(df.cache())

  /** Register an already-cached df for later release (e.g. the surviving
    * frame of an iterative loop that caches and unpersists per round). */
  def register(df: DataFrame): DataFrame = {
    registry.add(df)
    df
  }

  /** Unpersist every builder-cached frame registered since the last call;
    * returns the released frames (so a caller/test can audit that their
    * storage level actually dropped to NONE). */
  def releaseAll(): Seq[DataFrame] = {
    val released = Seq.newBuilder[DataFrame]
    var df = registry.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      released += df
      df = registry.poll()
    }
    released.result()
  }

  /** Number of currently-registered (not yet released) cached frames. */
  def pending: Int = registry.size()
}
