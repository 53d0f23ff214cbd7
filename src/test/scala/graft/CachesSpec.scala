package graft

import org.apache.spark.storage.StorageLevel

/** Builder-owned caches (dd06's postings, ss05's assignment, dd05's final
  * labels) must outlive their builder — the action runs on the returned
  * plan — so release is the session's job via [[Caches.releaseAll]].
  * This suite is the leak gate: every declared query that registers a
  * cache must drop to StorageLevel.NONE after release. (Verify and Bench
  * get the same hygiene process-wide via `spark.catalog.clearCache()`
  * between queries.) */
class CachesSpec extends SparkSpec {

  test("builder-registered caches release to StorageLevel.NONE after the action") {
    for (q <- Seq("ss05_ivf_ann")) {
      Caches.releaseAll() // drop registrations left by other suites' builders
      assert(SparkEntry.queries(q)(spark, sf001).count() >= 0)
      val released = Caches.releaseAll()
      assert(released.nonEmpty, s"$q registered no builder cache")
      released.foreach { df =>
        assert(df.storageLevel == StorageLevel.NONE, s"$q left a cached frame behind")
      }
      assert(Caches.pending == 0)
    }
  }

  test("dd06 registers no builder cache (round-7: ReusedExchange replaces it)") {
    Caches.releaseAll()
    assert(SparkEntry.queries("dd06_capped_jaccard")(spark, sf001).count() >= 0)
    assert(Caches.releaseAll().isEmpty,
      "dd06 should lean on exchange reuse, not a postings cache")
  }

  test("dd05 registers no builder cache (round-8: checkpointed rounds replace it)") {
    // the CC loop's per-round labels are localCheckpoint'd (lineage
    // truncation — see propagateMinLabels); superseded checkpoint RDDs
    // are the ContextCleaner's to release, not the session's, and the
    // in-loop edge caches are unpersisted by the builder itself
    Caches.releaseAll()
    assert(SparkEntry.queries("dd05_dup_clusters")(spark, sf001).count() >= 0)
    assert(Caches.releaseAll().isEmpty,
      "dd05 should checkpoint rounds, not register session-owned caches")
  }
}
