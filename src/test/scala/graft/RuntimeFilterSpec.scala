package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter injection — the 100 TB lever where a selective
  * dimension filter is turned into a bloom filter applied on the fact side
  * BEFORE its shuffle, cutting shuffled bytes by the dim filter's
  * selectivity. Local thresholds are lowered to trigger the optimizer rule
  * on test-scale data; on a cluster the defaults (10 MB creation side)
  * apply. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter on the fact side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join: bloom filters only help when the fact side
      // would otherwise be shuffled in full
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = graft.sources.Tables.table(spark, sf001, "lineitem")
        .select("l_orderkey", "l_extendedprice")
      val dim = graft.sources.Tables.table(spark, sf001, "orders")
        .filter(col("o_totalprice") > 400000) // selective
        .select("o_orderkey")
      val joined = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$plan")
      assert(joined.count() > 0)
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }
}
