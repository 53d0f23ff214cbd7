package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one entry per implemented operator from SURVEY.md §2, each a
  * function (spark, sfDir) => DataFrame over the harness testdata tables.
  * `oracleSql`: equivalent ANSI SQL runnable by DuckDB on the same parquet
  * tables; omitted for ops DuckDB can't express (rows-only check + ScalaTest).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.Relational.queries, operators.Relational.oracle),
      (operators.EtlQueries.queries, operators.EtlQueries.oracle),
      (operators.EtlPipelineQuery.queries, operators.EtlPipelineQuery.oracle),
      (operators.TextAnalysis.queries, operators.TextAnalysis.oracle),
      (operators.Dedup.queries, operators.Dedup.oracle),
      (operators.Similarity.queries, operators.Similarity.oracle),
      (operators.AsOfJoin.queries, operators.AsOfJoin.oracle),
      (streaming.EventWindows.queries, streaming.EventWindows.oracle),
      (multimodal.Multimodal.queries, multimodal.Multimodal.oracle))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** Assembled oracle SQL, passed through [[OracleSql.materializeReusedCtes]]
    * so no multiply-referenced CTE ships un-MATERIALIZED (DuckDB's CTE
    * inlining re-executes per reference — the failure that emptied
    * CORRECTNESS_r13 via ss16's chain oracle).
    */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _).map { case (k, v) =>
      k -> OracleSql.materializeReusedCtes(v)
    }
}
