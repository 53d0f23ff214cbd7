package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Attribution harness for dd05's r7→r8 +0.5 s at sf0.1 (round-8 verdict
  * ask #4; not driver contract). The r8 localCheckpoint swap fixed the
  * exponential-plan OOM and WON at sf1.0 (10.6→8.0 s), but cost ~0.5 s
  * at sf0.1 — this separates the candidate causes by running the SAME
  * dd05 pipeline (real `jaccardClusterEdges` input) under loop variants:
  *
  *  A  shipped form: EAGER seed localCheckpoint + per-round localCheckpoint
  *  B  lazy cached seed + per-round localCheckpoint (is the seed's extra
  *     eager job the cost?)
  *  C  r7 form: cached seed + per-round cache+count+unpersist (the
  *     OOM-prone baseline — safe here, sf0.1 converges in a few rounds)
  *  D  hybrid: checkpoint every 2nd round, cache+count between (bounded
  *     2-round plan growth, half the checkpoints)
  *
  * REPS round-robin with cache clearing, read the MIN (the bench's own
  * discipline; see the r6 warm-up lesson).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 REPS=4 runMain graft.ProfileDd05
  */
object ProfileDd05 {

  private def seedLabels(undirected: DataFrame): DataFrame = undirected
    .groupBy(col("id_a").as("doc_id"))
    .agg(min(col("id_b")).as("nbr_min"))
    .select(col("doc_id"), least(col("doc_id"), col("nbr_min")).as("cluster_id"))

  private def round(undirected: DataFrame, labels: DataFrame,
      obs: org.apache.spark.sql.Observation): DataFrame = {
    val neighborMin = undirected
      .join(labels.withColumnRenamed("doc_id", "id_b"), "id_b")
      .groupBy(col("id_a").as("doc_id"))
      .agg(min("cluster_id").as("nbr_min"))
    labels.join(neighborMin, Seq("doc_id"), "left")
      .select(col("doc_id"), col("cluster_id").as("prev"),
        least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"))
      .observe(obs, coalesce(sum(when(col("cluster_id") =!= col("prev"), 1L)), lit(0L)).as("moved"))
  }

  /** One full dd05 under a per-round materialization strategy:
    * mode 'A' seed-ckpt/round-ckpt, 'B' seed-cache/round-ckpt,
    * 'C' seed-cache/round-cache+count, 'D' ckpt every 2nd round. */
  private def variant(spark: org.apache.spark.sql.SparkSession, dir: String,
      mode: Char): Long = {
    val edges = Dedup.jaccardClusterEdges(spark, dir)
      .filter(col("id_a") =!= col("id_b")).cache()
    val undirected = edges.unionByName(
      edges.select(col("id_b").as("id_a"), col("id_a").as("id_b"))).cache()
    var labels =
      if (mode == 'A') seedLabels(undirected).localCheckpoint()
      else seedLabels(undirected).cache()
    var toRelease: Option[DataFrame] = if (mode == 'A') None else Some(labels)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 64) {
      val obs = org.apache.spark.sql.Observation()
      val stepped = round(undirected, labels, obs)
      val ckpt = mode match {
        case 'A' | 'B' => true
        case 'C' => false
        case 'D' => iter % 2 == 1
      }
      val next =
        if (ckpt) stepped.localCheckpoint()
        else { val c = stepped.cache(); c.count(); c }
      changed = obs.get("moved").asInstanceOf[Long]
      if (ckpt) { toRelease.foreach(_.unpersist()); toRelease = None }
      else { toRelease.foreach(_.unpersist()); toRelease = Some(next) }
      labels = next.select("doc_id", "cluster_id")
      iter += 1
    }
    val n = labels.orderBy("doc_id").count()
    toRelease.foreach(_.unpersist())
    undirected.unpersist(); edges.unpersist()
    n
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("REPS", "4").toInt
    val spark = Sessions.build("graft-profile-dd05")
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    val modes = Seq('A', 'B', 'C', 'D')
    val times = scala.collection.mutable.Map.empty[Char, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; m <- modes) {
      spark.catalog.clearCache(); Caches.releaseAll()
      val t0 = System.nanoTime()
      val n = variant(spark, sfDir, m)
      times(m) = times(m) :+ (System.nanoTime() - t0) / 1e9
      require(n > 0)
    }
    // edge stage alone, same discipline, for the fixed-cost floor
    val edgeTimes = (1 to reps).map { _ =>
      spark.catalog.clearCache(); Caches.releaseAll()
      val t0 = System.nanoTime()
      Dedup.jaccardClusterEdges(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    modes.foreach { m =>
      println(f"PROF dd05[$m] ${times(m).map(t => f"$t%.2f").mkString(" ")}  min ${times(m).min}%.2f")
    }
    println(f"PROF edges   ${edgeTimes.map(t => f"$t%.2f").mkString(" ")}  min ${edgeTimes.min}%.2f")
    spark.stop()
  }
}
