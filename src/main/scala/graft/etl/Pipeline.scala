package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.EtlFunctions

/** The end-to-end unification pipeline: extract → transform → merge →
  * final-cast → load (reference `src/etl/datapipeline.py:60-189`), rebuilt
  * as ONE lazy DataFrame lineage so Catalyst pushes filters/pruning into the
  * scans and the whole job is a single narrow pipeline until the (optional)
  * dedup shuffle.
  *
  * Scale posture: per-platform transforms are pure projections (no shuffle);
  * dedup is a window over the key (one shuffle); the merge is UNION ALL (no
  * shuffle); the final cast is a projection. At 100 TB the only exchange in
  * the whole plan is the dedup — and it's skipped for platforms without a
  * dedup key.
  */
object Pipeline {

  /** A5-ish control-plane directive for one platform. */
  sealed trait Directive
  case object Latest extends Directive
  case object Skip extends Directive
  final case class Exact(date: String) extends Directive

  /** Generic per-platform transform (replaces the reference's 3 hand-written
    * transformer classes, `src/etl/transformation.py:20-537`). Order of
    * operations mirrors the reference: dedup first (A22), then column
    * derivations, then required-field drop (A23) — Catalyst will push the
    * IsNotNull filters down through the projections anyway (§4.1). */
  def transform(raw: DataFrame, spec: PlatformSpec, now: Column = current_timestamp()): DataFrame = {
    // A22 — deterministic keep-first on input order.
    val deduped = spec.dedupKey match {
      case Some(k) =>
        val ordered = raw.withColumn("__ord", monotonically_increasing_id())
        val w = Window.partitionBy(col(k)).orderBy(col("__ord"))
        ordered.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__ord", "__rn")
      case None => raw
    }
    // Column derivations: one wide select of the spec's expressions.
    val present = raw.columns.toSet
    val exprs =
      if (spec.passthrough) spec.exprs.filter { case (pretty, _) => present(pretty) }
      else spec.exprs
    val derived = deduped.select(
      Canonical.fields.collect {
        case f if exprs.contains(f.pretty) => exprs(f.pretty).as(f.pretty)
      } :+ lit(spec.platformId).as("platform_id") :+ now.as("created_at"): _*)
    // A23 — required-field filter.
    spec.required.foldLeft(derived)((df, c) => df.filter(col(c).isNotNull))
  }

  /** A25 — schema-align union: add missing canonical columns as nulls,
    * UNION ALL (never a join), rename pretty → snake.
    * Ref: `src/etl/merging.py:6-28` + `src/utils/mapping.py`. */
  def merge(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "merge of zero frames")
    val aligned = frames.map { df =>
      val have = df.columns.toSet
      val withAll = Canonical.fields.foldLeft(df) { (d, f) =>
        if (have.contains(f.pretty)) d
        else d.withColumn(f.pretty, lit(null).cast(f.dataType))
      }
      withAll.select(Canonical.prettyNames.map(col): _*)
    }
    val unioned = aligned.reduce(_.unionByName(_))
    unioned.select(Canonical.fields.map(f => col(f.pretty).as(f.snake)): _*)
  }

  /** A26 + A27 — final typed cast to the DWH schema plus the deterministic
    * UUIDv5 record key. Ref: `src/utils/types_transform.py:7-90`. */
  def finalCast(df: DataFrame): DataFrame = {
    val withUid = df.withColumn("uid",
      EtlFunctions.uuid5Key(col("listing_id").try_cast("long"), col("platform_id").try_cast("int")))
    withUid.select(Canonical.fields.map(Canonical.castExpr): _*)
  }

  /** The one assembly path: per-platform transform (with an optional
    * post-transform hook — identity for [[run]], metric observation for
    * [[runReport]]) → merge → final cast. Keeping a single builder is what
    * guarantees run, runReport, and the streaming foreachBatch deployment
    * can never diverge in staging order or merge semantics. */
  private def assemble(rawByPlatform: Map[String, DataFrame], now: Column,
      post: (String, DataFrame) => DataFrame = (_, df) => df): DataFrame = {
    val transformed = rawByPlatform.toSeq.sortBy(_._1).map { case (name, raw) =>
      post(name, transform(raw, PlatformSpecs.byName(name), now))
    }
    finalCast(merge(transformed))
  }

  /** Full run over pre-loaded raw frames (extract is the caller's concern —
    * see Tables.csv / Tables.tableIfExists for the tolerant A1/A2 readers). */
  def run(rawByPlatform: Map[String, DataFrame],
      now: Column = current_timestamp()): DataFrame =
    assemble(rawByPlatform, now)

  /** The reference's run report (`src/etl/datapipeline.py:110-189`): a
    * status + per-stage row counts. Counts come from `Observation` metrics
    * attached to the lineage, so they are collected DURING the single load
    * action — the reference pays a `len(df)` materialization per stage;
    * here no extra pass, no extra action, works identically on a cluster. */
  final case class RunReport(status: String, message: String,
      rowsByPlatform: Map[String, Long], totalRows: Long)

  def runReport(rawByPlatform: Map[String, DataFrame],
      now: Column = current_timestamp(),
      metricsTimeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(30, "s"))(
      load: DataFrame => Unit): RunReport = {
    if (rawByPlatform.isEmpty)
      return RunReport("no_data", "No platforms returned data.", Map.empty, 0L)
    // Emptiness is checked BEFORE the sink runs (one limit-1 job over an
    // unobserved twin of the lineage), like the reference — a truncate-and-
    // reload sink must never execute for an empty run and then have the
    // report claim "no_data" as if nothing happened.
    if (assemble(rawByPlatform, now).isEmpty)
      return RunReport("no_data", "Unified DataFrame is empty.", Map.empty, 0L)
    val perPlatform = rawByPlatform.keys.map(p =>
      p -> org.apache.spark.sql.Observation(s"rows_$p")).toMap
    val totalObs = org.apache.spark.sql.Observation("rows_total")
    val unified = assemble(rawByPlatform, now,
        (name, df) => df.observe(perPlatform(name), count(lit(1)).as("n")))
      .observe(totalObs, count(lit(1)).as("n"))
    try {
      load(unified)
      // Bounded wait, not the unbounded blocking get: the metrics listener
      // fires asynchronously after the action, but a load callback that
      // never ran a Spark action over `unified` must surface as an error,
      // not hang this thread forever waiting for metrics that will never
      // arrive.
      def metric(o: org.apache.spark.sql.Observation): Option[Long] =
        try Some(scala.concurrent.Await.result(o.future, metricsTimeout).getAs[Long]("n"))
        catch { case _: java.util.concurrent.TimeoutException => None }
      val total = metric(totalObs)
      if (total.isEmpty)
        return RunReport("error",
          "Load callback completed without executing the unified frame.", Map.empty, -1L)
      val per = perPlatform.map { case (p, o) => p -> metric(o).getOrElse(0L) }
      RunReport("success", "Data loaded.", per, total.get)
    } catch {
      case e: Exception =>
        RunReport("error", s"Load error: ${e.getMessage}", Map.empty, -1L)
    }
  }

  /** A28/A29 — sinks. Parquet is the cluster-native path (partitioned by
    * platform so downstream reads prune); CSV mirrors the reference's test
    * loader; JDBC mirrors the ClickHouse truncate-and-reload semantics. */
  object Sinks {
    def parquet(df: DataFrame, path: String): Unit =
      df.write.mode(SaveMode.Overwrite).partitionBy("platform_id").parquet(path)

    /** Reference CSVLoader (`src/etl/loading.py:56-75`): single header CSV.
      * coalesce(1) is test-scale only, as in the reference. */
    def csv(df: DataFrame, path: String): Unit =
      df.coalesce(1).write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

    /** Reference ClickHouseLoader (`src/etl/loading.py:14-53`): TRUNCATE then
      * chunked insert == JDBC overwrite+truncate; 50k-row chunks == batchsize.
      * [[ClickHouseDialect]] supplies the type mapping when the URL is a
      * real ClickHouse endpoint (registration is idempotent and inert for
      * every other URL — Derby/postgres writes are untouched). */
    def jdbc(df: DataFrame, url: String, table: String, batchSize: Int = 50000): Unit = {
      ClickHouseDialect.register()
      df.write.mode(SaveMode.Overwrite)
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("truncate", "true")
        .option("batchsize", batchSize)
        .save()
    }
  }

  /** A4/A5 — latest-partition discovery + date resolution over a file layout
    * `prefix/{platform}_{yyyyMMdd}.csv`. Driver-side control plane (the
    * reference's PlatformsDateResolver, `src/utils/checking_s3_data.py`). */
  def resolveDates(spark: SparkSession, folder: String,
      directives: Map[String, Directive]): Map[String, Option[String]] = {
    val p = new org.apache.hadoop.fs.Path(folder)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val rx = """(\w+)_(\d{8})\.csv$""".r
    val latest: Map[String, String] =
      if (!fs.exists(p)) Map.empty
      else fs.listStatus(p).toSeq
        .flatMap(st => rx.findFirstMatchIn(st.getPath.getName).map(m => (m.group(1), m.group(2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap // A4: max(date) per platform
    directives.map {
      case (pl, Skip) => pl -> None
      case (pl, Latest) => pl -> latest.get(pl)
      // explicit date honored only if present and <= latest (A5 semantics)
      case (pl, Exact(d)) => pl -> latest.get(pl).filter(_ >= d).map(_ => d)
    }
  }
}
