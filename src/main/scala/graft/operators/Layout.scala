package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB posture: skew salting and
  * bucketed co-located joins. These are the knobs you reach for when AQE's
  * automatic skew splitting isn't enough or when a join key is reused across
  * many jobs and the shuffle should be paid once at write time.
  */
object Layout {

  /** Rows refused by [[capHotKeys]], per call-site tag, observable so a real
    * corpus that trips a cap is VISIBLE (refused groups produce zero
    * candidate pairs — recall loss that only exact dedup can recover; silent
    * under-reporting is worse than the skew it prevents). Each builder
    * invocation registers a fresh accumulator; [[refusedRows]] sums per tag.
    * Accumulator discipline: values are an operational signal, not an exact
    * metric — a capped frame consumed twice in one plan (both sides of a
    * self-join, as in dd04) or a retried stage counts its refusals each
    * execution. */
  private val refusedAccs =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, org.apache.spark.util.LongAccumulator)]()

  /** Total refused rows per tag since the last [[resetRefusedCounters]]
    * (only tags with nonzero counts). */
  def refusedRows: Map[String, Long] = {
    val it = refusedAccs.iterator()
    val m = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    while (it.hasNext) { val (tag, acc) = it.next(); m(tag) += acc.value }
    m.toMap.filter(_._2 > 0)
  }

  def resetRefusedCounters(): Unit = refusedAccs.clear()

  /** The shared hot-key guard behind dd04/dd05/dd06/ss08: count each key
    * group with ONE window pass (no groupBy + join-back) and drop groups
    * larger than `cap` BEFORE any pair join — the bound that keeps one hot
    * bucket/shingle from owning a k² slice of a candidate join at 100 TB.
    * Groups AT the cap are kept (`<=`).
    *
    * Refusals are counted into a per-call accumulator (see [[refusedRows]]).
    * The keep predicate is a Scala UDF only because an accumulator needs
    * executing code; it runs once per post-window row on an already
    * materialized integer — nothing for Catalyst to push past it here. */
  def capHotKeys(df: DataFrame, keys: Seq[String], cap: Long,
      tag: String = ""): DataFrame = {
    val label = if (tag.nonEmpty) tag else keys.mkString("+")
    val acc = df.sparkSession.sparkContext
      .longAccumulator(s"graft.capHotKeys.refused[$label]")
    refusedAccs.add(label -> acc)
    val keep = udf { sz: Long => val k = sz <= cap; if (!k) acc.add(1L); k }
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    df.withColumn("__grp_sz", count(lit(1)).over(w))
      .filter(keep(col("__grp_sz")))
      .drop("__grp_sz")
  }

  /** Skew-tolerant equi-join: salt the (large, skewed) left side by
    * splitting each key into `saltFactor` virtual keys, and explode the
    * right side across all salt values. Equivalent to `left.join(right,
    * keys)` for inner joins, but a hot key's rows spread over `saltFactor`
    * reducers instead of one.
    *
    * Salt is derived from a stable hash of the left row's other columns (or
    * a provided column), so the join stays deterministic. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int, saltSource: Option[Column] = None): DataFrame = {
    val saltCol = saltSource.getOrElse(
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(saltFactor.toLong)))
    val saltedLeft = left.withColumn("__salt", saltCol.cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(saltedRight, keys :+ "__salt").drop("__salt")
  }

  /** Write a table bucketed+sorted by join keys. Two tables bucketed the
    * same way join with NO exchange (and no sort, since buckets are sorted):
    * the shuffle is paid once at write time and amortized over every later
    * join — the standard layout for a fact table joined daily at 100 TB. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.drop(1): _*)
      .sortBy(keys.head, keys.drop(1): _*)
      .format("parquet")
      .saveAsTable(table)
}
