package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB posture: skew salting and
  * bucketed co-located joins. These are the knobs you reach for when AQE's
  * automatic skew splitting isn't enough or when a join key is reused across
  * many jobs and the shuffle should be paid once at write time.
  */
object Layout {

  /** The shared hot-key guard behind dd04/dd05/dd06/ss08: count each key
    * group with ONE window pass (no groupBy + join-back) and drop groups
    * larger than `cap` BEFORE any pair join — the bound that keeps one hot
    * bucket/shingle from owning a k² slice of a candidate join at 100 TB.
    * Groups AT the cap are kept (`<=`). */
  def capHotKeys(df: DataFrame, keys: Seq[String], cap: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    df.withColumn("__grp_sz", count(lit(1)).over(w))
      .filter(col("__grp_sz") <= cap)
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
