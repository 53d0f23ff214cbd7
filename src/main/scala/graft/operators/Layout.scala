package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB posture: skew salting and
  * bucketed co-located joins. These are the knobs you reach for when AQE's
  * automatic skew splitting isn't enough or when a join key is reused across
  * many jobs and the shuffle should be paid once at write time.
  */
object Layout {

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
