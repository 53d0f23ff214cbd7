package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Pins the round-1 lesson that round 14 re-paid: a DECLARED query's
  * output is a shipped contract with the driver's pandas comparer, which
  * lexsorts every column and `factorize`s the values — an ArrayType cell
  * raises `unhashable type: numpy.ndarray` and the whole row lands as
  * `err` in CORRECTNESS (untested, not failed: worse). e05/e06 adopted
  * the `array_join` serialization convention in round 1 and documented it
  * in a comment (`EtlQueries.scala`); st13 forgot it in round 14 because
  * the rule lived in prose, not a test. This is the companion to
  * [[OracleDisciplineSpec]]'s r13 CTE-materialization lint: same class —
  * shipped contract, no guard.
  *
  * House rule: every `SparkEntry.queries` output schema must be flat —
  * no top-level ArrayType / MapType / StructType column. Nested data is
  * fine INSIDE a query (the helpers keep their arrays; streaming parity
  * specs depend on them); the declared boundary serializes with
  * `array_join` / `to_json`, mirrored by `array_to_string` / DuckDB JSON
  * in the oracle.
  */
class OutputShapeSpec extends SparkSpec {

  /** Names of top-level columns the driver's comparer cannot sort. */
  private def unsortable(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.simpleString}"
    }.toSeq

  test("every declared query's output schema is flat (pandas-comparer sortable)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val cols = unsortable(fn(spark, sf001))
        if (cols.nonEmpty) Some(s"$name -> ${cols.mkString(", ")}") else None
    }
    graft.Caches.releaseAll() // plan builds above register builder caches
    assert(offenders.isEmpty,
      "declared queries with array/map/struct top-level columns (the " +
        "driver's pandas comparer crashes on these — serialize with " +
        s"array_join/to_json, see e05/e06):\n  ${offenders.mkString("\n  ")}")
  }

  test("the lint itself catches an array-typed fixture") {
    import spark.implicits._
    val bad = Seq((1L, Seq(1L, 2L))).toDF("id", "neighbor_ids")
    assert(unsortable(bad) == Seq("neighbor_ids: array<bigint>"))
    val good = bad.selectExpr("id",
      "array_join(transform(neighbor_ids, x -> cast(x as string)), '|') AS neighbor_ids")
    assert(unsortable(good).isEmpty)
  }
}
