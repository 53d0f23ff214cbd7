package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward as-of join picks the latest right row at or before left ts") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 102L)) // user 2 has no prior click
      .toDF("user_id", "ts", "purchase_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 900L),
      (1L, ts("2024-01-01 11:59:00"), 901L),
      (2L, ts("2024-01-01 09:30:00"), 902L)) // after user 2's purchase
      .toDF("user_id", "ts", "click_id")
      .withColumn("click_ts", col("ts"))

    val out = AsOfJoin.asofBackward(left, right, "user_id", "ts", Seq("click_ts", "click_id"))
      .select("purchase_id", "click_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap

    assert(out(100L).contains(900L)) // 10:00 sees 09:30
    assert(out(101L).contains(901L)) // 12:00 sees 11:59, not 09:30
    assert(out(102L).isEmpty) // nothing at or before 09:00
  }

  test("tie semantics: right row at the exact left ts is visible") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("user_id", "ts", "purchase_id")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 9L)).toDF("user_id", "ts", "click_id")
      .withColumn("click_ts", col("ts"))
    val out = AsOfJoin.asofBackward(left, right, "user_id", "ts", Seq("click_id"))
      .collect()(0)
    assert(out.getAs[Long]("click_id") == 9L)
  }
}
