package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.EtlFunctions._

class EtlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("numCoerce: bad strings → null, numerics parse (A6)") {
    val out = Seq("3.5", "abc", null, " 7 ", "1e3").toDF("x")
      .select(numCoerce($"x").as("v")).collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(3.5), None, None, Some(7.0), Some(1000.0)))
  }

  test("flooredLong floors then casts (A7)") {
    val out = Seq("3.9", "-1.5", "x").toDF("x")
      .select(flooredLong($"x").as("v")).collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(3L), Some(-2L), None))
  }

  test("tsNormalize: parse, floor to second, bad → epoch (A13)") {
    val out = Seq("2024-03-05 10:11:12.987", "not a date", null)
      .toDF("x").select(tsNormalize($"x").cast("string").as("v"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("2024-03-05 10:11:12", "1970-01-01 00:00:00", "1970-01-01 00:00:00"))
  }

  test("safeListParse: list literals parse, junk → [] (A17)") {
    val out = Seq("['a', 'b']", "[]", "nope", null, "[350.0, 870.5]")
      .toDF("x").select(safeListParse($"x").as("v")).collect()
      .map(_.getSeq[String](0))
    assert(out(0) == Seq("a", "b"))
    assert(out(1) == Seq.empty)
    assert(out(2) == Seq.empty)
    assert(out(3) == Seq.empty)
    assert(out(4) == Seq("350.0", "870.5"))
  }

  test("prefixEach strips leading slashes then prefixes (A18)") {
    val out = Seq(Seq("/a.jpg", "b.jpg")).toDF("x")
      .select(prefixEach("https://img/", $"x").as("v")).collect()(0).getSeq[String](0)
    assert(out == Seq("https://img/a.jpg", "https://img/b.jpg"))
  }

  test("arrayCompact drops null/blank (A19)") {
    val out = Seq(("m1", null: String, " ")).toDF("a", "b", "c")
      .select(arrayCompactStr($"a", $"b", $"c").as("v")).collect()(0).getSeq[String](0)
    assert(out == Seq("m1"))
  }

  test("metroJson builds single-key JSON map (A20)") {
    val out = Seq(("Арбатская", "walk", "5")).toDF("n", "t", "m")
      .select(metroJson($"n", $"t", $"m").as("v")).collect()(0).getString(0)
    assert(out == """{"Арбатская":["walk","5"]}""")
  }

  test("safeDiv guards zero/null denominators (A16)") {
    val out = Seq((10.0, 2.0), (10.0, 0.0)).toDF("n", "d")
      .select(safeDiv($"n", $"d").as("v")).collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(5.0), None))
  }

  test("enumDomain clamps out-of-domain values (A26)") {
    val out = Seq("sale", "weird", null).toDF("x")
      .select(enumDomain($"x", Seq("sale", "rent")).as("v"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("sale", "Unknown", "Unknown"))
  }

  test("stableId is stable and in [0, 1e10) (A12)") {
    val out = Seq("ООО Ромашка", "ООО Ромашка", "other").toDF("x")
      .select(stableId($"x").as("v")).collect().map(_.getLong(0))
    assert(out(0) == out(1))
    assert(out.forall(v => v >= 0 && v < 10000000000L))
  }

  test("boolFlag: truthy → 1.0 else 0.0 (A14)") {
    val out = Seq("true", "false", null, "1").toDF("x")
      .select(boolFlag($"x").as("v")).collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(1.0, 0.0, 0.0, 1.0))
  }
}
