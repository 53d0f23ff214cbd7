package graft

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._

import graft.functions.SketchExprs

/** The [[SelfDotRewrite]] optimizer rule and the round-3 sketch-expression
  * hardening (typed inputs, LSH plane memoization + table offsets). */
class OptimizerRuleSpec extends SparkSpec {
  import spark.implicits._

  // Parquet-backed (a Seq-backed LocalRelation is eagerly constant-folded by
  // ConvertToLocalRelation, leaving no expression in the optimized plan to
  // assert on).
  private def vecs = spark.read.parquet(s"$sf001/embeddings.parquet")
    .limit(2)
    .select($"vec_id", transform($"embedding", e => e.cast("double")).as("v"))

  private def bruteNormSq(v: Seq[Double]): Double = {
    var acc = 0.0
    v.foreach(x => acc += x * x)
    acc
  }

  test("dot_product(x, x) is rewritten to l2_norm_squared") {
    val df = vecs.select($"v", SketchExprs.dotProduct($"v", $"v").as("d"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("l2_norm_squared"), s"rule did not fire:\n$plan")
    df.collect().foreach { r =>
      assert(r.getDouble(1) == bruteNormSq(r.getSeq[Double](0)))
    }
  }

  test("sqrt(dot_product(x, x)) is rewritten to l2_norm") {
    val df = vecs.select($"v", sqrt(SketchExprs.dotProduct($"v", $"v")).as("n"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("l2_norm") && !plan.contains("dot_product"),
      s"rule did not fire:\n$plan")
    df.collect().foreach { r =>
      assert(r.getDouble(1) == math.sqrt(bruteNormSq(r.getSeq[Double](0))))
    }
  }

  test("dot_product(x, y) with distinct sides is left alone") {
    val df = vecs.select($"v",
      SketchExprs.dotProduct($"v", transform($"v", e => e * 2)).as("d"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("dot_product"), s"rule over-fired:\n$plan")
    df.collect().foreach { r =>
      assert(r.getDouble(1) == 2.0 * bruteNormSq(r.getSeq[Double](0)))
    }
  }

  test("rule fires through the SQL surface too") {
    vecs.createOrReplaceTempView("orv")
    val df = spark.sql("SELECT l2_norm_squared(v) AS s, dot_product(v, v) AS d FROM orv")
    assert(df.queryExecution.optimizedPlan.toString.contains("l2_norm_squared"))
    df.collect().foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("dot_product rejects mismatched lengths (documented HOF divergence)") {
    val e = intercept[Exception] {
      spark.sql("SELECT dot_product(array(1.0D), array(1.0D, 2.0D))").collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("length mismatch"))
  }

  test("typed inputs: wrong-typed args fail at analysis, not runtime") {
    val e = intercept[Exception] {
      spark.sql("SELECT l2_norm('not an array')").collect()
    }
    // AnalysisException (DATATYPE_MISMATCH), never a ClassCastException
    assert(!e.isInstanceOf[ClassCastException])
    assert(e.getMessage.toLowerCase.contains("mismatch") ||
      e.getMessage.contains("ARRAY"))
  }

  test("hyperplane LSH: memoized planes reproduce the per-row XXH64 formula") {
    val v = Array(0.3, -1.2, 0.8, 2.5)
    // Independent re-derivation of the bucket from the published formula
    // (offset 0 must reproduce round-2 buckets bitwise).
    var expected = 0
    for (p <- 0 until 8) {
      var dot = 0.0
      for (d <- v.indices) {
        val h = XXH64.hashLong(d.toLong, p.toLong)
        dot += v(d) * ((java.lang.Math.floorMod(h, 2001L) - 1000L).toDouble / 1000.0)
      }
      expected = expected * 2 + (if (dot > 0) 1 else 0)
    }
    val got = Seq(Tuple1(v)).toDF("v")
      .select(SketchExprs.hyperplaneLsh($"v", 8).as("b")).as[Int].head()
    assert(got == expected)
  }

  test("hyperplane LSH: distinct offsets give independent tables") {
    val df = vecs.select(
      SketchExprs.hyperplaneLsh($"v", 16, 0).as("t0"),
      SketchExprs.hyperplaneLsh($"v", 16, 16).as("t1"),
      SketchExprs.hyperplaneLsh($"v", 16).as("t0b"))
    val rows = df.collect()
    assert(rows.forall(r => r.getInt(0) == r.getInt(2))) // default offset = 0
    assert(rows.exists(r => r.getInt(0) != r.getInt(1))) // tables differ
  }
}
