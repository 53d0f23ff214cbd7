package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.plans.AsOfJoinPlan
import graft.sources.Tables

/** The custom as-of physical operator ([[graft.plans.AsOfJoinExec]]):
  * plan shape, equivalence with the union+window form on real data, and
  * edge semantics on crafted rows. */
class AsOfExecSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def lefts = Seq(
    (1L, 10L, ts("2026-01-01 10:00:00")),
    (1L, 11L, ts("2026-01-01 12:00:00")),
    (2L, 20L, ts("2026-01-01 09:00:00")), // key with no right rows
    (3L, 30L, ts("2026-01-01 08:00:00"))) // before every right row
    .toDF("k", "lid", "lt")

  private def rights = Seq(
    (1L, ts("2026-01-01 09:59:00")),
    (1L, ts("2026-01-01 10:00:00")), // tie with left 10 => visible
    (1L, ts("2026-01-01 11:30:00")),
    (3L, ts("2026-01-01 09:00:00")))
    .toDF("k", "rt")

  test("physical plan contains AsOfJoinExec with sorted co-partitioned children") {
    val df = AsOfJoinPlan.asofExec(lefts, rights, Seq("k"), "lt", "rt", Seq("rt"))
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in explain output
    assert(plan.contains("AsOfJoin"), s"operator missing:\n$plan")
    assert(plan.contains("Sort"), s"EnsureRequirements added no sort:\n$plan")
    assert(plan.contains("Exchange"), s"EnsureRequirements added no exchange:\n$plan")
  }

  test("the merge is whole-stage code-generated, and equals the interpreted path") {
    def df() = AsOfJoinPlan.asofExec(lefts, rights, Seq("k"), "lt", "rt", Seq("rt"))
    def run(): Map[Long, Option[Timestamp]] =
      df().select("lid", "rt").collect()
        .map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    // fallback=false turns a codegen COMPILE failure into a hard error; it
    // does not catch codegen non-participation (e.g. CollapseCodegenStages
    // declining the stage), so additionally assert the executed plan shows
    // a WholeStageCodegen stage wrapping the operator.
    val savedFallback = spark.conf.get("spark.sql.codegen.fallback")
    val savedWholeStage = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val viaCodegen =
      try {
        val d = df().select("lid", "rt")
        val rows = d.collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
        // post-execution so AQE's plan string is final
        val plan = d.queryExecution.executedPlan.toString
        assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(plan).isDefined,
          s"AsOfJoin not inside a WholeStageCodegen stage:\n$plan")
        rows
      } finally spark.conf.set("spark.sql.codegen.fallback", savedFallback)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val viaInterpreted =
      try run() finally spark.conf.set("spark.sql.codegen.wholeStage", savedWholeStage)
    assert(viaCodegen == viaInterpreted)
    assert(viaCodegen(10L).contains(ts("2026-01-01 10:00:00")))
  }

  test("backward semantics: latest visible right row, ties visible, outer nulls") {
    val got = AsOfJoinPlan.asofExec(lefts, rights, Seq("k"), "lt", "rt", Seq("rt"))
      .select("lid", "rt").collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    assert(got(10L).contains(ts("2026-01-01 10:00:00"))) // tie counts
    assert(got(11L).contains(ts("2026-01-01 11:30:00")))
    assert(got(20L).isEmpty) // no right rows for key
    assert(got(30L).isEmpty) // every right row is later
  }

  test("tolerance bounds the lookback") {
    val got = AsOfJoinPlan.asofExec(lefts, rights, Seq("k"), "lt", "rt", Seq("rt"),
        toleranceUs = Some(60L * 1000 * 1000)) // 1 minute
      .select("lid", "rt").collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    assert(got(10L).contains(ts("2026-01-01 10:00:00"))) // 0s back
    assert(got(11L).isEmpty) // 11:30 is 30m back > 1m tolerance
  }

  test("equivalent to the union+window form on real event data") {
    val ev = Tables.events(spark, sf001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("ts").as("click_ts"))
    val viaWindow = AsOfJoin.asofBackward(
        purchases.withColumnRenamed("ts", "ts").withColumn("ts", col("ts")),
        clicks, "user_id", "ts", Seq("click_ts"))
      .select(col("purchase_id"), col("click_ts"))
    val viaExec = AsOfJoinPlan.asofExec(
        purchases.withColumnRenamed("ts", "p_ts"),
        clicks.select(col("user_id"), col("click_ts")),
        Seq("user_id"), "p_ts", "click_ts", Seq("click_ts"))
      .select(col("purchase_id"), col("click_ts"))
    assert(viaWindow.exceptAll(viaExec).isEmpty && viaExec.exceptAll(viaWindow).isEmpty,
      "union+window and AsOfJoinExec disagree")
    assert(viaExec.count() == purchases.count()) // left-outer: every purchase kept
  }

  test("forward semantics: earliest right row at/after, ties visible, outer nulls") {
    val got = AsOfJoinPlan.asofExec(lefts, rights, Seq("k"), "lt", "rt", Seq("rt"),
        forward = true)
      .select("lid", "rt").collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    assert(got(10L).contains(ts("2026-01-01 10:00:00"))) // tie counts (>=)
    assert(got(11L).isEmpty) // every key-1 right row is earlier than 12:00
    assert(got(20L).isEmpty) // no right rows for key
    assert(got(30L).contains(ts("2026-01-01 09:00:00"))) // first later row
  }

  test("forward tolerance bounds the lookahead") {
    val l = Seq((1L, 1L, ts("2026-01-01 09:00:00")), (1L, 2L, ts("2026-01-01 09:58:30")))
      .toDF("k", "lid", "lt")
    val got = AsOfJoinPlan.asofExec(l, rights, Seq("k"), "lt", "rt", Seq("rt"),
        toleranceUs = Some(60L * 1000 * 1000), forward = true) // 1 minute
      .select("lid", "rt").collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    assert(got(1L).isEmpty) // 09:59 is 59m ahead > 1m tolerance
    assert(got(2L).contains(ts("2026-01-01 09:59:00"))) // 30s ahead
  }

  test("forward: stale candidate from an earlier left row never matches") {
    // one right row at t=5; left rows at t=3 (matches) then t=10 (must NOT
    // reuse the t=5 candidate sitting in the merge state)
    val l = Seq((1L, 1L, 3L), (1L, 2L, 10L)).toDF("k", "lid", "lt")
    val r = Seq((1L, 5L)).toDF("k", "rt")
    val got = AsOfJoinPlan.asofExec(l, r, Seq("k"), "lt", "rt", Seq("rt"),
        forward = true)
      .select("lid", "rt").collect()
      .map(row => row.getLong(0) -> (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
    assert(got(1L).contains(5L))
    assert(got(2L).isEmpty)
  }

  test("forward codegen path equals the interpreted path on real event data") {
    val ev = Tables.events(spark, sf001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    def run(): Map[Long, Option[Timestamp]] =
      AsOfJoinPlan.asofExec(purchases, clicks, Seq("user_id"), "p_ts", "click_ts",
          Seq("click_ts"), forward = true)
        .select("purchase_id", "click_ts").collect()
        .map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    val savedFallback = spark.conf.get("spark.sql.codegen.fallback")
    val savedWholeStage = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val viaCodegen = try run() finally
      spark.conf.set("spark.sql.codegen.fallback", savedFallback)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val viaInterpreted = try run() finally
      spark.conf.set("spark.sql.codegen.wholeStage", savedWholeStage)
    assert(viaCodegen == viaInterpreted)
    // and equals the union+window forward form
    val viaWindow = AsOfJoin.asofForward(
        purchases.withColumn("ts", col("p_ts")),
        clicks.withColumn("ts", col("click_ts")).select("user_id", "ts", "click_ts"),
        "user_id", "ts", Seq("click_ts"))
      .select("purchase_id", "click_ts").collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    assert(viaWindow == viaCodegen, "union+window forward and exec forward disagree")
  }

  test("union+window forms carry the matched ROW (nulls included) and never match null keys (ADVICE r13)") {
    // right@15 has v1=7,v2=null; right@5 has v1=null,v2="a". The old
    // per-column last(when(...), ignoreNulls) carry skipped the matched
    // row's null column and stitched v2="a" onto lid2's v1=7 — values
    // from two DIFFERENT right rows. The struct carry keeps the row
    // coherent. Null-key rows (lid3 / the null-key right row) must not
    // match each other: SQL equi-key semantics, same as the exec.
    val l = Seq((Option(1L), 1L, 10L), (Option(1L), 2L, 20L), (Option.empty[Long], 3L, 10L))
      .toDF("k", "lid", "t")
    val r = Seq(
      (Option(1L), 5L, Option.empty[Long], Option("a")),
      (Option(1L), 15L, Option(7L), Option.empty[String]),
      (Option.empty[Long], 5L, Option(9L), Option("z")))
      .toDF("k", "t", "v1", "v2")
    def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Option[Long], Option[String])] =
      df.select("lid", "v1", "v2").collect().map(row =>
        row.getLong(0) -> ((if (row.isNullAt(1)) None else Some(row.getLong(1)),
          Option(row.getString(2))))).toMap
    val expect = Map(
      1L -> ((None, Some("a"))),       // matched right@5 row-for-row
      2L -> ((Some(7L), None)),        // matched right@15: its null STAYS null
      3L -> ((None, None)))            // null key: no match
    val gotB = asMap(AsOfJoin.asofBackward(l, r, "k", "t", Seq("v1", "v2")))
    assert(gotB == expect, s"backward: $gotB")
    // Forward mirror: lid1@10 -> right@15 (earliest at/after), lid2@20 ->
    // none, null key -> none.
    val gotF = asMap(AsOfJoin.asofForward(l, r, "k", "t", Seq("v1", "v2")))
    assert(gotF == Map(
      1L -> ((Some(7L), None)),
      2L -> ((None, None)),
      3L -> ((None, None))), s"forward: $gotF")
    // And both agree with the exec on the same frame.
    val execB = asMap(AsOfJoinPlan.asofExec(
      l.withColumnRenamed("t", "lt"), r.withColumnRenamed("t", "rt"),
      Seq("k"), "lt", "rt", Seq("v1", "v2")))
    val execF = asMap(AsOfJoinPlan.asofExec(
      l.withColumnRenamed("t", "lt"), r.withColumnRenamed("t", "rt"),
      Seq("k"), "lt", "rt", Seq("v1", "v2"), forward = true))
    assert(execB == gotB, s"exec backward $execB != window $gotB")
    assert(execF == gotF, s"exec forward $execF != window $gotF")
  }

  test("aj04 composition: second exec adds no exchange or sort over the first") {
    val ev = Tables.events(spark, sf001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    def clicks(as: String) = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as(as))
    val back = AsOfJoinPlan.asofExec(purchases, clicks("b_ts"),
      Seq("user_id"), "p_ts", "b_ts", Seq("b_ts"))
    val both = AsOfJoinPlan.asofExec(back, clicks("f_ts"),
      Seq("user_id"), "p_ts", "f_ts", Seq("f_ts"), forward = true)
    val plan = both.queryExecution.executedPlan.toString
    // one exchange+sort pair per exec input side = 3 total (left side of
    // exec #2 is exec #1's output: already clustered and sorted)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    val sorts = "\\bSort \\[".r.findAllIn(plan).length
    assert(exchanges == 3, s"expected 3 exchanges, got $exchanges:\n$plan")
    assert(sorts == 3, s"expected 3 sorts, got $sorts:\n$plan")
  }

  test("null keys never match (SQL equi-key semantics, not sort-order equality)") {
    val l = Seq((Option(1L), 1L, ts("2026-01-01 10:00:00")),
        (Option.empty[Long], 2L, ts("2026-01-01 10:00:00")))
      .toDF("k", "lid", "lt")
    val r = Seq((Option(1L), ts("2026-01-01 09:00:00")),
        (Option.empty[Long], ts("2026-01-01 09:30:00")))
      .toDF("k", "rt")
    val got = AsOfJoinPlan.asofExec(l, r, Seq("k"), "lt", "rt", Seq("rt"))
      .select("lid", "rt").collect()
      .map(row => row.getLong(0) -> Option(row.getTimestamp(1))).toMap
    assert(got(1L).contains(ts("2026-01-01 09:00:00"))) // real key matches
    assert(got(2L).isEmpty) // null key matches nothing — not the null-key right row
  }

  test("non-long-backed time columns are rejected at build time") {
    val l = lefts.withColumn("ld", to_date(col("lt")))
    val e = intercept[IllegalArgumentException] {
      AsOfJoinPlan.asofExec(l, rights, Seq("k"), "ld", "rt", Seq("rt"))
    }
    assert(e.getMessage.contains("must be TIMESTAMP or BIGINT"))
  }

  test("empty right side yields all-null carries") {
    val got = AsOfJoinPlan.asofExec(lefts, rights.filter(col("k") < 0),
        Seq("k"), "lt", "rt", Seq("rt"))
      .select("rt").collect()
    assert(got.length == 4 && got.forall(_.isNullAt(0)))
  }
}
