package graft

import org.apache.spark.sql.functions._

/** tx12 (hashed-gram decontamination, the 100 TB form) must flag exactly
  * the pairs its oracle-checkable string twin tx10 flags: the 8-byte XXH64
  * gram key changes the shuffle payload, never the semantics, unless a
  * 64-bit collision merges two distinct trigrams (none at gate scale — a
  * collision would fail THIS test loudly, not silently). */
class TextAnalysisSpec extends SparkSpec {

  test("tx12's (corpus, eval, shared) set equals tx10's on the gate corpus") {
    def pairs(name: String) =
      graft.SparkEntry.queries(name)(spark, sf001)
        .select("corpus_id", "eval_id", "shared_grams")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val string = pairs("tx10_decontaminate")
    val hashed = pairs("tx12_decontaminate_hashed")
    assert(string.nonEmpty, "tx10 flagged nothing — the equality check would be vacuous")
    assert(hashed == string,
      s"hashed twin diverged: ${hashed.size} pairs vs tx10's ${string.size} " +
        s"(only_hashed=${(hashed -- string).take(5)}, only_string=${(string -- hashed).take(5)})")
  }

  test("tx12 is deterministic across invocations (rows-only contract)") {
    def run() = graft.SparkEntry.queries("tx12_decontaminate_hashed")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    assert(run() == run())
  }
}
