package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchExprs

/** Content-defined chunking: exact tiling, determinism, and the property
  * the whole technique exists for — a local edit only disturbs chunks near
  * the edit, so shifted/near-identical documents still dedup at chunk
  * granularity. */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String): Seq[(Int, Int, Long)] =
    Seq(Tuple1(text)).toDF("text")
      .select(explode(SketchExprs.cdcChunks($"text", 6)).as("c"))
      .select("c.off", "c.len", "c.hash")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq

  // deterministic pseudo-text, long enough for many chunks
  private def text(seed: Int, n: Int): String = {
    val sb = new StringBuilder
    var x = seed
    while (sb.length < n) {
      x = x * 1103515245 + 12345
      sb.append(('a' + math.floorMod(x >> 16, 26)).toChar)
      if (sb.length % 7 == 0) sb.append(' ')
    }
    sb.toString.take(n)
  }

  test("chunks tile the document exactly and respect the max bound") {
    for (t <- Seq(text(1, 3000), text(2, 100), "short", "")) {
      val cs = chunksOf(t)
      val byteLen = t.getBytes("UTF-8").length
      if (byteLen == 0) assert(cs.isEmpty)
      else {
        assert(cs.head._1 == 0)
        assert(cs.map(_._2).sum == byteLen, s"lens don't sum to $byteLen")
        cs.sliding(2).foreach {
          case Seq((o1, l1, _), (o2, _, _)) => assert(o1 + l1 == o2, "gap in tiling")
          case _ =>
        }
        assert(cs.forall(_._2 <= 256), "max chunk bound violated")
        // every chunk except possibly the last respects the min bound
        assert(cs.dropRight(1).forall(_._2 >= 16), "min chunk bound violated")
      }
    }
  }

  test("identical text yields identical chunks; chunking is deterministic") {
    val t = text(3, 2000)
    assert(chunksOf(t) == chunksOf(t))
  }

  test("a local edit only disturbs chunks around the edit (CDC resync)") {
    val t = text(4, 4000)
    val edited = t.updated(2000, 'Z')
    val orig = chunksOf(t)
    val after = chunksOf(edited)
    // chunks strictly before the edit are bit-identical
    val beforeOrig = orig.takeWhile { case (o, l, _) => o + l <= 2000 }
    assert(after.take(beforeOrig.length) == beforeOrig)
    // and the streams resynchronize after the edit: most chunk hashes are
    // shared even though all content after position 2000 follows an edit
    val shared = orig.map(_._3).toSet.intersect(after.map(_._3).toSet).size
    assert(shared >= orig.length * 3 / 4,
      s"only $shared/${orig.length} chunks survived a 1-char edit")
  }

  test("cdc_chunks is SQL-callable via the extension registry") {
    val n = spark.sql("SELECT size(cdc_chunks('hello world, hello chunking', 4)) AS n")
      .head.getInt(0)
    assert(n >= 1)
  }
}
