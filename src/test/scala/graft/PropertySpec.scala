package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.EtlFunctions._

/** Property checks (SURVEY.md §5.2): coercions are total (never throw),
  * structural invariants of union/dedup/filter hold for arbitrary inputs.
  * Runs on the shared local session via ScalaCheck's sbt integration. */
object EtlProperties extends Properties("graft.etl") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val anyStrings: Gen[List[String]] =
    Gen.listOfN(20, Gen.oneOf(
      Gen.alphaNumStr, Gen.numStr,
      Gen.oneOf("", " ", "3.5", "-1e3", "NaN", "2024-01-01", "['a','b']", "[", "null"),
      Gen.asciiPrintableStr))

  property("numCoerce and tsNormalize never throw on arbitrary strings") =
    Prop.forAllNoShrink(anyStrings) { xs =>
      val df = xs.toDF("x")
        .select(numCoerce($"x").as("n"), tsNormalize($"x").as("t"),
          flooredLong($"x").as("f"), safeListParse($"x").as("l"))
      df.collect().length == xs.length // totality: every row produced
    }

  property("union of N frames preserves total row count") =
    Prop.forAllNoShrink(Gen.listOfN(4, Gen.chooseNum(0, 30))) { sizes =>
      val frames = sizes.map(n => (0 until n).map(i => (i.toLong, s"v$i")).toDF("k", "v"))
      frames.reduce(_.unionByName(_)).count() == sizes.sum
    }

  property("keep-first dedup output is <= input and has distinct keys") =
    Prop.forAllNoShrink(Gen.listOfN(40, Gen.chooseNum(0, 8))) { keys =>
      val df = keys.zipWithIndex.map { case (k, i) => (k.toLong, i) }.toDF("url", "ord")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("url").orderBy("ord")
      val out = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      val n = out.count()
      n <= keys.length && n == keys.distinct.length
    }

  property("required-field filter output has no nulls in the required column") =
    Prop.forAllNoShrink(Gen.listOfN(30, Gen.option(Gen.alphaNumStr))) { xs =>
      val df = xs.map(o => Tuple1(o.orNull)).toDF("req")
      df.filter($"req".isNotNull).filter($"req".isNull).count() == 0L
    }

  private val vecs: Gen[(List[Double], List[Double])] = for {
    n <- Gen.chooseNum(1, 16)
    a <- Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0))
    b <- Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0))
  } yield (a, b)

  property("dot product is symmetric and l2 norm is non-negative") =
    Prop.forAllNoShrink(vecs) { case (a, b) =>
      import graft.functions.SketchExprs
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        SketchExprs.dotProduct($"a", $"b").as("ab"),
        SketchExprs.dotProduct($"b", $"a").as("ba"),
        SketchExprs.l2Norm($"a").as("na")).collect()(0)
      // per-element multiplication commutes, so symmetry holds BITWISE
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)) && r.getDouble(2) >= 0.0
    }

  // Random (key, time) streams: duplicate keys, duplicate timestamps, keys
  // present on only one side — the degenerate shapes a merge-join as-of
  // implementation can get wrong at the boundaries.
  private val asofInputs = for {
    nl <- Gen.chooseNum(0, 25)
    nr <- Gen.chooseNum(0, 25)
    lks <- Gen.listOfN(nl, Gen.chooseNum(0L, 5L))
    lts <- Gen.listOfN(nl, Gen.chooseNum(0L, 40L))
    rks <- Gen.listOfN(nr, Gen.chooseNum(0L, 5L))
    rts <- Gen.listOfN(nr, Gen.chooseNum(0L, 40L))
  } yield (lks.zip(lts), rks.zip(rts))

  property("AsOfJoinExec equals a reference scan for arbitrary key/time streams") =
    Prop.forAllNoShrink(asofInputs) { case (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, new java.sql.Timestamp(t * 1000)) }
        .toDF("lid", "k", "lt")
      val right = rs.map { case (k, t) => (k, new java.sql.Timestamp(t * 1000)) }
        .toDF("k", "rt")
      val got = graft.plans.AsOfJoinPlan
        .asofExec(left, right, Seq("k"), "lt", "rt", Seq("rt"))
        .select("lid", "rt").collect()
        .map(r => r.getLong(0) -> Option(r.getTimestamp(1)).map(_.getTime)).toMap
      // reference: independent per-left-row scan over the raw inputs
      val expected = ls.zipWithIndex.map { case ((k, t), i) =>
        val times = rs.collect { case (rk, rt) if rk == k && rt <= t => rt }
        i.toLong -> (if (times.isEmpty) None else Some(times.max * 1000))
      }.toMap
      got == expected
    }

  property("greedy tokenizer: count == tokens.length and tokens rebuild the words") =
    Prop.forAllNoShrink(for {
      words <- Gen.listOfN(8, Gen.identifier.suchThat(_.nonEmpty)).map(_.take(8))
      vocab <- Gen.listOfN(12, for {
        a <- Gen.alphaLowerChar; b <- Gen.alphaLowerChar
      } yield s"$a$b")
    } yield (words, vocab.distinct)) { case (words, vocab) =>
      import graft.functions.SubwordTokenizer
      val text = words.mkString(" ")
      val row = Seq(Tuple1(text)).toDF("t")
        .select(SubwordTokenizer.greedyTokenCount($"t", vocab).as("n"),
          SubwordTokenizer.greedyTokens($"t", vocab).as("toks"))
        .collect()(0)
      val n = row.getInt(0)
      val toks = row.getSeq[String](1)
      // the count IS the token list's length; tokenization is a
      // partition of each word (concatenating tokens rebuilds the text
      // minus spaces); every token is 1-2 chars and every 2-char token
      // is a vocab entry
      n == toks.length &&
        toks.mkString == words.mkString &&
        toks.forall(t => t.length == 1 || (t.length == 2 && vocab.contains(t)))
    }

  property("greedy tokenizer, MULTI-LENGTH vocab: longest match wins, scan equals a reference fold") =
    Prop.forAllNoShrink(for {
      words <- Gen.listOfN(8, Gen.identifier.suchThat(_.nonEmpty)).map(_.take(8))
      // variable-length entries (2..8 chars) drawn from a 3-letter
      // alphabet so words actually hit them, plus entries sliced from the
      // words themselves so longest-vs-prefix contention is guaranteed
      // (an "ab" prefix of an "abc" entry at the same position)
      rand <- Gen.listOfN(10, for {
        l <- Gen.chooseNum(2, 8)
        cs <- Gen.listOfN(l, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield (words, rand)) { case (words, rand) =>
      import graft.functions.SubwordTokenizer
      val sliced = words.filter(_.length >= 3)
        .flatMap(w => Seq(w.take(2), w.take(3), w.substring(1, math.min(4, w.length))))
      val vocab = (rand ++ sliced).distinct.filter(_.length >= 2)
      val text = words.mkString(" ")
      val row = Seq(Tuple1(text)).toDF("t")
        .select(SubwordTokenizer.greedyTokenCount($"t", vocab).as("n"),
          SubwordTokenizer.greedyTokens($"t", vocab).as("toks"))
        .collect()(0)
      val n = row.getInt(0)
      val toks = row.getSeq[String](1)
      // independent reference scan: at each position take the longest
      // vocab entry that fits, else 1 char
      val vset = vocab.toSet
      def ref(w: String): List[String] = {
        def step(p: Int): List[String] =
          if (p >= w.length) Nil
          else {
            val l = (math.min(8, w.length - p) to 2 by -1)
              .find(k => vset.contains(w.substring(p, p + k))).getOrElse(1)
            w.substring(p, p + l) :: step(p + l)
          }
        step(0)
      }
      val expected = words.flatMap(ref)
      n == toks.length &&
        toks == expected &&
        toks.mkString == words.mkString &&
        toks.forall(t => t.length == 1 || vset.contains(t))
    }

  property("word n-gram generator emits max(0, words - n + 1) rows") =
    Prop.forAllNoShrink(for {
      words <- Gen.listOfN(6, Gen.identifier.suchThat(_.nonEmpty)).map(_.take(6))
      n <- Gen.chooseNum(1, 4)
    } yield (words, n)) { case (words, n) =>
      val text = words.mkString(" ")
      val rows = Seq(Tuple1(text)).toDF("text")
        .select(graft.functions.WordNgrams($"text", n).as(Seq("pos", "ngram")))
        .collect()
      rows.length == math.max(0, words.length - n + 1) &&
        rows.zipWithIndex.forall { case (r, i) => r.getInt(0) == i }
    }

  // SetUnionAgg.DistinctCount (st15's streaming COUNT(DISTINCT) stand-in):
  // the buffer is canonical (sorted distinct), so ANY partitioning of the
  // input multiset into partial buffers, merged in ANY order, must land on
  // the same buffer and final count — the property the streaming answer's
  // hash-exactness rides on. Null and empty inputs route through the
  // `when(kind === 'leak', srcs)` path by design and must contribute
  // nothing.
  private val setUnionInputs: Gen[List[Seq[String]]] =
    Gen.listOfN(24, Gen.oneOf(
      Gen.const(null: Seq[String]),
      Gen.const(Seq.empty[String]),
      Gen.listOfN(3, Gen.oneOf("cc", "wiki", "books", "code", "news", "cc")).map(_.toSeq)))

  property("SetUnionAgg: any partition/permutation merges to the same canonical buffer") =
    Prop.forAllNoShrink(for {
      xs <- setUnionInputs
      shuffled <- Gen.const(new scala.util.Random(xs.hashCode).shuffle(xs))
      cut1 <- Gen.chooseNum(0, xs.length)
      cut2 <- Gen.chooseNum(0, xs.length)
    } yield (xs, shuffled, cut1, cut2)) { case (xs, shuffled, cut1, cut2) =>
      val agg = new graft.functions.SetUnionAgg.DistinctCount
      def fold(part: List[Seq[String]]) = part.foldLeft(agg.zero)(agg.reduce)
      def run(order: List[Seq[String]], cut: Int) = {
        val (l, r) = order.splitAt(cut)
        agg.merge(fold(l), fold(r))
      }
      val a = run(xs, cut1)
      val b = run(shuffled, cut2)
      val c = agg.merge(run(shuffled, cut2), run(xs, cut1)) // merge is idempotent-union
      val expected = xs.filter(_ != null).flatten.distinct.sorted
      a.vals == expected && b.vals == expected && c.vals == expected &&
        agg.finish(a) == expected.length.toLong &&
        a.vals == a.vals.distinct.sorted // canonical: sorted distinct
    }
}
