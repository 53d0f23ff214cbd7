package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.graftbridge.TypeBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization against a fixed merge
  * vocabulary — the real-tokenizer replacement for tx03's chars/4
  * heuristic and tx14's whitespace counts (training jobs pack TOKENIZER
  * tokens, not words). Vocabulary entries are VARIABLE-LENGTH (2 chars
  * and up): tx15's corpus-frequent bigrams are the one-merge-round
  * special case, and tx17's iterated BPE rounds add merged tokens up to
  * 8 chars ([[graft.operators.TextAnalysis]] builds both distributedly
  * and memoizes them). Tokenization scans each whitespace word left to
  * right; at each position it probes the vocab longest-first (bounded by
  * the vocab's own max entry length) and consumes the longest matching
  * entry, or a single character when nothing matches. Deterministic (no
  * randomness, ties in the vocab build broken lexicographically) and
  * oracle-expressible: DuckDB replays the exact scan with a recursive
  * CTE whose step is the same length-descending probe (tx08's playbook),
  * so tx15/tx16/tx17 are hash-exact.
  *
  * One JVM loop per text, whole-stage-codegen'd like `CdcChunks`; the
  * vocab rides the expression as a small Seq (KBs — canonicalization-safe,
  * unlike dd08's MB sketch which needs the broadcast transport).
  *
  * Positions are UTF-16 code units, which equals DuckDB's codepoint
  * semantics on BMP text; the gate corpus is ASCII. */
object SubwordTokenizer {

  /** Longest vocab entry that matches `s` at `p` within the word ending
    * (exclusive) at `end`; 1 when no entry matches (single-char token).
    * The probe is length-DESCENDING so a longer merged token always
    * beats its own prefix ("abc" beats "ab" at the same position). */
  private def matchLen(s: String, p: Int, end: Int, vocab: java.util.HashSet[String],
      maxLen: Int): Int = {
    var l = math.min(maxLen, end - p)
    while (l >= 2) {
      if (vocab.contains(s.substring(p, p + l))) return l
      l -= 1
    }
    1
  }

  /** Greedy token count of `text`: per whitespace word, longest-match scan
    * against the vocab (consume the longest matching entry, 1 char on a
    * miss). */
  def evalCount(text: UTF8String, vocab: java.util.HashSet[String], maxLen: Int): Int = {
    val s = text.toString
    val len = s.length
    var count = 0
    var i = 0
    while (i < len) {
      if (s.charAt(i) == ' ') i += 1
      else {
        var end = s.indexOf(' ', i)
        if (end < 0) end = len
        var p = i
        while (p < end) {
          p += matchLen(s, p, end, vocab, maxLen)
          count += 1
        }
        i = end
      }
    }
    count
  }

  /** The token strings themselves (spec/debug surface; tx15/tx17 ship
    * counts). */
  def evalTokens(text: UTF8String, vocab: java.util.HashSet[String], maxLen: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < len) {
      if (s.charAt(i) == ' ') i += 1
      else {
        var end = s.indexOf(' ', i)
        if (end < 0) end = len
        var p = i
        while (p < end) {
          val step = matchLen(s, p, end, vocab, maxLen)
          out += UTF8String.fromString(s.substring(p, p + step))
          p += step
        }
        i = end
      }
    }
    new GenericArrayData(out.toArray)
  }

  private def toSet(vocab: Seq[String]): java.util.HashSet[String] = {
    val set = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(set.add)
    set
  }

  /** Max entry length bounds the per-position probe; 1 on an empty vocab
    * so the scan degenerates to single characters without probing. */
  private def maxEntryLen(vocab: Seq[String]): Int =
    if (vocab.isEmpty) 1 else vocab.iterator.map(_.length).max

  /** Token count under greedy longest-match against `vocab`. */
  case class GreedySubwordTokenCount(child: Expression, vocab: Seq[String])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = IntegerType
    @transient private lazy val vset = toSet(vocab)
    @transient private lazy val maxLen = maxEntryLen(vocab)
    def countTokens(t: UTF8String): Int = evalCount(t, vset, maxLen)
    override def nullSafeEval(input: Any): Any =
      java.lang.Integer.valueOf(countTokens(input.asInstanceOf[UTF8String]))
    // references `this` so the generated code shares the expression's own
    // lazily-built vocab hash set (a static helper would rebuild it or
    // need its own registry; the BloomMightContainBroadcast pattern)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("greedyTok", this,
        classOf[GreedySubwordTokenCount].getName)
      defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
    }
    override protected def withNewChildInternal(c: Expression): GreedySubwordTokenCount =
      copy(child = c)
    override def prettyName: String = "greedy_subword_token_count"
  }

  /** The token array (same scan as the count; spec surface and the
    * adjacent-pair source of the iterated vocab build). */
  case class GreedySubwordTokens(child: Expression, vocab: Seq[String])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    @transient private lazy val vset = toSet(vocab)
    @transient private lazy val maxLen = maxEntryLen(vocab)
    def tokens(t: UTF8String): ArrayData = evalTokens(t, vset, maxLen)
    override def nullSafeEval(input: Any): Any =
      tokens(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("greedyTokArr", this,
        classOf[GreedySubwordTokens].getName)
      defineCodeGen(ctx, ev, c => s"$ref.tokens($c)")
    }
    override protected def withNewChildInternal(c: Expression): GreedySubwordTokens =
      copy(child = c)
    override def prettyName: String = "greedy_subword_tokens"
  }

  def greedyTokenCount(c: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(GreedySubwordTokenCount(ColumnBridge.expression(c), vocab))
  def greedyTokens(c: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(GreedySubwordTokens(ColumnBridge.expression(c), vocab))
}
