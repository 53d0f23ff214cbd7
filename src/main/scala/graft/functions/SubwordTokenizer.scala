package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.graftbridge.TypeBridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization against a fixed bigram-merge
  * vocabulary — the real-tokenizer replacement for tx03's chars/4
  * heuristic and tx14's whitespace counts (training jobs pack TOKENIZER
  * tokens, not words). The scheme is one round of BPE: the vocabulary is
  * the corpus's most frequent character bigrams (built distributedly and
  * memoized in [[graft.operators.TextAnalysis]]); tokenization scans each
  * whitespace word left to right, consuming a vocab bigram where one
  * matches and a single character otherwise. Deterministic (no
  * randomness, ties in the vocab build broken lexicographically) and
  * oracle-expressible: DuckDB replays the exact scan with a recursive CTE
  * (tx08's playbook), so tx15/tx16 are hash-exact.
  *
  * One JVM loop per text, whole-stage-codegen'd like `CdcChunks`; the
  * vocab rides the expression as a small Seq (KBs — canonicalization-safe,
  * unlike dd08's MB sketch which needs the broadcast transport).
  *
  * Positions are UTF-16 code units, which equals DuckDB's codepoint
  * semantics on BMP text; the gate corpus is ASCII. */
object SubwordTokenizer {

  /** Greedy token count of `text`: per whitespace word, longest-match scan
    * against the bigram vocab (consume 2 chars on a hit, 1 otherwise). */
  def evalCount(text: UTF8String, vocab: java.util.HashSet[String]): Int = {
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
          if (p + 2 <= end && vocab.contains(s.substring(p, p + 2))) p += 2
          else p += 1
          count += 1
        }
        i = end
      }
    }
    count
  }

  /** The token strings themselves (spec/debug surface; tx15 ships counts). */
  def evalTokens(text: UTF8String, vocab: java.util.HashSet[String]): ArrayData = {
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
          val step = if (p + 2 <= end && vocab.contains(s.substring(p, p + 2))) 2 else 1
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

  /** Token count under greedy longest-match against `vocab`. */
  case class GreedyBigramTokenCount(child: Expression, vocab: Seq[String])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = IntegerType
    @transient private lazy val vset = toSet(vocab)
    def countTokens(t: UTF8String): Int = evalCount(t, vset)
    override def nullSafeEval(input: Any): Any =
      java.lang.Integer.valueOf(countTokens(input.asInstanceOf[UTF8String]))
    // references `this` so the generated code shares the expression's own
    // lazily-built vocab hash set (a static helper would rebuild it or
    // need its own registry; the BloomMightContainBroadcast pattern)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("greedyTok", this,
        classOf[GreedyBigramTokenCount].getName)
      defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
    }
    override protected def withNewChildInternal(c: Expression): GreedyBigramTokenCount =
      copy(child = c)
    override def prettyName: String = "greedy_bigram_token_count"
  }

  /** The token array (same scan as the count; spec surface). */
  case class GreedyBigramTokens(child: Expression, vocab: Seq[String])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    @transient private lazy val vset = toSet(vocab)
    def tokens(t: UTF8String): ArrayData = evalTokens(t, vset)
    override def nullSafeEval(input: Any): Any =
      tokens(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("greedyTokArr", this,
        classOf[GreedyBigramTokens].getName)
      defineCodeGen(ctx, ev, c => s"$ref.tokens($c)")
    }
    override protected def withNewChildInternal(c: Expression): GreedyBigramTokens =
      copy(child = c)
    override def prettyName: String = "greedy_bigram_tokens"
  }

  def greedyTokenCount(c: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(GreedyBigramTokenCount(ColumnBridge.expression(c), vocab))
  def greedyTokens(c: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(GreedyBigramTokens(ColumnBridge.expression(c), vocab))
}
