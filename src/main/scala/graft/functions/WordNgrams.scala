package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating expression (UDTF surface, SURVEY.md §2 Part B):
  * one output row per word n-gram of a whitespace-tokenized text, with its
  * ordinal position — the generator twin of
  * [[SketchExprs.WordShingles]] (which materializes the array instead).
  * Completes the extension triple: scalar Expression (Uuid5/SketchExprs),
  * typed Aggregator (VectorAgg), Generator (this).
  *
  * Generators run through `GenerateExec`, which evaluates them row-by-row
  * (CodegenFallback is the norm here — Spark's own `Stack`/`JsonTuple` do
  * the same); the per-row work is a single JVM loop. Unlike the
  * explode(array) form, no intermediate array is allocated per row.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      // limit -1 keeps trailing empty tokens: Spark's split(text, " ") and
      // DuckDB's string_split both preserve them, and the tx06 oracle plus
      // the explode-based equivalence test compare against those semantics.
      // (Scala's char-overload split(' ') silently drops trailing empties.)
      val words = t.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (words.length < n) Nil
      else new Iterator[InternalRow] {
        private var i = 0
        private val sb = new java.lang.StringBuilder(64)
        override def hasNext: Boolean = i + n <= words.length
        override def next(): InternalRow = {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(words(i + j)); j += 1
          }
          val row = InternalRow(i, UTF8String.fromString(sb.toString))
          i += 1
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): WordNgrams = copy(child = c)
  override def prettyName: String = "word_ngrams"
}

object WordNgrams {
  def apply(c: Column, n: Int): Column = ColumnBridge.column(WordNgrams(ColumnBridge.expression(c), n))
}
