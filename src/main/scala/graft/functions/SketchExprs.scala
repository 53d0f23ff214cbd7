package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.graftbridge.TypeBridge.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sketch/signature math behind the
  * dedup operators. The same logic is expressible with higher-order
  * functions (`transform`/`aggregate` + `xxhash64`), but HOF lambdas are
  * interpreted per element — at sf0.1 the HOF forms spent 88 of 112 bench
  * seconds. These JVM loops are 30-100x faster and keep the same outputs.
  *
  * Each expression implements `doGenCode` as a static call into the eval
  * helpers below (Scala object methods get static forwarders), so they
  * participate in whole-stage codegen instead of breaking the stage the way
  * `CodegenFallback` would.
  *
  * All hashing uses Spark's own XXH64 (the engine of SQL `xxhash64`), so
  * signatures are stable across JVMs/partitions/runs.
  */
object SketchExprs {

  private def hashUtf8(s: UTF8String, seed: Long): Long =
    XXH64.hashUTF8String(s, seed)

  // ---------- static eval helpers (called from generated code) ----------

  /** Distinct word n-gram shingles of a whitespace-tokenized text. */
  def evalWordShingles(input: UTF8String, n: Int): ArrayData = {
    val words = input.toString.split(' ')
    val out = new java.util.LinkedHashSet[String]()
    if (words.length <= n) out.add(words.mkString(" "))
    else {
      var i = 0
      val sb = new java.lang.StringBuilder(64)
      while (i + n <= words.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j)); j += 1
        }
        out.add(sb.toString); i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator(); var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  /** k-permutation MinHash signature: element i = min XXH64(shingle, seed=i). */
  def evalMinhashSig(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      var seed = 0
      while (seed < k) {
        val h = hashUtf8(s, seed)
        if (h < sig(seed)) sig(seed) = h
        seed += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash: per-bit majority vote of XXH64 word hashes. */
  def evalSimhash64(input: UTF8String): Long = {
    val text = input.toString
    val counts = new Array[Int](64)
    var start = 0
    val len = text.length
    while (start < len) {
      var end = text.indexOf(' ', start)
      if (end < 0) end = len
      if (end > start) {
        val h = hashUtf8(UTF8String.fromString(text.substring(start, end)), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      start = end + 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** |a ∩ b| for string arrays (set semantics; inputs distinct). Matches
    * `size(array_intersect(a, b))` / DuckDB `len(list_intersect(a, b))`. */
  def evalArrayIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val set = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) { set.add(a.getUTF8String(i)); i += 1 }
    var c = 0
    i = 0
    while (i < b.numElements()) { if (set.contains(b.getUTF8String(i))) c += 1; i += 1 }
    c
  }

  /** Fraction of equal positions of two equal-length long arrays. */
  def evalSigAgreement(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var eq = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
    if (n == 0) 0.0 else eq.toDouble / n
  }

  /** XXH64 of a long-array slice — band bucketing for LSH. */
  def evalLongSliceHash(a: ArrayData, from: Int, len: Int): Long = {
    var h = 0L
    var i = from
    val end = math.min(from + len, a.numElements())
    while (i < end) { h = XXH64.hashLong(a.getLong(i), h); i += 1 }
    h
  }

  /** Sorted XXH64 hashes of distinct word n-gram shingles — the compact form
    * for pairwise intersection (8 bytes/shingle; 64-bit hashes make
    * cross-doc collisions vanishingly rare). */
  def evalShingleHashes(input: UTF8String, n: Int): ArrayData = {
    val sh = evalWordShingles(input, n)
    val out = new Array[Long](sh.numElements())
    var i = 0
    while (i < out.length) { out(i) = hashUtf8(sh.getUTF8String(i), 7L); i += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** Sorted XXH64 hashes of the DISTINCT word n-grams of a text, with
    * [[graft.functions.WordNgrams]]-parity tokenization: `split(" ", -1)`
    * (trailing empty tokens kept, matching Spark's `split` and DuckDB's
    * `string_split`) and NO output for texts of fewer than n words —
    * unlike [[evalWordShingles]], which drops trailing empties and emits
    * one whole-text shingle for short docs. tx12 rides this so its gram
    * stream is tx10's gram stream hashed, BY CONSTRUCTION (hashing the
    * distinct grams ≡ distinct hashes of the grams), while the strings
    * never leave this loop — the exploded index carries 8-byte longs. */
  def evalNgramHashes(input: UTF8String, n: Int): ArrayData = {
    val words = input.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(new Array[Long](0))
    val seen = new java.util.HashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j)); j += 1
      }
      seen.add(hashUtf8(UTF8String.fromString(sb.toString), 7L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** |a ∩ b| for two SORTED long arrays via a single merge scan. */
  def evalSortedLongIntersectCount(a: ArrayData, b: ArrayData): Int = {
    var i = 0; var j = 0; var c = 0
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Sequential-order dot product of two double arrays. Bitwise-identical to
    * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)` (and
    * to DuckDB's list_sum over the same products) — same left-fold order —
    * so oracle hashes are unaffected by the swap to this JVM loop.
    *
    * Length mismatch throws (the HOF form silently yields NULL); null
    * elements are NOT checked in the hot loop — arrays must be null-free,
    * which every engine call site guarantees (`transform(..., CAST)` over
    * non-null embeddings). This is the documented divergence from the HOF
    * form's NULL-propagating semantics. */
  def evalDotProduct(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"dot_product: array length mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Exact integer sum of squared differences over long arrays (see
    * [[LongSqDist]]) — ss14's grid distance as ONE JVM loop. The
    * `aggregate(zip_with(...))` HOF form computes the identical value
    * (same order, same wrapping Long arithmetic) but pays an interpreted
    * lambda call per element — and inside a `transform` lambda (the
    * per-centroid argmin shape) that cost multiplies by the centroid
    * count. */
  def evalLongSqDist(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"long_sqdist: array length mismatch ($n vs ${b.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) { val d = a.getLong(i) - b.getLong(i); acc += d * d; i += 1 }
    acc
  }

  /** Pack a long array whose elements all fit in signed 32 bits into a
    * 4-byte-big-endian-per-element binary (see [[PackInts]]). ss14's
    * integer grid values span [0, ~2e6], so the packing is lossless
    * there; an out-of-range element throws rather than wrapping — a
    * silent truncation would corrupt every downstream distance. */
  def evalPackInts(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      val v = a.getLong(i)
      if (v < Int.MinValue || v > Int.MaxValue)
        throw new IllegalArgumentException(
          s"pack_ints: element $i out of int32 range: $v")
      val x = v.toInt
      val o = i * 4
      out(o) = (x >>> 24).toByte; out(o + 1) = (x >>> 16).toByte
      out(o + 2) = (x >>> 8).toByte; out(o + 3) = x.toByte
      i += 1
    }
    out
  }

  /** [[evalLongSqDist]] over two [[evalPackInts]] binaries: identical
    * left-fold, identical long arithmetic (each unpacked element is
    * exact, diffs widen to long before squaring), half the in-flight
    * bytes — the re-rank joins' row-width halver (see [[BinIntSqDist]]). */
  def evalBinIntSqDist(a: Array[Byte], b: Array[Byte]): Long = {
    val n = a.length
    if (n != b.length || (n & 3) != 0)
      throw new IllegalArgumentException(
        s"packed_sqdist: binary length mismatch or not 4-aligned ($n vs ${b.length})")
    var acc = 0L
    var i = 0
    while (i < n) {
      val xa = ((a(i) & 0xff) << 24) | ((a(i + 1) & 0xff) << 16) |
        ((a(i + 2) & 0xff) << 8) | (a(i + 3) & 0xff)
      val xb = ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      val d = xa.toLong - xb.toLong
      acc += d * d
      i += 4
    }
    acc
  }

  /** Sequential-order sum of squared differences (see [[SqL2Dist]]). */
  def evalSqL2Dist(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"sq_l2_dist: array length mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); acc += d * d; i += 1 }
    acc
  }

  /** Sequential-order sum of squares (the sqrt-free L2 building block;
    * bitwise-identical to evalDotProduct(a, a) — same left fold). */
  def evalL2NormSquared(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); acc += x * x; i += 1 }
    acc
  }

  /** Sequential-order L2 norm (sqrt of left-fold sum of squares). */
  def evalL2Norm(a: ArrayData): Double = math.sqrt(evalL2NormSquared(a))

  /** Hyperplane coefficient matrix [plane][dim], derived deterministically
    * from XXH64(dim, planeIndex) and memoized per (offset, nPlanes, dims):
    * the round-2 form recomputed the XXH64 per dim×plane for EVERY row. The
    * cache is tiny (nPlanes×dims doubles) and JVM-wide, so executors pay the
    * derivation once per process, not once per row. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def planeMatrix(nPlanes: Int, offset: Int, dims: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((offset, nPlanes, dims), _ =>
      Array.tabulate(nPlanes, dims) { (p, d) =>
        val h = XXH64.hashLong(d.toLong, (offset + p).toLong)
        (java.lang.Math.floorMod(h, 2001L) - 1000L).toDouble / 1000.0
      })

  /** Random-hyperplane LSH bucket: nPlanes sign bits from planes
    * [offset, offset + nPlanes). offset=0 reproduces the round-2 buckets
    * bitwise; distinct offsets give the independent hash tables a
    * multi-table ANN/near-dup blocker needs. */
  def evalHyperplaneLsh(v: ArrayData, nPlanes: Int, offset: Int): Int = {
    val dims = v.numElements()
    val m = planeMatrix(nPlanes, offset, dims)
    var bucket = 0
    var p = 0
    while (p < nPlanes) {
      val row = m(p)
      var dot = 0.0
      var d = 0
      while (d < dims) { dot += v.getDouble(d) * row(d); d += 1 }
      bucket = bucket * 2 + (if (dot > 0) 1 else 0)
      p += 1
    }
    bucket
  }

  /** Content-defined chunking via a polynomial rolling hash (the Rabin
    * fingerprint idea behind rsync/LBFS-style dedup): a chunk boundary is
    * declared wherever the rolling hash of the last `Win` bytes has its low
    * `maskBits` bits zero — so boundaries are a function of local CONTENT,
    * not position, and an edit reshuffles only the chunks around it while
    * every other chunk keeps its identity. That chunk-identity stability is
    * what makes chunk-level dedup work on near-identical documents at
    * 100 TB (shifted text still dedups, unlike fixed-size blocks).
    *
    * Returns array<struct<off int, len int, hash bigint>> where `hash` is
    * XXH64 of the chunk's bytes; chunks tile the input exactly. Bounds:
    * min chunk MinLen (skew guard: a degenerate mask region can't emit
    * per-byte chunks), max MaxLen (forced cut; bounds state at scale). */
  private final val Win = 16
  private final val MinLen = 16
  private final val MaxLen = 256
  private final val Base = 257L

  def evalCdcChunks(input: UTF8String, maskBits: Int): ArrayData = {
    val bytes = input.getBytes
    val n = bytes.length
    val mask = (1L << maskBits) - 1
    // Base^(Win-1), for expiring the outgoing byte of the rolling window
    var basePow = 1L
    var i = 0
    while (i < Win - 1) { basePow *= Base; i += 1 }
    val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
    def emit(start: Int, len: Int): Unit = rows +=
      org.apache.spark.sql.catalyst.InternalRow(start, len, XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, len, 42L))
    var start = 0
    var h = 0L // polynomial hash of the last min(len, Win) bytes of the chunk
    var pos = 0
    while (pos < n) {
      val b = bytes(pos) & 0xffL
      val len = pos - start + 1
      h = if (len <= Win) h * Base + b
      else (h - (bytes(pos - Win) & 0xffL) * basePow) * Base + b
      if ((len >= MinLen && (h & mask) == 0) || len >= MaxLen || pos == n - 1) {
        emit(start, len)
        start = pos + 1
        h = 0L
      }
      pos += 1
    }
    new GenericArrayData(rows.toArray)
  }

  // ---------- expressions (codegen = static call into the helpers) ----------

  private val Self = "graft.functions.SketchExprs"

  case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      evalWordShingles(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalWordShingles($c, $n)")
    override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
    override def prettyName: String = "word_shingles"
  }

  case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      evalMinhashSig(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalMinhashSig($c, $k)")
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
    override def prettyName: String = "minhash_sig"
  }

  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(evalSimhash64(input.asInstanceOf[UTF8String]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalSimhash64($c)")
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
    override def prettyName: String = "simhash64"
  }

  case class ArrayIntersectCount(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Integer.valueOf(
        evalArrayIntersectCount(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Self.evalArrayIntersectCount($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "array_intersect_count"
  }

  case class SigAgreement(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Double.valueOf(
        evalSigAgreement(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Self.evalSigAgreement($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "sig_agreement"
  }

  case class LongSliceHash(child: Expression, from: Int, len: Int) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(evalLongSliceHash(input.asInstanceOf[ArrayData], from, len))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalLongSliceHash($c, $from, $len)")
    override protected def withNewChildInternal(c: Expression): LongSliceHash = copy(child = c)
    override def prettyName: String = "long_slice_hash"
  }

  case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      evalShingleHashes(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalShingleHashes($c, $n)")
    override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
    override def prettyName: String = "shingle_hashes"
  }

  case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      evalNgramHashes(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalNgramHashes($c, $n)")
    override protected def withNewChildInternal(c: Expression): NgramHashes = copy(child = c)
    override def prettyName: String = "ngram_hashes"
  }

  case class SortedLongIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Integer.valueOf(
        evalSortedLongIntersectCount(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Self.evalSortedLongIntersectCount($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "sorted_long_intersect_count"
  }

  // Typed inputs: the SQL-registered surface (dot_product(...) etc.) must
  // fail at ANALYSIS time on wrong-typed args, not with a runtime
  // ClassCastException from the eval helper.
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Double.valueOf(
        evalDotProduct(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Self.evalDotProduct($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "dot_product"
  }

  /** Squared L2 DISTANCE ||a-b||² as one left-to-right array pass — the
    * asymmetric-distance kernel for quantized ANN (ss12). Same sequential
    * fold as [[DotProduct]], so DuckDB's index-ordered `list_sum` mirrors
    * it bit-for-bit (the ss01 precedent). */
  case class SqL2Dist(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Double.valueOf(
        evalSqL2Dist(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Self.evalSqL2Dist($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "sq_l2_dist"
  }

  case class LongSqDist(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Long.valueOf(
        evalLongSqDist(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Self.evalLongSqDist($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "long_sqdist"
  }

  /** `pack_ints(array<bigint>) -> binary` — 4-byte big-endian packing of
    * int32-range longs (see [[evalPackInts]]): the ss22/ss23 re-rank
    * joins ship a feature vector on BOTH sides of every candidate row,
    * and packing halves that row width vs the 8-byte array form (r16
    * verdict #2 — the 100k soak's only memory wall). */
  case class PackInts(child: Expression) extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
    override def dataType: DataType = BinaryType
    override def nullSafeEval(input: Any): Any =
      evalPackInts(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalPackInts($c)")
    override protected def withNewChildInternal(c: Expression): PackInts = copy(child = c)
    override def prettyName: String = "pack_ints"
  }

  /** `packed_sqdist(binary, binary) -> bigint` — [[LongSqDist]] over two
    * [[PackInts]] binaries, value-identical to long_sqdist on the
    * unpacked arrays (see [[evalBinIntSqDist]]). */
  case class BinIntSqDist(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
    override def dataType: DataType = LongType
    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Long.valueOf(
        evalBinIntSqDist(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Self.evalBinIntSqDist($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "packed_sqdist"
  }

  case class L2Norm(child: Expression) extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any =
      java.lang.Double.valueOf(evalL2Norm(input.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalL2Norm($c)")
    override protected def withNewChildInternal(c: Expression): L2Norm = copy(child = c)
    override def prettyName: String = "l2_norm"
  }

  /** Squared L2 norm: one array pass, no sqrt — the optimizer rewrites
    * `dot_product(x, x)` to this (see [[graft.GraftExtensions]]), halving
    * the array reads in e.g. the PQ distance expansion ||a-b||². */
  case class L2NormSquared(child: Expression) extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any =
      java.lang.Double.valueOf(evalL2NormSquared(input.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalL2NormSquared($c)")
    override protected def withNewChildInternal(c: Expression): L2NormSquared = copy(child = c)
    override def prettyName: String = "l2_norm_squared"
  }

  /** Content-defined chunks of a text column — see [[evalCdcChunks]]. */
  case class CdcChunks(child: Expression, maskBits: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(maskBits >= 1 && maskBits <= 20, s"maskBits out of range: $maskBits")
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("off", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false),
      StructField("hash", LongType, nullable = false))), containsNull = false)
    override def nullSafeEval(input: Any): Any =
      evalCdcChunks(input.asInstanceOf[UTF8String], maskBits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalCdcChunks($c, $maskBits)")
    override protected def withNewChildInternal(c: Expression): CdcChunks = copy(child = c)
    override def prettyName: String = "cdc_chunks"
  }

  case class HyperplaneLsh(child: Expression, nPlanes: Int, offset: Int = 0)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any =
      java.lang.Integer.valueOf(evalHyperplaneLsh(input.asInstanceOf[ArrayData], nPlanes, offset))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Self.evalHyperplaneLsh($c, $nPlanes, $offset)")
    override protected def withNewChildInternal(c: Expression): HyperplaneLsh = copy(child = c)
    override def prettyName: String = "hyperplane_lsh"
  }

  // ---------- Column-level API ----------

  private def B = ColumnBridge
  def wordShingles(c: Column, n: Int = 3): Column = B.column(WordShingles(B.expression(c), n))
  def minhashSig(c: Column, k: Int): Column = B.column(MinHashSig(B.expression(c), k))
  def simhash64(c: Column): Column = B.column(SimHash64(B.expression(c)))
  def arrayIntersectCount(a: Column, b: Column): Column =
    B.column(ArrayIntersectCount(B.expression(a), B.expression(b)))
  def sigAgreement(a: Column, b: Column): Column =
    B.column(SigAgreement(B.expression(a), B.expression(b)))
  def longSliceHash(c: Column, from: Int, len: Int): Column =
    B.column(LongSliceHash(B.expression(c), from, len))
  def shingleHashes(c: Column, n: Int = 3): Column = B.column(ShingleHashes(B.expression(c), n))
  def ngramHashes(c: Column, n: Int = 3): Column = B.column(NgramHashes(B.expression(c), n))
  def sortedLongIntersectCount(a: Column, b: Column): Column =
    B.column(SortedLongIntersectCount(B.expression(a), B.expression(b)))
  def hyperplaneLsh(c: Column, nPlanes: Int, offset: Int = 0): Column =
    B.column(HyperplaneLsh(B.expression(c), nPlanes, offset))
  def sqL2Dist(a: Column, b: Column): Column =
    B.column(SqL2Dist(B.expression(a), B.expression(b)))
  def longSqDist(a: Column, b: Column): Column =
    B.column(LongSqDist(B.expression(a), B.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    B.column(DotProduct(B.expression(a), B.expression(b)))
  def l2Norm(c: Column): Column = B.column(L2Norm(B.expression(c)))
  def l2NormSquared(c: Column): Column = B.column(L2NormSquared(B.expression(c)))
  def cdcChunks(c: Column, maskBits: Int = 6): Column =
    B.column(CdcChunks(B.expression(c), maskBits))
}
