package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Primitive cores of the sketch pipeline, shared by the native
  * expressions below and callable from generated code. The row UDFs in
  * [[Text]] remain the registered SQL twins and the spec reference —
  * SketchExprSpec pins bit-parity; these expressions exist because the
  * dedup family evaluates them on EVERY document and a ScalaUDF pays
  * UTF8String⇄String and ArrayData⇄Seq[Long] conversions per row plus
  * the codegen break.
  */
object SketchNative {

  private val M61 = (1L << 61) - 1

  /** Distinct n-shingle gram64 hashes straight off the normalized BYTES:
    * after [[TextNative.normalize]] words are single-space separated, so
    * every shingle is a CONTIGUOUS byte slice [wordStart(i),
    * wordEnd(i+n-1)) — no split, no per-word allocation. Dedup is by
    * shingle CONTENT (UTF8String views over the slice), first-occurrence
    * order, exactly like `Text.shingleSet`; the hash is the Mersenne-61
    * roll over the slice bytes (== chars: the normalized alphabet is
    * ASCII) finished with mix64 — bit-identical to
    * `Text.gram64(shingle)`.
    */
  def shingleGramHashes(u: UTF8String, n: Int): ArrayData = {
    val norm = TextNative.normalize(u).getBytes
    var wc = if (norm.length == 0) 0 else 1
    var i = 0
    while (i < norm.length) { if (norm(i) == ' ') wc += 1; i += 1 }
    if (wc < n) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val starts = new Array[Int](wc)
    val ends = new Array[Int](wc)
    var w = 0
    starts(0) = 0
    i = 0
    while (i < norm.length) {
      if (norm(i) == ' ') { ends(w) = i; w += 1; starts(w) = i + 1 }
      i += 1
    }
    ends(w) = norm.length
    val seen = new java.util.HashSet[UTF8String]()
    val out = new Array[Long](wc - n + 1)
    var k = 0
    i = 0
    while (i + n <= wc) {
      val s = starts(i)
      val e = ends(i + n - 1)
      if (seen.add(UTF8String.fromBytes(norm, s, e - s))) {
        var h = 0L
        var j = s
        while (j < e) { h = (Text.mulMod61(h, 257L) + norm(j)) % M61; j += 1 }
        out(k) = Text.mix64(h)
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }

  /** gram64 hash of EVERY w-word window at stride 1 (one slot per start
    * position, duplicates kept — unlike [[shingleGramHashes]] this feeds
    * positional substring dedup, where occurrence order IS the result).
    * O(n) total via prefix polynomial rolls: pre(j) = roll61 of the
    * first j normalized chars, pow(k) = 257^k mod M61, and each window
    * [s, e) evaluates as pre(e) − pre(s)·pow(e−s) — one subtract-multiply
    * per window instead of re-rolling e−s chars, so hashing cost is
    * independent of the window width. Bit-identical to
    * `Text.gram64(windowString)` (spec-pinned).
    */
  def wordWindowHashes(u: UTF8String, w: Int): ArrayData = {
    val norm = TextNative.normalize(u).getBytes
    var wc = if (norm.length == 0) 0 else 1
    var i = 0
    while (i < norm.length) { if (norm(i) == ' ') wc += 1; i += 1 }
    if (wc < w) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val starts = new Array[Int](wc)
    val ends = new Array[Int](wc)
    var k = 0
    starts(0) = 0
    i = 0
    while (i < norm.length) {
      if (norm(i) == ' ') { ends(k) = i; k += 1; starts(k) = i + 1 }
      i += 1
    }
    ends(k) = norm.length
    val n = norm.length
    val pre = new Array[Long](n + 1)
    val pow = new Array[Long](n + 1)
    pow(0) = 1L
    i = 0
    while (i < n) {
      pre(i + 1) = (Text.mulMod61(pre(i), 257L) + norm(i)) % M61
      pow(i + 1) = Text.mulMod61(pow(i), 257L)
      i += 1
    }
    val out = new Array[Long](wc - w + 1)
    i = 0
    while (i + w <= wc) {
      val s = starts(i)
      val e = ends(i + w - 1)
      val sub = (pre(e) - Text.mulMod61(pre(s), pow(e - s))) % M61
      out(i) = Text.mix64(if (sub < 0) sub + M61 else sub)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def minhashSig(a: ArrayData): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(Text.minhashSignature(a.toLongArray))

  def bandHashes(a: ArrayData): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(Text.bandHashesFromSig(a.toLongArray))

  def simhash64(a: ArrayData): Long = Text.simhash64(a.toLongArray)

  /** word → its d count-min bucket ids in one pass: the Mersenne-61
    * roll over the word's bytes (== chars: the normalized alphabet is
    * ASCII, same contract as [[shingleGramHashes]]) finished with
    * mix64 — bit-identical to `Text.gram64(word)` — then each hash row
    * r derives its bucket from the shared hash plus its splitmix64
    * stream draw at seed 11, exactly `TextAnalysis.allBucketsUdf`.
    */
  def cmsBuckets(u: UTF8String, d: Int, bits: Int): ArrayData = {
    val b = u.getBytes
    var h = 0L
    var i = 0
    while (i < b.length) { h = (Text.mulMod61(h, 257L) + b(i)) % M61; i += 1 }
    val g = Text.mix64(h)
    val out = new Array[Int](d)
    var r = 0
    while (r < d) {
      out(r) =
        (Text.mix64(g + Text.splitmix64(11L, r.toLong)) >>> (64 - bits)).toInt
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** word → its count-min bucket ids inside whole-stage codegen. The
  * STREAMING sketch (`q_stream_cms`) evaluates this per word OCCURRENCE
  * (corpus rate — the batch row reads the staged grid and pays only per
  * vocab word), and as a ScalaUDF it was the one remaining codegen
  * break + UTF8String⇄String/ArrayData⇄Array conversion pair on that
  * path (r20 "not yet optimized" item 1). `TextAnalysis.allBucketsUdf`
  * stays as the registered spec-reference twin; SketchExprSpec pins
  * bit-parity.
  */
case class CmsBuckets(child: Expression, d: Int, bits: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cms_buckets"

  override def nullSafeEval(input: Any): Any =
    SketchNative.cmsBuckets(input.asInstanceOf[UTF8String], d, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchNative.cmsBuckets($c, $d, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsBuckets {
  def apply(c: Column, d: Int, bits: Int): Column =
    ColumnBridge.column(CmsBuckets(ColumnBridge.expression(c), d, bits))
}

/** text → gram64 hashes of its distinct 3-shingles, inside whole-stage
  * codegen (the scan-stage primitive of every sketch dedup query).
  */
case class ShingleGramHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    SketchNative.shingleGramHashes(input.asInstanceOf[UTF8String], 3)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchNative.shingleGramHashes($c, 3)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleGramHashes {
  def apply(c: Column): Column =
    ColumnBridge.column(ShingleGramHashes(ColumnBridge.expression(c)))
}

/** text → gram64 of every w-word window at stride 1, positional (slot i
  * = window starting at word i+1). The O(n) prefix-roll core of
  * `dedup_substring`'s candidate stage.
  */
case class WordWindowHashes(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_window_hashes"

  override def nullSafeEval(input: Any): Any =
    SketchNative.wordWindowHashes(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchNative.wordWindowHashes($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordWindowHashes {
  def apply(c: Column, w: Int): Column =
    ColumnBridge.column(WordWindowHashes(ColumnBridge.expression(c), w))
}

/** gram-hash array → 128-perm minhash signature (primitive loop, no
  * Seq[Long] boxing).
  */
case class MinhashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    SketchNative.minhashSig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchNative.minhashSig($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSig {
  def apply(c: Column): Column =
    ColumnBridge.column(MinhashSig(ColumnBridge.expression(c)))
}

/** minhash signature → 16 LSH band hashes. */
case class MinhashBands(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_bands"

  override def nullSafeEval(input: Any): Any =
    SketchNative.bandHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchNative.bandHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashBands {
  def apply(c: Column): Column =
    ColumnBridge.column(MinhashBands(ColumnBridge.expression(c)))
}

/** gram-hash array → 64-bit simhash (per-bit majority vote). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    SketchNative.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchNative.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def apply(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
}
