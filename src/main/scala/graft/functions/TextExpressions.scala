package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level core of the canonical normalize (lowercase, non-[a-z0-9]
  * → space, collapse runs, trim), operating directly on UTF8String.
  *
  * Equivalence with [[Text.normalizeString]] (and hence the Column
  * `normalize` and the DuckDB oracle regexes): `toLowerCase` is the
  * same UTF8String op Spark's `lower` uses, and the kept alphabet
  * [a-z0-9 ] is single-byte in both UTF-8 and UTF-16 — every byte of a
  * multi-byte character has the high bit set, so it is "non-alnum" at
  * the byte level exactly as each of its UTF-16 chars is at the char
  * level, and either way a run collapses to one space.
  * TextFastPathSpec pins bit-equality on testdata + unicode edge cases.
  */
object TextNative {
  def normalize(u: UTF8String): UTF8String = {
    val in = u.toLowerCase.getBytes
    val out = new Array[Byte](in.length)
    var n = 0
    var pending = false
    var i = 0
    while (i < in.length) {
      val b = in(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pending && n > 0) { out(n) = ' '; n += 1 }
        out(n) = b
        n += 1
        pending = false
      } else pending = true
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }
}

/** Native codegen'd form of the canonical text normalize — the hottest
  * primitive of the documents suite (exact dedup, fingerprints,
  * tokenization, curation all normalize every document). The Scala-UDF
  * fast path ([[Text.normalizeFastUdf]]) already avoided the
  * triple-regex cost but still breaks whole-stage codegen and pays the
  * UDF's UTF8String⇄String conversion per row; this expression stays
  * inside the codegen stage and works byte-level on UTF8String.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_normalize"

  override def nullSafeEval(input: Any): Any =
    TextNative.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNative.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  /** Column-API entry point: codegen'd canonical normalize. */
  def apply(c: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(c)))
}
