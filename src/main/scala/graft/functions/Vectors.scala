package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure Catalyst
  * expressions (`zip_with` + `aggregate` fold): codegen'd, no UDF, no
  * shuffle.
  *
  * Determinism: all arithmetic is a sequential left fold in DOUBLE —
  * replicated exactly in the DuckDB oracles via
  * list_sum(list_transform(list_zip(...))) on double-cast lists, which
  * the parity probe showed is bit-identical.
  */
object Vectors {

  /** Declarative fold form — kept as documentation of the semantics the
    * fast path must match. Higher-order functions are interpreted (not
    * codegen'd) and cost ~10 µs per 64-dim pair, so the hot queries use
    * [[dot]] below, which performs the IDENTICAL sequential double left
    * fold as a primitive loop (~50× faster, bit-equal result).
    */
  def dotExpr(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** The hot-path form: a native codegen'd Catalyst expression
    * ([[FloatDotProduct]]) — same sequential double fold as [[dotExpr]],
    * but a primitive Java loop over columnar ArrayData that stays inside
    * whole-stage codegen (no Seq[Float] boxing, no codegen break).
    */
  def dot(a: Column, b: Column): Column = FloatDotProduct(a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Deterministic random-hyperplane LSH keys: `tables` keys per vector,
    * each a `bits`-bit sign pattern tagged with its table index
    * (Charikar, STOC 2002). Plane entries are uniform [-1, 1) drawn from
    * the splitmix64 stream at `seed` (plane index × dim + component):
    * a symmetric sub-gaussian substitute for the classical gaussian
    * planes (Achlioptas, PODS'01 shows sign-LSH quality survives such
    * simple symmetric draws) whose EXACT dyadic construction
    * ((z >>> 11) / 2^52 − 1) replays bit-for-bit in the DuckDB oracle —
    * gaussians would need transcendental Box–Muller, which never
    * hash-matches across engines.
    */
  def lshKeys(dim: Int, tables: Int, bits: Int, seed: Long = 7L): Column => Column = {
    val planes = Array.tabulate(tables * bits, dim)((pl, i) =>
      (Text.splitmix64(seed, pl.toLong * dim + i) >>> 11).toDouble /
        (1L << 52).toDouble - 1.0)
    val f = udf { (emb: Seq[Float]) =>
      val v = emb.toArray
      Array.tabulate(tables) { t =>
        var key = 0L
        var b = 0
        while (b < bits) {
          val p = planes(t * bits + b)
          var s = 0.0
          var i = 0
          while (i < v.length && i < dim) { s += p(i) * v(i); i += 1 }
          if (s >= 0) key |= (1L << b)
          b += 1
        }
        (t.toLong << 32) | key
      }
    }
    (c: Column) => f(c)
  }
}
