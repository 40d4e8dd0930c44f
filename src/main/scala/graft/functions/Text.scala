package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by dedup + text-analysis operators.
  * Everything here is a `functions._` composition (whole-stage codegen,
  * no shuffle); the two sketch functions (minhash bands, simhash) are
  * per-row Scala UDFs over pre-hashed shingle arrays — per-row CPU only,
  * never a distribution concern.
  */
object Text {

  /** lowercase, strip non-alphanumerics, collapse whitespace — the
    * canonical form used by every dedup/fingerprint operator. Kept
    * DuckDB-replicable: regexp_replace(lower) twice + trim.
    */
  def normalize(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  def words(c: Column): Column = split(normalize(c), " ")

  /** Native codegen'd form of [[normalize]] — identical output
    * (TextFastPathSpec pins bit-equality), evaluated byte-level inside
    * whole-stage codegen (see [[NormalizeText]]). The preferred form in
    * every operator; [[normalize]] remains the declarative semantics
    * statement and [[normalizeFastUdf]] the UDF twin registered for the
    * pure-SQL surface.
    */
  def normalizeFast(c: Column): Column = NormalizeText(c)

  /** Fast form of [[words]]: identical output at ~µs/row instead of
    * ~ms/row. Use for per-document tokenization in queries; [[words]]
    * remains the declarative semantics statement.
    */
  def wordsFast(c: Column): Column = split(normalizeFast(c), " ")

  /** Word n-grams as an array column (empty when the doc is shorter than n).
    *
    * Built from n shifted `slice`s folded with `zip_with`, NOT
    * per-index `element_at` inside `transform`: higher-order functions are
    * interpreted (no codegen), and a per-element `element_at(words, i)`
    * re-evaluates the whole words subtree (regex normalize + split) for
    * every element — measured ~7 ms/row at 100 words/doc. The slice form
    * evaluates the words subtree n+1 times per ROW instead of 3n times
    * per ELEMENT (≈900× fewer regex evals at n=3, doc=100 words).
    */
  def shingles(wordsCol: Column, n: Int): Column = {
    val len = size(wordsCol) - (n - 1)
    val shifted = (0 until n).map(k => slice(wordsCol, lit(k + 1), len))
    val joined = shifted.reduce((a, b) => zip_with(a, b, (x, y) => concat_ws(" ", x, y)))
    when(size(wordsCol) >= n, joined).otherwise(array().cast("array<string>"))
  }

  /** xxhash64 of each shingle — the historical Column-path numeric form.
    * Round 10 moved the SKETCH base hash to [[gram64]] (splitmix64
    * finalizer over the Mersenne-61 rolling hash) so the MinHash/SimHash
    * sketches replay bit-exactly in the DuckDB oracle; this Column form
    * stays as the xx64 parity documentation.
    */
  def shingleHashes(shinglesCol: Column): Column =
    transform(shinglesCol, s => xxhash64(s))

  // ---- Fast single-pass shingle path ---------------------------------
  //
  // The Column pipeline above (normalize → split → slice/zip_with →
  // transform(xxhash64) → array_distinct) is the declarative statement of
  // the semantics, but every step is an interpreted higher-order function:
  // measured ~0.8 ms/row on 300-char docs, and it dominates the dedup
  // queries. The UDFs below compute the IDENTICAL result in one primitive
  // pass (~µs/row): same lowercase (UTF8String.toLowerCase == Spark
  // `lower`), same char class, same collapse/trim, same first-occurrence
  // distinct order, same xxhash64 seed-42 values
  // (XXH64.hashUTF8String == Spark `xxhash64`). TextFastPathSpec asserts
  // bit-equality against the Column path on real testdata docs.

  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.types.UTF8String

  /** Scala replication of [[normalize]]: lowercase, any char outside
    * [a-z0-9 ] becomes a space, collapse space runs, trim.
    */
  def normalizeString(s: String): String = {
    val lowered = UTF8String.fromString(s).toLowerCase.toString
    val sb = new java.lang.StringBuilder(lowered.length)
    var pendingSpace = false
    var i = 0
    while (i < lowered.length) {
      val c = lowered.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        sb.append(c)
        pendingSpace = false
      } else pendingSpace = true
      i += 1
    }
    sb.toString
  }

  /** Fast path of [[normalize]] — bit-equal per TextFastPathSpec; used by
    * every operator that normalizes full documents (the triple regex costs
    * ~0.8 ms/row on 300-char docs, this is ~µs/row).
    */
  val normalizeFastUdf = udf((s: String) => if (s == null) null else normalizeString(s))

  /** Distinct word n-grams of the normalized text, first-occurrence order
    * (== array_distinct(shingles(words(text), n))).
    */
  def shingleSet(text: String, n: Int): Array[String] = {
    val norm = normalizeString(text)
    if (norm.isEmpty) return Array.empty
    val ws = norm.split(' ')
    if (ws.length < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i + n <= ws.length) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < n) { if (k > 0) sb.append(' '); sb.append(ws(i + k)); k += 1 }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** Broadcastable FINGERPRINT probe set: the serialized form is the
    * raw primitive [[gram64]] array (8 BYTES PER GRAM regardless of
    * gram length — a 3.6M-gram eval suite is 29 MB where the string
    * `Set` is a GB-class driver-built object: collect + per-string
    * hashing + boxed set nodes + a corpus-scaled broadcast, the
    * driver-memory anti-pattern measured as ~half the streaming
    * decontam gate's 100×-fixture wall). Membership runs on a
    * transient OPEN-ADDRESSING table (power-of-2 capacity ≥ 2×n,
    * linear probing) built once per JVM on first use: ~1 cache miss
    * per probe, where binary search over the 29 MB array paid ~22
    * random misses per window — the probe is the per-window hot path
    * of both streaming contam gates. Fingerprints are already
    * mix64-avalanched, so the slot hash is a cheap fold of the high
    * bits.
    */
  final class GramHashProbe(val keys: Array[Long]) extends Serializable {
    // 2^29 keys = 4.3 GB serialized — past any practical broadcast; the
    // explicit bound keeps the capacity doubling below Int overflow
    // (cap ≤ 2^30) and the table under a 0.5 load factor (r14 review:
    // the unguarded `keys.length * 2` went negative at ~2^30 keys and
    // the insert loop span forever on a saturated table)
    require(keys.length <= (1 << 29),
      s"GramHashProbe holds at most 2^29 fingerprints, got ${keys.length}")
    @transient private lazy val state: (Array[Long], Int, Boolean) = {
      var cap = 16
      while (cap < keys.length * 2) cap <<= 1
      val t = new Array[Long](cap)
      val m = cap - 1
      var z = false
      var i = 0
      while (i < keys.length) {
        val h = keys(i)
        if (h == 0L) z = true
        else {
          var p = (h ^ (h >>> 32)).toInt & m
          while (t(p) != 0L && t(p) != h) p = (p + 1) & m
          t(p) = h
        }
        i += 1
      }
      (t, m, z)
    }
    def contains(h: Long): Boolean = {
      val (t, m, z) = state
      if (h == 0L) return z
      var p = (h ^ (h >>> 32)).toInt & m
      while (t(p) != 0L) {
        if (t(p) == h) return true
        p = (p + 1) & m
      }
      false
    }
  }

  /** FUSED shingle-and-FINGERPRINT-probe: does ANY word n-gram of the
    * normalized text have a [[gram64]] fingerprint in `probe`? Builds
    * each window string exactly as [[shingleSet]] does but probes as
    * it goes and EARLY-EXITS on the first hit — contaminated docs
    * short-circuit, and no doc materializes its distinct-shingle array
    * for a second UDF (r13 What's-wrong #3); duplicate windows probe
    * twice instead of paying the dedup hash (membership is
    * idempotent). See [[GramHashProbe]] for the memory story. The trade: membership is fingerprint equality, not
    * string equality — a false positive needs a 64-bit [[gram64]]
    * collision between an arrival gram and an eval gram (expected
    * collisions ~|eval|·|grams|/2⁶⁴; deterministic when one occurs,
    * and the DuckDB oracle replays the SAME fingerprints, so the hash
    * gate compares like with like). TextFastPathSpec pins the
    * equivalence with `shingleSet(text, n).exists(set)` on
    * collision-free corpora.
    */
  def anyGramHashIn(text: String, n: Int, probe: GramHashProbe): Boolean = {
    val norm = normalizeString(text)
    if (norm.isEmpty) return false
    val ws = norm.split(' ')
    if (ws.length < n) return false
    var i = 0
    while (i + n <= ws.length) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < n) { if (k > 0) sb.append(' '); sb.append(ws(i + k)); k += 1 }
      if (probe.contains(gram64(sb.toString))) return true
      i += 1
    }
    false
  }

  /** Count of DISTINCT word n-grams whose [[gram64]] fingerprint sits in
    * `probe` — the counting twin of [[anyGramHashIn]] (distinct gram
    * STRINGS, as [[shingleSet]] defines them, so two distinct grams
    * colliding to one fingerprint count separately — exactly what the
    * SQL replay's `COUNT(*)` over distinct-gram rows joined by
    * fingerprint computes).
    */
  def countGramHashesIn(text: String, n: Int, probe: GramHashProbe): Long = {
    val sh = shingleSet(text, n)
    var c = 0L
    var i = 0
    while (i < sh.length) {
      if (probe.contains(gram64(sh(i)))) c += 1L
      i += 1
    }
    c
  }

  /** Spark-`xxhash64`-identical string hash (XXH64, seed 42). */
  def xx64(s: String): Long = XXH64.hashUTF8String(UTF8String.fromString(s), 42L)

  /** text → distinct 3-shingles (fast path of the Column pipeline). */
  val shinglesFastUdf = udf((text: String) => shingleSet(text, 3))

  /** text → distinct n-shingles for arbitrary n (same fast path). */
  def shinglesNFastUdf(n: Int) = udf((text: String) => shingleSet(text, n))

  // ---- splitmix64-seeded sketch hashing ------------------------------
  //
  // Round 10: the sketch base hash moved from xxhash64 to
  // mix64(roll61(shingle)) — the splitmix64 FINALIZER (Steele/Lea/
  // Flood, "Fast Splittable Pseudorandom Number Generators", OOPSLA'14;
  // the same mixer `mm_simhash` already replays) applied to the
  // Mersenne-61 rolling polynomial hash (`text_rollhash`'s closed-form-
  // replayable fingerprint). Statistically equivalent avalanche for
  // sketching, and — unlike xxhash64's lane/length-dependent byte
  // schedule — plain 2^64/2^61 modular arithmetic, so every downstream
  // sketch (MinHash sigs, band folds, SimHash votes, LSH planes)
  // replays bit-exactly in DuckDB HUGEINT and the rows flip from
  // spec-only to hash-oracled under the driver's hard gate.

  val SmGolden: Long = 0x9E3779B97F4A7C15L // splitmix64 stream increment

  /** splitmix64 finalizer: xor-shift/multiply avalanche, mod 2^64. */
  def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Draw i of the splitmix64 stream at `seed` — the deterministic
    * parameter source for minhash perms and LSH hyperplanes.
    */
  def splitmix64(seed: Long, i: Long): Long = mix64(seed + (i + 1L) * SmGolden)

  /** Sketch base hash of one shingle: Mersenne-61 rolling hash, then the
    * splitmix64 finalizer for avalanche. Never 0-colliding with empty
    * input in practice: shingles are non-empty normalized word trigrams.
    */
  def gram64(s: String): Long = mix64(rollingHash(s))

  /** Column form of [[gram64]] — fingerprints a gram STRING column
    * (e.g. the staged eval-gram dump) with the sketch base hash.
    */
  val gram64Udf = udf((s: String) => gram64(s))

  /** text → gram64 of each distinct 3-shingle — the numeric form fed to
    * the MinHash/SimHash sketches (fast path).
    */
  val shingleHashesFastUdf = udf { (text: String) =>
    val sh = shingleSet(text, 3)
    val out = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) { out(i) = gram64(sh(i)); i += 1 }
    out
  }

  // ---- MinHash --------------------------------------------------------

  val MinhashPerms = 128
  val LshBands = 16
  val LshRows = 8 // MinhashPerms / LshBands
  private val MersennePrime = 2147483647L // 2^31-1

  /** Deterministic permutation parameters from the splitmix64 stream at
    * seed 42 (draw 2p → a, draw 2p+1 → b): 31-bit so a*x+b stays in 63
    * bits, a ∈ [1, M), b ∈ [0, M). Integer-derivable, so the DuckDB
    * oracle regenerates them instead of trusting 256 literals.
    */
  private val (permA, permB): (Array[Long], Array[Long]) = (
    Array.tabulate(MinhashPerms)(p =>
      (splitmix64(42L, 2L * p) >>> 33) % (MersennePrime - 1) + 1),
    Array.tabulate(MinhashPerms)(p =>
      (splitmix64(42L, 2L * p + 1) >>> 33) % MersennePrime))

  /** 128-perm minhash signature of a shingle-hash array. */
  def minhashSignature(hashes: Array[Long]): Array[Long] = {
    val sig = Array.fill(MinhashPerms)(Long.MaxValue)
    var i = 0
    while (i < hashes.length) {
      val x = hashes(i) >>> 33 // 31-bit universe
      var p = 0
      while (p < MinhashPerms) {
        val h = (permA(p) * x + permB(p)) % MersennePrime
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    sig
  }

  /** 16 LSH band hashes (8 minhash rows per band) from a signature. */
  def bandHashesFromSig(sig: Array[Long]): Array[Long] = {
    Array.tabulate(LshBands) { b =>
      var h = 1125899906842597L // deterministic FNV-ish fold of the band
      var r = 0
      while (r < LshRows) {
        h = h * 1099511628211L + sig(b * LshRows + r)
        r += 1
      }
      h
    }
  }

  /** Estimated Jaccard from two signatures (fraction of agreeing perms). */
  def minhashJaccard(a: Array[Long], b: Array[Long]): Double = {
    var agree = 0
    var i = 0
    while (i < MinhashPerms) { if (a(i) == b(i)) agree += 1; i += 1 }
    agree.toDouble / MinhashPerms
  }

  // ---- SimHash --------------------------------------------------------

  /** 64-bit simhash of a shingle-hash array: per-bit majority vote. */
  def simhash64(hashes: Array[Long]): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  def minhashBandHashes(hashes: Array[Long]): Array[Long] =
    bandHashesFromSig(minhashSignature(hashes))

  val bandsFromSigUdf =
    udf((sig: Seq[Long]) => bandHashesFromSig(sig.toArray))
  val minhashSigUdf =
    udf((hashes: Seq[Long]) => minhashSignature(hashes.toArray))
  val simhashUdf =
    udf((hashes: Seq[Long]) => simhash64(hashes.toArray))

  // ---- Rolling hash fingerprint --------------------------------------

  /** 61-bit rolling polynomial hash of the normalized text (Rabin–Karp
    * style, base 257 mod 2^61-1) — the order-sensitive fingerprint
    * companion to md5.
    */
  private val Mersenne61 = (1L << 61) - 1

  /** (a*b) mod 2^61-1 via the Mersenne fold: with x = a·b in 128 bits,
    * x ≡ (x & M) + (x >> 61) (mod M) because 2^61 ≡ 1.
    */
  private[functions] def mulMod61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (lo & Mersenne61) + ((hi << 3) | (lo >>> 61))
    while (r >= Mersenne61) r -= Mersenne61
    r
  }

  def rollingHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (mulMod61(h, 257L) + s.charAt(i).toLong) % Mersenne61
      i += 1
    }
    h
  }

  val rollingHashUdf = udf((s: String) => rollingHash(s))
}
