package graft.operators

/** DuckDB replay fragments for the splitmix64-seeded sketches.
  *
  * Round 10 moved every sketch seed off xxhash64 (whose lane/length
  * byte schedule has no SQL form) onto two primitives that DO replay
  * bit-exactly in DuckDB integer arithmetic — already proven separately
  * by `text_rollhash` (Mersenne-61 closed polynomial form) and
  * `mm_simhash` (splitmix64 finalizer in HUGEINT mod 2^64):
  *
  *  - shingle gram hash  = mix64(roll61(shingle))      [Text.gram64]
  *  - minhash perms      = splitmix64 stream at seed 42 [Text.permA/B]
  *  - LSH plane entries  = splitmix64 stream at seed 7  [Vectors.lshKeys]
  *
  * The fragments below rebuild those pipelines in SQL so the previously
  * spec-only sketch rows (`dedup_minhash`, `dedup_simhash`,
  * `dedup_delta_lsh`, `ann_lsh`, `dedup_embed_lsh`) hash-verify under
  * the driver's DuckDB gate. Conventions (see the two proven oracles):
  * HUGEINT carries every mod-2^64 value; `x // 2^k` is the unsigned
  * right shift; 64×64→64 multiplication splits into 32-bit halves so no
  * product exceeds 2^97; `AS MATERIALIZED` pins every multiply-consumed
  * CTE (DuckDB would otherwise re-derive the whole pipeline per
  * consumer).
  */
object SketchSql {

  private val M64 = "CAST(18446744073709551616 AS HUGEINT)" // 2^64
  private val M61 = "CAST(2305843009213693951 AS HUGEINT)" // 2^61 - 1
  private val C1 = "CAST(13787848793156543929 AS HUGEINT)" // 0xbf58476d1ce4e5b9
  private val C2 = "CAST(10723151780598845931 AS HUGEINT)" // 0x94d049bb133111eb
  private val Golden = "CAST(11400714819323198485 AS HUGEINT)" // 0x9e3779b97f4a7c15

  /** CTE chain applying the splitmix64 finalizer to column `col` of
    * `src` (a HUGEINT in [0, 2^64)), carrying `keys` through unchanged.
    * Final table: `<prefix>mix(keys..., x)`.
    */
  def mix64Ctes(prefix: String, src: String, keys: String, col: String): String = s"""
    ${prefix}m1 AS (SELECT $keys, xor($col, $col // 1073741824) AS x FROM $src),
    ${prefix}m2 AS (SELECT $keys, ((x % 4294967296) * $C1
            + (((x // 4294967296) * $C1) % 4294967296) * 4294967296) % $M64 AS x
          FROM ${prefix}m1),
    ${prefix}m3 AS (SELECT $keys, xor(x, x // 134217728) AS x FROM ${prefix}m2),
    ${prefix}m4 AS (SELECT $keys, ((x % 4294967296) * $C2
            + (((x // 4294967296) * $C2) % 4294967296) * 4294967296) % $M64 AS x
          FROM ${prefix}m3),
    ${prefix}mix AS (SELECT $keys, xor(x, x // 2147483648) AS x FROM ${prefix}m4)"""

  /** documents → `grams(doc_id, g)`: the gram64 hash of every distinct
    * normalized 3-shingle (one row per shingle; docs with < 3 words get
    * no rows — the Spark side's `size(hashes) > 0` filter). Requires
    * `WITH RECURSIVE` at the head of the enclosing query (the 257^k
    * power table builds by list doubling, as in `rollhashSql`).
    */
  val gramsCtes: String = s"""
    docs AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS t FROM documents),
    wrds AS (SELECT doc_id, string_split(t, ' ') AS w FROM docs),
    sidx AS (SELECT doc_id, w, unnest(range(1, greatest(len(w) - 1, 1))) AS i FROM wrds),
    sh AS MATERIALIZED (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM sidx),
    maxn AS (SELECT max(length(s)) AS mx FROM sh),
    powlist AS (
      SELECT [CAST(1 AS HUGEINT)] AS ps, CAST(257 AS HUGEINT) AS mult, 1 AS sz
      UNION ALL
      SELECT ps || list_transform(ps, x -> (x * mult) % $M61), (mult * mult) % $M61, sz * 2
      FROM powlist WHERE sz < (SELECT mx FROM maxn)
    ),
    pows AS MATERIALIZED (
      SELECT i - 1 AS k, ps[i] AS p
      FROM (SELECT ps FROM powlist ORDER BY sz DESC LIMIT 1),
           unnest(range(1, len(ps) + 1)) AS u(i)
    ),
    schars AS (SELECT doc_id, s, length(s) AS n, i, ascii(s[i]) AS c
               FROM sh, unnest(range(1, length(s) + 1)) AS u(i)),
    roll AS (SELECT doc_id, SUM((CAST(c AS HUGEINT) * p) % $M61) % $M61 AS r
             FROM schars JOIN pows ON pows.k = schars.n - schars.i
             GROUP BY doc_id, s),
    ${mix64Ctes("g", "roll", "doc_id", "r")},
    grams AS MATERIALIZED (SELECT doc_id, x AS g FROM gmix)"""

  /** grams → `sigs(doc_id, p, sig)`: the 128-perm minhash signature.
    * Perm parameters regenerate from the splitmix64 stream at seed 42
    * (draw 2p → a, 2p+1 → b) — derived, not trusted literals.
    */
  val minhashSigsCtes: String = s"""
    pbase AS (SELECT p, (42 + (2*p + 1) * $Golden) % $M64 AS za0,
                        (42 + (2*p + 2) * $Golden) % $M64 AS zb0
              FROM (SELECT unnest(range(0, 128)) AS p)),
    ${mix64Ctes("pa", "pbase", "p", "za0")},
    ${mix64Ctes("pb", "pbase", "p", "zb0")},
    perms AS MATERIALIZED (
      SELECT a.p, CAST((a.x // 8589934592) % 2147483646 AS BIGINT) + 1 AS pa,
             CAST((b.x // 8589934592) % 2147483647 AS BIGINT) AS pb
      FROM pamix a JOIN pbmix b USING (p)),
    sigs AS MATERIALIZED (
      SELECT g.doc_id, perms.p,
             MIN((perms.pa * CAST(g.g // 8589934592 AS BIGINT) + perms.pb) % 2147483647) AS sig
      FROM grams g CROSS JOIN perms
      GROUP BY g.doc_id, perms.p)"""

  /** sigs → `bands(doc_id, band_idx, band_hash)`: 16 bands × 8 rows,
    * FNV-ish left fold mod 2^64 (list_reduce == the Scala ascending
    * loop, init prepended).
    */
  val bandsCtes: String = s"""
    bands AS MATERIALIZED (
      SELECT doc_id, p // 8 AS band_idx,
             list_reduce(
               list_prepend(CAST(1125899906842597 AS HUGEINT),
                            list(CAST(sig AS HUGEINT) ORDER BY p)),
               (acc, s) -> (acc * 1099511628211 + s) % $M64) AS band_hash
      FROM sigs GROUP BY doc_id, p // 8)"""

  /** Per-pair signature agreement → est_jaccard, from a `cand(ida, idb)`
    * CTE; emits the final SELECT (filter ≥ 0.7, exact: k/128 is dyadic).
    */
  val jaccardSelect: String = """
    agree AS (
      SELECT c.ida, c.idb, SUM(CASE WHEN x.sig = y.sig THEN 1 ELSE 0 END) AS k
      FROM cand c
      JOIN sigs x ON x.doc_id = c.ida
      JOIN sigs y ON y.doc_id = c.idb AND y.p = x.p
      GROUP BY c.ida, c.idb)
    SELECT ida AS doc_id_a, idb AS doc_id_b,
           CAST(k AS DOUBLE) / 128 AS est_jaccard
    FROM agree WHERE CAST(k AS DOUBLE) / 128 >= 0.7e0"""

  /** CTE chain fingerprinting an arbitrary gram-string CTE
    * `src(keys..., s)` with [[graft.functions.Text.gram64]] —
    * roll61 (base-257 polynomial mod 2⁶¹−1 over the gram's chars, via
    * the same recursively-doubled 257^k power table as [[gramsCtes]])
    * then the splitmix64 finalizer. Final table: `<prefix>gh(keys...,
    * s, g)`. This is how an oracle replays a FINGERPRINT-probe gate
    * (the streaming decontam/audit rows' broadcast eval-gram arrays)
    * like with like: both engines compare the same 64-bit values, so
    * even a fingerprint collision reproduces identically. Requires
    * `WITH RECURSIVE` at the head of the enclosing query.
    */
  def gramHash64Ctes(prefix: String, src: String, keys: String): String = s"""
    ${prefix}maxn AS (SELECT max(length(s)) AS mx FROM $src),
    ${prefix}powlist AS (
      SELECT [CAST(1 AS HUGEINT)] AS ps, CAST(257 AS HUGEINT) AS mult, 1 AS sz
      UNION ALL
      SELECT ps || list_transform(ps, x -> (x * mult) % $M61), (mult * mult) % $M61, sz * 2
      FROM ${prefix}powlist WHERE sz < (SELECT mx FROM ${prefix}maxn)
    ),
    ${prefix}pows AS MATERIALIZED (
      SELECT i - 1 AS k, ps[i] AS p
      FROM (SELECT ps FROM ${prefix}powlist ORDER BY sz DESC LIMIT 1),
           unnest(range(1, len(ps) + 1)) AS u(i)
    ),
    ${prefix}schars AS (SELECT $keys, s, length(s) AS n, i, ascii(s[i]) AS c
               FROM $src, unnest(range(1, length(s) + 1)) AS u(i)),
    ${prefix}roll AS (SELECT $keys, s, SUM((CAST(c AS HUGEINT) * p) % $M61) % $M61 AS r
             FROM ${prefix}schars JOIN ${prefix}pows
               ON ${prefix}pows.k = ${prefix}schars.n - ${prefix}schars.i
             GROUP BY $keys, s),
    ${mix64Ctes(s"${prefix}g", s"${prefix}roll", s"$keys, s", "r")},
    ${prefix}gh AS MATERIALIZED (SELECT $keys, s, x AS g FROM ${prefix}gmix)"""

  /** LSH plane/bucket replay over the normalized-embedding table `src`
    * (default `n`, Similarity's `duckEmb` prefix; callers needing a
    * filtered corpus — e.g. the kNN-graph rows' zero-norm guard — pass
    * their own CTE name): emits `buck(vec_id, bucket)`
    * with bucket = (table << 32) | sign-bit key, exactly
    * `Vectors.lshKeys(dim=64, tables, bits, seed)`. Plane entries are
    * the exact dyadic uniforms ((z >>> 11) / 2^52 − 1); the plane·vec
    * dot is the same list_sum double fold every cosine oracle uses.
    */
  def lshBucketCtes(tables: Int, bits: Int, seed: Long,
      src: String = "n"): String = s"""
    lpidx AS (SELECT pl, i, ($seed + (pl * 64 + i + 1) * $Golden) % $M64 AS z0
              FROM (SELECT unnest(range(0, ${tables * bits})) AS pl),
                   unnest(range(0, 64)) AS u(i)),
    ${mix64Ctes("lp", "lpidx", "pl, i", "z0")},
    planes AS MATERIALIZED (
      SELECT pl, list(CAST(x // 2048 AS DOUBLE) / 4503599627370496e0 - 1e0 ORDER BY i) AS wl
      FROM lpmix GROUP BY pl),
    sdot AS (SELECT $src.vec_id, p.pl,
               list_sum(list_transform(list_zip(p.wl, $src.emb), z -> z[1]*z[2])) AS s
             FROM $src CROSS JOIN planes p),
    buck AS MATERIALIZED (
      SELECT vec_id, CAST(pl // $bits AS BIGINT) * 4294967296 +
             CAST(SUM(CASE WHEN s >= 0 THEN (1 << (pl % $bits)) ELSE 0 END) AS BIGINT) AS bucket
      FROM sdot GROUP BY vec_id, pl // $bits)"""
}
