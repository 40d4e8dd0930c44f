package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata
  * extraction via batch `mapPartitions`.
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * `decodeStub` derives deterministic fake media dimensions from the
  * payload bytes. Everything around it — the binary column schema, the
  * typed Dataset, per-partition batch iteration (the shape a real codec
  * UDF needs: amortize codec init across a partition), and the metadata
  * schema — is real and oracle-checked.
  *
  * Scale: payloads stay opaque and partition-local; metadata extraction is
  * a narrow map (no shuffle); a real pipeline would fuse decode +
  * feature-extract in the same partition pass.
  */
object Multimodal {

  case class Payload(doc_id: Long, payload: Array[Byte])
  case class Meta(doc_id: Long, byte_len: Long, width: Long, height: Long,
    frames: Long, decode_status: String)

  /** The deterministic stand-in for a codec: byte length → fake dims. */
  def decodeStub(docId: Long, bytes: Array[Byte]): Meta = {
    val n = bytes.length.toLong
    Meta(docId, n,
      width = 64L + n % 193L,
      height = 64L + (n * 31L) % 157L,
      frames = 1L + docId % 8L,
      decode_status = "stubbed")
  }

  /** documents.text encoded to a binary payload column, decoded per
    * partition. The mapPartitions iterator is the real batch shape —
    * codec state would be initialized once per partition here.
    */
  def meta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[Payload]
      .mapPartitions { rows =>
        // per-partition init point (codec handle in a real pipeline)
        rows.map(p => decodeStub(p.doc_id, p.payload))
      }
      .toDF()
  }

  val metaSql: String = """
    SELECT doc_id,
      octet_length(encode(text)) AS byte_len,
      64 + octet_length(encode(text)) % 193 AS width,
      64 + (octet_length(encode(text)) * 31) % 157 AS height,
      1 + doc_id % 8 AS frames,
      'stubbed' AS decode_status
    FROM documents"""

  case class Frame(doc_id: Long, frame_idx: Long, frame_offset: Long,
    frame_len: Long)

  /** Frame sampling plumbing: each payload splits into its `frames`
    * equal byte ranges (stub for video keyframe extraction), one output
    * row per sampled frame. The explode happens INSIDE the partition
    * pass — a narrow ×frames fan-out with no shuffle; a real pipeline
    * would decode each range in the same pass. Offsets/lengths are
    * real byte arithmetic over the actual payload (oracle-checked);
    * only the codec is stubbed.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[Payload]
      .mapPartitions { rows =>
        rows.flatMap { p =>
          val m = decodeStub(p.doc_id, p.payload)
          val n = m.frames
          val base = m.byte_len / n
          val rem = m.byte_len % n
          (0L until n).iterator.map { i =>
            // frame i gets [i*base + min(i, rem), ...) — remainder bytes
            // distributed to the first `rem` frames
            val off = i * base + math.min(i, rem)
            val len = base + (if (i < rem) 1L else 0L)
            Frame(p.doc_id, i, off, len)
          }
        }
      }
      .toDF()
  }

  val frameSampleSql: String = """
    WITH m AS (
      SELECT doc_id,
             octet_length(encode(text)) AS byte_len,
             1 + doc_id % 8 AS frames
      FROM documents)
    SELECT doc_id,
           i AS frame_idx,
           i * (byte_len // frames) + least(i, byte_len % frames) AS frame_offset,
           (byte_len // frames) + CASE WHEN i < byte_len % frames THEN 1 ELSE 0 END AS frame_len
    FROM m, LATERAL (SELECT unnest(range(frames)) AS i)"""

  case class Resize(doc_id: Long, width: Long, height: Long,
    out_w: Long, out_h: Long, resize_status: String)

  /** Resize plumbing: letterbox each (stub-decoded) image into a 224×224
    * budget preserving aspect ratio — the geometry every vision-model
    * preprocessing pass computes. All integer arithmetic (floor'd scaled
    * dims, min 1 px), oracle-checked; only the pixel resample itself is
    * the stubbed codec step. Narrow map, no shuffle.
    */
  def resize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val Target = 224L
    Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[Payload]
      .mapPartitions { rows =>
        rows.map { p =>
          val m = decodeStub(p.doc_id, p.payload)
          val (w, h) = (m.width, m.height)
          val (ow, oh) =
            if (w >= h) (Target, math.max(1L, h * Target / w))
            else (math.max(1L, w * Target / h), Target)
          Resize(p.doc_id, w, h, ow, oh, "stubbed")
        }
      }
      .toDF()
  }

  val resizeSql: String = """
    WITH m AS (
      SELECT doc_id,
             64 + octet_length(encode(text)) % 193 AS width,
             64 + (octet_length(encode(text)) * 31) % 157 AS height
      FROM documents)
    SELECT doc_id, width, height,
           CASE WHEN width >= height THEN 224 ELSE greatest(1, width * 224 // height) END AS out_w,
           CASE WHEN width >= height THEN greatest(1, height * 224 // width) ELSE 224 END AS out_h,
           'stubbed' AS resize_status
    FROM m"""

  case class Features(doc_id: Long, byte_len: Long, byte_sum: Long,
    n_distinct_bytes: Long, min_byte: Long, max_byte: Long)

  /** Feature extraction over the RAW payload bytes — real computation
    * (order-independent integer statistics), not a stub: primitive loop
    * per payload inside the partition pass, exactly where a production
    * pipeline runs its embedding/codec feature extractor. The corpus is
    * ASCII so the DuckDB oracle recomputes the same statistics from
    * per-character code points.
    */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[Payload]
      .mapPartitions { rows =>
        rows.map { p =>
          val bs = p.payload
          var sum = 0L
          var mn = 256L
          var mx = -1L
          val seen = new Array[Boolean](256)
          var i = 0
          while (i < bs.length) {
            val v = (bs(i) & 0xff).toLong
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            seen(v.toInt) = true
            i += 1
          }
          Features(p.doc_id, bs.length.toLong, sum,
            seen.count(identity).toLong, mn, mx)
        }
      }
      .toDF()
  }

  val featuresSql: String = """
    WITH c AS (SELECT doc_id, unnest(string_split_regex(text, '')) AS ch FROM documents),
    b AS (SELECT doc_id, unicode(ch) AS v FROM c WHERE ch != '')
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS byte_len,
           CAST(sum(v) AS BIGINT) AS byte_sum,
           CAST(count(DISTINCT v) AS BIGINT) AS n_distinct_bytes,
           CAST(min(v) AS BIGINT) AS min_byte,
           CAST(max(v) AS BIGINT) AS max_byte
    FROM b GROUP BY doc_id"""

  /** Exact BINARY dedup over the payload column — the multimodal twin of
    * `dedup_exact` (image/video corpora dedup raw bytes before any
    * decode: identical files are the dominant duplication mode). md5
    * runs over the binary payload itself (codegen'd, no decode, no
    * text assumptions); one hash-keyed shuffle groups identical
    * payloads, keeper = min doc_id. At 100 TB the hash computes in the
    * scan and only (hash, doc_id) slim rows shuffle — payload bytes
    * never move.
    */
  def payloadDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .select($"doc_id", md5($"payload").as("payload_md5"))
      .groupBy($"payload_md5")
      .agg(min($"doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
  }

  // DuckDB's md5 takes VARCHAR (hashed as UTF-8 bytes) — the same bytes
  // Spark's md5(encode(text,'UTF-8')) hashes, so the oracle can hash the
  // text directly
  val payloadDedupSql: String = """
    SELECT md5(text) AS payload_md5,
           MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY 1"""

  /** Staged payload-hash index of the BASE corpus (md5 of payload bytes
    * → keeper, multiplicity) — the binary-modality twin of
    * [[Dedup.baseFpIndex]], built once per source generation through
    * DumpCache; the continuous gate ([[StreamQueries.streamMmDedup]])
    * only ever reads it back.
    */
  private[graft] def basePayloadIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dump = graft.sources.DumpCache.dirFor(
      "graft_base_payload_md5", dir, "documents.parquet")
    graft.sources.DumpCache.ensure(dump) { tmp =>
      Tables.documents(spark, dir).filter(!Dedup.isDelta($"doc_id"))
        .select($"doc_id", md5(encode($"text", "UTF-8")).as("payload_md5"))
        .groupBy($"payload_md5")
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .write.mode("overwrite").parquet(tmp)
    }
    spark.read.parquet(dump)
  }

  /** Rolling 4-byte gram hashes of a payload (stride 1), avalanche-mixed
    * (splitmix64 finalizer) so the simhash bit-vote sees decorrelated
    * bits — the byte-level analog of the text shingle hashes.
    */
  def byteGramHashes(bytes: Array[Byte]): Array[Long] = {
    val n = math.max(bytes.length - 3, 0)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
      out(i) = h ^ (h >>> 31)
      i += 1
    }
    out
  }

  /** NEAR-dup detection for binary payloads — the fuzzy twin of
    * [[payloadDedup]]'s exact byte dedup (re-encoded images, metadata
    * retags, and truncated uploads share most byte content but no md5):
    * 64-bit SimHash over rolling 4-byte grams, then the same Hamming-≤3
    * pigeonhole blocking as `dedup_simhash` (4 blocks of 16 bits — any
    * pair within distance 3 agrees on ≥1 whole block, so the block join
    * finds every such pair; no all-pairs compare).
    *
    * Scale: signatures are one per-partition pass over the payloads
    * (the same batch `mapPartitions` slot a real codec/fingerprint
    * occupies); only (doc_id, sig, block) slim rows shuffle — payload
    * bytes never move, like `mm_dedup`. SQL hash-oracled via
    * [[payloadSimhashSql]] (splitmix64 is plain 2^64 integer
    * arithmetic, unlike the xxhash64-seeded text sketches);
    * SketchSpec additionally plants a one-byte-flipped copy (caught)
    * next to unrelated payloads (not paired).
    */
  def payloadSimhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigs = Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[Payload]
      .mapPartitions(rows => rows.map { p =>
        // the DuckDB oracle reads code points via ascii(text[i]), which
        // equals the UTF-8 byte ONLY for ASCII corpora — fail loudly on
        // the first non-ASCII payload instead of hash-mismatching
        var j = 0
        while (j < p.payload.length) {
          require(p.payload(j) >= 0,
            s"doc ${p.doc_id}: non-ASCII payload byte at offset $j — " +
              "mm_simhash's byte-level oracle parity is ASCII-only")
          j += 1
        }
        (p.doc_id, graft.functions.Text.simhash64(byteGramHashes(p.payload)))
      })
      .toDF("doc_id", "sig")
    // Shared clique-collapsed blocking (r15, [[Dedup.simhashPairs]]):
    // blocking runs over one representative per DISTINCT SIGNATURE and
    // verified signature pairs expand back through the groups — the
    // fixture's ~100-copy byte-identical payload cliques (and a real
    // corpus's 10⁶-copy viral files) hit the block join ONCE each
    // instead of streaming Θ(clique²) candidate rows through it. The
    // r14 shape (doc-level blocking, in-join bit_count verify) had
    // already made candidates codegen-cheap; this removes the
    // candidate VOLUME itself. Output identical (see the helper's
    // case-split proof); the signature mapPartitions pass runs once
    // into the group-by exchange.
    graft.operators.Dedup.simhashPairs(spark, sigs)
  }

  /** DuckDB oracle for [[payloadSimhash]] — the byte-level sketch
    * replayed in unsigned-2^64 HUGEINT arithmetic: 4-byte gram values
    * from `ascii()` (the corpus is pure ASCII, so code point == UTF-8
    * byte), the splitmix64 avalanche with `(x·C) mod 2^64` computed
    * from 32-bit halves (`lo·C + ((hi·C) mod 2^32)·2^32`, every term
    * < 2^97 ≪ HUGEINT), unsigned shifts as integer division, xors on
    * HUGEINT; the per-bit majority vote runs over 16-bit BIGINT parts
    * (4.5× cheaper than per-bit HUGEINT ops, measured), and the
    * pigeonhole block join + `bit_count(xor)` Hamming verify mirror the
    * Spark plan. Signed-vs-unsigned is immaterial: Scala's Long is the
    * two's-complement view of the same 64 bits, and every extracted
    * field (bits, 16-bit bands, xor popcount) reads bit patterns, not
    * magnitudes.
    */
  val payloadSimhashSql: String = """
    WITH b AS MATERIALIZED (
      SELECT doc_id, i, CAST(ascii(text[i]) AS HUGEINT) AS byte
      FROM documents, LATERAL (SELECT unnest(range(1, length(text) + 1)) AS i) u
    ),
    grams0 AS (
      SELECT b1.doc_id, b1.i,
             b1.byte * 16777216 + b2.byte * 65536 + b3.byte * 256 + b4.byte AS h0
      FROM b b1
      JOIN b b2 ON b2.doc_id = b1.doc_id AND b2.i = b1.i + 1
      JOIN b b3 ON b3.doc_id = b1.doc_id AND b3.i = b1.i + 2
      JOIN b b4 ON b4.doc_id = b1.doc_id AND b4.i = b1.i + 3
    ),
    g1 AS (SELECT doc_id, i, xor(h0, h0 // 1073741824) AS x FROM grams0),
    g2 AS (SELECT doc_id, i,
             ((x % 4294967296) * CAST(13787848793156543929 AS HUGEINT)
              + (((x // 4294967296) * CAST(13787848793156543929 AS HUGEINT)) % 4294967296) * 4294967296)
             % CAST(18446744073709551616 AS HUGEINT) AS x
           FROM g1),
    g3 AS (SELECT doc_id, i, xor(x, x // 134217728) AS x FROM g2),
    g4 AS (SELECT doc_id, i,
             ((x % 4294967296) * CAST(10723151780598845931 AS HUGEINT)
              + (((x // 4294967296) * CAST(10723151780598845931 AS HUGEINT)) % 4294967296) * 4294967296)
             % CAST(18446744073709551616 AS HUGEINT) AS x
           FROM g3),
    grams AS MATERIALIZED (
      SELECT doc_id, xor(x, x // 2147483648) AS g FROM g4
    ),
    parts AS MATERIALIZED (
      SELECT doc_id, k,
             CAST((g // (CAST(1 AS HUGEINT) << (k * 16))) % 65536 AS BIGINT) AS p
      FROM grams, unnest(range(0, 4)) AS u(k)
    ),
    votes AS MATERIALIZED (
      SELECT doc_id, k * 16 + jj AS j,
             SUM(CASE WHEN (p // (1 << jj)) % 2 = 1 THEN 1 ELSE -1 END) AS tally
      FROM parts, unnest(range(0, 16)) AS w(jj)
      GROUP BY doc_id, k * 16 + jj
    ),
    sigs AS MATERIALIZED (
      SELECT d.doc_id,
             coalesce(SUM(CASE WHEN v.tally > 0
                          THEN (CAST(1 AS HUGEINT) << v.j) ELSE CAST(0 AS HUGEINT) END), 0) AS sig
      FROM (SELECT DISTINCT doc_id FROM documents) d
      LEFT JOIN votes v USING (doc_id)
      GROUP BY d.doc_id
    ),
    blocked AS (
      SELECT doc_id, sig, blk,
             (sig // (CAST(1 AS HUGEINT) << (blk * 16))) % 65536 AS bh
      FROM sigs, unnest(range(0, 4)) AS u(blk)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             a.sig AS sa, b.sig AS sb
      FROM blocked a JOIN blocked b
        ON a.blk = b.blk AND a.bh = b.bh AND a.doc_id < b.doc_id
    )
    SELECT doc_id_a, doc_id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 3"""
}
