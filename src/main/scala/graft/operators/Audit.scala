package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** The per-document PIPELINE AUDIT (`pipeline_audit`) — the data-card
  * funnel every production training-data pipeline publishes: for each
  * corpus document, which gate drops it FIRST, with the receipt a
  * lineage trail wants (the keeper id for duplicates, the PII-scrub
  * flag). The individual gates all exist as first-class rows; this row
  * is their COMPOSITION under a fixed ladder — the artifact a "why is
  * my corpus 40% smaller than the crawl" question is answered from.
  *
  * Ladder (first failure wins — the order a real pipeline applies
  * them, cheap-and-local before corpus-global):
  *  1. `quality`   — the SERVED trained gate says pred = 0, or the doc
  *     has no featurizable text at all (empty/degenerate docs never
  *     reach the scored table; absent score = failed gate);
  *  2. `decontam`  — the doc shares ≥ 1 verbatim 7-gram with the eval
  *     suite (the `text_decontam` protocol);
  *  3. `duplicate` — the doc is not the keeper (min doc_id) of its
  *     normalized-text fingerprint group (`dedup_exact`'s rule over
  *     the audited slice);
  *  4. `near_duplicate` — the doc has a SMALLER-id audited near-dup
  *     partner under the MinHash-LSH verdict (band collision, then
  *     signature-estimated Jaccard ≥ 0.7 — `dedup_minhash`'s rule,
  *     keep-first by id): the data-card rung production lineage
  *     separates from exact duplication (r13 verdict item 3);
  *  5. `kept`.
  * PII is NOT a drop stage — production scrubs and keeps — so it rides
  * as the independent `scrubbed` flag; `dup_of` carries the keeper id
  * whenever the doc is a non-keeper, and `near_dup_of` the smallest
  * verified colliding partner whenever one exists — both regardless of
  * which earlier stage already dropped the doc (the receipt is about
  * lineage, not the verdict).
  *
  * Scale shape: every stage input is either a STAGED artifact read
  * (the scored corpus, the benchmark-sized eval-gram set — broadcast)
  * or one scan-derived slim frame; the composition is doc_id-keyed
  * equi-joins of slim verdict columns plus one fingerprint groupBy —
  * all co-partitioned on doc_id after the first exchange, nothing
  * corpus-wide at a reducer beyond (id, flag) rows. Oracle: the full
  * DuckDB replay — the 12-iteration training prefix for the served
  * gate, the 7-gram eval CTEs, the fingerprint keeper rule and the
  * PII regex flag composed under the identical CASE ladder.
  */
object Audit {

  def pipelineAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // text coalesced to '': a NULL-text doc would otherwise fingerprint
    // to a NULL hash, never match in the keeper join, and vanish from
    // the audit entirely (violating one-audit-row-per-corpus-doc) — and
    // the DuckDB oracle would drop it identically, so the hash gate
    // could never catch it (r13 ADVICE). The oracle's adocs CTE carries
    // the same coalesce.
    val docs = Tables.documents(spark, dir)
      .filter(!$"source".isInCollection(Decontam.EvalSources))
      .select($"doc_id", coalesce($"text", lit("")).as("text"), $"source")
    // stage 1: the staged SERVED quality verdict (one parquet read; a
    // doc absent from the scored table had no featurizable text)
    val pred = spark.read.parquet(TextAnalysis.qualityScoredDump(spark, dir))
      .select($"doc_id", $"pred")
    // stage 2: 7-gram collision with the staged eval-gram set, joined on
    // gram64 FINGERPRINTS (r14): 8-byte join keys instead of ~45-char
    // strings — slimmer shuffle/broadcast, and the SAME values the
    // streaming gate's broadcast probe compares, so the two audit rows
    // share one collision definition. Un-hinted: AQE broadcasts a
    // benchmark-sized suite from size stats and falls back to a shuffle
    // join for the 10⁷-gram suites this family exists for.
    val evalGramsH = spark.read.parquet(Decontam.evalGramsDump(spark, dir))
      .select(Text.gram64Udf($"s").as("g")).distinct()
    val contaminated = docs
      .select($"doc_id", explode(Text.shinglesNFastUdf(Decontam.N)($"text")).as("s"))
      .select($"doc_id", Text.gram64Udf($"s").as("g"))
      .join(evalGramsH, Seq("g"), "left_semi")
      .select($"doc_id").distinct()
      .withColumn("contam", lit(1))
    // stage 3: exact-duplicate keeper rule over the audited slice
    val fp = docs.select($"doc_id", md5(Text.normalizeFast($"text")).as("h"))
    val keep = fp.groupBy($"h").agg(min($"doc_id").as("keep_id"))
    val dup = fp.join(keep, "h")
      .select($"doc_id", $"keep_id", ($"doc_id" =!= $"keep_id").as("is_dup"))
    // stage 4: near-duplicate (MinHash-LSH) within the audited slice —
    // `dedup_delta_lsh`'s staged machinery: base docs read their
    // (sig, bands) rows from the STAGED band index (text never
    // re-sketched; the audited-slice join drops eval-source entries),
    // only the arriving delta sketches fresh. Candidates are
    // band-bucket-bounded (never all-pairs); a doc is near_duplicate
    // iff a SMALLER-id audited partner verifies at est_jaccard ≥ 0.7,
    // with the smallest such partner as the lineage receipt.
    val baseSk = graft.operators.Dedup.baseMinhashIndex(spark, dir)
      .join(docs.select($"doc_id"), Seq("doc_id"))
    // the DELTA sketch is a STAGED read too (r15; the r14 shape cached
    // it in storage memory for the session's lifetime — the exact class
    // the r14 review caught on the base side, found by ADVICE on this
    // one). It is consumed four times (band self-join twice + the two
    // sig-attach joins); like the base index, re-scanning slim columnar
    // sigs beats both re-running the 128-perm sketch per consumer and a
    // never-released cache. The audited-slice join drops eval-source
    // entries, same as the base side. NULL-text delta docs land in
    // neither sketch (empty gram sets are filtered identically), so the
    // keeper/near joins see the same rows as the inline derivation did.
    val deltaSk = graft.operators.Dedup.deltaMinhashIndex(spark, dir)
      .join(docs.select($"doc_id"), Seq("doc_id"))
    val sk = baseSk.select($"doc_id", $"sig", $"bands")
      .unionByName(deltaSk.select($"doc_id", $"sig", $"bands"))
    val bandRows = sk.select($"doc_id",
      posexplode($"bands").as(Seq("band_idx", "band_hash")))
    val candPairs = bandRows.as("x").join(bandRows.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("y.doc_id").as("adoc"), col("x.doc_id").as("partner"))
      .distinct()
    val simUdf = udf((a: Seq[Long], b: Seq[Long]) =>
      Text.minhashJaccard(a.toArray, b.toArray))
    val near = candPairs
      .join(sk.select($"doc_id".as("adoc"), $"sig".as("sig_a")), Seq("adoc"))
      .join(sk.select($"doc_id".as("partner"), $"sig".as("sig_p")), Seq("partner"))
      .filter(simUdf($"sig_a", $"sig_p") >= 0.7)
      .groupBy($"adoc")
      .agg(min($"partner").as("near_of"))
      .withColumnRenamed("adoc", "doc_id")
    // the scrub flag (not a drop stage; ONE shared definition with the
    // streaming gate — TextAnalysis.piiHitCol)
    val pii = docs.select($"doc_id",
      TextAnalysis.piiHitCol($"text").cast("int").as("scrubbed"))
    docs.select($"doc_id", $"source")
      .join(pred, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"))
      .join(near, Seq("doc_id"), "left")
      .join(pii, Seq("doc_id"))
      .select($"doc_id", $"source",
        when($"pred".isNull || $"pred" === 0, "quality")
          .when($"contam" === 1, "decontam")
          .when($"is_dup", "duplicate")
          .when($"near_of".isNotNull, "near_duplicate")
          .otherwise("kept").as("verdict"),
        when($"is_dup", $"keep_id").otherwise(lit(null).cast("long")).as("dup_of"),
        $"near_of".as("near_dup_of"),
        $"scrubbed")
  }

  /** The shared audit replay CTEs — training prefix scoring, the
    * 7-gram eval-collision protocol (audit-prefixed names so they
    * cannot clash with the training prefix's CTEs), the fingerprint
    * hash, and the PII flag — parameterized by the arrival predicate
    * so the batch oracle ([[pipelineAuditSql]], whole audited slice)
    * and the streaming oracle (delta arrivals only) compose from ONE
    * text instead of two hash-coupled copies (the qmTrainCtesSql
    * convention).
    */
  private[operators] def auditCtesSql(deltaPred: String): String = {
    val evalIn = Decontam.EvalSources.map(s => s"'$s'").mkString(",")
    val norm = "trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g'))"
    // the near-dup rung's sketch replay (SketchSql) builds its 257^k
    // power table recursively, so the composed query's WITH must be
    // RECURSIVE (legal for the non-recursive CTEs it also carries)
    TextAnalysis.qmTrainCtesSql.replaceFirst("WITH ", "WITH RECURSIVE ") + s""",
    ${SketchSql.gramsCtes},
    ${SketchSql.minhashSigsCtes},
    ${SketchSql.bandsCtes},
    scored2 AS (
      SELECT f.doc_id,
             CASE WHEN ${TextAnalysis.qmMarginSql} >= ${TextAnalysis.QmScale / 2}
                  THEN 1 ELSE 0 END AS pred
      FROM feat f, w${TextAnalysis.QmIters} w),
    adocs AS (SELECT doc_id, source, coalesce(text, '') AS text
              FROM documents
              WHERE source NOT IN ($evalIn) $deltaPred),
    awrds AS (SELECT doc_id, source, string_split($norm, ' ') w FROM documents),
    aidx AS (SELECT doc_id, source, w, unnest(range(1, greatest(len(w)-5,1))) i FROM awrds),
    ash AS (SELECT DISTINCT doc_id, source,
                   w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]||' '||w[i+5]||' '||w[i+6] s
            FROM aidx),
    ${SketchSql.gramHash64Ctes("a7", "ash", "doc_id, source")},
    aev AS (SELECT DISTINCT g FROM a7gh WHERE source IN ($evalIn)),
    acont AS (SELECT DISTINCT doc_id FROM a7gh JOIN aev USING (g)
              WHERE source NOT IN ($evalIn)),
    afp AS (SELECT doc_id, md5($norm) h FROM adocs),
    apii AS (SELECT doc_id,
               CASE WHEN len(regexp_extract_all(text, '${TextAnalysis.EmailRe}'))
                       + len(regexp_extract_all(text, '${TextAnalysis.Ipv4Re}'))
                       + len(regexp_extract_all(text, '${TextAnalysis.LongNumRe}')) > 0
                    THEN 1 ELSE 0 END AS scrubbed
             FROM adocs)"""
  }

  /** The shared near-dup verification tail: per-pair 128-position
    * signature agreement over an `acand(adoc, partner)` CTE supplied by
    * the caller (batch: within-slice smaller-id pairs; streaming:
    * arrival-vs-base pairs), then the per-doc verdict — smallest
    * partner at est_jaccard ≥ 0.7 (exact: k/128 is dyadic).
    */
  private[operators] val auditNearTailSql: String = s""",
    aagree AS (
      SELECT c.adoc, c.partner,
             SUM(CASE WHEN sx.sig = sy.sig THEN 1 ELSE 0 END) AS k
      FROM acand c
      JOIN sigs sx ON sx.doc_id = c.adoc
      JOIN sigs sy ON sy.doc_id = c.partner AND sy.p = sx.p
      GROUP BY c.adoc, c.partner),
    anear AS (
      SELECT adoc AS doc_id, MIN(partner) AS near_of
      FROM aagree WHERE CAST(k AS DOUBLE) / 128 >= 0.7e0
      GROUP BY adoc)"""

  /** Full DuckDB replay: the shared [[auditCtesSql]] composition with
    * the within-slice keeper rule and the identical CASE ladder.
    */
  val pipelineAuditSql: String = auditCtesSql(deltaPred = "") + s""",
    akeep AS (SELECT h, MIN(doc_id) keep_id FROM afp GROUP BY 1),
    anb AS (SELECT b.doc_id, b.band_idx, b.band_hash
            FROM bands b JOIN adocs USING (doc_id)),
    acand AS (SELECT DISTINCT y.doc_id AS adoc, x.doc_id AS partner
              FROM anb x JOIN anb y
                ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
               AND x.doc_id < y.doc_id)""" + auditNearTailSql + s"""
    SELECT a.doc_id, a.source,
           CASE WHEN s2.pred IS NULL OR s2.pred = 0 THEN 'quality'
                WHEN c.doc_id IS NOT NULL THEN 'decontam'
                WHEN f2.doc_id <> k.keep_id THEN 'duplicate'
                WHEN nr.near_of IS NOT NULL THEN 'near_duplicate'
                ELSE 'kept' END AS verdict,
           CASE WHEN f2.doc_id <> k.keep_id THEN k.keep_id END AS dup_of,
           nr.near_of AS near_dup_of,
           CAST(p.scrubbed AS INT) AS scrubbed
    FROM adocs a
    LEFT JOIN scored2 s2 USING (doc_id)
    LEFT JOIN acont c USING (doc_id)
    JOIN afp f2 USING (doc_id)
    JOIN akeep k ON k.h = f2.h
    LEFT JOIN anear nr USING (doc_id)
    JOIN apii p USING (doc_id)"""
}
