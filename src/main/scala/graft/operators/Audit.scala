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
  *  4. `kept`.
  * PII is NOT a drop stage — production scrubs and keeps — so it rides
  * as the independent `scrubbed` flag; `dup_of` carries the keeper id
  * whenever the doc is a non-keeper, regardless of which earlier stage
  * already dropped it (the receipt is about lineage, not the verdict).
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
    // stage 2: verbatim 7-gram collision with the staged eval-gram set
    val evalGrams = spark.read.parquet(Decontam.evalGramsDump(spark, dir))
    val contaminated = docs
      .select($"doc_id", explode(Text.shinglesNFastUdf(Decontam.N)($"text")).as("s"))
      .join(broadcast(evalGrams), Seq("s"), "left_semi")
      .select($"doc_id").distinct()
      .withColumn("contam", lit(1))
    // stage 3: exact-duplicate keeper rule over the audited slice
    val fp = docs.select($"doc_id", md5(Text.normalizeFast($"text")).as("h"))
    val keep = fp.groupBy($"h").agg(min($"doc_id").as("keep_id"))
    val dup = fp.join(keep, "h")
      .select($"doc_id", $"keep_id", ($"doc_id" =!= $"keep_id").as("is_dup"))
    // the scrub flag (not a drop stage; ONE shared definition with the
    // streaming gate — TextAnalysis.piiHitCol)
    val pii = docs.select($"doc_id",
      TextAnalysis.piiHitCol($"text").cast("int").as("scrubbed"))
    docs.select($"doc_id", $"source")
      .join(pred, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"))
      .join(pii, Seq("doc_id"))
      .select($"doc_id", $"source",
        when($"pred".isNull || $"pred" === 0, "quality")
          .when($"contam" === 1, "decontam")
          .when($"is_dup", "duplicate")
          .otherwise("kept").as("verdict"),
        when($"is_dup", $"keep_id").otherwise(lit(null).cast("long")).as("dup_of"),
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
    TextAnalysis.qmTrainCtesSql + s""",
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
    aev AS (SELECT DISTINCT s FROM ash WHERE source IN ($evalIn)),
    acont AS (SELECT DISTINCT doc_id FROM ash JOIN aev USING (s)
              WHERE source NOT IN ($evalIn)),
    afp AS (SELECT doc_id, md5($norm) h FROM adocs),
    apii AS (SELECT doc_id,
               CASE WHEN len(regexp_extract_all(text, '${TextAnalysis.EmailRe}'))
                       + len(regexp_extract_all(text, '${TextAnalysis.Ipv4Re}'))
                       + len(regexp_extract_all(text, '${TextAnalysis.LongNumRe}')) > 0
                    THEN 1 ELSE 0 END AS scrubbed
             FROM adocs)"""
  }

  /** Full DuckDB replay: the shared [[auditCtesSql]] composition with
    * the within-slice keeper rule and the identical CASE ladder.
    */
  val pipelineAuditSql: String = auditCtesSql(deltaPred = "") + s""",
    akeep AS (SELECT h, MIN(doc_id) keep_id FROM afp GROUP BY 1)
    SELECT a.doc_id, a.source,
           CASE WHEN s2.pred IS NULL OR s2.pred = 0 THEN 'quality'
                WHEN c.doc_id IS NOT NULL THEN 'decontam'
                WHEN f2.doc_id <> k.keep_id THEN 'duplicate'
                ELSE 'kept' END AS verdict,
           CASE WHEN f2.doc_id <> k.keep_id THEN k.keep_id END AS dup_of,
           CAST(p.scrubbed AS INT) AS scrubbed
    FROM adocs a
    LEFT JOIN scored2 s2 USING (doc_id)
    LEFT JOIN acont c USING (doc_id)
    JOIN afp f2 USING (doc_id)
    JOIN akeep k ON k.h = f2.h
    JOIN apii p USING (doc_id)"""
}
