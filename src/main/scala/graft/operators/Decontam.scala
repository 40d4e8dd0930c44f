package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** Benchmark decontamination — the training-data hygiene step that flags
  * corpus documents sharing verbatim n-grams with an evaluation set
  * (the standard n-gram-collision protocol used for pre-training corpus
  * decontamination). The `source ∈ {src0,src1,src2}` slice of `documents`
  * stands in for the benchmark suite; everything else is the corpus.
  *
  * Scale shape: the eval set's distinct n-grams are benchmark-sized
  * (small by construction — eval suites are ~10⁵ items no matter how big
  * the corpus is), so they BROADCAST; the corpus side is one scan +
  * per-row shingle fan-out, the collision check is a map-side broadcast
  * join, and the only shuffle is the per-doc collision count on doc_id.
  * Corpus size never touches a reducer except as the (tiny) hit set.
  */
object Decontam {

  private[operators] val EvalSources = Seq("src0", "src1", "src2")
  private[operators] val N = 7 // n-gram length of the collision protocol

  /** The distinct eval-suite 7-gram set, staged ONCE per source
    * generation through DumpCache: the shingle explode over the eval
    * slice is real work (a documents scan + per-doc UDF pass), and the
    * continuous gate ([[StreamQueries.streamDecontam]]) needs the SET at
    * every query build — re-deriving it per build was the same
    * double-derivation class the r9 bench flagged on
    * `text_decontam_bloom`. The staged artifact is benchmark-sized by
    * construction, so reading it back is a single small parquet scan.
    */
  private[graft] def evalGramsDump(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    graft.sources.DumpCache.ensure(
      graft.sources.DumpCache.dirFor("graft_eval_grams", dir, "documents.parquet")) { tmp =>
      Tables.documents(spark, dir)
        .filter($"source".isInCollection(EvalSources))
        .select(explode(Text.shinglesNFastUdf(N)($"text")).as("s"))
        .distinct()
        .coalesce(1).write.mode("overwrite").parquet(tmp)
    }
  }

  /** (doc_id, n_collisions) for every corpus doc sharing ≥ 1 distinct
    * 7-gram with the eval set; n_collisions counts the doc's DISTINCT
    * colliding 7-grams.
    */
  def ngramCollisions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val shingled = docs.select($"doc_id", $"source",
      explode(Text.shinglesNFastUdf(N)($"text")).as("s"))
    val evalGrams = shingled
      .filter($"source".isInCollection(EvalSources))
      .select($"s").distinct()
    shingled
      .filter(!$"source".isInCollection(EvalSources))
      .join(broadcast(evalGrams), "s")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_collisions"))
  }

  /** The same decontamination contract executed through a BLOOM-FILTER
    * runtime pre-filter — the shape that matters when the eval-gram set
    * is too big to broadcast as rows (many benchmark suites × many
    * paraphrase expansions) but its SKETCH is not: a Bloom filter over
    * the eval grams costs numBits/8 bytes regardless of corpus size.
    *
    *  1. one aggregation compresses the eval grams into a Bloom filter
    *     (Spark's own `BloomFilterAggregate` — the expression its
    *     runtime-filter rewrite injects for shuffle-join pruning —
    *     reached through graft's `ColumnBridge`, and exposed to SQL as
    *     `graft_bloom_agg`/`graft_might_contain` via GraftExtensions);
    *  2. the corpus scan drops every n-gram the filter rejects MAP-SIDE
    *     (`might_contain` on a literal sketch — a codegen'd expression,
    *     no join, no shuffle: this is the scan-reduction step);
    *  3. the surviving sliver (true hits + Bloom false positives) is
    *     verified EXACTLY against the eval grams, so the output is
    *     bit-identical to [[ngramCollisions]] — false positives cost
    *     only wasted verify work, never wrong rows. Same SQL oracle.
    */
  def bloomDecontam(spark: SparkSession, dir: String,
      numBits: Long = graft.GraftExtensions.DefaultBloomBits): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val docs = Tables.documents(spark, dir)
    val shingled = docs.select($"doc_id", $"source",
      explode(Text.shinglesNFastUdf(N)($"text")).as("s"))
    // materialize the eval-gram set ONCE: it feeds two consumers — the
    // Bloom build (an eager head()) and the broadcast verify join — and
    // without the cache each would re-run the eval slice's shingle
    // explode (r9's bench flagged exactly that double derivation). The
    // set is benchmark-sized by construction, so caching it is the same
    // memory the broadcast already pays.
    val evalGrams = shingled
      .filter($"source".isInCollection(EvalSources))
      .select($"s").distinct()
      .cache()
    val bloomAgg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64($"s")),
        Literal(1000000L), Literal(numBits)).toAggregateExpression())
    val bloom = evalGrams.select(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val mightContain = ColumnBridge.column(new BloomFilterMightContain(
      Literal.create(bloom, org.apache.spark.sql.types.BinaryType),
      ColumnBridge.expression(xxhash64($"s"))))
    shingled
      .filter(!$"source".isInCollection(EvalSources))
      .filter(mightContain) // map-side sketch rejection: no join yet
      .join(broadcast(evalGrams), "s") // exact verify of the sliver
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_collisions"))
  }

  val ngramCollisionsSql: String = """
    WITH docs AS (SELECT doc_id, source, trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) t FROM documents),
    wrds AS (SELECT doc_id, source, string_split(t,' ') w FROM docs),
    idx AS (SELECT doc_id, source, w, unnest(range(1, greatest(len(w)-5,1))) i FROM wrds),
    sh AS (SELECT DISTINCT doc_id, source, w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]||' '||w[i+5]||' '||w[i+6] s FROM idx),
    ev AS (SELECT DISTINCT s FROM sh WHERE source IN ('src0','src1','src2'))
    SELECT doc_id, count(*) AS n_collisions
    FROM sh JOIN ev USING (s)
    WHERE source NOT IN ('src0','src1','src2')
    GROUP BY 1"""

  /** Contamination-RATIO decontamination — the fuzzy companion of
    * [[ngramCollisions]]'s verbatim 7-gram protocol: what FRACTION of
    * each corpus document's distinct 3-gram shingles appears anywhere
    * in the eval suite's shingle union. The verbatim gate catches
    * copied spans (7 consecutive words survive no paraphrase); the
    * ratio catches documents substantially COMPOSED of benchmark text
    * even when reordering/light paraphrase breaks every long n-gram —
    * the contamination-analysis metric decontamination reports are
    * built on, and the signal a threshold policy (drop at frac ≥ t)
    * consumes. Emits every corpus doc with ≥ 1 shared shingle:
    * (doc_id, n_shingles, n_eval_shingles, frac) — exact integer
    * counts, ONE final double division.
    *
    * Scale shape: same as the verbatim gate — the eval shingle union
    * is benchmark-sized (broadcast), the corpus side is one scan +
    * per-row shingle fan-out, membership is marked by a map-side
    * broadcast LEFT join, and both counts come out of ONE conditional
    * doc_id aggregation (count(*) + count(hit)) — a single shuffle,
    * no per-doc join. Corpus size never reaches a reducer except as
    * per-doc count rows. (A first cut with two separate doc_id aggs +
    * a doc_id join was plan-audited at 2 shuffles + an SMJ and
    * replaced by this form — result-identical.)
    */
  def fracDecontam(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        explode(Text.shinglesFastUdf($"text")).as("s"))
    val evalSh = sh.filter($"source".isInCollection(EvalSources))
      .select($"s").distinct().withColumn("hit", lit(1))
    sh.filter(!$"source".isInCollection(EvalSources))
      .join(broadcast(evalSh), Seq("s"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"), count($"hit").as("n_eval_shingles"))
      .filter($"n_eval_shingles" > 0)
      .select($"doc_id", $"n_shingles", $"n_eval_shingles",
        ($"n_eval_shingles".cast("double") / $"n_shingles".cast("double")).as("frac"))
  }

  val fracDecontamSql: String = """
    WITH docs AS (SELECT doc_id, source, trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) t FROM documents),
    wrds AS (SELECT doc_id, source, string_split(t,' ') w FROM docs),
    idx AS (SELECT doc_id, source, w, unnest(range(1, greatest(len(w)-1,1))) i FROM wrds),
    sh AS (SELECT DISTINCT doc_id, source, w[i]||' '||w[i+1]||' '||w[i+2] s FROM idx),
    ev AS (SELECT DISTINCT s FROM sh WHERE source IN ('src0','src1','src2')),
    corpus AS (SELECT doc_id, s FROM sh WHERE source NOT IN ('src0','src1','src2')),
    n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM corpus GROUP BY 1),
    hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_eval_shingles
             FROM corpus JOIN ev USING (s) GROUP BY 1)
    SELECT doc_id, n_shingles, n_eval_shingles,
           CAST(n_eval_shingles AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS frac
    FROM n JOIN hits USING (doc_id)"""

  /** SEMANTIC decontamination (`decontam_embed`) — the embedding-space
    * member of the decontamination family: flag corpus vectors whose
    * cosine to ANY eval-suite vector reaches `threshold`. The n-gram
    * gates ([[ngramCollisions]] verbatim, [[fracDecontam]] fuzzy) see
    * only SURFACE overlap; a translated, heavily paraphrased, or
    * reformatted copy of a benchmark item shares no shingle yet sits
    * next to it in embedding space — the leak class embedding-based
    * contamination analyses exist for. The `vec_id % evalMod = 0` slice
    * stands in for the benchmark suite's embeddings (the place a
    * production pipeline plugs its embedded eval sets in).
    *
    * Emits one row per CONTAMINATED corpus vector: (vec_id,
    * n_eval_hits = #eval vectors within threshold, best_cos = the max
    * hit cosine, witness_id = smallest hitting eval id — the receipt an
    * audit trail wants). All aggregates are associative (count / max /
    * min: map-side-combined, order-independent), and each cosine is
    * the same sequential double fold on both engines ([[graft.functions.Vectors]]'
    * parity contract) — so max over an identical value set is
    * engine-exact and the hash oracle holds with no float hazard.
    *
    * Scale shape: the eval suite is benchmark-sized BY CONSTRUCTION
    * (~10⁵ vectors no matter the corpus), so it broadcasts; scoring is
    * ONE corpus scan with |eval| codegen'd [[graft.functions.FloatDotProduct]]
    * folds per row (a BroadcastNestedLoopJoin — there is no equi-key;
    * the filter keeps the post-join stream hit-sized), and the only
    * shuffle carries slim (vec_id, partial-agg) rows for docs that hit.
    * At 10⁵-eval scale the per-row cost is the documented swap to the
    * sketched prescreen: [[Similarity.embedPairsLsh]]'s hyperplane
    * buckets or [[Pq]]'s ADC tables prune eval candidates before the
    * exact rescore — same machinery, same exact verify, staged like
    * `q_stream_ann_probe`'s serving index.
    */
  def embedDecontam(spark: SparkSession, dir: String,
      threshold: Double = 0.30, evalMod: Long = 50L): DataFrame = {
    import spark.implicits._
    import graft.functions.Vectors
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Vectors.norm2($"embedding").as("nrm"))
      .filter($"nrm" > 0)
    val eval = emb.filter($"vec_id" % evalMod === 0)
      .select($"vec_id".as("eval_id"), $"embedding".as("ee"), $"nrm".as("en"))
    emb.filter($"vec_id" % evalMod =!= 0)
      .crossJoin(broadcast(eval))
      .select($"vec_id", $"eval_id",
        (Vectors.dot($"embedding", $"ee") / ($"nrm" * $"en")).as("cos"))
      .filter($"cos" >= threshold)
      .groupBy($"vec_id")
      .agg(count(lit(1)).as("n_eval_hits"), max($"cos").as("best_cos"),
        min($"eval_id").as("witness_id"))
  }

  val embedDecontamSql: String = """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) emb
               FROM embeddings),
    n AS (SELECT vec_id, emb, sqrt(list_sum(list_transform(emb, x -> x*x))) nrm FROM e),
    q AS (SELECT vec_id eval_id, emb ee, nrm en FROM n WHERE vec_id % 50 = 0 AND nrm > 0),
    c AS (SELECT vec_id, emb, nrm FROM n WHERE vec_id % 50 <> 0 AND nrm > 0),
    s AS (SELECT c.vec_id, q.eval_id,
            list_sum(list_transform(list_zip(c.emb, q.ee), x -> x[1]*x[2])) / (c.nrm * q.en) AS cos
          FROM c, q)
    SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
           MAX(cos) AS best_cos, MIN(eval_id) AS witness_id
    FROM s WHERE cos >= 0.30 GROUP BY vec_id"""
}
