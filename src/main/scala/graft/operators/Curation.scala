package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** Corpus curation operators: deterministic sampling and the composed
  * end-to-end filter→dedup pipeline a pre-training data run actually
  * executes. Both are fully declarative (one window shuffle each), so
  * Catalyst plans them like any analytics query — filters push to the
  * scan, the sample rank and the dedup argmin are single-shuffle windows.
  */
object Curation {

  /** Deterministic stratified sample: exactly ceil(10%) of each `lang`
    * stratum, chosen by md5(doc_id) order — reproducible across runs,
    * engines, and partitionings (no RNG state), which is what a data
    * pipeline needs for auditable subsampling. One shuffle on `lang`.
    *
    * At 100 TB: rank-per-stratum needs only the stratum's rows on one
    * partition; for strata too large for that use
    * [[sampleStratifiedThreshold]] — identical output via per-partition
    * local top-k + a global rank over candidates only.
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        md5($"doc_id".cast("string").cast("binary")).as("h"))
    val w = Window.partitionBy($"lang")
    docs
      .withColumn("rk", row_number().over(w.orderBy($"h", $"doc_id")))
      .withColumn("n_lang", count(lit(1)).over(w))
      .filter($"rk" <= ceil($"n_lang" * 0.1))
      .select($"doc_id", $"lang", $"rk")
  }

  val sampleStratifiedSql: String = """
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n_lang
      FROM documents)
    SELECT doc_id, lang, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= ceil(n_lang * 0.1)"""

  /** The huge-strata form of [[sampleStratified]] — identical output,
    * different plan. Pass 1 computes stratum sizes (tiny agg, broadcast
    * back); pass 2 takes each partition's LOCAL k-smallest (h, doc_id)
    * per stratum — spread over (lang, partition) reducers, so no stratum
    * ever needs all its rows on one partition — then ranks only the
    * ≤ #partitions·k surviving candidates globally per stratum. Every
    * true top-k row is in its partition's local top-k, so the final rank
    * over the candidate superset reproduces the rank form's rows AND rank
    * values exactly (same md5 order, no RNG). Work on any single
    * partition is O(sample size), not O(stratum size).
    */
  def sampleStratifiedThreshold(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        md5($"doc_id".cast("string").cast("binary")).as("h"))
    val ks = docs.groupBy($"lang")
      .agg(ceil(count(lit(1)) * 0.1).cast("long").as("k"))
    val local = docs
      .withColumn("pid", spark_partition_id())
      .join(broadcast(ks), "lang")
      .withColumn("lrk", row_number().over(
        Window.partitionBy($"lang", $"pid").orderBy($"h", $"doc_id")))
      .filter($"lrk" <= $"k")
    local
      .withColumn("rk", row_number().over(
        Window.partitionBy($"lang").orderBy($"h", $"doc_id")))
      .filter($"rk" <= $"k")
      .select($"doc_id", $"lang", $"rk")
  }

  /** Curriculum / source-mixture sampling: each source gets a target
    * sampling RATE (the knob a pre-training data recipe turns — upweight
    * curated sources, downweight crawl), applied as a deterministic
    * per-row Bernoulli: keep iff the first 8 hex chars of md5(doc_id)
    * are lexicographically below the rate's hex threshold. Fixed-width
    * lowercase hex compares identically to the numeric compare in BOTH
    * engines, so the oracle is exact — and the whole operator is a pure
    * scan-stage filter: ZERO shuffles, reproducible across runs,
    * partitionings, and engines (contrast [[sampleStratified]], which
    * buys exact per-stratum counts with a shuffle).
    */
  def sampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weights = Map("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.25)
    val default = 0.1
    def hexThreshold(rate: Double): String =
      f"${math.min((rate * (1L << 32)).toLong, 0xffffffffL)}%08x"
    val thr = weights.foldLeft(lit(hexThreshold(default))) {
      case (acc, (src, rate)) =>
        when($"source" === src, lit(hexThreshold(rate))).otherwise(acc)
    }
    Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        substring(md5($"doc_id".cast("string").cast("binary")), 1, 8).as("h"),
        thr.as("thr"))
      .filter($"h" < $"thr")
      .select($"doc_id", $"source")
  }

  val sampleWeightedSql: String = {
    def hexThreshold(rate: Double): String =
      f"${math.min((rate * (1L << 32)).toLong, 0xffffffffL)}%08x"
    s"""
    SELECT doc_id, source FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
          CASE source WHEN 'src0' THEN '${hexThreshold(0.8)}'
                      WHEN 'src1' THEN '${hexThreshold(0.5)}'
                      WHEN 'src2' THEN '${hexThreshold(0.25)}'
                      ELSE '${hexThreshold(0.1)}' END"""
  }

  /** Deterministic train/validation/test split — the assignment every
    * corpus needs to be STABLE across reruns, engines and partitionings
    * (a split that drifts leaks eval data into training). Same
    * fixed-width md5-hex-threshold device as [[sampleWeighted]]:
    * bucket = where md5(doc_id)'s first 8 hex digits fall in [0,1) —
    * train < 0.90 ≤ val < 0.95 ≤ test. Pure per-row scan expression:
    * ZERO shuffles, reproducible byte-for-byte on any engine with md5.
    * New documents never move existing ones between splits (assignment
    * depends only on the doc's own id) — the property that lets a
    * 100 TB corpus grow incrementally without re-splitting.
    */
  def trainValTestSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val trainEnd = f"${(0.90 * (1L << 32)).toLong}%08x"
    val valEnd = f"${(0.95 * (1L << 32)).toLong}%08x"
    Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        substring(md5($"doc_id".cast("string").cast("binary")), 1, 8).as("h"))
      .select($"doc_id", $"source",
        when($"h" < trainEnd, "train")
          .when($"h" < valEnd, "val")
          .otherwise("test").as("split"))
  }

  val trainValTestSplitSql: String = {
    val trainEnd = f"${(0.90 * (1L << 32)).toLong}%08x"
    val valEnd = f"${(0.95 * (1L << 32)).toLong}%08x"
    s"""
    SELECT doc_id, source,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$trainEnd' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$valEnd' THEN 'val'
                ELSE 'test' END AS split
    FROM documents"""
  }

  /** Concat-and-split sequence packing — the training-batch assembly
    * step: documents concatenate (per `lang` stream, deterministic
    * doc_id order) and cut into fixed 512-word bins. Emitted per doc:
    * its bin, offset within the bin, and whether it spans a bin
    * boundary (split across training sequences).
    *
    * Plan: one window shuffle per stream key (the running word count);
    * everything else is per-row arithmetic. At 100 TB the stream key is
    * the shard/curriculum key — same single-shuffle shape. The windowed
    * cumsum puts a stream's rows on one partition like the rank-based
    * sample; for monster streams the same partial-prefix-sum trick as
    * [[sampleStratifiedThreshold]] applies (per-partition sums, then a
    * tiny prefix over partition totals).
    */
  def pack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val SeqLen = 512
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        size(split(Text.normalizeFast($"text"), " ")).as("n_words"))
    docs
      .withColumn("cum_before", coalesce(sum($"n_words").over(
        Window.partitionBy($"lang").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"doc_id", $"lang", $"n_words",
        ($"cum_before" / SeqLen).cast("int").as("bin_id"),
        ($"cum_before" % SeqLen).cast("int").as("bin_offset"),
        (($"cum_before" % SeqLen) + $"n_words" > SeqLen).cast("int").as("spans_bins"))
  }

  val packSql: String = """
    WITH d AS (
      SELECT doc_id, lang,
             CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')), ' ')) AS INT) AS n_words
      FROM documents),
    c AS (
      SELECT doc_id, lang, n_words,
             CAST(coalesce(SUM(n_words) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
      FROM d)
    SELECT doc_id, lang, n_words,
           CAST(cum_before // 512 AS INT) AS bin_id,
           CAST(cum_before % 512 AS INT) AS bin_offset,
           CAST(cum_before % 512 + n_words > 512 AS INT) AS spans_bins
    FROM c"""

  /** The composed curation pipeline: quality-filter → language-filter →
    * exact-dedup (keep min doc_id per normalized-text hash) → per-doc
    * stats. This is the reference shape of an LLM pre-training data run,
    * expressed as ONE declarative query: the quality/langid expressions
    * inline into the scan stage (no shuffle), and dedup is the single
    * window shuffle. Thresholds chosen for the synthetic corpus.
    */
  def curate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Text.wordsFast($"text")
    val nWords = size(w)
    val stopHits = size(filter(w, x =>
      x.isInCollection(Seq("the", "a", "of", "and", "to", "is"))))
    val filtered = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"text", nWords.as("n_words"),
        (stopHits.cast("double") / nWords).as("stop_ratio"),
        md5(Text.normalizeFast($"text")).as("text_hash"))
      .filter($"lang" === "en" && $"n_words" >= 30 && $"stop_ratio" > 0)
    filtered
      .withColumn("pick", row_number().over(
        Window.partitionBy($"text_hash").orderBy($"doc_id")))
      .filter($"pick" === 1)
      .select($"doc_id", $"lang", $"n_words", $"stop_ratio", $"text_hash")
  }

  val curateSql: String = """
    WITH d AS (
      SELECT doc_id, lang, text,
             string_split(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')), ' ') AS w,
             md5(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g'))) AS text_hash
      FROM documents),
    scored AS (
      SELECT doc_id, lang, text_hash, CAST(len(w) AS INT) AS n_words,
             len(list_filter(w, x -> x IN ('the','a','of','and','to','is'))) * 1.0 / len(w) AS stop_ratio
      FROM d),
    filtered AS (
      SELECT * FROM scored
      WHERE lang = 'en' AND n_words >= 30 AND stop_ratio > 0),
    deduped AS (
      SELECT *, row_number() OVER (PARTITION BY text_hash ORDER BY doc_id) AS pick
      FROM filtered)
    SELECT doc_id, lang, n_words, stop_ratio, text_hash
    FROM deduped WHERE pick = 1"""

  /** The WHOLE corpus-build DAG as ONE declarative query — what a
    * pre-training data run actually ships: quality gate → exact dedup
    * (keep-first) → deterministic split assignment → per-(split, lang)
    * corpus accounting. Composing through the optimizer (instead of
    * materializing between stages) lets Catalyst inline the quality
    * filters into the scan, share the normalize across the hash and the
    * word stats, and leaves exactly TWO shuffles: the dedup window and
    * the final stats agg — the split assignment is a free per-row
    * expression sandwiched between them. The per-stage artifact forms
    * exist as their own operators (`pipeline_curate`, `dedup_exact`,
    * `pipeline_split`); this row proves they COMPOSE without glue code
    * or extra passes.
    */
  def corpusBuild(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val trainEnd = f"${(0.90 * (1L << 32)).toLong}%08x"
    val valEnd = f"${(0.95 * (1L << 32)).toLong}%08x"
    val w = Text.wordsFast($"text")
    val filtered = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"n_chars", size(w).as("n_words"),
        md5(Text.normalizeFast($"text")).as("text_hash"))
      .filter($"n_words" >= 30)
    val deduped = filtered
      .withColumn("pick", row_number().over(
        Window.partitionBy($"text_hash").orderBy($"doc_id")))
      .filter($"pick" === 1)
    deduped
      .withColumn("h", substring(md5($"doc_id".cast("string").cast("binary")), 1, 8))
      .withColumn("split",
        when($"h" < trainEnd, "train").when($"h" < valEnd, "val").otherwise("test"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_words").as("total_words"),
        sum($"n_chars").as("total_chars"))
  }

  val corpusBuildSql: String = {
    val trainEnd = f"${(0.90 * (1L << 32)).toLong}%08x"
    val valEnd = f"${(0.95 * (1L << 32)).toLong}%08x"
    s"""
    WITH d AS (
      SELECT doc_id, lang, n_chars,
             CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')), ' ')) AS INT) AS n_words,
             md5(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g'))) AS text_hash
      FROM documents),
    filtered AS (SELECT * FROM d WHERE n_words >= 30),
    deduped AS (
      SELECT *, row_number() OVER (PARTITION BY text_hash ORDER BY doc_id) AS pick
      FROM filtered),
    assigned AS (
      SELECT *,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$trainEnd' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$valEnd' THEN 'val'
                  ELSE 'test' END AS split
      FROM deduped WHERE pick = 1)
    SELECT split, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY 1, 2"""
  }

  /** Deterministic global training-order shuffle: every doc gets a
    * seeded pseudo-random sort key (`md5(seed || doc_id)` — RNG-free, so
    * the order is reproducible across engines, partitionings and
    * re-runs) and a GLOBAL 1-based position in that order.
    *
    * The naive global position (`row_number()` over an unpartitioned
    * window) collapses the whole corpus onto one task — the canonical
    * scale-killer. The scalable form is the classic two-pass global
    * index: range-partition + sort within partitions on the key (a total
    * order across partitions, the same machinery as a global ORDER BY),
    * count rows per partition (tiny: P longs to the driver), broadcast
    * the prefix-sum offsets, and assign `offset(pid) + local index` in
    * one per-partition pass. No single-task stage anywhere; the only
    * full-data movement is the one range shuffle any global sort pays.
    *
    * The sorted frame is cached between the two passes (count + assign)
    * and UNPERSISTED before returning — the returned frame is an eager
    * local checkpoint of the final assignment, so no corpus-wide cache
    * outlives the operator. At corpus scale use DISK_ONLY or a parquet
    * staging write instead — the two passes are deterministic either way.
    */
  def shuffleOrder(spark: SparkSession, dir: String): DataFrame =
    seededOrder(spark, dir, "s42:")

  /** The two-pass global index over a seeded hash order, parameterized
    * by the seed prefix — [[shuffleOrder]] is one epoch of it and
    * [[epochOrders]] stacks several.
    */
  private def seededOrder(spark: SparkSession, dir: String,
      seed: String): DataFrame =
    seededOrderOf(spark,
      Tables.documents(spark, dir).select(org.apache.spark.sql.functions.col("doc_id")), seed)

  /** The same two-pass index over an ARBITRARY (doc_id) set — lets the
    * schedule compose with upstream selections ([[budgetEpochs]]) without
    * re-deriving them per epoch.
    */
  private def seededOrderOf(spark: SparkSession, ids: DataFrame,
      seed: String): DataFrame = {
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = ids
      .select($"doc_id",
        md5(concat(lit(seed), $"doc_id".cast("string"))).as("skey"))
      .repartitionByRange(parts, $"skey", $"doc_id")
      .sortWithinPartitions($"skey", $"doc_id")
      .withColumn("pid", spark_partition_id())
      .cache()
    val counts = sorted.groupBy($"pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L)).toArray
    val bc = spark.sparkContext.broadcast(offsets)
    val out = sorted.as[(Long, String, Int)].mapPartitions { it =>
      var local = 0L
      it.map { case (docId, skey, pid) =>
        local += 1
        (docId, skey, bc.value(pid) + local)
      }
    }.toDF("doc_id", "skey", "shuffle_pos")
      // materialize the (slim, 3-column) assignment so the corpus-wide
      // sorted cache can be released before the operator returns
      .localCheckpoint()
    sorted.unpersist(blocking = false)
    out
  }

  val shuffleOrderSql: String = """
    SELECT doc_id,
           md5('s42:' || CAST(doc_id AS VARCHAR)) AS skey,
           CAST(row_number() OVER (
             ORDER BY md5('s42:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
             AS shuffle_pos
    FROM documents"""

  /** Multi-EPOCH training schedule: one independent deterministic
    * global order per epoch (seed `e{k}:`), stacked with the epoch id —
    * the reshuffle-every-epoch contract of LLM training loops, with the
    * property that every epoch's order is reproducible in isolation
    * (resume epoch 2 without recomputing epoch 0). Each epoch is one
    * run of the same two-pass range-partition index as
    * [[shuffleOrder]]; epochs is a small constant, so the total cost is
    * epochs × (one range shuffle + P-row driver counts).
    */
  def epochOrders(spark: SparkSession, dir: String,
      epochs: Int = 3): DataFrame =
    (0 until epochs).map { e =>
      seededOrder(spark, dir, s"e$e:")
        .withColumn("epoch", org.apache.spark.sql.functions.lit(e))
        .select(org.apache.spark.sql.functions.col("epoch"),
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("skey"),
          org.apache.spark.sql.functions.col("shuffle_pos"))
    }.reduce(_ unionByName _)

  /** Oracle for [[epochOrders]] — the VALUES list is generated from the
    * SAME `epochs` parameter (a mismatched literal list would silently
    * desync the oracle from a non-default call).
    */
  def epochOrdersSql(epochs: Int = 3): String = {
    val values = (0 until epochs).map(e => s"($e)").mkString(",")
    s"""
    SELECT ep.epoch, doc_id,
           md5('e' || ep.epoch || ':' || CAST(doc_id AS VARCHAR)) AS skey,
           CAST(row_number() OVER (PARTITION BY ep.epoch
             ORDER BY md5('e' || ep.epoch || ':' || CAST(doc_id AS VARCHAR)),
                      doc_id) AS BIGINT) AS shuffle_pos
    FROM documents CROSS JOIN (VALUES $values) ep(epoch)"""
  }

  /** Token-budget selection: take documents in QUALITY order until the
    * cumulative token count reaches the budget — the greedy knapsack
    * every "train on the best N-billion tokens" recipe runs after
    * scoring. Order is total ((quality_score desc, doc_id) — score ties
    * cannot flip membership between engines).
    *
    * The global cumulative sum is the running-total sibling of
    * [[shuffleOrder]]'s two-pass global index: an unpartitioned
    * `SUM() OVER (ORDER BY ...)` window would serialize the corpus
    * through one task, so instead range-partition + sort on the quality
    * key (the one full-data movement any global order pays), aggregate
    * per-partition token totals (P longs to the driver), broadcast the
    * prefix offsets, and emit `offset(pid) + local running sum` in one
    * per-partition pass. The slim selected set is locally checkpointed
    * so the corpus-wide sorted cache never outlives the operator.
    */
  def tokenBudget(spark: SparkSession, dir: String,
      budget: Long = 10000L): DataFrame = {
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = TextAnalysis.quality(spark, dir)
      .select($"doc_id", $"n_words".cast("long").as("n_tokens"),
        $"quality_score")
      .repartitionByRange(parts, $"quality_score".desc, $"doc_id".asc)
      .sortWithinPartitions($"quality_score".desc, $"doc_id".asc)
      .withColumn("pid", spark_partition_id())
      .cache()
    val partial = sorted.groupBy($"pid").agg(sum($"n_tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts)
      .scanLeft(0L)((acc, p) => acc + partial.getOrElse(p, 0L)).toArray
    val bc = spark.sparkContext.broadcast(offsets)
    val out = sorted.as[(Long, Long, Double, Int)].mapPartitions { it =>
      var run = 0L
      it.map { case (docId, nTok, q, pid) =>
        run += nTok
        (docId, nTok, q, bc.value(pid) + run)
      }
    }.toDF("doc_id", "n_tokens", "quality_score", "cum_tokens")
      .filter($"cum_tokens" <= budget)
      .localCheckpoint()
    sorted.unpersist(blocking = false)
    out
  }

  /** Fixed-SIZE uniform sample — the reservoir-sampling contract done
    * the distributed way: the k documents with the smallest seeded hash
    * (md5 of a seed-prefixed id — RNG-free, engine-reproducible) form
    * an exact uniform k-draw, computed as TakeOrdered top-k
    * (per-partition partial top-k, P×k rows to the driver merge) —
    * never a global sort. Fraction sampling (`sample_stratified`)
    * scales output WITH the corpus; fixed-k keeps it constant — the
    * eval-set / human-review draw.
    */
  def sampleFixed(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source",
        md5(concat(lit("fx42:"), $"doc_id".cast("string"))).as("skey"))
      .orderBy($"skey".asc, $"doc_id".asc)
      .limit(k)
  }

  /** Oracle for [[sampleFixed]] — k derives from the same parameter. */
  def sampleFixedSql(k: Int = 100): String = s"""
    SELECT doc_id, lang, source,
           md5('fx42:' || CAST(doc_id AS VARCHAR)) AS skey
    FROM documents ORDER BY skey, doc_id LIMIT $k"""

  /** Oracle for [[tokenBudget]] — budget derives from the same
    * parameter (the class of silent desync budgetEpochsSql already
    * fixed). */
  def tokenBudgetSql(budget: Long = 10000L): String = s"""
    WITH q AS (SELECT doc_id, CAST(n_words AS BIGINT) AS n_tokens,
                      quality_score
               FROM (${TextAnalysis.qualitySql})),
    c AS (SELECT doc_id, n_tokens, quality_score,
            CAST(SUM(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
          FROM q)
    SELECT doc_id, n_tokens, quality_score, cum_tokens
    FROM c WHERE cum_tokens <= $budget"""

  /** The composed training schedule ([[tokenBudget]] × [[epochOrders]]):
    * the budget-cut corpus reshuffled independently per epoch — "train E
    * epochs over the best N tokens" as ONE query. The two two-pass
    * indexes FUSE: the budget cut's global cumulative sum runs once and
    * its (slim, locally checkpointed) selected set feeds every epoch's
    * reshuffle — the corpus is scanned exactly once no matter how many
    * epochs follow (PlanShapeSpec pins zero file scans in the composed
    * result: the epoch legs reorder the staged cut, never the corpus).
    */
  def budgetEpochs(spark: SparkSession, dir: String,
      budget: Long = 10000L, epochs: Int = 3): DataFrame = {
    import spark.implicits._
    val selected = tokenBudget(spark, dir, budget).select($"doc_id")
    (0 until epochs).map { e =>
      seededOrderOf(spark, selected, s"e$e:")
        .withColumn("epoch", lit(e))
        .select($"epoch", $"doc_id", $"skey", $"shuffle_pos")
    }.reduce(_ unionByName _)
  }

  /** Oracle for [[budgetEpochs]] — the VALUES list and the cum_tokens
    * cutoff derive from the same epochs/budget parameters as the query,
    * like [[epochOrdersSql]].
    */
  def budgetEpochsSql(epochs: Int = 3, budget: Long = 10000L): String = {
    val values = (0 until epochs).map(e => s"($e)").mkString(",")
    s"""
    WITH q AS (SELECT doc_id, CAST(n_words AS BIGINT) AS n_tokens,
                      quality_score
               FROM (${TextAnalysis.qualitySql})),
    c AS (SELECT doc_id,
            CAST(SUM(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
          FROM q),
    sel AS (SELECT doc_id FROM c WHERE cum_tokens <= $budget)
    SELECT ep.epoch, doc_id,
           md5('e' || ep.epoch || ':' || CAST(doc_id AS VARCHAR)) AS skey,
           CAST(row_number() OVER (PARTITION BY ep.epoch
             ORDER BY md5('e' || ep.epoch || ':' || CAST(doc_id AS VARCHAR)),
                      doc_id) AS BIGINT) AS shuffle_pos
    FROM sel CROSS JOIN (VALUES $values) ep(epoch)"""
  }

  /** Deterministic ratio INTERLEAVING — the reader-side schedule of
    * [[mixSources]]'s static quotas: a training loader consuming three
    * sources at 5:3:2 needs each document's GLOBAL slot, not just its
    * source quota. Every block of 10 consecutive slots carries 5 src0 +
    * 3 src1 + 2 src2 docs (contiguous sub-runs per source), so the mix
    * ratio holds at every 10-doc prefix boundary — the property
    * curriculum schedules rely on.
    *
    * slot(r, s) = (r div w_s)·10 + start_s + (r mod w_s) for the doc at
    * 0-based md5 rank r within source s — pure integer arithmetic on
    * both engines. Once the shortest source exhausts, later blocks
    * carry its slots empty (positions stay deterministic; a quota cut
    * like `pipeline_mix` trims to exact ratios first when density is
    * required). Shape: one rank window per source partition (the huge-
    * strata remedy is `sample_stratified_topk`'s local-top-k plan) +
    * a pure slot expression; no joins.
    */
  def interleave(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weights = Map("src0" -> 5L, "src1" -> 3L, "src2" -> 2L)
    val starts = Map("src0" -> 0L, "src1" -> 5L, "src2" -> 8L)
    val w = Window.partitionBy($"source").orderBy($"skey", $"doc_id")
    val wCol = coalesce(
      weights.foldLeft(lit(null).cast("long")) { case (acc, (s, v)) =>
        when($"source" === s, lit(v)).otherwise(acc) }, lit(1L))
    val startCol = coalesce(
      starts.foldLeft(lit(null).cast("long")) { case (acc, (s, v)) =>
        when($"source" === s, lit(v)).otherwise(acc) }, lit(0L))
    Tables.documents(spark, dir)
      .filter($"source".isin("src0", "src1", "src2"))
      .select($"doc_id", $"source",
        md5(concat(lit("il:"), $"doc_id".cast("string"))).as("skey"))
      .withColumn("r", row_number().over(w).cast("long") - 1)
      .withColumn("wv", wCol)
      // r div wv, not (r / wv).cast("long"): Spark's '/' on longs is
      // double division, which loses floor semantics past 2^53 — div is
      // the exact integer form the oracle's '//' uses at any scale
      .select($"doc_id", $"source", $"skey",
        ($"r" + 1).as("src_rank"),
        (expr("r div wv") * 10 + startCol + ($"r" % $"wv") + 1)
          .as("slot"))
  }

  val interleaveSql: String = """
    WITH d AS (
      SELECT doc_id, source,
             md5('il:' || CAST(doc_id AS VARCHAR)) AS skey,
             CASE source WHEN 'src0' THEN 5 WHEN 'src1' THEN 3 ELSE 2 END AS w,
             CASE source WHEN 'src0' THEN 0 WHEN 'src1' THEN 5 ELSE 8 END AS st
      FROM documents WHERE source IN ('src0', 'src1', 'src2')),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY source ORDER BY skey, doc_id) - 1 AS r
      FROM d)
    SELECT doc_id, source, skey,
           CAST(r + 1 AS BIGINT) AS src_rank,
           CAST((r // w) * 10 + st + (r % w) + 1 AS BIGINT) AS slot
    FROM ranked"""

  /** Domain-mixture construction — the static-mix step of a training
    * recipe (DoReMi-style weights, FineWeb source blending): given
    * target PROPORTIONS per source, emit the largest corpus that hits
    * them exactly, bounded by what each source can supply.
    *
    * Targets here: src0 : src1 : src2 = 5 : 3 : 2 (other sources
    * excluded). The output size is pinned by the binding source,
    * N_out = min_s (n_s·denom div w_s), and each quota is
    * k_s = (w_s·N_out) div denom — ALL integer arithmetic, so both
    * engines agree bit-for-bit (contrast [[sampleWeighted]], which
    * fixes per-source RATES; mixing fixes the output COMPOSITION and
    * derives the rates from observed counts at runtime). Rows are
    * chosen per source by md5(doc_id) order — deterministic, auditable,
    * stable under partitioning.
    *
    * Scale shape: counts are a map-side-combined agg on `source`
    * (output = #sources rows); quotas ride a broadcast join; the pick
    * is one rank window per source. Strata too large for one reducer
    * switch the rank to [[sampleStratifiedThreshold]]'s local-top-k
    * candidate plan — identical rows, O(quota) per-partition work.
    */
  def mixSources(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wnum = when($"source" === "src0", 5L)
      .when($"source" === "src1", 3L)
      .otherwise(2L)
    val docs = Tables.documents(spark, dir)
      .filter($"source".isin("src0", "src1", "src2"))
      .select($"doc_id", $"source",
        md5($"doc_id".cast("string").cast("binary")).as("h"))
    val counts = docs.groupBy($"source")
      .agg(count(lit(1)).as("n"))
      .withColumn("wnum", wnum)
    // binding-source output size: one row, broadcast back onto the quotas
    val nOut = counts.agg(min(expr("(n * 10) div wnum")).as("n_out"))
    val quotas = counts.crossJoin(broadcast(nOut))
      .select($"source", expr("(wnum * n_out) div 10").as("k"))
    docs.join(broadcast(quotas), "source")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"source").orderBy($"h", $"doc_id")))
      .filter($"rk" <= $"k")
      .select($"doc_id", $"source", $"rk")
  }

  val mixSourcesSql: String = """
    WITH docs AS (
      SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h,
             CASE source WHEN 'src0' THEN 5 WHEN 'src1' THEN 3 ELSE 2 END AS wnum
      FROM documents WHERE source IN ('src0', 'src1', 'src2')),
    counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n, MIN(wnum) AS wnum
      FROM docs GROUP BY source),
    n_out AS (SELECT MIN((n * 10) // wnum) AS n_out FROM counts),
    quotas AS (
      SELECT source, CAST((wnum * (SELECT n_out FROM n_out)) // 10 AS BIGINT) AS k
      FROM counts),
    ranked AS (
      SELECT d.doc_id, d.source, q.k,
             row_number() OVER (PARTITION BY d.source ORDER BY d.h, d.doc_id) AS rk
      FROM docs d JOIN quotas q USING (source))
    SELECT doc_id, source, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= k"""

  /** Curriculum mixture ANNEALING — the phase-dependent form of
    * [[mixSources]]: modern training recipes shift the domain mixture
    * over the run (web-heavy early for coverage, curated/quality-heavy
    * late — the "anneal" phase of e.g. data-mixture curricula), so the
    * mix is a SCHEDULE, not one static set of weights. Per phase
    * (epoch), the same integer-exact construction as the static mix —
    * output size pinned by that phase's binding source, quotas
    * k = w·N_out div denom — against that phase's weight row.
    *
    * The per-source pick ORDER (md5(doc_id), doc_id) is shared across
    * phases, which buys the auditable stable-prefix property: a
    * source's phase-p selection is a PREFIX of any phase where its
    * quota is larger, so documents enter/leave the mix monotonically
    * as their domain anneals up/down — no churn beyond the quota
    * delta (what an incremental data loader actually wants to ship
    * between phases).
    *
    * Scale shape: ONE corpus scan, ONE rank window per source (rank is
    * phase-independent, computed once), counts = a #sources-row agg;
    * the phase schedule and quotas ride broadcast joins, and the
    * #phases fan-out happens on the quota table (phases × sources
    * rows), never on the corpus. All integer math — exact hash oracle.
    */
  def annealMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // (epoch, w_src0, w_src1, w_src2) out of denom 10: web-heavy -> flat
    // -> curated-heavy
    val phases = AnnealSchedule.zipWithIndex.flatMap { case ((w0, w1, w2), e) =>
      Seq((e, "src0", w0), (e, "src1", w1), (e, "src2", w2))
    }.toDF("epoch", "source", "wnum")
    val docs = Tables.documents(spark, dir)
      .filter($"source".isin("src0", "src1", "src2"))
      .select($"doc_id", $"source",
        md5($"doc_id".cast("string").cast("binary")).as("h"))
    val counts = docs.groupBy($"source").agg(count(lit(1)).as("n"))
    val nOut = counts.join(broadcast(phases), "source")
      .groupBy($"epoch").agg(min(expr("(n * 10) div wnum")).as("n_out"))
    val quotas = phases.join(broadcast(counts), "source")
      .join(broadcast(nOut), "epoch")
      .select($"epoch", $"source", expr("(wnum * n_out) div 10").as("k"))
    docs
      .withColumn("rk", row_number().over(
        Window.partitionBy($"source").orderBy($"h", $"doc_id")))
      .join(broadcast(quotas), "source")
      .filter($"rk" <= $"k")
      .select($"epoch", $"doc_id", $"source", $"rk")
  }

  /** The anneal schedule (weights per phase out of denom 10), shared by
    * the operator and its oracle so they can never desynchronize.
    */
  private val AnnealSchedule: Seq[(Long, Long, Long)] =
    Seq((6L, 3L, 1L), (4L, 4L, 2L), (2L, 4L, 4L))

  def annealMixSql: String = {
    val values = AnnealSchedule.zipWithIndex.flatMap { case ((w0, w1, w2), e) =>
      Seq(s"($e,'src0',$w0)", s"($e,'src1',$w1)", s"($e,'src2',$w2)")
    }.mkString(",")
    s"""
    WITH docs AS (
      SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents WHERE source IN ('src0', 'src1', 'src2')),
    phases(epoch, source, wnum) AS (VALUES $values),
    counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM docs GROUP BY source),
    nout AS (
      SELECT epoch, MIN((n * 10) // wnum) AS n_out
      FROM phases JOIN counts USING (source) GROUP BY epoch),
    quotas AS (
      SELECT epoch, source, CAST((wnum * n_out) // 10 AS BIGINT) AS k
      FROM phases JOIN nout USING (epoch)),
    ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
      FROM docs)
    SELECT q.epoch, r.doc_id, r.source, CAST(r.rk AS INT) AS rk
    FROM ranked r JOIN quotas q USING (source) WHERE r.rk <= q.k"""
  }

  /** Cluster-balanced corpus curation — the TOPIC-BALANCE step a
    * semantic-curation pipeline runs after learning an embedding
    * clustering (the DataComp/SemDeDup-family practice: cap each
    * semantic cluster so over-represented topics cannot dominate the
    * training mix): documents (joined 1:1 to their embedding row)
    * assign to their learned k-means cell, and each cell keeps at most
    * `cap` members by the deterministic md5 pick order. The capped SET
    * is auditable and stable under partitioning, and — because the
    * pick order matches [[mixSources]]/[[annealMix]] — a smaller cap's
    * selection is always a prefix of a larger cap's.
    *
    * Scale shape: training is [[Similarity.kmeansCodebook]]'s
    * corpus-once/model-iterate split; assignment is a per-row map
    * against the broadcast codebook inside the scan; the cap is one
    * rank window per cell (k cells — bounded partitions; huge cells
    * route through the same local-top-k plan as the other capped
    * picks). Oracle: the full Lloyd's replay (`ivfTrainedCorpusSql`,
    * shared with `ann_ivf`) + the capped pick — train→assign→balance
    * hash-verified end to end.
    */
  def clusterBalance(spark: SparkSession, dir: String, cap: Int = 30): DataFrame = {
    import spark.implicits._
    val (codebook, _) = Similarity.kmeansCodebook(spark, dir)
    val bc = spark.sparkContext.broadcast(codebook)
    val cellUdf = udf((v: Seq[Float]) => Similarity.nearestCell(v.toArray, bc.value)._1)
    Tables.embeddings(spark, dir)
      .select($"vec_id".as("doc_id"), cellUdf($"embedding").as("cell"),
        md5($"vec_id".cast("string").cast("binary")).as("h"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"cell").orderBy($"h", $"doc_id")))
      .filter($"rk" <= cap)
      .select($"doc_id", $"cell", $"rk")
  }

  def clusterBalanceSql(cap: Int = 30, k: Int = 10, iters: Int = 4): String =
    Similarity.ivfTrainedCorpusSql(k, iters) + s""",
    picked AS (
      SELECT vec_id AS doc_id, cell,
             row_number() OVER (PARTITION BY cell
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
      FROM corpus)
    SELECT doc_id, CAST(cell AS INT) AS cell, CAST(rk AS INT) AS rk
    FROM picked WHERE rk <= $cap"""

  /** TEMPERATURE-sampled language mixture (`sample_temperature`) — the
    * α-sampling standard of multilingual pre-training (mBERT/XLM-R:
    * sample language ℓ ∝ n_ℓ^α, α ≈ 0.5, flattening the head so
    * low-resource languages aren't drowned): [[mixSources]]'s
    * composition-first construction with weights DERIVED from the
    * observed counts instead of a static table. α = 1/2 makes the
    * weight n_ℓ^α an INTEGER SQUARE ROOT, kept exact on both engines
    * by correcting `floor(sqrt(n))` with one ±1 integer adjustment
    * (IEEE sqrt is correctly rounded, so the double seed is within
    * one of the true isqrt; the correction makes the oracle immune
    * even to a last-ulp disagreement). From there the mix machinery
    * is unchanged and all-integer: N_out = min_ℓ (n_ℓ·Σw div w_ℓ)
    * (the binding language caps the corpus), quota
    * k_ℓ = w_ℓ·N_out div Σw, rows picked per language in the shared
    * md5 order (stable-prefix across any quota change, as in the
    * anneal family).
    *
    * Scale shape: counts = one map-side-combined agg (#langs rows);
    * isqrt/totals/quotas all happen on that tiny table and ride
    * broadcast joins; the pick is one rank window per language
    * (huge strata route through the local-top-k plan). One corpus
    * scan, one window shuffle — any scale.
    */
  def sampleTemperature(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        md5($"doc_id".cast("string").cast("binary")).as("h"))
    // the weight/quota math lives on a #langs-sized table — collect it
    // and run the integer arithmetic driver-side (the kmeans-partials
    // move; a first cut derived it as four chained tiny aggregations
    // and paid a corpus scan per branch), then ship quotas back as a
    // broadcast literal table: TWO corpus scans total (counts + pick)
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().sortBy(_._1)
    def isqrt(n: Long): Long = {
      var r = math.sqrt(n.toDouble).toLong
      while ((r + 1) * (r + 1) <= n) r += 1
      while (r * r > n) r -= 1
      r
    }
    val w = counts.map { case (l, n) => (l, n, isqrt(n)) }
    val sw = w.map(_._3).sum
    val nOut = w.map { case (_, n, wi) => n * sw / wi }.min
    val quotas = w.toSeq.map { case (l, _, wi) => (l, wi * nOut / sw) }
      .toDF("lang", "k")
    docs.join(broadcast(quotas), "lang")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"lang").orderBy($"h", $"doc_id")))
      .filter($"rk" <= $"k")
      .select($"doc_id", $"lang", $"rk")
  }

  val sampleTemperatureSql: String = """
    WITH docs AS (
      SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents),
    counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM docs GROUP BY lang),
    w AS (
      SELECT lang, n,
             CASE WHEN (r0 + 1) * (r0 + 1) <= n THEN r0 + 1
                  WHEN r0 * r0 > n THEN r0 - 1
                  ELSE r0 END AS w
      FROM (SELECT lang, n,
                   CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS r0
            FROM counts)),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS sw FROM w),
    n_out AS (SELECT MIN((n * (SELECT sw FROM tot)) // w) AS n_out FROM w),
    quotas AS (
      SELECT lang,
             CAST((w * (SELECT n_out FROM n_out)) // (SELECT sw FROM tot)
                  AS BIGINT) AS k
      FROM w),
    ranked AS (
      SELECT d.doc_id, d.lang, q.k,
             row_number() OVER (PARTITION BY d.lang ORDER BY d.h, d.doc_id) AS rk
      FROM docs d JOIN quotas q USING (lang))
    SELECT doc_id, lang, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= k"""
}
