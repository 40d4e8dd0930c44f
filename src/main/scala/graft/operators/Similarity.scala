package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.sources.Tables

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Scale design: brute-force = broadcast the (small) query set against one
  * scan of the corpus — no corpus self-shuffle; ranking shuffles only
  * (#queries × corpus) scored rows on the query key. The LSH variant is
  * the 100 TB path: bucket the corpus once, join queries to buckets,
  * exact-rescore only candidates.
  */
object Similarity {

  /** Shared DuckDB SQL prefix: embeddings cast to double lists so all
    * cosine arithmetic matches Spark's double fold bit-for-bit.
    */
  private val duckEmb =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) emb
      |           FROM embeddings),
      |n AS (SELECT vec_id, emb, sqrt(list_sum(list_transform(emb, x -> x*x))) nrm FROM e)""".stripMargin

  /** Exact cosine top-5 neighbours for the 10 query vectors (vec_id < 10). */
  def annBruteforce(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Vectors.norm2($"embedding").as("nrm"))
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"nrm".as("qn"))
    val scored = emb.join(broadcast(queries), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        (Vectors.dot($"qe", $"embedding") / ($"qn" * $"nrm")).as("cos"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    scored.withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
  }

  val annBruteforceSql: String = duckEmb + """,
    q AS (SELECT vec_id qid, emb qe, nrm qn FROM n WHERE vec_id < 10),
    s AS (SELECT qid, vec_id nid,
            list_sum(list_transform(list_zip(qe, emb), x -> x[1]*x[2])) / (qn * nrm) c
          FROM q, n WHERE vec_id != qid)
    SELECT qid AS query_id, nid AS neighbor_id, c AS cos,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid) AS INT) AS rank
    FROM s QUALIFY rank <= 5"""

  /** Embedding near-duplicate pairs: cosine ≥ 0.4 (threshold is
    * data-calibrated; the synthetic corpus tops out at ~0.51).
    *
    * Exact contract, fully distributed: a block self-join ("triangle
    * join"). Each vector hashes into one of `blocks` blocks; every
    * unordered block pair (i ≤ j) is one reduce group, and a vector in
    * block b is replicated to exactly the `blocks` groups that pair b
    * with every block. Shuffle volume is O(n·B) rows and task memory is
    * O(n/B) vectors — both tunable via `blocks` to fit any cluster —
    * while the Θ(n²) pair comparisons run as primitive in-memory loops
    * spread evenly over B(B+1)/2 reduce groups. No driver collect, no
    * whole-corpus broadcast.
    *
    * Exact all-pairs is inherently Θ(n²) compare; at 100 TB the
    * sublinear path is [[embedPairsLsh]] (hyperplane-bucketed candidates
    * + exact rescore) — kept separate because LSH recall < 1 would break
    * this operator's exact-threshold contract.
    */
  def embedPairs(spark: SparkSession, dir: String, blocks: Int = 8): DataFrame = {
    import spark.implicits._
    trianglePairs(
      Tables.embeddings(spark, dir)
        .select($"vec_id", $"embedding").as[(Long, Array[Float])],
      blocks, threshold = 0.4)
  }

  /** The reusable exact all-pairs core of [[embedPairs]] (see its
    * scaladoc for the shuffle/memory analysis); separated so specs can
    * drive synthetic corpora — including sizes small enough that some
    * blocks are EMPTY, which must not corrupt the group bookkeeping.
    */
  def trianglePairs(rows: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      blocks: Int, threshold: Double): DataFrame = {
    import rows.sparkSession.implicits._
    val replicated = rows.flatMap { case (id, v) =>
      val blk = (java.lang.Long.hashCode(id) & Int.MaxValue) % blocks
      val nrm = math.sqrt(selfDot(v))
      (0 until blocks).iterator.map { o =>
        val (i, j) = if (o <= blk) (o, blk) else (blk, o)
        (i * blocks + j, blk, id, v, nrm)
      }
    }
    replicated.groupByKey(_._1).flatMapGroups { (rkey, it) =>
      val (gi, gj) = (rkey / blocks, rkey % blocks)
      val left = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Double)]
      val right = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Double)]
      it.foreach { case (_, blk, id, v, nrm) =>
        if (blk == gi) left += ((id, v, nrm)) else right += ((id, v, nrm))
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      def compare(a: (Long, Array[Float], Double), b: (Long, Array[Float], Double)): Unit = {
        val (ida, va, na) = a
        val (idb, vb, nb) = b
        val c = dotD(va, vb) / (na * nb)
        if (c >= threshold) out += (if (ida < idb) (ida, idb, c) else (idb, ida, c))
      }
      if (gi == gj) {
        // diagonal group: all pairs within the block
        var x = 0
        while (x < left.length) {
          var y = x + 1
          while (y < left.length) { compare(left(x), left(y)); y += 1 }
          x += 1
        }
      } else {
        var x = 0
        while (x < left.length) {
          var y = 0
          while (y < right.length) { compare(left(x), right(y)); y += 1 }
          x += 1
        }
      }
      out.iterator
    }.toDF("vec_id_a", "vec_id_b", "cos")
  }

  /** The sublinear scale path for embedding near-dup: hyperplane-LSH
    * bucketed candidate generation (reusing [[Vectors.lshKeys]], the same
    * machinery as [[annLsh]]) + exact [[Vectors.dot]] rescore of
    * candidates only. Each vector lands in `tables` buckets; the
    * self-join touches only same-bucket pairs (expected bucket size
    * n/2^bits per table), so candidate volume is sublinear in n² and the
    * join is an ordinary bucketed equi-join — no all-pairs anywhere.
    *
    * Approximate by construction: a true pair colliding in no table is
    * missed. Rows-only driver check; SketchSpec asserts precision 1.0
    * (exact rescore ⇒ every emitted pair is a true pair) and measures
    * recall against the exact twin [[embedPairs]].
    */
  def embedPairsLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // 4-bit keys × 16 tables: at the near-threshold cosine regime of this
    // corpus (0.4-0.51 ⇒ per-bit collision ~0.63-0.67) more, shorter keys
    // buy recall; real near-dup corpora (cos ≥ 0.9) do well with 8-bit.
    val keyer = Vectors.lshKeys(dim = 64, tables = 16, bits = 4)
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Vectors.norm2($"embedding").as("nrm"))
    // slim candidate generation: only (vec_id, bucket) rides the self-join
    // and the pair-dedup shuffle; embeddings attach post-candidate via two
    // id equi-joins (the same shape as minhash LSH's signature attach) —
    // never shuffle 64-float payloads through the candidate explosion
    val keys = emb.select($"vec_id", explode(keyer($"embedding")).as("bucket"))
    val cand = keys.toDF("vec_id_a", "bucket")
      .join(keys.toDF("vec_id_b", "bucket"), Seq("bucket"))
      .filter($"vec_id_a" < $"vec_id_b")
      .select($"vec_id_a", $"vec_id_b")
    val a = emb.select($"vec_id".as("vec_id_a"), $"embedding".as("ea"), $"nrm".as("na"))
    val b = emb.select($"vec_id".as("vec_id_b"), $"embedding".as("eb"), $"nrm".as("nb"))
    // dedupe AFTER the rescore+threshold: with the embedding side
    // broadcastable the attach joins are map-side, the codegen'd dot is
    // ~ns/pair, and only the tiny surviving pair set hits the dedup
    // shuffle (vs shuffling the full multi-table candidate set up front).
    // When the embedding side is too big to broadcast — shuffle-join
    // attach — flip to candidate-first distinct so id pairs shuffle once.
    cand.join(broadcast(a), Seq("vec_id_a")).join(broadcast(b), Seq("vec_id_b"))
      .select($"vec_id_a", $"vec_id_b",
        (Vectors.dot($"ea", $"eb") / ($"na" * $"nb")).as("cos"))
      .filter($"cos" >= 0.4)
      .dropDuplicates("vec_id_a", "vec_id_b")
  }

  /** Sequential double left fold — bit-identical to the DuckDB oracle's
    * list_sum(list_transform(list_zip(...))).
    */
  private def dotD(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private def selfDot(a: Array[Float]): Double = dotD(a, a)

  val embedPairsSql: String = duckEmb + """
    SELECT * FROM (
      SELECT a.vec_id vec_id_a, b.vec_id vec_id_b,
             list_sum(list_transform(list_zip(a.emb, b.emb), x -> x[1]*x[2])) / (a.nrm * b.nrm) cos
      FROM n a JOIN n b ON a.vec_id < b.vec_id)
    WHERE cos >= 0.4"""

  /** LSH-bucketed ANN: 8 tables × 6-bit hyperplane keys, exact re-score of
    * in-bucket candidates, top-5. Rows-only driver check; SketchSpec
    * measures recall against [[annBruteforce]].
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // 6-bit keys: on this synthetic corpus (no real clusters, top cosine
    // ~0.5) wider buckets trade scan fraction (~10-15% of corpus) for
    // usable recall; real embedding corpora cluster far tighter.
    val keyer = Vectors.lshKeys(dim = 64, tables = 8, bits = 6)
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Vectors.norm2($"embedding").as("nrm"),
        explode(keyer($"embedding")).as("bucket"))
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"nrm".as("qn"), $"bucket")
    val cand = emb.join(queries, Seq("bucket"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), $"qe", $"qn", $"embedding", $"nrm")
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand.select($"query_id", $"neighbor_id",
      (Vectors.dot($"qe", $"embedding") / ($"qn" * $"nrm")).as("cos"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    scored.withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
  }

  /** Per-label centroid of the embedding corpus, one row per (label, dim).
    * Summation runs in exact DECIMAL (float→decimal(27,9) cast on both
    * engines) so the per-dimension sums are order-independent and
    * hash-match; the mean is one final double division. Shape: posexplode
    * ×dim fan-out → ONE shuffle on (label, dim) with map-side partial
    * aggregation — the shuffle carries only #labels × dim × #partitions
    * partial rows regardless of corpus size. This is the seed step of
    * IVF-style ANN indexing (cluster assignment against centroids).
    */
  def embedCentroids(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
      .groupBy($"label", $"dim")
      // exact-integer summation: round(v·1e9) — the double multiply is
      // bit-identical across engines and round() is half-away-from-zero
      // in both, so each addend is the SAME integer everywhere (unlike
      // double→decimal casts, whose rounding paths differ ~1e-9 on some
      // values). Integer sums are order-independent; one final double
      // division sequence, identical on both sides.
      .agg(sum(round($"v".cast("double") * 1e9).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .select($"label", $"dim",
        ($"s".cast("double") / 1e9 / $"n").as("centroid"), $"n")
  }

  /** IVF-style ANN: the corpus is partitioned into cells (here the
    * `label` column stands in for a k-means coarse quantizer; see
    * [[embedCentroids]] — its output IS the cell codebook), each query
    * probes its `nprobe` nearest cell centroids, and exact cosine runs
    * only inside probed cells.
    *
    * Scale: the codebook is #cells × dim (always broadcastable); the
    * probe join semi-filters the corpus scan to nprobe/#cells of the
    * data — the classic IVF read reduction — and the final top-k is the
    * same map-side-limited window as brute force. No corpus self-join,
    * no full scan per query. Rows-only driver check; SketchSpec asserts
    * internal consistency + recall vs brute force.
    */
  def annIvf(spark: SparkSession, dir: String, nprobe: Int = 3): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    // cell codebook: label -> dense centroid array (ordered by dim)
    val cells = embedCentroids(spark, dir)
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"dim", $"centroid"))).as("cs"))
      .select($"label", $"cs.centroid".as("centroid"))
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"),
        Vectors.norm2($"embedding").as("qn"))
    // score each query against every cell centroid (tiny cross: Q × cells)
    val qDotCell = queries.crossJoin(broadcast(cells))
      .select($"query_id", $"qe", $"qn", $"label",
        Vectors.dot($"qe", $"centroid".cast("array<float>")).as("score"))
    val probes = qDotCell
      .withColumn("cell_rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"score".desc, $"label".asc)))
      .filter($"cell_rank" <= nprobe)
      .select($"query_id", $"qe", $"qn", $"label")
    // exact cosine only inside probed cells
    val corpus = emb.select($"vec_id", $"label", $"embedding",
      Vectors.norm2($"embedding").as("nrm"))
    val scored = corpus.join(broadcast(probes), Seq("label"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), $"label",
        (Vectors.dot($"qe", $"embedding") / ($"qn" * $"nrm")).as("cos"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    scored.withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
  }

  /** Symmetric int8 scalar quantization of each embedding — the storage
    * step that makes a 100 TB vector store tractable (4× smaller than
    * float32, SIMD-friendly dot products). Per vector: scale =
    * max|x|/127, q_i = round(x_i/scale) ∈ [-127, 127]; emitted metrics
    * are ORDER-INDEPENDENT (max abs reconstruction error, zero count) so
    * they hash-match DuckDB bit-for-bit — both engines round half away
    * from zero and divide in IEEE double.
    *
    * Plan: pure per-row Column expressions, no shuffle. `scale`
    * materializes into a column BEFORE the lambdas that use it (an
    * attribute reference is a row read; a computed subtree inside a
    * lambda would re-evaluate per element). The lambdas only touch their
    * own element — the interpreted-HOF cost is ~µs/row on 64-dim
    * vectors, not a hot-path concern.
    */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding",
        (array_max(transform($"embedding", x => abs(x.cast("double")))) / 127.0)
          .as("scale"))
      .filter($"scale" > 0)
      .withColumn("q", transform($"embedding", x => round(x.cast("double") / $"scale")))
      .select($"vec_id", $"scale",
        array_max(zip_with($"q", $"embedding",
          (q, x) => abs(q * $"scale" - x.cast("double")))).as("max_abs_err"),
        size(filter($"q", q => q === 0)).as("n_zero"))
  }

  val embedQuantizeSql: String = """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) emb
               FROM embeddings),
    s AS (SELECT vec_id, emb,
                 list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
          FROM e),
    q AS (SELECT vec_id, emb, scale,
                 list_transform(emb, x -> round(x / scale)) AS qv
          FROM s WHERE scale > 0)
    SELECT vec_id, scale,
           list_max(list_transform(list_zip(qv, emb), p -> abs(p[1] * scale - p[2]))) AS max_abs_err,
           CAST(len(list_filter(qv, x -> x = 0)) AS INT) AS n_zero
    FROM q"""

  val embedCentroidsSql: String = """
    WITH x AS (
      SELECT label, CAST(i AS INT) - 1 AS dim,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1e9) AS BIGINT) AS v
      FROM embeddings,
           LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i))
    SELECT label, dim,
           CAST(SUM(v) AS DOUBLE) / 1e9 / COUNT(*) AS centroid,
           COUNT(*) AS n
    FROM x GROUP BY label, dim"""
}
