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
    * Exact all-pairs via broadcast-corpus + per-partition primitive loops:
    * one side of the O(n²) comparison is broadcast (embeddings are the
    * SMALL distilled table; 2 K × 64 floats ≈ 0.5 MB — at 100 TB the
    * corpus-scale near-dup path is [[annLsh]] / [[Dedup.minhashLsh]],
    * all-pairs is for the final candidate set), the other side streams
    * partition-local. Equivalent join-based form costs ~15 µs/pair in
    * interpreted UDF/HOF overhead; this is ~0.1 µs/pair.
    */
  def embedPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
    val corpus = rows.collect().sortBy(_._1)
    val norms = corpus.map { case (_, v) => math.sqrt(selfDot(v)) }
    val bc = spark.sparkContext.broadcast((corpus, norms))
    rows.mapPartitions { it =>
      val (corp, nrm) = bc.value
      it.flatMap { case (ida, va) =>
        val na = math.sqrt(selfDot(va))
        // corp is sorted by vec_id: only compare against larger ids
        val start = lowerBound(corp, ida)
        (start until corp.length).iterator.flatMap { j =>
          val (idb, vb) = corp(j)
          val c = dotD(va, vb) / (na * nrm(j))
          if (c >= 0.4) Some((ida, idb, c)) else None
        }
      }
    }.toDF("vec_id_a", "vec_id_b", "cos")
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

  /** Index of the first corpus entry with vec_id strictly greater than id. */
  private def lowerBound(corp: Array[(Long, Array[Float])], id: Long): Int = {
    var lo = 0
    var hi = corp.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (corp(mid)._1 <= id) lo = mid + 1 else hi = mid
    }
    lo
  }

  val embedPairsSql: String = duckEmb + """
    SELECT * FROM (
      SELECT a.vec_id vec_id_a, b.vec_id vec_id_b,
             list_sum(list_transform(list_zip(a.emb, b.emb), x -> x[1]*x[2])) / (a.nrm * b.nrm) cos
      FROM n a JOIN n b ON a.vec_id < b.vec_id)
    WHERE cos >= 0.4"""

  /** LSH-bucketed ANN: 8 tables × 8-bit hyperplane keys, exact re-score of
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
