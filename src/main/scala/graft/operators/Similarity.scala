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
    * data-calibrated; the synthetic corpus tops out at ~0.51). Exact
    * pairwise — the sublinear path at scale is [[annLsh]]'s bucketing.
    */
  def embedPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", Vectors.norm2($"embedding").as("nrm"))
    emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_id_a"), $"b.vec_id".as("vec_id_b"),
        (Vectors.dot($"a.embedding", $"b.embedding") / ($"a.nrm" * $"b.nrm")).as("cos"))
      .filter($"cos" >= 0.4)
  }

  val embedPairsSql: String = duckEmb + """
    SELECT * FROM (
      SELECT a.vec_id vec_id_a, b.vec_id vec_id_b,
             list_sum(list_transform(list_zip(a.emb, b.emb), x -> x[1]*x[2])) / (a.nrm * b.nrm) cos
      FROM n a JOIN n b ON a.vec_id < b.vec_id)
    WHERE cos >= 0.4"""

  /** LSH-bucketed ANN: 8 tables × 8-bit hyperplane keys, exact re-score of
    * in-bucket candidates, top-5. Rows-only driver check; SimilaritySpec
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
}
