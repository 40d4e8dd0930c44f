package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the corpus k-NN graph.
  *
  * Curation pipelines rank documents by graph centrality over the
  * embedding neighbourhood graph (density weighting, representative
  * selection, influence-aware sampling). The primitive is PageRank
  * over the corpus kNN edge list — size-resolved by
  * [[Similarity.knnEdges]]: exact top-k cosine edges at gate/measured
  * scales, hyperplane-LSH candidate edges past
  * [[Similarity.KnnEdgesExactMaxVectors]] (the exact builder is Θ(n²)
  * by contract; at corpus scale the ANN graph is the deployed object).
  *
  * Arithmetic is FIXED-POINT: ranks are BIGINTs scaled by 1e12 and
  * every step is integer multiply / integer (floor) division. Floating
  * sums depend on reduce order, so a float PageRank is not
  * bit-reproducible across partitionings, let alone engines; the
  * integer form is associative-exact — the same device as the
  * exact-integer-moment Pearson in [[Profile.statsCorr]] — which is
  * what lets DuckDB replay the identical iteration as the oracle.
  */
object Graph {

  /** Fixed-point scale: 1e12 (rank mass 1.0 == 1e12). */
  val Scale: Long = 1000000000000L

  /** Damping 0.85 expressed as the integer pair 85/100. */
  private val DampNum = 85L
  private val DampDen = 100L

  /** `iters` rounds of damped PageRank over the k-NN graph.
    *
    * pr⁰(v) = S div N;  pr⁺(v) = (15·S) div (100·N)
    *                            + (85 · Σ_{u→v} (pr(u) div outdeg(u))) div 100
    *
    * Every node of a k-NN graph has out-degree exactly k, so there are
    * no dangling nodes; nodes nobody points at still appear via the
    * left join and hold the base rank.
    *
    * Scale shape: this is Pregel-on-DataFrames — per round ONE join of
    * the edge list with the rank vector on `src` (both sides hash-
    * partitioned on the same key, so the exchange is planned once and
    * reused) and ONE `dst` aggregation with map-side partial sums. The
    * edge list is cached across rounds; nothing corpus-sized ever
    * reaches the driver (the two `count()` scalars are bounded). A
    * fixed small iteration count keeps lineage shallow — a production
    * run at hundreds of rounds would checkpoint every few like
    * [[Clusters.dedupClusters]] does.
    */
  def pagerank(spark: SparkSession, dir: String, iters: Int = 3,
      exactMax: Long = Similarity.KnnEdgesExactMaxVectors): DataFrame = {
    import spark.implicits._
    // edge source resolves by corpus size ([[Similarity.knnEdges]]):
    // exact top-k edges at every gate/measured SF (≤ 100k vectors —
    // oracle replay unchanged), LSH candidate edges past it, where the
    // exact builder's Θ(n²) contract would be the whole row's wall
    // (measured: the 100×-fixture graph rows were this quadratic
    // edge-build, not the linear rank iterations)
    val edges = Similarity.knnEdges(spark, dir, exactMax = exactMax)
      .select($"vec_id".as("src"), $"neighbor_id".as("dst"))
      .cache()
    val outdeg = edges.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    // k-NN: the src set IS the node set (every node emits k edges)
    val nodes = edges.select($"src".as("id")).distinct().cache()
    val n = nodes.count() // bounded driver scalar
    val base = (15L * Scale) / (100L * n)
    val withDeg = edges.join(outdeg, "src").cache()
    var pr = nodes.select($"id", lit(Scale / n).as("pr"))
    for (_ <- 1 to iters) {
      val inflow = withDeg
        .join(pr.withColumnRenamed("id", "src"), "src")
        .select($"dst", expr("pr div outdeg").as("contrib"))
        .groupBy($"dst").agg(sum($"contrib").as("inflow"))
      pr = nodes
        .join(inflow.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select($"id",
          (lit(base) + expr(s"($DampNum * coalesce(inflow, 0L)) div $DampDen"))
            .as("pr"))
    }
    pr.select($"id".as("vec_id"), $"pr".as("pagerank"))
  }

  /** DuckDB replay: same knn edge definition as
    * [[Similarity.embedKnnGraphSql]], then the three iterations
    * unrolled as CTEs. Integer sums widen to HUGEINT in DuckDB, so
    * every aggregate is cast back to BIGINT.
    */
  def pagerankSql(iters: Int = 3): String = {
    val S = Scale
    def iter(prev: String, cur: String): String = s"""
    $cur AS (
      SELECT nd.id,
             CAST((15 * $S) // (100 * (SELECT cnt FROM nn))
               + (85 * COALESCE(CAST(SUM(p.pr // dg.d) AS BIGINT), 0)) // 100
               AS BIGINT) AS pr
      FROM nodes nd
      LEFT JOIN knn e ON e.dst = nd.id
      LEFT JOIN deg dg ON dg.src = e.src
      LEFT JOIN $prev p ON p.id = e.src
      GROUP BY nd.id)"""
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) emb
      |           FROM embeddings),
      |n AS (SELECT vec_id, emb, sqrt(list_sum(list_transform(emb, x -> x*x))) nrm FROM e),
      |s AS (SELECT a.vec_id vid, b.vec_id nid,
      |        list_sum(list_transform(list_zip(a.emb, b.emb), x -> x[1]*x[2])) / (a.nrm * b.nrm) c
      |      FROM n a JOIN n b ON a.vec_id != b.vec_id),
      |knn AS (SELECT vid AS src, nid AS dst FROM (
      |          SELECT vid, nid, row_number() OVER (PARTITION BY vid ORDER BY c DESC, nid) rk
      |          FROM s) WHERE rk <= 3),
      |nodes AS (SELECT DISTINCT src AS id FROM knn),
      |nn AS (SELECT COUNT(*) cnt FROM nodes),
      |deg AS (SELECT src, COUNT(*) d FROM knn GROUP BY src),
      |p0 AS (SELECT id, CAST(""".stripMargin + S.toString +
      """ // (SELECT cnt FROM nn) AS BIGINT) AS pr FROM nodes),""".stripMargin +
      (0 until iters).map(i => iter(s"p$i", s"p${i + 1}")).mkString(",") + s"""
    SELECT id AS vec_id, pr AS pagerank FROM p$iters"""
  }

  /** Per-node triangle count + local clustering coefficient over the
    * undirected k-NN graph — the density signal curation uses to find
    * tightly-knit near-duplicate neighbourhoods (a high-clustering node
    * sits inside a clique-like region; PageRank finds central nodes,
    * this finds DENSE ones).
    *
    * Algorithm: orient every undirected edge low-id → high-id, build
    * wedges (x<y<z) by joining the oriented list with itself on the
    * middle vertex, and close each wedge against the oriented list —
    * every triangle is produced exactly once at its smallest vertex.
    * This is the standard two-join distributed triangle count; each join
    * is keyed, never a cartesian product.
    *
    * Scale: a k-NN graph has undirected degree ≤ 2k, so wedge fan-out is
    * bounded by 4k² per vertex — the joins stay balanced at any corpus
    * size. On a general (skewed) graph the same pipeline holds with the
    * orientation changed to (degree, id) order, which bounds wedge
    * emission by O(m^1.5) total and puts hub vertices at wedge ENDS
    * instead of centers — the one-line skew remedy this operator's
    * contract documents. The clustering coefficient 2T/(d(d−1)) is a
    * fixed double expression over exact integer (T, d), hash-stable
    * across engines.
    */
  def triangles(spark: SparkSession, dir: String,
      exactMax: Long = Similarity.KnnEdgesExactMaxVectors): DataFrame = {
    import spark.implicits._
    // same size-resolved edge source as [[pagerank]] — see the note there
    val knn = Similarity.knnEdges(spark, dir, exactMax = exactMax)
      .select($"vec_id".as("src"), $"neighbor_id".as("dst"))
    val und = knn
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .distinct().cache()
    val nodes = knn.select($"src".as("vec_id")).distinct()
    val deg = und.select($"a".as("vec_id"))
      .unionAll(und.select($"b".as("vec_id")))
      .groupBy($"vec_id").agg(count(lit(1)).as("degree"))
    val wedges = und.select($"a".as("x"), $"b".as("y"))
      .join(und.select($"a".as("y"), $"b".as("z")), "y")
    val tri = wedges
      .join(und.select($"a".as("x"), $"b".as("z")), Seq("x", "z"))
      .select($"x", $"y", $"z")
    val incident = tri
      .select(explode(array($"x", $"y", $"z")).as("vec_id"))
      .groupBy($"vec_id").agg(count(lit(1)).as("n_tri"))
    nodes.join(deg, Seq("vec_id"), "left")
      .join(incident, Seq("vec_id"), "left")
      .select($"vec_id", $"degree",
        coalesce($"n_tri", lit(0L)).as("n_tri"),
        when($"degree" >= 2,
          (lit(2.0) * coalesce($"n_tri", lit(0L)).cast("double")) /
            ($"degree".cast("double") * ($"degree".cast("double") - lit(1.0))))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** DuckDB replay: same knn edge CTE as [[pagerankSql]], then the
    * orient → wedge → close pipeline verbatim.
    */
  val trianglesSql: String = """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) emb
               FROM embeddings),
    n AS (SELECT vec_id, emb, sqrt(list_sum(list_transform(emb, x -> x*x))) nrm FROM e),
    s AS (SELECT a.vec_id vid, b.vec_id nid,
            list_sum(list_transform(list_zip(a.emb, b.emb), x -> x[1]*x[2])) / (a.nrm * b.nrm) c
          FROM n a JOIN n b ON a.vec_id != b.vec_id),
    knn AS (SELECT vid AS src, nid AS dst FROM (
              SELECT vid, nid, row_number() OVER (PARTITION BY vid ORDER BY c DESC, nid) rk
              FROM s) WHERE rk <= 3),
    und AS (SELECT DISTINCT least(src, dst) a, greatest(src, dst) b FROM knn),
    tri AS (SELECT e1.a x, e1.b y, e2.b z
            FROM und e1
            JOIN und e2 ON e2.a = e1.b
            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
    inc AS (SELECT unnest([x, y, z]) AS vec_id FROM tri),
    cnt AS (SELECT vec_id, COUNT(*) AS n_tri FROM inc GROUP BY 1),
    degs AS (SELECT v AS vec_id, COUNT(*) AS degree FROM (
               SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
             GROUP BY 1),
    nodes AS (SELECT DISTINCT src AS vec_id FROM knn)
    SELECT nd.vec_id, dg.degree,
           CAST(COALESCE(c.n_tri, 0) AS BIGINT) AS n_tri,
           CASE WHEN dg.degree >= 2 THEN
             (2.0 * CAST(COALESCE(c.n_tri, 0) AS DOUBLE)) /
             (CAST(dg.degree AS DOUBLE) * (CAST(dg.degree AS DOUBLE) - 1.0))
           ELSE 0.0 END AS clustering
    FROM nodes nd
    LEFT JOIN degs dg ON dg.vec_id = nd.vec_id
    LEFT JOIN cnt c ON c.vec_id = nd.vec_id"""
}
