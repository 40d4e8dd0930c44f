package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over the near-duplicate pair graph — the step
  * that turns PAIRS (what every near-dup detector emits) into CLUSTERS
  * (what a dedup pipeline actually acts on: keep one doc per component).
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round every node takes the min of its own label
  * and its neighbours' labels; at the fixpoint every node carries the
  * minimum doc_id of its component — a deterministic, engine-independent
  * cluster id. Each round is ONE join + ONE aggregation on the edge list
  * (both plain hash shuffles Catalyst plans normally, AQE-splittable),
  * and `localCheckpoint` cuts the growing lineage so round N+1 reads
  * round N's materialized labels instead of replaying the whole chain.
  *
  * Scale: rounds = graph diameter. Near-dup components are overwhelmingly
  * tiny and star-or-chain shaped (diameter ≤ ~3), so this converges in a
  * handful of rounds of edge-cardinality shuffles — the right trade at
  * 100 TB, where per-round cost dominates. For adversarially long chains
  * the literature's large-star/small-star variant (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond") reduces rounds to
  * O(log n) with the same per-round join shape; the propagation loop
  * below is the same harness with a different per-round rewrite.
  *
  * Oracle: DuckDB recursive CTE computing reachability labels over the
  * SAME pair set (min reachable id == component min on a symmetric edge
  * list) — an exact SQL hash-match, plus a ScalaTest spec on synthetic
  * graphs (chains, stars, isolated pairs).
  */
object Clusters {

  /** Clusters of the exact 3-gram Jaccard ≥ 0.8 near-dup graph
    * ([[Dedup.ngramJaccard]]'s verified pair set). One row per clustered
    * doc: (doc_id, cluster_id = min doc_id in component, n_members).
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Dedup.ngramJaccard(spark, dir)
      .select($"doc_id_a".as("a"), $"doc_id_b".as("b"))
    val labels = propagateMinLabels(pairs)
    labels.select($"node".as("doc_id"), $"label".as("cluster_id"),
      count(lit(1)).over(Window.partitionBy($"label")).as("n_members"))
  }

  /** Min-label propagation to the fixpoint over an undirected edge list
    * given as (a, b) pairs (each undirected edge once, either order).
    * Returns (node, label) with label = min node id of the component.
    * Separated from [[dedupClusters]] so specs can drive synthetic
    * graphs directly.
    */
  def propagateMinLabels(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // symmetric edge list: propagation must flow both directions
    val p = pairs.toDF("a", "b")
    val edges = p.select($"a".as("src"), $"b".as("dst"))
      .union(p.select($"b".as("src"), $"a".as("dst")))
      .localCheckpoint() // pairs are computed once; rounds reuse the result
    var labels = edges.select($"src".as("node")).distinct()
      .select($"node", $"node".as("label"))
      .localCheckpoint()
    var round = 0
    var converged = edges.isEmpty
    while (!converged && round < maxRounds) {
      val nbrMin = edges.join(labels, edges("dst") === labels("node"))
        .groupBy(edges("src").as("n2"))
        .agg(min(labels("label")).as("nbr_label"))
      val next = labels.join(nbrMin, labels("node") === nbrMin("n2"), "left")
        .select(labels("node"),
          least(labels("label"), coalesce($"nbr_label", labels("label"))).as("label"),
          (labels("label") > coalesce($"nbr_label", labels("label")))
            .cast("long").as("chg"))
        .localCheckpoint()
      converged = next.agg(coalesce(sum($"chg"), lit(0L))).as[Long].head == 0L
      labels = next.select($"node", $"label")
      round += 1
    }
    require(converged, s"label propagation did not converge in $maxRounds rounds")
    labels
  }

  /** Reachability-label recursive CTE over the verified Jaccard pair set:
    * node n gets every label reachable from it; MIN per node == component
    * min because the edge list is made symmetric first.
    */
  val dedupClustersSql: String = s"""
    WITH RECURSIVE pairs AS (
      ${Dedup.ngramJaccardSql}
    ),
    edges AS (
      SELECT doc_id_a AS s, doc_id_b AS d FROM pairs
      UNION
      SELECT doc_id_b AS s, doc_id_a AS d FROM pairs
    ),
    reach(node, label) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.s, r.label FROM edges e JOIN reach r ON r.node = e.d
    ),
    comp AS (SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node)
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
    FROM comp"""
}
