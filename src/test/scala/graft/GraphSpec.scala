package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Semantic oracles for the fixed-point PageRank (the DuckDB replay in
  * CORRECTNESS checks engine parity; these check the MATH).
  */
class GraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val pr: Map[Long, Long] =
    Graph.pagerank(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pagerank covers every embedding exactly once, all ranks positive") {
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(pr.size === n)
    assert(pr.values.forall(_ > 0))
  }

  test("rank mass is conserved up to integer-floor dust") {
    // every div floors away < 1 fixed-point unit per node/edge per round;
    // with N=500, E=1500, 3 rounds the loss is < ~10k units of 1e12
    val total = pr.values.sum
    assert(total <= Graph.Scale)
    assert(total > (Graph.Scale * 0.999).toLong,
      s"mass $total lost more than 0.1% of ${Graph.Scale}")
  }

  test("nodes with no in-edges sit exactly at the damped base rank") {
    import spark.implicits._
    val edges = graft.operators.Similarity.embedKnnGraph(spark, sf)
      .select($"vec_id".as("src"), $"neighbor_id".as("dst"))
    val dsts = edges.select("dst").distinct().as[Long].collect().toSet
    val n = pr.size.toLong
    val base = (15L * Graph.Scale) / (100L * n)
    val sinksOnly = pr.keySet.diff(dsts)
    assert(sinksOnly.forall(id => pr(id) == base),
      s"non-base rank on in-degree-0 nodes: ${sinksOnly.filter(id => pr(id) != base).take(3)}")
    // and somebody must be ABOVE base, else the graph did nothing
    assert(pr.values.exists(_ > base))
  }

  test("integer arithmetic makes reruns bit-identical") {
    val again = Graph.pagerank(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === pr)
  }

  test("triangles match a driver-side exact recount; clustering is 2T/d(d-1)") {
    import spark.implicits._
    val und = graft.operators.Similarity.embedKnnGraph(spark, sf)
      .select($"vec_id".as("src"), $"neighbor_id".as("dst"))
      .as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2).map { case (k, v) => k -> v.toSet }
    val exactTri = adj.map { case (v, nbrs) =>
      v -> nbrs.toSeq.combinations(2)
        .count { case Seq(x, y) => und((math.min(x, y), math.max(x, y))) }
        .toLong
    }
    val got = Graph.triangles(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === adj.keySet)
    got.foreach { case (v, (deg, ntri, cc)) =>
      assert(deg === adj(v).size.toLong, s"degree of $v")
      assert(ntri === exactTri(v), s"triangle count of $v")
      val expCc =
        if (deg >= 2) (2.0 * ntri) / (deg.toDouble * (deg.toDouble - 1.0))
        else 0.0
      assert(cc === expCc, s"clustering of $v")
      assert(cc >= 0.0 && cc <= 1.0)
    }
    assert(got.values.map(_._2).sum % 3 === 0L,
      "incident counts must triple-count each triangle")
    assert(got.values.exists(_._2 > 0), "k-NN graph should close some triangles")
  }

  test("knn edge source resolves exact at every gate corpus, lsh past the swap point") {
    import graft.operators.Similarity
    // every hash-gate corpus (sf0.001/0.01/0.1 ≤ 2,000 vectors) and the
    // 10x fixture (20,000) sit under the threshold — the oracles replay
    // exact edges; the 100x fixture's 200k sits above
    for (n <- Seq(50L, 500L, 5000L, 50000L, Similarity.KnnEdgesExactMaxVectors))
      assert(Similarity.knnSourceTagFor(n) === "exact", s"n=$n")
    for (n <- Seq(Similarity.KnnEdgesExactMaxVectors + 1, 500000L, 5000000L))
      assert(Similarity.knnSourceTagFor(n) === "lsh", s"n=$n")
    assert(GraftConfig.knnEdgesExactMaxVectors ===
      Similarity.KnnEdgesExactMaxVectors)
  }

  test("knnEdges IS the builder its tag names (forced-lsh ≡ the lsh twin)") {
    import graft.operators.Similarity
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getInt(3))
    // default resolution at gate SF = the exact builder, row for row
    val auto = Similarity.knnEdges(spark, sf).collect().map(key).toSet
    val exact = Similarity.embedKnnGraph(spark, sf).collect().map(key).toSet
    assert(auto === exact)
    // exactMax = 0 forces every corpus onto the lsh path
    val forced = Similarity.knnEdges(spark, sf, exactMax = 0L)
      .collect().map(key).toSet
    val lsh = Similarity.embedKnnGraphLsh(spark, sf).collect().map(key).toSet
    assert(forced === lsh)
  }

  test("pagerank over forced-lsh edges keeps the consumer contracts") {
    // the at-scale shape: out-degree may drop below k for bucket-orphaned
    // nodes; degree is COMPUTED so ranks stay positive and mass bounded
    val lshPr = Graph.pagerank(spark, sf, exactMax = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lshPr.nonEmpty)
    assert(lshPr.values.forall(_ > 0))
    assert(lshPr.values.sum <= Graph.Scale)
    val triRows = Graph.triangles(spark, sf, exactMax = 0L).collect()
    assert(triRows.nonEmpty)
    triRows.foreach { r =>
      val cc = r.getDouble(3)
      assert(cc >= 0.0 && cc <= 1.0)
    }
  }
}
