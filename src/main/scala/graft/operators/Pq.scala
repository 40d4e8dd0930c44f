package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Product quantization (PQ) — the vector-compression workhorse of
  * billion-scale ANN (FAISS IVFPQ, ScaNN): split each d-dim vector into
  * `m` subspaces, k-means each subspace independently, and store a vector
  * as m small codes (here 8 codes × 16 cells = 8 bytes vs 256 bytes of
  * float32 — 32×). Queries score compressed vectors WITHOUT
  * decompression via ADC (asymmetric distance computation): per query,
  * one m×k lookup table of exact sub-inner-products, then each corpus
  * vector's approximate inner product is m table adds.
  *
  * What PQ buys at 100 TB is BANDWIDTH/STORAGE (the corpus scan reads 8
  * bytes/vector, not 256) — not compare-count; pair it with the IVF cell
  * filter ([[Similarity.annIvf]]) for scan reduction. Everything
  * broadcast here is model-sized by construction: the codebook is
  * m×k×(d/m) = d×k doubles (~8 KB), a query's LUT is m×k doubles.
  *
  * Determinism (reproducible index build, same discipline as
  * [[Similarity.kmeansCodebook]]): md5-ordered seeds shared by all
  * subspaces, scaled-integer centroid sums (partition-invariant), ties
  * toward the lower cell id, empty cells keep their centroid. Training
  * makes ONE corpus pass per iteration for ALL subspaces (each partition
  * emits m×k×(subDim+2) partials), not m separate k-means runs.
  *
  * Spec-oracled (SketchSpec): bit-identical retrain, per-subspace
  * monotone objectives, ADC top-5 recall vs exact brute force, and
  * code-reconstruction MSE sanity.
  */
object Pq {

  final case class Codebook(m: Int, k: Int, subDim: Int,
      centroids: Array[Array[Array[Double]]], objectives: Array[Double])

  /** Nearest sub-centroid of `v[s*subDim ..< (s+1)*subDim]` among
    * `cs(s)`: ascending L2, ties toward the lower cell id.
    */
  private[graft] def nearestSubCell(v: Array[Float], s: Int, subDim: Int,
      cs: Array[Array[Double]]): Int = {
    val off = s * subDim
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      val ctr = cs(c)
      var d = 0.0
      var i = 0
      while (i < subDim) { val t = v(off + i) - ctr(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Train the PQ codebook: deterministic per-subspace Lloyd's, one
    * corpus pass per iteration covering all m subspaces at once.
    * `objectives(it)` = total squared distance summed over subspaces
    * against the iteration's INPUT centroids (monotone non-increasing).
    */
  def train(spark: SparkSession, dir: String, m: Int = 8, k: Int = 16,
      iters: Int = 4): Codebook = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].cache()
    val dim = emb.head()._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    // seeds: the first k vectors in md5(vec_id) order seed EVERY
    // subspace with their corresponding slice — RNG-free, engine-free
    val seeds = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", md5($"vec_id".cast("string")).as("h"))
      .orderBy($"h", $"vec_id").limit(k)
      .select($"embedding").as[Array[Float]].collect()
    var centroids = Array.tabulate(m, k) { (s, c) =>
      Array.tabulate(subDim)(i => seeds(c)(s * subDim + i).toDouble)
    }
    val objectives = Array.ofDim[Double](iters)
    for (it <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val partials = emb.mapPartitions { rows =>
        val cs = bc.value
        val cnt = Array.ofDim[Long](m, k)
        val sums = Array.ofDim[Long](m, k, subDim)
        var sq = 0.0
        rows.foreach { case (_, v) =>
          var s = 0
          while (s < m) {
            val cell = nearestSubCell(v, s, subDim, cs(s))
            cnt(s)(cell) += 1
            val ctr = cs(s)(cell)
            val acc = sums(s)(cell)
            var i = 0
            while (i < subDim) {
              val x = v(s * subDim + i).toDouble
              val t = x - ctr(i)
              sq += t * t
              acc(i) += math.round(x * 1e9)
              i += 1
            }
            s += 1
          }
        }
        // flat emission (encoder-friendly): one row per non-empty
        // (subspace, cell) + one sq-objective row per partition
        val cells = for {
          s <- (0 until m).iterator
          c <- (0 until k).iterator
          if cnt(s)(c) > 0
        } yield (s, c, cnt(s)(c), sums(s)(c), 0.0)
        cells ++ Iterator.single((-1, -1, 0L, Array.empty[Long], sq))
      }.collect() // ≤ P × (m×k + 1) partial rows
      val cnt = Array.ofDim[Long](m, k)
      val sums = Array.ofDim[Long](m, k, subDim)
      partials.foreach {
        case (-1, _, _, _, psq) => objectives(it) += psq
        case (s, c, n, ps, _) =>
          cnt(s)(c) += n
          var i = 0
          while (i < subDim) { sums(s)(c)(i) += ps(i); i += 1 }
      }
      centroids = Array.tabulate(m, k) { (s, c) =>
        if (cnt(s)(c) == 0) centroids(s)(c)
        else Array.tabulate(subDim)(i => sums(s)(c)(i).toDouble / 1e9 / cnt(s)(c))
      }
    }
    emb.unpersist(blocking = false)
    Codebook(m, k, subDim, centroids, objectives)
  }

  /** PQ-encode every corpus vector: m codes + the true norm (kept so ADC
    * scores can be normalized like cosine). Per-row map over a broadcast
    * codebook; this projection IS the compressed store a production
    * pipeline writes (8 bytes of codes per vector).
    */
  def encode(spark: SparkSession, dir: String, cb: Codebook): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    val codeUdf = udf { (v: Seq[Float]) =>
      val c = bc.value
      val a = v.toArray
      Array.tabulate(c.m)(s => nearestSubCell(a, s, c.subDim, c.centroids(s)))
    }
    Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding",
        graft.functions.Vectors.norm2($"embedding").as("nrm"))
      .withColumn("codes", codeUdf($"embedding"))
  }

  /** PQ search for the 10 query vectors, the production two-stage shape
    * (FAISS's IVFPQ + refine):
    *
    *  1. **ADC scan** — per query one exact m×k LUT of sub-inner-
    *     products against the codebook; each corpus vector's approximate
    *     inner product is m table adds over ONLY (vec_id, codes, nrm) —
    *     the compressed store. Per-query top-`shortlist` by approx
    *     score (map-side-limited window, like brute force's top-k).
    *  2. **Exact re-rank** — the shortlist (#queries × shortlist rows,
    *     always tiny) joins back to the full vectors by id, exact cosine
    *     re-scores it, top-5 emitted. Full-precision vectors are read
    *     for shortlist rows only — this is why PQ stores can keep the
    *     float vectors in cold storage.
    *
    * Recall is governed by the shortlist depth (ADC error just has to
    * keep a true neighbour inside the top-`shortlist`, not the top-5) —
    * the knob production systems actually tune.
    */
  def annPq(spark: SparkSession, dir: String, cb: Codebook,
      shortlist: Int = 50): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    val encoded = encode(spark, dir, cb)
    // zero-norm guard: cosine is undefined for a zero vector and Spark
    // orders NaN ABOVE every double, so an unguarded 0/0 would top every
    // shortlist — drop zero-norm rows on BOTH sides of BOTH rank windows
    val corpus = encoded.select($"vec_id", $"codes", $"nrm")
      .filter($"nrm" > 0)
    val queries = Tables.embeddings(spark, dir).filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"),
        luts(bc)($"embedding").as("lut"),
        graft.functions.Vectors.norm2($"embedding").as("qn"))
      .filter($"qn" > 0)
    val adc = udf { (lut: Seq[Seq[Double]], codes: Seq[Int]) =>
      var s = 0
      var acc = 0.0
      while (s < codes.length) { acc += lut(s)(codes(s)); s += 1 }
      acc
    }
    val scored = corpus.join(broadcast(queries.select($"query_id", $"lut", $"qn")),
        $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        (adc($"lut", $"codes") / ($"qn" * $"nrm")).as("approx_cos"))
    val wa = Window.partitionBy($"query_id").orderBy($"approx_cos".desc, $"neighbor_id".asc)
    val short = scored.withColumn("arank", row_number().over(wa))
      .filter($"arank" <= shortlist)
      .select($"query_id", $"neighbor_id")
    // exact re-rank: attach full vectors to the tiny shortlist by id
    rerankExact(spark, dir, short)
  }

  private def luts(bc: org.apache.spark.broadcast.Broadcast[Codebook]) =
    udf { (q: Seq[Float]) =>
      val c = bc.value
      Array.tabulate(c.m) { s =>
        Array.tabulate(c.k) { cell =>
          val ctr = c.centroids(s)(cell)
          var d = 0.0
          var i = 0
          while (i < c.subDim) { d += q(s * c.subDim + i).toDouble * ctr(i); i += 1 }
          d
        }
      }
    }

  /** The driver-facing query: train → encode → ADC scan → exact re-rank. */
  def query(spark: SparkSession, dir: String, shortlist: Int = 50): DataFrame =
    annPq(spark, dir, train(spark, dir), shortlist)

  /** IVF + PQ composed — the FAISS `IVFPQ,Refine` production index
    * shape, assembled from graft's two trained stages: the coarse
    * k-means quantizer ([[Similarity.kmeansCodebook]]) partitions the
    * compressed store into cells, each query probes only its `nprobe`
    * nearest cells, the ADC scan runs over the PQ codes of PROBED cells
    * only (nprobe/k of the corpus instead of all of it — the read
    * reduction IVF exists for, stacked on PQ's byte-per-subspace
    * compression), and the exact re-rank touches full-precision vectors
    * for the tiny shortlist alone.
    *
    * Scale: both models are broadcast artifacts (k×dim centroids,
    * m×k×subDim codebook); the probe join replicates each query
    * `nprobe` times (#queries × nprobe rows — broadcast-safe by
    * construction, never corpus-sized); everything downstream is the
    * same map-side-limited windows as [[annPq]]. Rows-only driver
    * check; SketchSpec pins recall vs brute force and the
    * subset-of-probed-cells invariant.
    */
  def annIvfPq(spark: SparkSession, dir: String, nprobe: Int = 3,
      kCells: Int = 10, shortlist: Int = 50): DataFrame = {
    import spark.implicits._
    val (cells, _) = Similarity.kmeansCodebook(spark, dir, kCells, 4)
    val cb = train(spark, dir)
    val bcCells = spark.sparkContext.broadcast(cells)
    val bc = spark.sparkContext.broadcast(cb)
    val cellUdf = udf((v: Seq[Float]) =>
      Similarity.nearestCell(v.toArray, bcCells.value)._1)
    val probeUdf = udf { (v: Seq[Float]) =>
      val a = v.toArray
      bcCells.value.indices
        .map { c =>
          val ctr = bcCells.value(c)
          var d = 0.0
          var i = 0
          while (i < ctr.length) { val t = a(i) - ctr(i); d += t * t; i += 1 }
          (d, c)
        }
        .sorted.take(nprobe).map(_._2)
    }
    val corpus = encode(spark, dir, cb)
      .select($"vec_id", $"codes", $"nrm", cellUdf($"embedding").as("cell"))
      .filter($"nrm" > 0)
    val probes = Tables.embeddings(spark, dir).filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"),
        luts(bc)($"embedding").as("lut"),
        graft.functions.Vectors.norm2($"embedding").as("qn"),
        explode(probeUdf($"embedding")).as("cell"))
      .filter($"qn" > 0)
    val adc = udf { (lut: Seq[Seq[Double]], codes: Seq[Int]) =>
      var s = 0
      var acc = 0.0
      while (s < codes.length) { acc += lut(s)(codes(s)); s += 1 }
      acc
    }
    val scored = corpus.join(broadcast(probes), "cell")
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        (adc($"lut", $"codes") / ($"qn" * $"nrm")).as("approx_cos"))
    val wa = Window.partitionBy($"query_id")
      .orderBy($"approx_cos".desc, $"neighbor_id".asc)
    val short = scored.withColumn("arank", row_number().over(wa))
      .filter($"arank" <= shortlist)
      .select($"query_id", $"neighbor_id")
    rerankExact(spark, dir, short)
  }

  /** Shared exact-cosine re-rank of a (query_id, neighbor_id) shortlist:
    * full-precision vectors attach by id (the shortlist is #queries ×
    * shortlist rows — tiny), top-5 per query emitted.
    */
  private def rerankExact(spark: SparkSession, dir: String,
      short: DataFrame): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding",
        graft.functions.Vectors.norm2($"embedding").as("vnrm"))
      .filter($"vnrm" > 0)
    val qemb = Tables.embeddings(spark, dir).filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"),
        graft.functions.Vectors.norm2($"embedding").as("qn2"))
      .filter($"qn2" > 0)
    val exact = short
      .join(emb, short("neighbor_id") === emb("vec_id"))
      .join(broadcast(qemb), "query_id")
      .select($"query_id", $"neighbor_id",
        (graft.functions.Vectors.dot($"qe", $"embedding") / ($"qn2" * $"vnrm")).as("cos"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    exact.withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
  }

  /** One unrolled per-subspace Lloyd iteration for the DuckDB replay
    * oracles — the PQ twin of [[Similarity.ivfIterSql]]: every subspace
    * trains in the same pass (the codebook table is keyed (s, cell)).
    */
  private def pqIterSql(t: Int): String = s"""
    pqd_$t AS MATERIALIZED (
      SELECT sub.vec_id, sub.s, cb.cell,
             list_reduce(list_transform(list_zip(sub.sv, cb.ctr),
                         p -> (p[1] - p[2]) * (p[1] - p[2])), (a, b) -> a + b) AS d
      FROM sub JOIN pqcb_$t cb USING (s)
    ),
    pqa_$t AS MATERIALIZED (
      SELECT vec_id, s, cell FROM (
        SELECT vec_id, s, cell,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, cell ASC) AS rn
        FROM pqd_$t) WHERE rn = 1
    ),
    pqs_$t AS MATERIALIZED (
      SELECT a.s, a.cell, x.i, SUM(x.sint) AS sm, COUNT(DISTINCT x.vec_id) AS cnt
      FROM pqa_$t a JOIN subx x ON x.vec_id = a.vec_id AND x.s = a.s
      GROUP BY 1, 2, 3
    ),
    pqn_$t AS (
      SELECT s, cell, list(CAST(sm AS DOUBLE) / 1e9 / cnt ORDER BY i) AS ctr
      FROM pqs_$t GROUP BY 1, 2
    ),
    pqcb_${t + 1} AS MATERIALIZED (
      SELECT o.s, o.cell, coalesce(n.ctr, o.ctr) AS ctr
      FROM pqcb_$t o LEFT JOIN pqn_$t n USING (s, cell)
    )"""

  /** Shared replay prefix for the PQ oracles: embeddings with norms,
    * subspace slices (plain + scaled-integer), the seeded codebook, the
    * 4 unrolled training iterations, the final encoding, and the
    * per-query LUT of exact sub-inner-products.
    */
  private val pqTrainedSql: String = """
    e AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, z -> CAST(z AS DOUBLE)) AS emb,
             sqrt(list_sum(list_transform(embedding, z -> CAST(z AS DOUBLE) * CAST(z AS DOUBLE)))) AS nrm
      FROM embeddings
    ),
    sub AS MATERIALIZED (
      SELECT vec_id, s, emb[s*8+1 : s*8+8] AS sv
      FROM e, unnest(range(0, 8)) AS u(s)
    ),
    subx AS MATERIALIZED (
      SELECT vec_id, s, i, CAST(round(sv[i+1] * 1e9) AS BIGINT) AS sint
      FROM sub, unnest(range(0, 8)) AS w(i)
    ),
    pqseeds AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cell, emb
      FROM (SELECT vec_id, emb, md5(CAST(vec_id AS VARCHAR)) AS h
            FROM e ORDER BY h, vec_id LIMIT 16)
    ),
    pqcb_0 AS MATERIALIZED (
      SELECT u.s, pqseeds.cell, emb[u.s*8+1 : u.s*8+8] AS ctr
      FROM pqseeds, unnest(range(0, 8)) AS u(s)
    ),""" + (0 until 4).map(pqIterSql).mkString(",") + """,
    codes AS MATERIALIZED (
      SELECT vec_id, s, cell FROM (
        SELECT sub.vec_id, sub.s, cb.cell,
               row_number() OVER (PARTITION BY sub.vec_id, sub.s
                 ORDER BY list_reduce(list_transform(list_zip(sub.sv, cb.ctr),
                          p -> (p[1] - p[2]) * (p[1] - p[2])), (a, b) -> a + b) ASC,
                 cb.cell ASC) AS rn
        FROM sub JOIN pqcb_4 cb USING (s)) WHERE rn = 1
    ),
    lut AS MATERIALIZED (
      SELECT q.vec_id AS query_id, cb.s, cb.cell,
             list_reduce(list_transform(list_zip(q.emb[cb.s*8+1 : cb.s*8+8], cb.ctr),
                         p -> p[1] * p[2]), (a, b) -> a + b) AS ip
      FROM (SELECT vec_id, emb FROM e WHERE vec_id < 10 AND nrm > 0) q, pqcb_4 cb
    )"""

  /** Shared exact re-rank tail: top-5 per query over the shortlist by
    * full-precision cosine.
    */
  private val rerankSql: String = """
    SELECT s.query_id, s.neighbor_id,
           list_sum(list_transform(list_zip(q.emb, x.emb), z -> z[1] * z[2]))
             / (q.nrm * x.nrm) AS cos,
           CAST(row_number() OVER (PARTITION BY s.query_id
                ORDER BY list_sum(list_transform(list_zip(q.emb, x.emb), z -> z[1] * z[2]))
                         / (q.nrm * x.nrm) DESC, s.neighbor_id ASC) AS INT) AS rank
    FROM short s
    JOIN e x ON x.vec_id = s.neighbor_id AND x.nrm > 0
    JOIN e q ON q.vec_id = s.query_id AND q.nrm > 0
    QUALIFY rank <= 5"""

  /** DuckDB oracle for [[query]] (`ann_pq`) — train → encode → ADC →
    * exact re-rank replayed bit-exactly: the per-subspace Lloyd's
    * unrolls like the IVF oracle, the ADC sum over subspaces is an
    * ordered list fold (ascending s, the Scala loop's order), and the
    * shortlist/re-rank windows use the established cosine forms.
    */
  /** Oracle for [[query]] — the shortlist width derives from the same
    * parameter. (The codebook geometry m/k/iters flows through the
    * trained [[Codebook]] object on both sides and is fixed in
    * [[pqTrainedSql]]; changing it means regenerating that prefix.)
    */
  def annPqSql(shortlist: Int = 50): String = "WITH" + pqTrainedSql + s""",
    adc AS MATERIALIZED (
      SELECT l.query_id, c.vec_id AS neighbor_id,
             list_reduce(list(l.ip ORDER BY l.s), (a, b) -> a + b)
               / (q.nrm * x.nrm) AS approx_cos
      FROM codes c
      JOIN lut l ON l.s = c.s AND l.cell = c.cell
      JOIN e x ON x.vec_id = c.vec_id
      JOIN e q ON q.vec_id = l.query_id
      WHERE c.vec_id != l.query_id AND x.nrm > 0
      GROUP BY l.query_id, c.vec_id, q.nrm, x.nrm
    ),
    short AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY approx_cos DESC, neighbor_id ASC) AS arank
        FROM adc) WHERE arank <= $shortlist
    )""" + rerankSql

  /** DuckDB oracle for [[annIvfPq]] — BOTH trained stages replayed in
    * one query: the coarse k-means cells (the `Similarity.ivfIterSql`
    * blocks over this prefix's nrm-enriched `e` — the extra column is
    * harmless), the PQ codebook, and the probed-cell-restricted ADC
    * with exact re-rank.
    */
  def annIvfPqSql(nprobe: Int = 3, shortlist: Int = 50): String =
    "WITH" + pqTrainedSql + """,
    et AS MATERIALIZED (SELECT * FROM e),
    xs AS MATERIALIZED (
      SELECT vec_id, CAST(i AS BIGINT) - 1 AS dm,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1e9) AS BIGINT) AS s
      FROM embeddings, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) u
    ),
    cb_0 AS MATERIALIZED (
      SELECT list(emb ORDER BY h, vec_id) AS cb
      FROM (SELECT vec_id, emb, md5(CAST(vec_id AS VARCHAR)) AS h
            FROM e ORDER BY h, vec_id LIMIT 10)
    ),""" + (0 until 4).map(Similarity.ivfIterSql).mkString(",") + """,
    dfin AS MATERIALIZED (
      SELECT e.vec_id, cells.c,
             list_reduce(list_transform(list_zip(e.emb, cells.ctr),
                         p -> (p[1] - p[2]) * (p[1] - p[2])), (a, b) -> a + b) AS d
      FROM e, (SELECT unnest(cb) AS ctr, generate_subscripts(cb, 1) - 1 AS c
               FROM cb_4) cells
    ),
    cellasg AS MATERIALIZED (
      SELECT vec_id, c AS cell FROM (
        SELECT vec_id, c,
               row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, c ASC) AS rn
        FROM dfin) WHERE rn = 1
    ),
    probes AS MATERIALIZED (
      SELECT vec_id AS query_id, c AS cell FROM (
        SELECT vec_id, c,
               row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, c ASC) AS rn
        FROM dfin WHERE vec_id < 10) WHERE rn <= """ + nprobe.toString + """
    ),
    adc AS MATERIALIZED (
      SELECT l.query_id, c.vec_id AS neighbor_id,
             list_reduce(list(l.ip ORDER BY l.s), (a, b) -> a + b)
               / (q.nrm * x.nrm) AS approx_cos
      FROM probes p
      JOIN cellasg ca ON ca.cell = p.cell
      JOIN codes c ON c.vec_id = ca.vec_id
      JOIN lut l ON l.query_id = p.query_id AND l.s = c.s AND l.cell = c.cell
      JOIN e x ON x.vec_id = c.vec_id
      JOIN e q ON q.vec_id = p.query_id
      WHERE c.vec_id != p.query_id AND x.nrm > 0
      GROUP BY l.query_id, c.vec_id, q.nrm, x.nrm
    ),
    short AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY approx_cos DESC, neighbor_id ASC) AS arank
        FROM adc) WHERE arank <= """ + shortlist.toString + """
    )""" + rerankSql

  /** Mean squared reconstruction error of the PQ codes — the compression
    * quality metric an index build monitors (spec asserts it shrinks
    * with more training and beats the 1-centroid degenerate codebook).
    */
  def reconstructionMse(spark: SparkSession, dir: String, cb: Codebook): Double = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    val errs = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .map { case (_, v) =>
        val c = bc.value
        var s = 0
        var e = 0.0
        while (s < c.m) {
          val cell = nearestSubCell(v, s, c.subDim, c.centroids(s))
          val ctr = c.centroids(s)(cell)
          var i = 0
          while (i < c.subDim) {
            val t = v(s * c.subDim + i) - ctr(i)
            e += t * t
            i += 1
          }
          s += 1
        }
        e
      }
    errs.agg(avg($"value")).as[Double].head()
  }
}
