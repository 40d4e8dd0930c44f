package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text
import graft.operators.{Dedup, Similarity}

/** In-repo oracles for the sketch operators the driver can only
  * rows-check: MinHash+LSH, SimHash, hyperplane-LSH ANN, rolling hash.
  */
class SketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def pairs(df: org.apache.spark.sql.DataFrame,
      a: String = "doc_id_a", b: String = "doc_id_b"): Set[(Long, Long)] =
    df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("MIPS norm-augmentation ranks exactly like raw inner product") {
    // The reduction embed_mips's scale path rests on (Bachrach et al.
    // 2014): with phi(x) = [x, sqrt(M^2 - |x|^2)] and psi(q) = [q, 0],
    // cos(psi(q), phi(x)) = <q,x> / (|q|·M) — a per-query-constant
    // positive scaling of the inner product, so the neighbor RANKING is
    // identical and any cosine ANN index serves MIPS unchanged.
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .collect().map(r => r.getLong(0) ->
        r.getAs[Seq[Float]](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val m2 = emb.values.map(v => dot(v, v)).max
    def phi(v: Array[Double]) = v :+ math.sqrt(math.max(m2 - dot(v, v), 0.0))
    for (qid <- 0L until 5L) {
      val q = emb(qid)
      val psiQ = q :+ 0.0
      val others = emb.keys.filter(_ != qid).toSeq
      val byIp = others.sortBy(o => (-dot(q, emb(o)), o)).take(10)
      val byAug = others.sortBy { o =>
        val p = phi(emb(o))
        (-(dot(psiQ, p) / math.sqrt(dot(p, p))), o)
      }.take(10)
      assert(byIp === byAug,
        s"augmented-cosine ranking diverged from raw IP for query $qid")
    }
  }

  test("mm_simhash pairs a one-byte-flipped payload copy; unrelated payloads stay apart") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_mmsim").toString
    val rnd = new scala.util.Random(7)
    // base "payload" text of 400 deterministic chars; the near-dup flips
    // ONE character (≤4 byte-grams change → few simhash bits move);
    // the two unrelated docs are independent draws
    val base = Array.fill(400)(('a' + rnd.nextInt(26)).toChar).mkString
    val flipped = base.updated(200, if (base(200) == 'z') 'a' else 'z')
    val unrelated1 = Array.fill(400)(('a' + rnd.nextInt(26)).toChar).mkString
    val unrelated2 = Array.fill(400)(('a' + rnd.nextInt(26)).toChar).mkString
    Seq((1L, base), (2L, flipped), (3L, unrelated1), (4L, unrelated2))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.operators.Multimodal.payloadSimhash(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Int]("hamming")).toMap
    assert(got.contains((1L, 2L)),
      s"one-byte-flipped copy not caught: $got")
    assert(got((1L, 2L)) <= 3)
    assert(got.keySet.forall(p => p == ((1L, 2L))),
      s"unrelated payloads paired: $got")
    // exact byte copies collide at distance 0 (the mm_dedup overlap case)
    val h = graft.operators.Multimodal.byteGramHashes(base.getBytes("UTF-8"))
    assert(Text.simhash64(h) === Text.simhash64(
      graft.operators.Multimodal.byteGramHashes((base + "").getBytes("UTF-8"))))
  }

  test("minhash LSH recovers every exact-Jaccard>=0.8 pair (recall 1.0 on planted dups)") {
    val exact = pairs(Dedup.ngramJaccard(spark, sf))
    val cand = pairs(Dedup.minhashLsh(spark, sf))
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    assert(exact.subsetOf(cand),
      s"missed pairs: ${exact.diff(cand).take(5)}")
  }

  test("minhash signature-estimated Jaccard tracks exact Jaccard within 0.15") {
    val exact = Dedup.ngramJaccard(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val est = Dedup.minhashLsh(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val common = exact.keySet.intersect(est.keySet)
    assert(common.nonEmpty)
    common.foreach { k =>
      assert(math.abs(exact(k) - est(k)) <= 0.15,
        s"pair $k exact=${exact(k)} est=${est(k)}")
    }
  }

  test("simhash Hamming<=3 pairs are true near-duplicates (precision)") {
    val exact = pairs(Dedup.ngramJaccard(spark, sf))
    val sh = pairs(Dedup.simhash(spark, sf))
    assert(sh.nonEmpty, "simhash should find the closest planted dups")
    val truePos = sh.intersect(exact).size.toDouble / sh.size
    assert(truePos >= 0.9, s"precision $truePos; fp pairs: ${sh.diff(exact).take(5)}")
  }

  test("simhash doc-level and collapsed plans emit the identical pair set") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the executable form of the collapse's case-split proof: planted
    // signatures — a 4-copy clique (sig 0x1111), a near-dup at
    // Hamming 1 of it, a second 3-copy clique far away (>3 bits), and
    // two unrelated sigs — exercise within-group, cross-group, and
    // no-pair cases on both the shipped collapse and the doc-level
    // reference twin (routing between them was measured and REJECTED
    // r16 — see simhashPairs' scaladoc — but the equality proof is
    // what makes the collapse trustworthy, so it stays executable)
    val sigs = Seq(
      1L -> 0x1111L, 2L -> 0x1111L, 3L -> 0x1111L, 4L -> 0x1111L,
      5L -> 0x1113L,                       // Hamming 1 from the clique
      6L -> 0xff00f0L, 7L -> 0xff00f0L, 8L -> 0xff00f0L,
      9L -> 0xabcdef0123L, 10L -> 0x5555aaaa5555L
    ).toDF("doc_id", "sig")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id_a", "doc_id_b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val doc = norm(Dedup.simhashPairsDocLevel(spark, sigs))
    val col = norm(Dedup.simhashPairsCollapsed(spark, sigs))
    assert(doc === col, s"routes diverge: doc-only ${doc.diff(col)}, collapsed-only ${col.diff(doc)}")
    // the clique pairs and the near-dup are all present
    assert(doc.contains((1L, 2L, 0)) && doc.contains((3L, 4L, 0)))
    assert(doc.exists(p => p._1 == 1L && p._2 == 5L && p._3 == 1))
    // no cross-clique or unrelated pair leaked
    assert(!doc.exists(p => p._2 >= 9L || (p._1 <= 5L && p._2 >= 6L && p._2 <= 8L)))
    // and the shipped entrypoint (the collapse) agrees with both
    assert(norm(Dedup.simhashPairs(spark, sigs)) === doc)
  }

  test("lsh ANN candidates achieve usable recall vs brute force on top-5") {
    val brute = Similarity.annBruteforce(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.annLsh(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    // random synthetic vectors have no cluster structure; 6-bit × 8-table
    // hyperplane LSH is calibrated to >=20% top-5 recall here (real
    // embedding corpora cluster and do far better)
    assert(recall >= 0.2, s"recall@5 = $recall")
  }

  test("IVF ANN probes cells correctly and achieves usable recall vs brute force") {
    import org.apache.spark.sql.functions._
    val ivf = Similarity.annIvf(spark, sf).collect()
    // 10 queries × top-5, every neighbor from a probed cell, ranked by cos
    assert(ivf.length === 50)
    ivf.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Any]("cell")).distinct.length <= 3) // nprobe cells
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      val cosines = byRank.map(_.getAs[Double]("cos"))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y })
    }
    val brute = Similarity.annBruteforce(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(got).size.toDouble / brute.size
    // the synthetic corpus is unclustered, so even a learned quantizer's
    // recall is bounded by how often true neighbors land in a probed
    // cell (≈ nprobe/k at random); assert above chance — real embedding
    // corpora cluster and do far better
    assert(recall >= 0.15, s"recall@5 = $recall")
  }

  test("PCA top component: eigenpair residual, variance capture, determinism") {
    val (mean, pc1, lambda) = Similarity.pcaTop(spark, sf)
    assert(pc1.length === 64 && mean.length === 64)
    // unit norm
    val nrm = math.sqrt(pc1.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-9)
    // rebuild the covariance locally and check Cv ≈ λv (a true eigenpair)
    val rows = graft.sources.Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val n = rows.length
    val cov = Array.ofDim[Double](64, 64)
    for (i <- 0 until 64; j <- 0 until 64)
      cov(i)(j) = rows.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
    val cv = Array.tabulate(64)(i => (0 until 64).map(j => cov(i)(j) * pc1(j)).sum)
    val residual = math.sqrt(cv.zip(pc1).map { case (a, b) => (a - lambda * b) * (a - lambda * b) }.sum)
    // the exact covariance differs from the scaled-integer one by the
    // 1e-4 moment quantization; the residual bound reflects both that
    // and power-iteration convergence
    assert(residual / lambda < 1e-3, s"residual=$residual lambda=$lambda")
    // PC1 variance dominates every coordinate axis
    val maxAxisVar = (0 until 64).map(i => cov(i)(i)).max
    assert(lambda >= maxAxisVar * (1 - 1e-6),
      s"lambda=$lambda < max axis variance $maxAxisVar")
    // projection variance equals the eigenvalue (the definition of PC1)
    val projs = Similarity.embedPca(spark, sf).collect().map(_.getDouble(1))
    val pm = projs.sum / projs.length
    val pv = projs.map(p => (p - pm) * (p - pm)).sum / projs.length
    assert(math.abs(pv - lambda) / lambda < 1e-2, s"projVar=$pv lambda=$lambda")
    // bit-identical retrain
    val (m2, v2, l2) = Similarity.pcaTop(spark, sf)
    assert(mean.sameElements(m2) && pc1.sameElements(v2) && lambda === l2)
  }

  test("PCA top-2 deflation: orthogonality, lambda ordering, pc1 consistency, " +
      "deflated eigenpair, determinism") {
    val (mean, comps) = Similarity.pcaTopK(spark, sf, 2)
    assert(comps.size === 2)
    val (v1, l1) = comps(0)
    val (v2, l2) = comps(1)
    // both unit, near-orthogonal, variance-ordered
    assert(math.abs(math.sqrt(v1.map(x => x * x).sum) - 1.0) < 1e-9)
    assert(math.abs(math.sqrt(v2.map(x => x * x).sum) - 1.0) < 1e-9)
    assert(math.abs(v1.zip(v2).map { case (a, b) => a * b }.sum) < 1e-3,
      "pc1 and pc2 should be near-orthogonal")
    assert(l1 >= l2 && l2 > 0, s"lambda order violated: $l1 < $l2")
    // component 1 IS the single-component row's answer
    val (m1, pc1, lam1) = Similarity.pcaTop(spark, sf)
    assert(mean.sameElements(m1) && v1.sameElements(pc1) && l1 === lam1)
    // v2 is an eigenpair of the DEFLATED covariance: rebuild it the
    // exact way training does and check C'v2 ≈ λ2 v2
    val rows = graft.sources.Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val n = rows.length
    val cov = Array.ofDim[Double](64, 64)
    for (i <- 0 until 64; j <- 0 until 64)
      cov(i)(j) = rows.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n -
        l1 * v1(i) * v1(j)
    val cv = Array.tabulate(64)(i => (0 until 64).map(j => cov(i)(j) * v2(j)).sum)
    val residual = math.sqrt(cv.zip(v2).map { case (a, b) =>
      (a - l2 * b) * (a - l2 * b) }.sum)
    assert(residual / l2 < 1e-2, s"deflated residual=$residual lambda2=$l2")
    // the projected columns decorrelate (PCA's defining property)
    val projs = Similarity.embedPcaK(spark, sf).collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val mx = projs.map(_._1).sum / projs.length
    val my = projs.map(_._2).sum / projs.length
    val cxy = projs.map { case (x, y) => (x - mx) * (y - my) }.sum / projs.length
    assert(math.abs(cxy) / (l1 + l2) < 1e-2, s"projection covariance $cxy")
    // bit-identical retrain
    val (meanB, compsB) = Similarity.pcaTopK(spark, sf, 2)
    assert(mean.sameElements(meanB))
    comps.zip(compsB).foreach { case ((va, la), (vb, lb)) =>
      assert(va.sameElements(vb) && la === lb)
    }
  }

  test("LSH kNN graph: per-node caps, exact emitted edges, recall vs the exact twin") {
    val k = 3
    val lsh = Similarity.embedKnnGraphLsh(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(lsh.nonEmpty)
    // at most k per node, no self-edges
    assert(lsh.groupBy(_._1).forall(_._2.length <= k))
    assert(lsh.forall { case (v, n, _) => v != n })
    // every EMITTED edge carries the exact cosine (rescore is exact even
    // though candidate generation is approximate)
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (vecs(a), vecs(b))
      var d = 0.0; var sx = 0.0; var sy = 0.0
      var i = 0
      while (i < x.length) {
        d += x(i).toDouble * y(i).toDouble
        sx += x(i).toDouble * x(i).toDouble
        sy += y(i).toDouble * y(i).toDouble
        i += 1
      }
      d / (math.sqrt(sx) * math.sqrt(sy))
    }
    lsh.foreach { case (v, n, c) => assert(c === cos(v, n), s"edge ($v,$n)") }
    // recall against the exact Θ(n²) twin (measured 0.91 on this corpus;
    // the floor leaves room for plane-stream churn, not for regressions)
    val exact = Similarity.embedKnnGraph(spark, sf, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = lsh.map { case (v, n, _) => (v, n) }.toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@$k = $recall")
  }

  test("incremental PCA refresh: delta projections equal the full-model row bitwise") {
    // the incremental ≡ recompute contract for MODEL STATE: staged base
    // moments + delta scan must reproduce the full-corpus projections
    // exactly (integer-moment additivity), so the delta row's output is
    // the full embedPca output restricted to the delta slice, bit-equal
    val full = Similarity.embedPca(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val delta = Similarity.embedPcaDelta(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(delta.nonEmpty)
    assert(delta.keySet === full.keySet.filter(_ % 10 == 0))
    delta.foreach { case (id, p) =>
      assert(p === full(id), s"vec $id: delta-refresh $p != full ${full(id)}")
    }
  }

  test("k-means codebook training is deterministic with a monotone objective") {
    val (codebook, obj) = Similarity.kmeansCodebook(spark, sf)
    assert(codebook.length === 10)
    assert(codebook.forall(_.length === 64))
    // Lloyd's guarantee: the recorded objective (distance to the
    // iteration's INPUT centroids) never increases across iterations
    obj.zip(obj.tail).foreach { case (a, b) =>
      assert(b <= a * (1 + 1e-12), s"objective rose: $a -> $b (all: ${obj.toSeq})")
    }
    // and training actually moved: the final objective beats the seed one
    assert(obj.last < obj.head, s"k-means learned nothing: ${obj.toSeq}")
    // determinism: retraining reproduces the codebook bit-for-bit
    // (md5-ordered seeds + integer-sum centroids; the sums are also
    // partition-invariant by construction)
    val (again, _) = Similarity.kmeansCodebook(spark, sf)
    codebook.zip(again).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("brute-force ANN output is internally consistent") {
    val rows = Similarity.annBruteforce(spark, sf).collect()
    assert(rows.length === 50) // 10 queries × 5 neighbours
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq === Seq(1, 2, 3, 4, 5))
      val cosines = byRank.map(_.getDouble(2))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y })
      cosines.foreach(c => assert(c >= -1.0001 && c <= 1.0001))
    }
  }

  test("embed triangle join matches a local all-pairs oracle exactly") {
    // small-scale brute-force twin: the oracle the distributed block
    // self-join must reproduce bit-for-bit
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val norms = emb.map { case (_, v) => math.sqrt(dot(v, v)) }
    val expected = (for {
      x <- emb.indices.iterator
      y <- (x + 1) until emb.length
      c = dot(emb(x)._2, emb(y)._2) / (norms(x) * norms(y))
      if c >= 0.4
    } yield ((emb(x)._1, emb(y)._1), c)).toMap
    val got = Similarity.embedPairs(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, c) => assert(got(k) === c, s"cos mismatch on $k") }
  }

  test("triangle join property: random corpora, incl. sizes with EMPTY blocks") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    // n = 3 with blocks = 8 guarantees empty blocks; 40 and 300 exercise
    // diagonal and off-diagonal groups at several densities
    for (n <- Seq(3, 40, 300)) {
      val vecs = (0L until n.toLong).map(id =>
        (id, Array.fill(8)(rnd.nextGaussian().toFloat)))
      val expected = (for {
        x <- vecs.indices.iterator
        y <- (x + 1) until n
        c = dot(vecs(x)._2, vecs(y)._2) /
          (math.sqrt(dot(vecs(x)._2, vecs(x)._2)) * math.sqrt(dot(vecs(y)._2, vecs(y)._2)))
        if c >= 0.1
      } yield (vecs(x)._1, vecs(y)._1)).toSet
      val got = Similarity.trianglePairs(vecs.toDS(), blocks = 8, threshold = 0.1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"n=$n diff=${got.diff(expected).take(3)}/${expected.diff(got).take(3)}")
    }
  }

  test("embed LSH near-dup: precision 1.0 vs exact twin, recall measured") {
    val exact = pairs(Similarity.embedPairs(spark, sf), "vec_id_a", "vec_id_b")
    val lsh = pairs(Similarity.embedPairsLsh(spark, sf), "vec_id_a", "vec_id_b")
    assert(exact.nonEmpty)
    // exact rescore of candidates ⇒ every emitted pair is a true pair
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact).take(5)}")
    val recall = lsh.size.toDouble / exact.size
    // the corpus's near-dups sit at cos 0.4-0.51, the hardest LSH regime
    // (per-bit collision 0.63-0.67) — 16 tables × 4-bit keys is calibrated
    // to >=40% recall here; real near-dup corpora (cos>=0.9) approach 1.0
    assert(recall >= 0.4, s"recall = $recall (${lsh.size}/${exact.size})")
  }

  test("LSH key width scales with corpus size but stays 4 at the gate SFs") {
    // the static DuckDB oracle and the recall calibration replay 4-bit
    // keys: the gate corpora (500 / 2000 vectors) MUST resolve to 4,
    // while larger corpora must widen to keep candidates linear
    for (n <- Seq(1L, 100L, 500L, 2000L))
      assert(Similarity.lshBitsFor(n) === 4, s"n=$n")
    assert(Similarity.lshBitsFor(16000L) === 7) // 128 buckets boundary
    assert(Similarity.lshBitsFor(16001L) === 8)
    assert(Similarity.lshBitsFor(20000L) === 8)
    assert(Similarity.lshBitsFor(2000000L) === 14)
    // monotone, never shrinks with corpus growth
    val seq = Seq(1L, 10L, 1000L, 10000L, 100000L, 1000000L, 10000000L)
      .map(Similarity.lshBitsFor)
    assert(seq === seq.sorted)
  }

  test("rolling hash matches a BigInt reference implementation (overflow-free split)") {
    val Mod = BigInt((1L << 61) - 1)
    def reference(s: String): Long =
      s.foldLeft(BigInt(0))((h, c) => (h * 257 + c.toInt) mod Mod).toLong
    assert(Text.rollingHash("") === 0L)
    assert(Text.rollingHash("a") === 97L)
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val s = rnd.alphanumeric.take(rnd.nextInt(2000)).mkString
      assert(Text.rollingHash(s) === reference(s), s"mismatch on len=${s.length}")
    }
  }

  test("minhash/simhash signatures are deterministic across invocations") {
    val h = Array(123456789L, -987654321L, 42L, Long.MaxValue / 3)
    assert(Text.minhashSignature(h).toSeq === Text.minhashSignature(h.clone()).toSeq)
    assert(Text.simhash64(h) === Text.simhash64(h.clone()))
    assert(Text.minhashBandHashes(h).length === Text.LshBands)
  }

  test("PQ retrain is bit-identical and its objective is monotone") {
    val cb1 = graft.operators.Pq.train(spark, sf)
    val cb2 = graft.operators.Pq.train(spark, sf)
    for (s <- 0 until cb1.m; c <- 0 until cb1.k)
      assert(cb1.centroids(s)(c).toSeq === cb2.centroids(s)(c).toSeq,
        s"subspace $s cell $c differs across retrains")
    cb1.objectives.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-6, s"objective rose: ${cb1.objectives.toSeq}")
    }
  }

  test("PQ reconstruction MSE beats the degenerate 1-cell codebook") {
    val trained = graft.operators.Pq.train(spark, sf)
    val degenerate = graft.operators.Pq.train(spark, sf, k = 1, iters = 1)
    val mseT = graft.operators.Pq.reconstructionMse(spark, sf, trained)
    val mseD = graft.operators.Pq.reconstructionMse(spark, sf, degenerate)
    assert(mseT < mseD,
      s"16-cell codebook ($mseT) should beat 1-cell ($mseD)")
  }

  test("PQ recall is usable and monotone in the shortlist depth") {
    val brute = Similarity.annBruteforce(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cb = graft.operators.Pq.train(spark, sf)
    def recallAt(shortlist: Int): Double = {
      val pq = graft.operators.Pq.annPq(spark, sf, cb, shortlist)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      brute.intersect(pq).size.toDouble / brute.size
    }
    // ADC alone reaches ~0.14 top-5 recall on this clusterless synthetic
    // corpus (true top-5 sit in a flat cos≈0.4-0.5 band — the hardest
    // ADC regime); the shortlist + exact-re-rank stage carries recall,
    // and DEPTH is the production tuning knob — so the contract tested
    // here is (a) usable recall at depth 100, (b) monotone improvement
    val r25 = recallAt(25)
    val r100 = recallAt(100)
    assert(r100 >= 0.8, s"shortlist=100 recall = $r100")
    assert(r100 >= r25, s"recall not monotone in depth: $r25 -> $r100")
  }

  test("delta LSH candidates equal the full-corpus run restricted to pairs touching the delta") {
    // The incremental path (delta bands probing the staged base index +
    // its own bands) must find EXACTLY what a from-scratch full-corpus
    // LSH run finds among pairs with >= 1 delta-side doc — same recall,
    // delta-sized work. Base-vs-base pairs are intentionally absent (the
    // standing index already resolved them).
    val full = pairs(Dedup.minhashLsh(spark, sf))
    val expected = full.filter { case (a, b) => a % 5 == 0 || b % 5 == 0 }
    val got = pairs(Dedup.deltaLshCandidates(spark, sf))
    assert(expected.nonEmpty, "test data should have near-dups touching the delta")
    assert(got === expected,
      s"missing ${expected.diff(got).take(5)}, extra ${got.diff(expected).take(5)}")
  }

  test("PQ zero-norm vectors never reach the shortlist (NaN ordering guard)") {
    // Spark orders NaN above every double, so an unguarded 0/0 cosine
    // would put a zero-norm vector at rank 1 of EVERY query. Plant one
    // and prove the guard keeps it out of all results.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_pq_zero").toString
    val zeroId = 999999L
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val dim = base.select(size($"embedding")).head().getInt(0)
    val zero = Seq((zeroId, Array.fill(dim)(0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding", $"label".cast("int"))
    base.unionByName(zero).write.parquet(s"$tmp/embeddings.parquet")
    val cb = graft.operators.Pq.train(spark, tmp)
    val res = graft.operators.Pq.annPq(spark, tmp, cb).collect()
    assert(res.nonEmpty, "guarded search should still return neighbors")
    assert(!res.exists(_.getLong(1) == zeroId),
      "zero-norm vector surfaced in a shortlist — NaN guard broken")
    assert(res.forall(r => !r.getDouble(2).isNaN),
      "NaN cosine leaked into the result")
  }

  test("IVFPQ: shortlist honors probed cells; recall tracks plain PQ") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val res = graft.operators.Pq.annIvfPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res.nonEmpty)
    // invariant: every returned neighbor lives in one of its query's
    // nprobe probed cells (the IVF read-reduction contract)
    val (cells, _) = Similarity.kmeansCodebook(spark, sf, 10, 4)
    def cellOf(v: Array[Float]) = Similarity.nearestCell(v, cells)._1
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    def probesOf(q: Array[Float]) = cells.indices.map { c =>
      var d = 0.0
      var i = 0
      while (i < cells(c).length) { val t = q(i) - cells(c)(i); d += t * t; i += 1 }
      (d, c)
    }.sorted.take(3).map(_._2).toSet
    res.foreach { case (qid, nid) =>
      assert(probesOf(vecs(qid))(cellOf(vecs(nid))),
        s"neighbor $nid of query $qid came from an unprobed cell")
    }
    // recall vs brute force: bounded below by what cell-pruning keeps —
    // random vectors spread neighbors across cells, so the floor is
    // modest; clustered real corpora do far better
    val brute = Similarity.annBruteforce(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(res).size.toDouble / brute.size
    assert(recall >= 0.2, s"IVFPQ recall@5 = $recall")
  }

  test("containment catches a doc embedded in a larger shell that Jaccard misses") {
    // The operator's motivating claim, proven on a planted corpus: a
    // small doc pasted verbatim inside a much larger shell has shingle
    // containment 1.0 but symmetric Jaccard far below the 0.8 dedup
    // threshold — whole-doc Jaccard is structurally blind to doc-in-doc.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_contain").toString
    val core = (1 to 40).map(i => s"tok$i").mkString(" ")
    val shell = (100 to 400).map(i => s"pad$i").mkString(" ") + " " + core
    val noise = (1 to 3).map(k =>
      (10L + k, (1 to 60).map(i => s"w${k}x$i").mkString(" "), "en", "web"))
    val docs = (Seq((1L, core, "en", "web"), (2L, shell, "en", "web")) ++ noise)
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val cont = graft.operators.Dedup.containment(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("containment"))
      .toMap
    assert(cont.get((1L, 2L)).exists(_ >= 0.999),
      s"embedded doc not caught by containment: $cont")
    val jac = pairs(Dedup.ngramJaccard(spark, tmp))
    assert(!jac.contains((1L, 2L)) && !jac.contains((2L, 1L)),
      "Jaccard unexpectedly caught the embedded pair — planting is wrong")
  }

  test("containment df cap boundary: df == cap kept, df == cap + 1 dropped") {
    // the cap decision has moved twice (r15 in-buffer over-marker:
    // kept iff entries <= cap → r16 df-count + anti-join → r17
    // window-df filter: dropped iff df > cap) — this pins that the
    // boundary itself never moves: four byte-identical one-shingle
    // docs give the shingle df = 4, so cap 4 keeps all 12 ordered
    // pairs and cap 3 drops the shingle (and with it every pair)
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dfcap_b").toString
    (1L to 4L).map(id => (id, "x y z", "en", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def n(cap: Long) = graft.operators.Dedup
      .containment(spark, tmp, checkpoint = false, dfCap = Some(cap)).count()
    assert(n(4L) === 12L, "df == cap must survive the cap filter")
    assert(n(3L) === 0L, "df == cap + 1 must be cut")
  }

  test("containment df cap: hot shingles cut from the count, genuine pairs " +
      "intact with identical values, auto cap inactive on a small corpus") {
    // Planted hot-shingle corpus for the r15 skew guard: one 3-word
    // phrase shared by 31 docs (df 31), a tiny doc T that IS the phrase
    // (its whole shingle set is the hot shingle), and a genuine
    // doc-in-doc pair sharing only cold shingles. The cap must cut
    // exactly the pairs whose counted overlap was hot-only (disclosed
    // false negatives) and leave every other pair bit-identical.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dfcap").toString
    val hot = "h1 h2 h3"
    val core = (1 to 40).map(i => s"tok$i").mkString(" ")
    val shell = (100 to 400).map(i => s"pad$i").mkString(" ") + " " + core
    val noise = (1 to 30).map(k =>
      (100L + k, s"$hot " + (1 to 40).map(i => s"n${k}w$i").mkString(" ")))
    val docs = (Seq((1L, core), (2L, shell), (3L, hot)) ++ noise)
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def res(cap: Option[Long]) =
      Dedup.containment(spark, tmp, checkpoint = false, dfCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val un = res(Some(Long.MaxValue))
    // T is contained (1.0) in every phrase-carrying doc; A in its shell
    assert(un.get((1L, 2L)).exists(_._3 >= 0.999), s"genuine pair lost: $un")
    assert(noise.forall(n => un.contains((3L, n._1))),
      "hot-only containments missing from the uncapped run")
    val capped = res(Some(10L))
    // the hot shingle (df 31 > 10) no longer counts: hot-only pairs are
    // the documented false negatives...
    assert(!capped.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      s"capped run still emits hot-only pairs: ${capped.keySet.filter(p => p._1 == 3L || p._2 == 3L)}")
    // ...and every other pair survives with identical n_a/inter/score
    assert(capped === un.filter { case ((a, b), _) => a != 3L && b != 3L })
    // the auto-sized cap (max(4096, n/20)) resolves inactive here
    assert(res(None) === un, "auto cap unexpectedly active on a 33-doc corpus")
    assert(Dedup.containmentDfCapFor(33) === 4096L &&
      Dedup.containmentDfCapFor(500000) === 25000L &&
      // the O(1) ceiling that keeps pair volume <= cap*postings linear
      // and every surviving collect_list buffer <= 64Ki entries at any corpus
      Dedup.containmentDfCapFor(10000000000L) === 65536L)
  }

  test("embedPairsLsh: identity cliques collapse before bucketing and expand " +
      "back losslessly; zero-norm cliques emit nothing") {
    // Planted identical-embedding cliques (r15 ADVICE: the defining
    // skew input of an embedding dedup — the fixtures hold none, so
    // this corpus pins the collapse): clique A (3 copies), clique B
    // (2 copies of a near-identical vector), one anti-correlated
    // outsider, and a 2-copy ZERO-vector clique whose NaN cosine must
    // produce no pairs, exactly as the doc-level plan dropped it.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_clique").toString
    val rnd = new scala.util.Random(7)
    val a = Array.fill(64)(rnd.nextFloat() - 0.5f)
    val b = a.clone(); b(0) = a(0) + 0.01f
    val far = a.map(x => -x)
    val zero = Array.fill(64)(0f)
    val rows = Seq((1L, a), (2L, a), (3L, a), (4L, b), (5L, b),
      (6L, far), (7L, zero), (8L, zero))
      .map { case (id, v) => (id, v.toSeq, 0) }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rowsOut = Similarity.embedPairsLsh(spark, tmp).collect()
    val out = rowsOut.map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val within = Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))
    val cross = Set((1L, 4L), (1L, 5L), (2L, 4L), (2L, 5L), (3L, 4L), (3L, 5L))
    assert(out.keySet === within ++ cross,
      s"expected cliques + cross pairs, got ${out.keySet}")
    // one row per pair: the expansion must not duplicate
    assert(rowsOut.length === out.size)
    within.foreach(p => assert(math.abs(out(p) - 1.0) < 1e-9,
      s"identical pair $p cos ${out(p)}"))
    // every A-B member pair carries the ONE representative cosine
    assert(cross.map(out).size === 1 && out((1L, 4L)) >= 0.99)
  }

  test("substring dedup: keeper kept, later spans excised, overlap-merge + islands exact") {
    // Planted corpus for every branch of the contract (W = 20):
    //  doc 1  u1..u5 S(21) v1..v4      — first occurrence of S: untouched
    //  doc 2  x1..x5 S(21) y1..y4      — S excised: two OVERLAPPING dup
    //                                    windows (pos 6,7) merge to [6,26]
    //  doc 3  = doc 1 verbatim         — every window dup: stripped to ""
    //  doc 4  five tokens              — shorter than W: untouched
    //  doc 5  T(20) T(20)              — self-repeat: second copy excised
    //  doc 6  z1 z2 S g1..g3 T z3      — TWO islands with a kept gap
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_substr").toString
    def toks(p: String, n: Int) = (1 to n).map(i => f"$p$i%02d")
    val S = toks("s", 21); val T = toks("t", 20)
    val d1 = (toks("u", 5) ++ S ++ toks("v", 4)).mkString(" ")
    val d2 = (toks("x", 5) ++ S ++ toks("y", 4)).mkString(" ")
    val d4 = toks("q", 5).mkString(" ")
    val d5 = (T ++ T).mkString(" ")
    val d6 = (Seq("z01", "z02") ++ S ++ toks("g", 3) ++ T ++ Seq("z03")).mkString(" ")
    Seq((1L, d1), (2L, d2), (3L, d1), (4L, d4), (5L, d5), (6L, d6))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.operators.Dedup.substringDedup(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((30L, 0L, d1)), s"keeper rewritten: ${got(1L)}")
    assert(got(2L) === ((30L, 21L, (toks("x", 5) ++ toks("y", 4)).mkString(" "))),
      s"overlap-merge wrong: ${got(2L)}")
    assert(got(3L) === ((30L, 30L, "")), s"exact dup not stripped: ${got(3L)}")
    assert(got(4L) === ((5L, 0L, d4)), s"short doc touched: ${got(4L)}")
    assert(got(5L) === ((40L, 20L, T.mkString(" "))), s"self-repeat: ${got(5L)}")
    assert(got(6L) === ((47L, 41L, "z01 z02 g01 g02 g03 z03")),
      s"island merge wrong: ${got(6L)}")
  }

  test("CMS: estimates one-sided and bounded; the sketch is LINEAR under shard merge") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // one-sided + bounded on the real corpus: true <= est <= true + 2N/w
    // (the e/w expectation bound with generous slack; exact at this
    // vocab since 31 words rarely collide in 1024 buckets)
    val rows = TextAnalysis.cms(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val n = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("sum(size(filter(split(trim(regexp_replace(regexp_replace(lower(text)," +
        "'[^a-z0-9 ]',' '),' +',' ')),' '), x -> x != ''))) n")
      .head().getLong(0)
    rows.foreach { case (w, t, e) =>
      assert(e >= t, s"CMS under-counted <$w>: $e < $t")
      assert(e - t <= 2 * n / 1024 + 1, s"CMS error blown on <$w>: $e vs $t (N=$n)")
    }
    // LINEARITY: split the corpus into two shards by doc parity; the
    // union's counters equal the elementwise SUM of the shard counters —
    // exactly, the property that makes CMS segments mergeable
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val tmpA = java.nio.file.Files.createTempDirectory("graft_cms_a").toString
    val tmpB = java.nio.file.Files.createTempDirectory("graft_cms_b").toString
    docs.filter($"doc_id" % 2 === 0).write.mode("overwrite").parquet(s"$tmpA/documents.parquet")
    docs.filter($"doc_id" % 2 =!= 0).write.mode("overwrite").parquet(s"$tmpB/documents.parquet")
    def cmap(dir: String) = TextAnalysis.cmsCounters(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val (whole, a, b) = (cmap(sf), cmap(tmpA), cmap(tmpB))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged === whole, "CMS linearity broken: shard-sum != whole-corpus counters")
  }

  test("substring dedup equals an independent reference on random tiny-vocab corpora") {
    // Tiny vocab (4 words) + short docs force dense window collisions,
    // overlapping removals, self-repeats and cross-doc spans the planted
    // corpus can't enumerate; the reference is a direct transliteration
    // of the CONTRACT (window map -> min-(doc,pos) keeper -> covered
    // union -> rebuild), sharing no code with the operator.
    import spark.implicits._
    val W = 4
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val docs = (1L to 12L).map { id =>
        val n = 2 + rnd.nextInt(14)
        id -> Seq.fill(n)(s"w${rnd.nextInt(4)}").mkString(" ")
      }
      val expected: Map[Long, (Long, Long, String)] = {
        val toks = docs.map { case (id, t) => id -> t.split(" ").toVector }.toMap
        val occ = for {
          (id, w) <- toks.toSeq; p <- 1 to w.length - W + 1
        } yield (w.slice(p - 1, p - 1 + W).mkString(" "), id, p)
        val keeper = occ.groupBy(_._1).map { case (win, os) =>
          win -> os.map(o => (o._2, o._3)).min }
        val covered: Map[Long, Set[Int]] = occ
          .filter(o => keeper(o._1) != ((o._2, o._3)))
          .flatMap(o => (o._3 until o._3 + W).map(p => o._2 -> p))
          .groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).toSet }
        toks.map { case (id, w) =>
          val cov = covered.getOrElse(id, Set.empty)
          val kept = w.zipWithIndex.collect { case (t, i) if !cov(i + 1) => t }
          id -> ((w.length.toLong, cov.size.toLong, kept.mkString(" ")))
        }
      }
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_substr_rnd$trial").toString
      docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = graft.operators.Dedup.substringDedup(spark, tmp, w = W).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got === expected, s"trial $trial diverged from the reference")
    }
  }

  test("incremental substring dedup equals the base-first batch reference on random corpora") {
    // Same device as above with the DELTA contract: keeper preference
    // (is_delta, doc_id, pos) — any base occurrence beats any delta one —
    // and only delta docs in the output. Random ids mix base (%5 != 0)
    // and delta (%5 == 0) so base-vs-delta, delta-vs-delta and
    // base-internal-dup cases all occur.
    import spark.implicits._
    val W = 4
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val docs = (1L to 15L).map { id =>
        val n = 2 + rnd.nextInt(14)
        id -> Seq.fill(n)(s"w${rnd.nextInt(4)}").mkString(" ")
      }
      val expected: Map[Long, (Long, Long, String)] = {
        val toks = docs.map { case (id, t) => id -> t.split(" ").toVector }.toMap
        val occ = for {
          (id, w) <- toks.toSeq; p <- 1 to w.length - W + 1
        } yield (w.slice(p - 1, p - 1 + W).mkString(" "), id, p)
        val keeper = occ.groupBy(_._1).map { case (win, os) =>
          win -> os.map(o => (o._2 % 5 == 0, o._2, o._3)).min }
        val covered: Map[Long, Set[Int]] = occ
          .filter(o => keeper(o._1) != ((o._2 % 5 == 0, o._2, o._3)))
          .flatMap(o => (o._3 until o._3 + W).map(p => o._2 -> p))
          .groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).toSet }
        toks.collect { case (id, w) if id % 5 == 0 =>
          val cov = covered.getOrElse(id, Set.empty)
          val kept = w.zipWithIndex.collect { case (t, i) if !cov(i + 1) => t }
          id -> ((w.length.toLong, cov.size.toLong, kept.mkString(" ")))
        }
      }
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_sdelta_rnd$trial").toString
      docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = graft.operators.Dedup.substringDeltaDedup(spark, tmp, w = W).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got === expected, s"trial $trial diverged from the base-first reference")
    }
  }

  test("incremental substring dedup: base spans excised from arrivals, base never rewritten") {
    // Base (ids % 5 != 0): doc 1 holds span S; doc 2 is a verbatim copy
    // of doc 1 (base-internal dup — must NOT appear in the output and
    // must not perturb delta verdicts). Delta (ids % 5 == 0): doc 5
    // pastes S (excised via the staged index), doc 10 is a verbatim copy
    // of doc 5 (fully stripped: every window is in base or earlier
    // delta), doc 15 is unique (untouched).
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_substr_d").toString
    def toks(p: String, n: Int) = (1 to n).map(i => f"$p$i%02d")
    val S = toks("s", 20)
    val d1 = (toks("u", 5) ++ S ++ toks("v", 5)).mkString(" ")
    val d5 = (toks("x", 5) ++ S ++ toks("y", 5)).mkString(" ")
    val d15 = toks("q", 25).mkString(" ")
    Seq((1L, d1), (2L, d1), (5L, d5), (10L, d5), (15L, d15))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.operators.Dedup.substringDeltaDedup(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet === Set(5L, 10L, 15L), s"non-delta rows emitted: ${got.keySet}")
    assert(got(5L) === ((30L, 20L, (toks("x", 5) ++ toks("y", 5)).mkString(" "))),
      s"base span not excised: ${got(5L)}")
    assert(got(10L) === ((30L, 30L, "")), s"delta copy not stripped: ${got(10L)}")
    assert(got(15L) === ((25L, 0L, d15)), s"unique delta touched: ${got(15L)}")
  }

  test("hll_merge: persisted per-day sketch union == direct sketch; error bounded") {
    import org.apache.spark.sql.functions._
    // merged row from the persisted per-day sketches
    val rows = graft.operators.Analytics.qHllMerge(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val events = graft.sources.Tables.events(spark, sf)
    // (a) mergeability: union of per-day sketches == ONE sketch over the
    // whole corpus (HLL registers are max-of-hashes — associative,
    // order-independent), asserted as exact estimate equality
    val direct = events
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))"))
      .head().getLong(0)
    assert(rows("ALL") === direct,
      s"merged=${rows("ALL")} direct=$direct — sketch union must equal one pass")
    // (b) accuracy: every estimate within lgK=12 HLL error (~1.6% rse;
    // allow 5% = ~3 sigma) of the exact distinct count
    val exactAll = events.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(math.abs(rows("ALL") - exactAll).toDouble / exactAll <= 0.05,
      s"merged estimate ${rows("ALL")} vs exact $exactAll")
    val exactByDay = events
      .groupBy(to_date(col("ts")).cast("string").as("d"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exactByDay.foreach { case (d, exact) =>
      assert(math.abs(rows(d) - exact).toDouble / exact <= 0.05,
        s"day $d estimate ${rows(d)} vs exact $exact")
    }
    // (c) determinism: rebuilding the daily sketches from scratch yields
    // byte-identical binaries (what makes persisted sketches diffable)
    val rebuilt = events
      .select(to_date(col("ts")).as("d"), col("user_id"))
      .groupBy(col("d"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sketch"))
      .select(col("d").cast("string"), md5(col("sketch")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val stored = spark.read.parquet(
      graft.sources.DumpCache.dirFor("graft_hll_daily", sf, "events.parquet"))
      .select(col("d").cast("string"), md5(col("sketch")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rebuilt === stored, "per-day sketch bytes changed on rebuild")
  }
}
