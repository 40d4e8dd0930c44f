package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

/** In-repo oracle for the binned-ECDF two-sample KS variant: the exact
  * statistic must sit inside the bracket the binned row reports, at a
  * width coarse enough that the bracket is genuinely loose, and the
  * width=1 degeneracy must collapse the lower bound onto the exact D
  * (every bin is then a single grid point of the exact row's grid).
  */
class ProfileSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Planted events: arm 0 uniform on $1..$40, arm 1 uniform on
    * $21..$60 — a pure location shift with known exact D = 0.5
    * (ECDFs differ maximally over the non-overlap region $41..$60 where
    * arm 0 has full mass and arm 1 half). Written through parquet so
    * the rows run the real loader path.
    */
  private def plantedDir(): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ks").toString
    val rows = (1 to 40).map(d => (d.toLong * 2, 0L, "click", d.toDouble)) ++
      (1 to 40).map(d => (d.toLong * 2 + 1, 1L, "click", d.toDouble + 20.0))
    rows.toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(1700000000000000 + event_id)"))
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("binned KS brackets the exact statistic; width=1 collapses the lower bound") {
    val dir = plantedDir()
    val exact = Profile.statsKs(spark, dir).head()
    val exactD = exact.getAs[Double]("ks_d")
    assert(math.abs(exactD - 0.5) < 1e-12, s"planted exact D should be 0.5, got $exactD")

    // $10 bins: coarse enough that the bracket is visibly loose
    val coarse = Profile.statsKsBinned(spark, dir, widthCents = 1000L).head()
    val lo = coarse.getAs[Double]("ks_d_lower")
    val hi = coarse.getAs[Double]("ks_d_upper")
    assert(lo <= exactD + 1e-12 && exactD <= hi + 1e-12,
      s"exact D=$exactD outside bracket [$lo, $hi]")
    assert(hi - lo > 1e-9, "coarse bracket should have nonzero width")

    // width=1: one bin per cents grid point -> lower bound IS the exact D
    val fine = Profile.statsKsBinned(spark, dir, widthCents = 1L).head()
    assert(fine.getAs[Long]("d_num") === exact.getAs[Long]("d_num"),
      "width=1 d_num must equal the exact row's d_num")
    assert(fine.getAs[Long]("na") === exact.getAs[Long]("na"))
    assert(fine.getAs[Long]("nb") === exact.getAs[Long]("nb"))
  }

  test("exact AUC: separation, ties, and anti-ranking on planted scores") {
    import spark.implicits._
    def auc(rows: Seq[(Long, Long)]): (Long, Double) = {
      val r = Profile.aucOn(rows.toDF("label", "score_micro")).head()
      (r.getAs[Long]("auc_num"), r.getAs[Double]("auc"))
    }
    // perfect separation: every positive above every negative -> AUC 1
    assert(auc(Seq((1L, 10L), (1L, 9L), (0L, 5L), (0L, 4L)))._2 === 1.0)
    // perfect anti-ranking -> AUC 0
    assert(auc(Seq((1L, 1L), (0L, 5L)))._2 === 0.0)
    // tie handling: pos {2,2}, neg {2,1}: pairs = 4, wins = 2 (both pos
    // beat neg@1), ties = 2 (both pos tie neg@2) -> (2 + 0.5*2)/4 = 0.75
    val (num, a) = auc(Seq((1L, 2L), (1L, 2L), (0L, 2L), (0L, 1L)))
    assert(num === 6L && math.abs(a - 0.75) < 1e-12, s"num=$num auc=$a")
    // random interleave cross-checked against the O(n^2) definition
    val rnd = new scala.util.Random(7)
    val rows = (1 to 60).map(_ => (rnd.nextInt(2).toLong, rnd.nextInt(12).toLong))
    val pos = rows.filter(_._1 == 1L).map(_._2)
    val neg = rows.filter(_._1 == 0L).map(_._2)
    val brute = (for (p <- pos; n <- neg)
      yield (if (p > n) 2L else if (p == n) 1L else 0L)).sum
    val (num2, a2) = auc(rows)
    assert(num2 === brute, s"grid num=$num2 vs brute=$brute")
    assert(math.abs(a2 - brute.toDouble / (2.0 * pos.size * neg.size)) < 1e-12)
  }

  test("calibration: planted bins, clamping, and a known nonzero ECE") {
    import spark.implicits._
    val S = 1000000L
    def calib(rows: Seq[(Long, Long)]) =
      Profile.calibrationOn(rows.toDF("label", "score_micro"))
        .collect().map(r => r.getAs[Long]("bin") -> r).toMap

    // perfectly calibrated two bins: bin 2 (scores 250k, 1/4 positive),
    // bin 7 (scores 750k, 3/4 positive) -> per-bin gap 0, ECE 0
    val good = calib(
      Seq((1L, 250000L), (0L, 250000L), (0L, 250000L), (0L, 250000L),
          (1L, 750000L), (1L, 750000L), (1L, 750000L), (0L, 750000L)))
    assert(good.keySet === Set(2L, 7L))
    assert(good(2L).getAs[Double]("pos_rate") === 0.25)
    assert(good(2L).getAs[Double]("mean_pred") === 0.25)
    assert(good(7L).getAs[Double]("ece") === 0.0)

    // clamping: a negative score lands in bin 0 with clamped pred 0; an
    // over-scale score lands in bin 9 with clamped pred exactly 1
    val cl = calib(Seq((0L, -500000L), (1L, 3000000L)))
    assert(cl.keySet === Set(0L, 9L))
    assert(cl(0L).getAs[Long]("pred_num") === 0L)
    assert(cl(9L).getAs[Long]("pred_num") === S)
    assert(cl(9L).getAs[Double]("mean_pred") === 1.0)

    // known nonzero ECE: one bin, two docs predicted 1.0 but only one
    // positive -> ece_num = |2S - S| = S, ece = S/(2S) = 0.5
    val bad = calib(Seq((1L, S), (0L, S)))
    assert(bad(9L).getAs[Long]("ece_num") === S)
    assert(bad(9L).getAs[Double]("ece") === 0.5)

    // weighted-average identity on a mixed set: ECE recomputed from the
    // reported per-bin integers matches the reported global column
    val rnd = new scala.util.Random(11)
    val rows = (1 to 80).map(_ =>
      (rnd.nextInt(2).toLong, rnd.nextInt(1400000).toLong - 200000L))
    val m = calib(rows)
    val eceNum = m.values.map(r =>
      math.abs(r.getAs[Long]("pred_num") - r.getAs[Long]("pos") * S)).sum
    val nTot = m.values.map(_.getAs[Long]("n")).sum
    val any = m.values.head
    assert(any.getAs[Long]("ece_num") === eceNum)
    assert(any.getAs[Double]("ece") === eceNum.toDouble / (nTot * S).toDouble)
  }

  test("confusion matrix: planted cells, integer-ratio metrics, degenerate guard") {
    import spark.implicits._
    def conf(rows: Seq[(Long, Long)]) =
      Profile.confusionOn(rows.toDF("label", "pred")).collect()
    // tp=2 fp=1 tn=3 fn=1 -> precision 2/3, recall 2/3, f1 4/6, acc 5/7
    val r = conf(Seq((1L, 1L), (1L, 1L), (0L, 1L), (0L, 0L), (0L, 0L),
      (0L, 0L), (1L, 0L))).head
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("tn"),
      r.getAs[Long]("fn")) === ((2L, 1L, 3L, 1L)))
    assert(r.getAs[Double]("precision") === 2.0 / 3.0)
    assert(r.getAs[Double]("recall") === 2.0 / 3.0)
    assert(r.getAs[Double]("f1") === 4.0 / 6.0)
    assert(r.getAs[Double]("accuracy") === 5.0 / 7.0)
    // degenerate: no predicted positives (tp+fp = 0) -> no row, not NaN
    assert(conf(Seq((1L, 0L), (0L, 0L))).isEmpty)
    // degenerate: no actual positives (tp+fn = 0) -> no row
    assert(conf(Seq((0L, 1L), (0L, 0L))).isEmpty)
  }

  test("PR curve: brute-force thresholds, monotone recall, endpoint identities") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 70).map(_ =>
      (rnd.nextInt(2).toLong, rnd.nextInt(9).toLong))
    val curve = Profile.prCurveOn(rows.toDF("label", "score_micro"))
      .collect().map(r => r.getAs[Long]("score_micro") ->
        ((r.getAs[Long]("tp"), r.getAs[Long]("fp"),
          r.getAs[Double]("precision"), r.getAs[Double]("recall"))))
      .toMap
    val np = rows.count(_._1 == 1L).toLong
    assert(curve.keySet === rows.map(_._2).toSet)
    curve.foreach { case (s, (tp, fp, prec, rec)) =>
      val btp = rows.count { case (l, sc) => l == 1L && sc >= s }.toLong
      val bfp = rows.count { case (l, sc) => l == 0L && sc >= s }.toLong
      assert((tp, fp) === ((btp, bfp)), s"threshold $s")
      assert(prec === btp.toDouble / (btp + bfp).toDouble)
      assert(rec === btp.toDouble / np.toDouble)
    }
    // recall is monotone nonincreasing in the threshold; the lowest
    // threshold recovers every positive (recall exactly 1)
    val byThreshold = curve.toSeq.sortBy(_._1)
    byThreshold.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(a._4 >= b._4)
      case _ =>
    }
    assert(byThreshold.head._2._4 === 1.0)
  }

  test("binned KS on the gate corpus: bracket holds against the exact row") {
    val dir = "/root/testdata/sf0.001"
    val exactD = Profile.statsKs(spark, dir).head().getAs[Double]("ks_d")
    val b = Profile.statsKsBinned(spark, dir).head()
    assert(b.getAs[Double]("ks_d_lower") <= exactD + 1e-12)
    assert(exactD <= b.getAs[Double]("ks_d_upper") + 1e-12)
  }

  /** Planted 2×2-plus-a-zero-cell contingency table for chi2/gini:
    * en = (src0 30, src1 10), de = (src0 10, src1 30), fr = (src0 8).
    */
  private def plantedContingency(): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_chi2").toString
    val rows =
      (1 to 30).map(i => (i.toLong, "en", "src0")) ++
      (31 to 40).map(i => (i.toLong, "en", "src1")) ++
      (41 to 50).map(i => (i.toLong, "de", "src0")) ++
      (51 to 80).map(i => (i.toLong, "de", "src1")) ++
      (81 to 88).map(i => (i.toLong, "fr", "src0"))
    rows.toDF("doc_id", "lang", "source")
      .withColumn("text", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.lit(1L))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("chi2 contingency: hand-computed statistic, zero cells present") {
    val dir = plantedContingency()
    val cells = Profile.statsChi2(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("o"), r.getAs[Long]("diff"),
          r.getAs[Double]("contrib")))).toMap
    // the full grid: 3 langs × 2 sources, INCLUDING the absent fr/src1
    assert(cells.size === 6)
    val (oZero, _, contribZero) = cells(("fr", "src1"))
    assert(oZero === 0L)
    // zero cell contributes exactly e = n_fr * n_src1 / N = 8*40/88
    assert(math.abs(contribZero - 8.0 * 40.0 / 88.0) < 1e-12)
    // diff is the exact integer residual o*N - n_l*n_s
    val (oEn0, diffEn0, _) = cells(("en", "src0"))
    assert(oEn0 === 30L && diffEn0 === 30L * 88L - 40L * 48L)
    // hand-computed full statistic over the 6 cells
    val chi2 = cells.values.map(_._3).toSeq.sorted.sum
    val expect = Seq(
      (30.0, 40.0 * 48.0 / 88.0), (10.0, 40.0 * 40.0 / 88.0),
      (10.0, 40.0 * 48.0 / 88.0), (30.0, 40.0 * 40.0 / 88.0),
      (8.0, 8.0 * 48.0 / 88.0), (0.0, 8.0 * 40.0 / 88.0))
      .map { case (o, e) => (o - e) * (o - e) / e }.sorted.sum
    assert(math.abs(chi2 - expect) < 1e-9, s"chi2 $chi2 vs $expect")
  }

  test("mi grid: hand-computed lifts, zero-cell convention, pinned MI scalar") {
    val dir = plantedContingency()
    val rows = Profile.statsMi(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("o"), r.getAs[Double]("p_cell"),
          r.getAs[Double]("lift")))).toMap
    // same zero-completed grid as chi2: 3 langs × 2 sources
    assert(rows.size === 6)
    // lift is the exact-int ratio o*N / (n_l*n_s), one correctly-
    // rounded division — assert EXACT equality, not tolerance
    assert(rows(("en", "src0")) === ((30L, 30.0 / 88.0, 2640.0 / 1920.0)))
    assert(rows(("de", "src1")) === ((30L, 30.0 / 88.0, 2640.0 / 1600.0)))
    assert(rows(("fr", "src0")) === ((8L, 8.0 / 88.0, 704.0 / 384.0)))
    // the absent cell: p = 0, lift = 0 (MI contribution 0 by 0·ln 0)
    assert(rows(("fr", "src1")) === ((0L, 0.0, 0.0)))
    // the MI SCALAR (ln stays out of the hash contract; pinned here):
    // I(L;S) = Σ_{o>0} p·ln(lift), hand-built from the planted table
    val mi = rows.values.filter(_._1 > 0L)
      .map { case (_, p, lift) => p * math.log(lift) }.sum
    val expect = Seq(
      (30.0, 40.0 * 48.0), (10.0, 40.0 * 40.0),
      (10.0, 40.0 * 48.0), (30.0, 40.0 * 40.0),
      (8.0, 8.0 * 48.0))
      .map { case (o, nls) => (o / 88.0) * math.log(o * 88.0 / nls) }.sum
    assert(math.abs(mi - expect) < 1e-12, s"MI $mi vs $expect")
    // independence sanity: the planted table is confounded, MI > 0
    assert(mi > 0.05)
  }

  test("gini impurity: hand-computed per-lang values") {
    val dir = plantedContingency()
    val g = Profile.statsGini(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_sources"),
          r.getAs[Long]("top_source_docs"), r.getAs[Double]("gini")))).toMap
    // en: 30/10 -> 1 - (900+100)/1600 = 0.375; fr: single source -> 0
    assert(g("en") === ((40L, 2L, 30L, 1.0 - 1000.0 / 1600.0)))
    assert(g("de") === ((40L, 2L, 30L, 1.0 - 1000.0 / 1600.0)))
    assert(g("fr") === ((8L, 1L, 8L, 0.0)))
  }

  test("embed_stats: mixed dims, zero norms, and value ranges surface") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_estats").toString
    val rows = Seq(
      (1L, Array(3f, 4f), 0),          // norm 5
      (2L, Array(0f, 0f), 0),          // the degenerate zero vector
      (3L, Array(-1f, 2f), 0),
      (4L, Array(1f, 2f, 2f), 0))      // the stray 3-dim encoder output
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = graft.operators.Similarity.embedStats(spark, tmp).collect()
      .map(r => r.getAs[Int]("dim") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("n_zero_norm"),
          r.getAs[Double]("norm_min"), r.getAs[Double]("norm_max"),
          r.getAs[Double]("elem_min"), r.getAs[Double]("elem_max")))).toMap
    assert(out.keySet === Set(2, 3))
    val (n2, z2, nmin2, nmax2, emin2, emax2) = out(2)
    assert(n2 === 3L && z2 === 1L)
    assert(nmin2 === 0.0 && nmax2 === 5.0)
    assert(emin2 === -1.0 && emax2 === 4.0)
    val (n3, z3, _, nmax3, _, _) = out(3)
    assert(n3 === 1L && z3 === 0L && nmax3 === 3.0)
  }
}
