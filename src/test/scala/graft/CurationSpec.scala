package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("pipeline_audit: the ladder composes the component rows exactly — " +
      "verdict precedence, duplicate receipts, scrub flags all cross-check") {
    import spark.implicits._
    import graft.operators.{Audit, Decontam, TextAnalysis}
    val audit = Audit.pipelineAudit(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("verdict"),
          Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("near_dup_of")).map(_.toLong),
          r.getAs[Int]("scrubbed")))).toMap
    assert(audit.nonEmpty)
    // component truths, from the already-hash-verified rows
    val evalSrcs = Set("src0", "src1", "src2")
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter(!$"source".isInCollection(evalSrcs.toSeq))
    assert(audit.size.toLong === docs.count(), "one audit row per corpus doc")
    val pred = spark.read.parquet(TextAnalysis.qualityScoredDump(spark, sf))
      .select($"doc_id", $"pred").as[(Long, Int)].collect().toMap
    val contaminated = Decontam.ngramCollisions(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val hashOf = docs
      .select($"doc_id",
        org.apache.spark.sql.functions.md5(
          graft.functions.Text.normalizeFast($"text")).as("h"))
      .as[(Long, String)].collect().toMap
    // keeper truth over the AUDITED (eval-excluded) slice — the row's
    // documented rule; Dedup.exact's full-corpus keeper would differ
    // whenever a duplicate group's min id is an eval-source doc (r13
    // review finding)
    val keeperOf = hashOf.toSeq.groupBy(_._2)
      .map { case (h, xs) => h -> xs.map(_._1).min }
    val piiHit = TextAnalysis.piiOn(docs.select($"doc_id", $"text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_emails") + r.getAs[Long]("n_ipv4") +
          r.getAs[Long]("n_longnum") > 0)).toMap
    // near-dup truth from the hash-verified full-corpus LSH row: its
    // pair set restricted to both-endpoints-audited IS the audit's
    // within-slice rule (a doc's bands don't depend on the slice)
    val auditedIds = audit.keySet
    val nearOf = graft.operators.Dedup.minhashLsh(spark, sf)
      .select($"doc_id_a", $"doc_id_b").as[(Long, Long)].collect()
      .filter { case (a, b) => auditedIds(a) && auditedIds(b) }
      .groupBy(_._2).map { case (b, ps) => b -> ps.map(_._1).min }
    audit.foreach { case (id, (verdict, dupOf, nearDupOf, scrubbed)) =>
      val q = pred.get(id).forall(_ == 0) // absent or 0 = quality drop
      val c = contaminated(id)
      val keeper = keeperOf(hashOf(id))
      val d = keeper != id
      val nr = nearOf.get(id)
      val expected =
        if (q) "quality" else if (c) "decontam"
        else if (d) "duplicate"
        else if (nr.isDefined) "near_duplicate" else "kept"
      assert(verdict === expected,
        s"doc $id: verdict $verdict, expected $expected (q=$q c=$c d=$d nr=$nr)")
      // both receipts are lineage, independent of the verdict
      assert(dupOf === (if (d) Some(keeper) else None),
        s"doc $id dup_of $dupOf vs keeper $keeper")
      assert(nearDupOf === nr, s"doc $id near_dup_of $nearDupOf vs $nr")
      assert((scrubbed == 1) === piiHit(id), s"doc $id scrub flag")
    }
    // the funnel is non-degenerate on this corpus: kept plus at least
    // one drop stage must both occur
    val verdicts = audit.values.map(_._1).toSet
    assert(verdicts.contains("kept") && verdicts.size >= 2, s"got $verdicts")
  }

  test("top-k threshold stratified sample equals the rank form row-for-row") {
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Int)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val rank = rows(Curation.sampleStratified(spark, sf))
    val topk = rows(Curation.sampleStratifiedThreshold(spark, sf))
    assert(rank.nonEmpty)
    assert(topk === rank,
      s"diff: ${topk.diff(rank).take(3)} / ${rank.diff(topk).take(3)}")
  }

  test("sample picks exactly ceil(10%) of each stratum") {
    val byLang = Curation.sampleStratifiedThreshold(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = graft.sources.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet === totals.keySet)
    byLang.foreach { case (lang, n) =>
      assert(n === math.ceil(totals(lang) * 0.1).toLong, s"lang=$lang")
    }
  }

  test("pipeline_mix hits the 5:3:2 composition pinned by the binding source") {
    val weights = Map("src0" -> 5L, "src1" -> 3L, "src2" -> 2L)
    val supply = graft.sources.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("source").isin(weights.keys.toSeq: _*))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nOut = weights.map { case (s, w) => supply(s) * 10L / w }.min
    val expected = weights.map { case (s, w) => s -> (w * nOut / 10L) }
    val got = Curation.mixSources(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // quotas never exceed supply, and the binding source is maximally used
    expected.foreach { case (s, k) => assert(k <= supply(s), s) }
    assert(weights.exists { case (s, w) =>
      supply(s) * 10L / w == nOut && expected(s) == w * nOut / 10L })
  }

  test("pipeline_anneal: per-phase quotas are integer-exact and selections are stable prefixes") {
    import org.apache.spark.sql.functions.col
    val schedule = Seq(
      Map("src0" -> 6L, "src1" -> 3L, "src2" -> 1L),
      Map("src0" -> 4L, "src1" -> 4L, "src2" -> 2L),
      Map("src0" -> 2L, "src1" -> 4L, "src2" -> 4L))
    val supply = graft.sources.Tables.documents(spark, sf)
      .filter(col("source").isin("src0", "src1", "src2"))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Curation.annealMix(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getInt(3)))
    // per-phase counts match the integer quota construction
    val gotCounts = rows.groupBy(r => (r._1, r._3)).view.mapValues(_.size.toLong).toMap
    schedule.zipWithIndex.foreach { case (w, e) =>
      val nOut = w.map { case (s, wn) => supply(s) * 10L / wn }.min
      w.foreach { case (s, wn) =>
        assert(gotCounts.getOrElse((e, s), 0L) === wn * nOut / 10L,
          s"phase $e source $s")
      }
    }
    // stable-prefix property: a source's smaller-quota phase selection
    // is a subset of its larger-quota phase selection
    val bySrcPhase = rows.groupBy(r => (r._3, r._1))
      .view.mapValues(_.map(_._2).toSet).toMap
    for (s <- Seq("src0", "src1", "src2");
         e1 <- schedule.indices; e2 <- schedule.indices) {
      val (a, b) = (bySrcPhase.getOrElse((s, e1), Set.empty),
        bySrcPhase.getOrElse((s, e2), Set.empty))
      if (a.size <= b.size) assert(a.subsetOf(b), s"$s: phase $e1 not prefix of $e2")
    }
  }

  test("sample_temperature: exact isqrt weights, binding-language quotas, head flattening") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_temp_mix").toString
    // lang counts {aa: 9, bb: 4, cc: 2} -> isqrt weights {3, 2, 1}, Σ=6;
    // N_out = min(9·6/3, 4·6/2, 2·6/1) = 12 (binding: bb and cc);
    // quotas = {6, 4, 2}. Head share flattens 60% -> 50%, tail rises
    // 13.3% -> 16.7% — the α=0.5 contract. n=9 exercises the
    // perfect-square isqrt edge, n=2 the non-square floor.
    val rows = (1 to 9).map(i => (i.toLong, "aa")) ++
      (10 to 13).map(i => (i.toLong, "bb")) ++
      (14 to 15).map(i => (i.toLong, "cc"))
    rows.toDF("doc_id", "lang")
      .withColumn("text", org.apache.spark.sql.functions.lit("t"))
      .withColumn("source", org.apache.spark.sql.functions.lit("src0"))
      .withColumn("n_chars", org.apache.spark.sql.functions.lit(1L))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Curation.sampleTemperature(spark, tmp).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang === Map("aa" -> 6, "bb" -> 4, "cc" -> 2), s"quotas $byLang")
    assert(out.length === 12)
    // determinism: a rerun picks the identical rows
    val again = Curation.sampleTemperature(spark, tmp).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    assert(again.toSet === out.toSet)
  }

  test("pipeline_mix reruns pick the identical rows") {
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Int)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val a = rows(Curation.mixSources(spark, sf))
    assert(a.nonEmpty)
    assert(rows(Curation.mixSources(spark, sf)) === a)
  }

  test("checkpoint/cache/manifest operators are rerun-deterministic") {
    // the driver's hash compare presumes identical reruns; these four
    // route through localCheckpoint, operator-scoped caches, or a
    // driver-side file manifest — exactly where nondeterminism would
    // sneak in if it could
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    for ((name, mk) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
        "pipeline_budget" -> (() => Curation.tokenBudget(spark, sf)),
        "pipeline_epochs" -> (() => Curation.epochOrders(spark, sf)),
        "dedup_containment" -> (() => graft.operators.Dedup.containment(spark, sf)),
        "sink_manifest" -> (() => graft.sources.Sinks.manifestPrune(spark, sf)))) {
      val a = rows(mk())
      assert(a.nonEmpty, name)
      assert(rows(mk()) === a, s"$name differs across reruns")
    }
  }

  test("pipeline_budget selects the MAXIMAL quality-ordered prefix under the budget") {
    val budget = 500L
    val sel = Curation.tokenBudget(spark, sf, budget).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("cum_tokens")).toMap
    assert(sel.nonEmpty && sel.values.max <= budget)
    // independent greedy oracle: fold the quality order locally
    val order = graft.operators.TextAnalysis.quality(spark, sf)
      .select("doc_id", "n_words", "quality_score").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getDouble(2)))
      .sortBy { case (id, _, q) => (-q, id) }
    var cum = 0L
    val expected = order.takeWhile { case (_, n, _) => { cum += n; cum <= budget } }
      .map(_._1).toSet
    assert(sel.keySet === expected,
      s"missing ${expected.diff(sel.keySet)}, extra ${sel.keySet.diff(expected)}")
  }
}
