package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Clusters, Dedup, TextAnalysis}

/** In-repo oracles for the corpus-hygiene operators added in round 3:
  * connected-component dedup clustering, repetition statistics, and PII
  * counting/redaction (the synthetic corpus is mostly PII-free, so the
  * planted rows here are the operative check of the regex semantics).
  */
class HygieneSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("boilerplate: shared lines dropped, unique docs pass through untouched") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_boiler").toString
    // a 10-word "cookie banner" segment planted as the head of 4 docs
    // (df = 4 > maxDf = 2 → boilerplate); each doc has a unique tail;
    // doc 9 shares nothing (df of all its segments = 1 → untouched)
    val banner = (1 to 10).map(i => s"nav$i").mkString(" ")
    val tails = (1 to 4).map(k => (1 to 12).map(i => s"u${k}w$i").mkString(" "))
    val unique = (1 to 25).map(i => s"solo$i").mkString(" ")
    val docs = (tails.zipWithIndex.map { case (t, k) =>
      (k.toLong, s"$banner $t", "en", "web")
    } :+ ((9L, unique, "en", "web")))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.boilerplate(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toMap
    // banner docs: 10+12 words = 3 segments (banner, tail words 1-10,
    // tail words 11-12); the banner segment drops, the unique tail stays
    for (k <- 0 until 4) {
      val (nLines, nKept, nDropped, cleanMd5) = out(k.toLong)
      assert(nLines === 3L && nKept === 2L && nDropped === 1L,
        s"doc $k: lines=$nLines kept=$nKept dropped=$nDropped")
      assert(cleanMd5 === md5hex(tails(k)),
        s"doc $k rewrite should be exactly its unique tail")
    }
    // the fully unique doc is untouched: rewrite == its normalized text
    val (nl, nk, nd, cm) = out(9L)
    assert(nl === 3L && nk === 3L && nd === 0L)
    assert(cm === md5hex(unique))
  }

  test("min-label propagation resolves chains, stars and isolated pairs") {
    import spark.implicits._
    // components: chain 1-2-3-4 (diameter 3), star 20-{21,22,23},
    // isolated pair 10-11, long chain 100..110 (diameter 10 — forces
    // multiple propagation rounds)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (20L, 21L), (20L, 22L),
      (20L, 23L), (10L, 11L)) ++ (100L until 110L).map(i => (i, i + 1))
    val labels = Clusters.propagateMinLabels(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L))
    assert(Seq(20L, 21L, 22L, 23L).forall(labels(_) == 20L))
    assert(Seq(10L, 11L).forall(labels(_) == 10L))
    assert((100L to 110L).forall(labels(_) == 100L))
    assert(labels.size === 4 + 4 + 2 + 11)
  }

  test("propagation matches a union-find reference on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 3) {
      val edges = Seq.fill(50)(
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)).filter(p => p._1 != p._2)
      // union-find with min-root union: the root of every set is its
      // minimum element, i.e. exactly the propagation's cluster id
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
      val labels = Clusters.propagateMinLabels(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(labels === expected)
    }
  }

  test("propagation result is invariant to the checkpoint cadence") {
    import spark.implicits._
    // a 25-node path needs many rounds, so every cadence exercises both
    // the cut and the replayed-lineage paths (k stays small because each
    // uncut round references the previous labels twice — lineage is 2^k
    // between cuts, the reason the production default is 3)
    val path = (0L until 24L).map(i => (i, i + 1))
    val expected = (0L to 24L).map(_ -> 0L).toMap
    for (k <- Seq(1, 3, 5)) {
      val labels = Clusters.propagateMinLabels(
          path.toDF("a", "b"), checkpointEvery = k)
        .as[(Long, Long)].collect().toMap
      assert(labels === expected, s"checkpointEvery=$k diverged")
    }
  }

  test("alternating stars equals propagation on random graphs, log rounds on a path") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 2) {
      val edges = Seq.fill(40)(
        (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong)).filter(p => p._1 != p._2)
      val viaProp = Clusters.propagateMinLabels(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      val (starLabels, _) = Clusters.alternatingStars(edges.toDF("a", "b"))
      assert(starLabels.as[(Long, Long)].collect().toMap === viaProp)
    }
    // 200-node path: diameter 199 would cost propagation ~200 rounds;
    // star contraction must stay logarithmic
    val path = (0L until 199L).map(i => (i, i + 1))
    val (labels, rounds) = Clusters.alternatingStars(path.toDF("a", "b"))
    assert(rounds <= 15, s"expected O(log n) rounds, took $rounds")
    val got = labels.as[(Long, Long)].collect()
    assert(got.length === 200 && got.forall(_._2 == 0L))
  }

  test("propagation handles an empty edge list") {
    import spark.implicits._
    val labels = Clusters.propagateMinLabels(
      Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(labels.count() === 0L)
  }

  test("delta pair merge BRIDGES two existing base components transitively") {
    import spark.implicits._
    // standing generation: component {1,2,3} labeled 1, component
    // {10,11} labeled 10, component {50,51} labeled 50 (untouched)
    val base = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L), (50L, 50L), (51L, 50L))
      .toDF("doc_id", "cluster_id")
    // delta doc 100 pairs with a member of EACH component, and delta
    // docs 100-101 chain; base doc 30 was never clustered before
    val newPairs = Seq((2L, 100L), (100L, 11L), (100L, 101L), (101L, 30L))
      .toDF("a", "b")
    val got = Clusters.mergeDeltaPairs(base, newPairs)
      .as[(Long, Long)].collect().toMap
    // both base components + the chain + the fresh base doc merge to
    // min id 1; the untouched component must NOT appear
    val merged = Set(1L, 2L, 3L, 10L, 11L, 30L, 100L, 101L)
    assert(got.keySet === merged)
    assert(merged.forall(got(_) == 1L))
  }

  test("micro-batch pair folding equals the one-shot merge, bridge split across batches") {
    import spark.implicits._
    // base: three components {1,2}, {10,11}, {20,21} and an untouched {30}
    val base = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L), (21L, 20L), (30L, 30L)).toDF("doc_id", "cluster_id")
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    // the bridge 1⋈10⋈20 arrives in TWO batches: batch 1 links delta 100
    // to components 1 and 10; batch 2 links the SAME delta doc to 20 —
    // the second batch must see batch 1's merged labels to relabel all
    // three components to the global min
    val p1 = Seq((2L, 100L), (100L, 11L)).toDF("a", "b")
    val p2 = Seq((100L, 21L)).toDF("a", "b")
    val folded = Seq(p1, p2).foldLeft(empty) { (aff, p) =>
      Clusters.applyPairBatch(base, aff, p)
    }.as[(Long, Long)].collect().toMap
    val oneShot = Clusters.mergeDeltaPairs(base, p1.unionByName(p2))
      .as[(Long, Long)].collect().toMap
    assert(folded === oneShot, s"folded=$folded oneShot=$oneShot")
    val merged = Set(1L, 2L, 10L, 11L, 20L, 21L, 100L)
    assert(folded.keySet === merged) // 30 untouched, absent
    assert(merged.forall(folded(_) == 1L))
  }

  test("delta pair merge within one base component keeps its label and blast radius") {
    import spark.implicits._
    val base = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    // delta 100 attaches inside component 1 only
    val newPairs = Seq((2L, 100L)).toDF("a", "b")
    val got = Clusters.mergeDeltaPairs(base, newPairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 100L -> 1L))
  }

  test("dedupClusters is consistent with the jaccard pair set on sf0.001") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val clusters = Clusters.dedupClusters(spark, dir)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toMap
    val pairs = Dedup.ngramJaccard(spark, dir)
      .select($"doc_id_a", $"doc_id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty) // planted dups must exist at this sf
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b), s"pair ($a,$b) split across clusters")
    }
    // cluster id is the min member of its component
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min === cid)
    }
  }

  test("editDistVerify: metrics are sane and identical docs score sim 1.0") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = Dedup.editDistVerify(spark, dir)
      .select($"doc_id_a", $"doc_id_b", $"edit_dist", $"max_len", $"edit_sim")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty) // planted dups must exist at this sf
    // one row per verified Jaccard pair — the verify never drops pairs
    assert(rows.length === Dedup.ngramJaccard(spark, dir).count())
    rows.foreach { case (a, b, d, m, s) =>
      assert(a < b)
      assert(d >= 0 && d <= m, s"($a,$b): dist $d outside [0, $m]")
      assert(s >= 0.0 && s <= 1.0)
      assert(math.abs(s - (1.0 - d.toDouble / m)) < 1e-12)
    }
    // exact copies in the planted dup set must surface as edit_dist 0
    val norm = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", graft.functions.Text.normalizeFast($"text").as("t"))
      .as[(Long, String)].collect().toMap
    rows.foreach { case (a, b, d, _, _) =>
      assert((d == 0L) === (norm(a) == norm(b)),
        s"($a,$b): edit_dist $d disagrees with normalized-text equality")
    }
  }

  test("applyChangelog: multi-version CDC histories resolve last-write-wins") {
    import spark.implicits._
    val base = Seq((1L, "a", 0L, "I"), (2L, "b", 0L, "I"), (3L, "c", 0L, "I"))
      .toDF("k", "v", "seq", "op")
    val changes = Seq(
      (1L, "a1", 1L, "U"), (1L, "a2", 2L, "U"), // two updates → latest wins
      (2L, "b", 1L, "D"), // plain delete
      (3L, "c", 1L, "D"), (3L, "c2", 2L, "U"), // delete then re-insert
      (4L, "d", 1L, "U")) // upsert of a key absent from the base
      .toDF("k", "v", "seq", "op")
    val out = graft.sources.Sinks.applyChangelog(base, changes, key = "k")
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "a2", 3L -> "c2", 4L -> "d"))
  }

  test("repetitionStats hand-computed vectors") {
    // "a a a b": words 4, top 3, 3-grams {"a a a","a a b"} → 2 total 0 dup
    assert(TextAnalysis.repetitionStats("a a a b") === ((4L, 3L, 2L, 0L)))
    // "a a a a a": 3 identical 3-grams → 2 duplicated
    assert(TextAnalysis.repetitionStats("a a a a a") === ((5L, 5L, 3L, 2L)))
    // normalization applies first: case + punctuation fold together
    assert(TextAnalysis.repetitionStats("The THE the!") === ((3L, 3L, 1L, 0L)))
    // empty text normalizes to a single empty word, no 3-grams
    assert(TextAnalysis.repetitionStats("") === ((1L, 1L, 0L, 0L)))
    assert(TextAnalysis.repetitionStats("one two") === ((2L, 1L, 0L, 0L)))
  }

  test("PII counts and redaction on planted rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact john.doe@example.com or admin@sub.example.org today"),
      (2L, "server 10.0.0.1 and 192.168.255.254 rebooted"),
      (3L, "account 123456789 card 9876543210123456"),
      (4L, "clean text with short numbers 123 and 12345678"),
      (5L, "mixed: a@b.co at 8.8.8.8 ref 999999999"),
      // the 9-digit run inside the local part is not \b-delimited (v1 is
      // word-word), and the email is redacted first anyway — no <NUM>
      (6L, "v123456789@example.com wrote"),
      (7L, "reach foo.bar@x.io,10.0.0.1 now"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.piiOn(docs)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L)._1 === 2L && out(1L)._2 === 0L && out(1L)._3 === 0L)
    assert(out(2L)._1 === 0L && out(2L)._2 === 2L && out(2L)._3 === 0L)
    assert(out(3L)._1 === 0L && out(3L)._2 === 0L && out(3L)._3 === 2L)
    assert(out(4L) === ((0L, 0L, 0L,
      md5Hex("clean text with short numbers 123 and 12345678"))))
    assert(out(5L) === ((1L, 1L, 1L, md5Hex("mixed: <EMAIL> at <IP> ref <NUM>"))))
    assert(out(1L)._4 === md5Hex("contact <EMAIL> or <EMAIL> today"))
    assert(out(2L)._4 === md5Hex("server <IP> and <IP> rebooted"))
    assert(out(3L)._4 === md5Hex("account <NUM> card <NUM>"))
    assert(out(6L) === ((1L, 0L, 0L, md5Hex("<EMAIL> wrote"))))
    assert(out(7L) === ((1L, 1L, 0L, md5Hex("reach <EMAIL>,<IP> now"))))
  }

  test("semDedupDelta: keep-first inversion by a smaller-id arrival, untouched-cell passthrough") {
    import spark.implicits._
    import graft.operators.Similarity
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdd").toString
    // two orthogonal clusters; base ids {21,31} cluster A, {42,53}
    // cluster B (md5 order picks seeds 21 and 42 — one per cluster);
    // delta id 20 (vec_id % 10 = 0) lands in A with a SMALLER id than
    // every base member
    val rows = Seq(
      (21L, Array(1f, 0f, 0f, 0f), 0),
      (31L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (42L, Array(0f, 0f, 1f, 0f), 0),
      (53L, Array(0f, 0f, 0.9f, 0.1f), 0),
      (20L, Array(0.95f, 0.05f, 0f, 0f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    // the staged BASE generation keeps 21 (first of its cell) and 42
    val dump = Similarity.semDedupBaseDump(spark, tmp, k = 2)
    val baseV = spark.read.parquet(s"$dump/verdicts").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("cell"), r.getAs[Int]("is_kept")))).toMap
    assert(baseV(21L)._2 === 1 && baseV(31L)._2 === 0)
    assert(baseV(42L)._2 === 1 && baseV(53L)._2 === 0)
    // the delta merge must FLIP 21 to dropped (20 < 21 within τ) and
    // pass cluster B through with its staged verdicts
    val out = Similarity.semDedupDelta(spark, tmp, k = 2).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("cell"), r.getAs[Int]("is_kept")))).toMap
    assert(out.keySet === Set(20L, 21L, 31L, 42L, 53L))
    assert(out(20L)._2 === 1, "new smallest-id arrival must be kept")
    assert(out(21L)._2 === 0, "keep-first inversion: 21 must flip to dropped")
    assert(out(31L)._2 === 0)
    assert(out(42L) === baseV(42L) && out(53L) === baseV(53L),
      "untouched cell must pass staged verdicts through")
  }

  test("embedDecontam: semantic leak flags, no-surface-overlap blind spot of " +
      "the n-gram gates, hit counting and witness") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_edc").toString
    // eval suite = ids ≡ 0 (mod 50): e0 = x-axis, e50 = y-axis.
    // corpus: id 1 = scaled copy of e0 (a "paraphrase" — same direction,
    // different magnitude), id 2 = orthogonal (clean), id 3 = the
    // diagonal (cos ≈ 0.707 to BOTH eval vectors → 2 hits, witness 0),
    // id 4 = cos exactly 0 to both (z-axis, clean).
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (50L, Array(0f, 1f, 0f, 0f), 0),
      (1L, Array(3f, 0f, 0f, 0f), 1),
      (2L, Array(0f, 0f, 0f, 1f), 1),
      (3L, Array(1f, 1f, 0f, 0f), 1),
      (4L, Array(0f, 0f, 1f, 0f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = graft.operators.Decontam.embedDecontam(spark, tmp)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_eval_hits"), r.getAs[Double]("best_cos"),
          r.getAs[Long]("witness_id")))).toMap
    assert(out.keySet === Set(1L, 3L), s"flagged ${out.keySet}")
    assert(out(1L)._1 === 1L && math.abs(out(1L)._2 - 1.0) < 1e-12)
    assert(out(1L)._3 === 0L)
    assert(out(3L)._1 === 2L && out(3L)._3 === 0L)
    assert(math.abs(out(3L)._2 - math.sqrt(0.5)) < 1e-12)
  }

  test("embedDecontamLsh: precision 1.0 against the exact row (every flag a true " +
      "flag, counts/cosines/witness bounded), recall measured") {
    val dir = "/root/testdata/sf0.001"
    def flags(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_eval_hits"), r.getAs[Double]("best_cos"),
          r.getAs[Long]("witness_id")))).toMap
    val exact = flags(graft.operators.Decontam.embedDecontam(spark, dir))
    val lsh = flags(graft.operators.Decontam.embedDecontamLsh(spark, dir))
    assert(exact.nonEmpty && lsh.nonEmpty)
    // precision 1.0: every emitted flag is exact-verified, so it must be
    // a true flag whose hit count / best cosine are bounded by the exact
    // row's and whose witness can only be a LATER eval id (a candidate
    // subset can never invent hits)
    lsh.foreach { case (id, (hits, best, wit)) =>
      assert(exact.contains(id), s"vec $id flagged by LSH but not exact")
      val (eh, eb, ew) = exact(id)
      assert(hits <= eh, s"vec $id LSH hits $hits > exact $eh")
      assert(best <= eb + 1e-12, s"vec $id LSH best $best > exact $eb")
      assert(wit >= ew, s"vec $id LSH witness $wit < exact $ew")
    }
    // the documented trade: recall < 1 is possible (false negatives are
    // inherent to a cosine LSH prescreen); floor it well below the
    // measured value so the spec pins breakage, not noise
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.5, s"flag recall $recall collapsed")
  }

  test("z-order write produces files with disjoint z ranges") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    graft.sources.Sinks.zorderRoundTrip(spark, dir).count()
    val out = graft.sources.DumpCache.dirFor(
      "graft_events_zorder", dir, "events.parquet")
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 1, "expected a multi-file z-ordered layout")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(org.apache.spark.sql.functions.min($"zval"),
          org.apache.spark.sql.functions.max($"zval"))
        .as[(Long, Long)].head
      r
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping z ranges: $hi > $lo2")
      case _ =>
    }
  }

  test("Misra-Gries heavy hitters equal the exact top-10 on sf0.001") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val sketched = TextAnalysis.heavyHitters(spark, dir)
      .as[(String, Long)].collect().toSeq
    val exact = graft.sources.Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.Text.wordsFast($"text")).as("word"))
      .filter(org.apache.spark.sql.functions.length($"word") >= 3)
      .groupBy($"word").count()
      .orderBy($"count".desc, $"word".asc).limit(10)
      .as[(String, Long)].collect().toSeq
    assert(sketched === exact)
  }

  test("SemDeDup: every drop has a smaller-id co-celled exact witness; " +
      "every co-celled exact pair forces a drop") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = graft.operators.Similarity.semDedup(spark, dir)
      .as[(Long, Int, Int)].collect()
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    assert(rows.length.toLong === n, "one verdict row per corpus vector")
    assert(rows.map(_._1).distinct.length === rows.length)
    val cell = rows.map(r => r._1 -> r._2).toMap
    val kept = rows.filter(_._3 == 1).map(_._1).toSet
    val dropped = rows.filter(_._3 == 0).map(_._1).toSet
    // ground truth: the EXACT near-dup pair list at the same threshold
    val exact = graft.operators.Similarity.embedPairs(spark, dir)
      .select("vec_id_a", "vec_id_b")
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "corpus should contain exact near-dup pairs")
    // precision: a dropped vector always has a smaller-id near-dup in
    // its own cell (the drop's witness is itself an exact pair)
    dropped.foreach { d =>
      assert(exact.exists { case (a, b) =>
        b == d && a < d && cell(a) == cell(d) },
        s"vec $d dropped without a co-celled exact witness")
    }
    // forced drops: a co-celled exact pair's larger endpoint cannot
    // survive (the smaller endpoint witnesses it directly)
    exact.foreach { case (a, b) =>
      if (cell(a) == cell(b))
        assert(dropped.contains(math.max(a, b)),
          s"co-celled exact pair ($a,$b) left ${math.max(a, b)} kept")
    }
    // and something must actually be kept
    assert(kept.nonEmpty)
  }

  test("SemDeDup verdicts are deterministic across runs") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val r1 = graft.operators.Similarity.semDedup(spark, dir)
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    val r2 = graft.operators.Similarity.semDedup(spark, dir)
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    assert(r1 === r2)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
}
