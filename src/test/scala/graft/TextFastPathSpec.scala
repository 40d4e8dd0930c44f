package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text

/** The dedup operators use the single-pass Scala shingle path
  * (Text.shingleSet / xx64) for speed; the Column pipeline
  * (normalize→words→shingles→xxhash64→array_distinct) remains the
  * declarative statement of the semantics. This spec pins the two paths
  * bit-identical on real testdata documents plus adversarial edge cases.
  */
class TextFastPathSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val edgeCases = Seq(
    "", " ", "  a  ", "a b", "a b c", "A  B!!C d", "ONE two THREE four",
    "tabs\tand\nnewlines are non-alnum", "ünïcödé ÀÇCÉNTS and ß sharp",
    "123 456 789 0", "trailing punct...", "...leading", "a!b@c#d$e%f",
    "repeat repeat repeat repeat repeat repeat")

  test("normalizeString matches the Column normalize on testdata + edge cases") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").as[String].collect().toSeq ++ edgeCases
    val viaColumn = docs.toDF("text")
      .select(Text.normalize($"text")).as[String].collect()
    docs.zip(viaColumn).foreach { case (in, col) =>
      assert(Text.normalizeString(in) === col, s"input=<$in>")
    }
  }

  test("shingleSet matches array_distinct(shingles(words)) on testdata + edge cases") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").as[String].collect().toSeq ++ edgeCases
    val viaColumn = docs.toDF("text")
      .select(array_distinct(Text.shingles(Text.words($"text"), 3)))
      .as[Seq[String]].collect()
    docs.zip(viaColumn).foreach { case (in, col) =>
      assert(Text.shingleSet(in, 3).toSeq === col, s"input=<$in>")
    }
  }

  test("native NormalizeText expression is bit-equal to the Column normalize") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").as[String].collect().toSeq ++ edgeCases
    val both = docs.toDF("text")
      .select(Text.normalize($"text").as("col"), Text.normalizeFast($"text").as("nat"))
      .as[(String, String)].collect()
    docs.zip(both).foreach { case (in, (col, nat)) =>
      assert(nat === col, s"input=<$in>")
    }
    // null propagates
    val n = Seq((1, null: String)).toDF("i", "text")
      .select(Text.normalizeFast($"text")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("xx64 matches the Column xxhash64 (seed 42) exactly") {
    import spark.implicits._
    val strings = edgeCases ++ Seq("the quick brown fox", "a", "0") ++
      (0 until 100).map(i => s"shingle number $i padding")
    val viaColumn = strings.toDF("s").select(xxhash64($"s")).as[Long].collect()
    strings.zip(viaColumn).foreach { case (in, col) =>
      assert(Text.xx64(in) === col, s"input=<$in>")
    }
  }

  test("mix64/splitmix64/gram64 match an independent BigInt reference") {
    // independent reimplementation in BigInt so a sign/overflow slip in
    // the Long path can't self-confirm
    val m64 = BigInt(1) << 64
    def ref(z0: BigInt): BigInt = {
      var z = z0.mod(m64)
      z = ((z ^ (z >> 30)) * BigInt("bf58476d1ce4e5b9", 16)).mod(m64)
      z = ((z ^ (z >> 27)) * BigInt("94d049bb133111eb", 16)).mod(m64)
      (z ^ (z >> 31)).mod(m64)
    }
    def toU(l: Long): BigInt = BigInt(java.lang.Long.toUnsignedString(l))
    for (x <- Seq(0L, 1L, 42L, -1L, Long.MaxValue, Long.MinValue, 123456789L))
      assert(toU(Text.mix64(x)) === ref(toU(x)), s"mix64($x)")
    val golden = BigInt("9e3779b97f4a7c15", 16)
    for (seed <- Seq(7L, 42L); i <- 0L until 10L)
      assert(toU(Text.splitmix64(seed, i)) === ref(seed + (i + 1) * golden),
        s"splitmix64($seed,$i)")
    // gram64 = mix64 over the Mersenne-61 rolling hash
    val m61 = (BigInt(1) << 61) - 1
    def roll(s: String): BigInt = s.foldLeft(BigInt(0))((h, c) => (h * 257 + c.toInt).mod(m61))
    for (s <- Seq("a", "the quick brown", "one two three", "0 1 2"))
      assert(toU(Text.gram64(s)) === ref(roll(s)), s"gram64(<$s>)")
  }

  test("greedy BPE tokenization: pinned vectors + structural properties") {
    import graft.operators.TextAnalysis
    // hand-derived against the vocab: longest match at every position.
    // "thinking": th|in|k|ing (no 'thi…' merge; 'in' beats 'i')
    assert(TextAnalysis.bpeGreedyCount("thinking") === 4L)
    // "the" is one merge; bare chars fall back to singles
    assert(TextAnalysis.bpeGreedyCount("the") === 1L)
    assert(TextAnalysis.bpeGreedyCount("q") === 1L)
    // "information" = in|for|m|at|ion ('ma' is not a vocab merge, and the
    // greedy 'at' consumes the 'a' that 'tion' would have needed)
    assert(TextAnalysis.bpeGreedyCount("information") === 5L)
    // digits are singles unless merged — none are: "2024" = 4 tokens
    assert(TextAnalysis.bpeGreedyCount("2024") === 4L)
    // properties on real corpus words: 1 <= tokens <= len, and compression
    // (multi-char merges fire) on typical English text
    val words = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("explode(split(trim(regexp_replace(regexp_replace(lower(text)," +
        "'[^a-z0-9 ]',' '),' +',' ')),' ')) w")
      .collect().map(_.getString(0)).filter(_.nonEmpty)
    assert(words.nonEmpty)
    words.foreach { w =>
      val n = TextAnalysis.bpeGreedyCount(w)
      assert(n >= 1 && n <= w.length, s"word=<$w> n=$n")
    }
    val totalTokens = words.map(TextAnalysis.bpeGreedyCount).sum.toDouble
    val totalChars = words.map(_.length).sum.toDouble
    // the synthetic corpus's vocabulary is only English-ish, so the merge
    // rate is modest (measured 1.30 at sf0.001); assert clearly above the
    // no-merge baseline of 1.0 char/token
    assert(totalChars / totalTokens > 1.2,
      f"vocab merges should compress text (chars/token = ${totalChars / totalTokens}%.2f)")
  }

  test("BPE training learns the textbook merges on Sennrich's example corpus") {
    import spark.implicits._
    // The classic BPE walkthrough: {low:5, lower:2, newest:6, widest:3}.
    // Hand-derived with the (count DESC, left ASC, right ASC) tie-break:
    //  1. es:9 (ties st:9, 'es' < 'st')   2. es+t -> est:9
    //  3. lo:7 (ties ow:7 before the merge; after rank-2 'ow' still 7,
    //     'lo' < 'ow')                    4. lo+w -> low:7
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Seq((1L, words.mkString(" "), "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.operators.TextAnalysis.bpeTrain(spark, tmp, merges = 4)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got === Array(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L)), s"learned merges: ${got.mkString(", ")}")
    // structural property on the real corpus: the argmax pair count is
    // non-increasing across ranks (old pair counts only shrink under a
    // merge, and any NEW pair (x, ab)/(ab, y) occurs at most as often
    // as ab itself was just created)
    val corpus = graft.operators.TextAnalysis
      .bpeTrain(spark, "/root/testdata/sf0.001", merges = 8)
      .orderBy("rank").collect().map(_.getLong(4))
    assert(corpus.length === 8)
    corpus.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"pair counts increased across ranks: ${corpus.mkString(",")}")
    }
  }

  test("fingerprint probes equal their string-set twins on collision-free corpora") {
    import spark.implicits._
    val texts = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"text").as[String].collect().take(200) ++ edgeCases
    val someGrams = texts.flatMap(t => Text.shingleSet(t, 7).take(2)).toSet
    for (set <- Seq(someGrams, Set("definitely not a gram"), Set.empty[String]);
         n <- Seq(3, 7)) {
      // the broadcast form the streaming gates actually probe: gram64
      // fingerprints behind the open-addressing membership table
      val probe = new Text.GramHashProbe(set.toArray.map(Text.gram64))
      for (t <- texts) {
        assert(Text.anyGramHashIn(t, n, probe) ===
          Text.shingleSet(t, n).exists(set),
          s"fingerprint ANY probe diverged on n=$n text=${t.take(40)}")
        assert(Text.countGramHashesIn(t, n, probe) ===
          Text.shingleSet(t, n).count(set).toLong,
          s"fingerprint COUNT probe diverged on n=$n text=${t.take(40)}")
      }
    }
  }

  test("trained quality filter separates a planted signal and retrains bit-identically") {
    import spark.implicits._
    // label-1 sources (even) get stopword-rich text, label-0 none — the
    // signal the per-mille stopword feature carries
    val stop = Seq("the", "a", "of", "and", "to", "is")
    val docs = (0 until 40).map { i =>
      val words =
        if (i % 2 == 0) Seq.fill(5)(stop).flatten ++ (0 until 30).map(j => s"w${i}x$j")
        else (0 until 60).map(j => s"v${i}x$j")
      (i.toLong, words.mkString(" "), "en", s"src${i % 2}", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val scored = graft.operators.TextAnalysis.qualityModelOn(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(scored.length === 40)
    // the trained gate must recover the planted labels exactly
    assert(scored.forall { case (_, y, _, pred) => pred.toLong === y },
      s"misclassified: ${scored.filter(s => s._4.toLong != s._2).mkString(", ")}")
    // bit-identical retrain: integer gradients are associative, so a
    // second training run (fresh cache, same data) reproduces every
    // score exactly — the reproducibility contract a corpus-wide
    // quality gate needs
    val again = graft.operators.TextAnalysis.qualityModelOn(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(scored.sortBy(_._1) === again.sortBy(_._1))
    // and under a different partitioning of the same corpus
    val repart = graft.operators.TextAnalysis.qualityModelOn(docs.repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(scored.sortBy(_._1) === repart.sortBy(_._1))
  }

  test("ttr: hand-computed type/token ratios on planted docs") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ttr").toString
    val rows = Seq(
      (1L, "the cat the dog"),              // 4 tokens, 3 types
      (2L, "repeat repeat repeat repeat"),  // 4 tokens, 1 type
      (3L, "all four words differ"),        // 4 tokens, 4 types
      (4L, "Punct!! folds, CASE folds."),   // punct/case fold first
      (5L, "?!... !!"))                     // EMPTY after normalize
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.operators.TextAnalysis.ttr(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Int]("n_types"),
          r.getAs[Double]("ttr")))).toMap
    assert(out(1L) === ((4, 3, 0.75)))
    assert(out(2L) === ((4, 1, 0.25)))
    assert(out(3L) === ((4, 4, 1.0)))
    // "punct folds case folds" -> 4 tokens, 3 types
    assert(out(4L) === ((4, 3, 0.75)))
    // blank/punct-only page: the empty-string token is FILTERED (r18
    // ADVICE) — 0 tokens, ttr 0.0, never the 1/1/1.0 inversion
    assert(out(5L) === ((0, 0, 0.0)))
  }

  test("zipf: hand-computed power-rank profile and doubling ratios") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_zipf").toString
    // counts: aa 16, bb 8, cc 4, dd 4, ee 2, ff 1 — the count-4 tie
    // breaks by word (cc rank 3, dd rank 4), so rank 4 = dd
    val text = (Seq.fill(16)("aa") ++ Seq.fill(8)("bb") ++
      Seq.fill(4)("cc") ++ Seq.fill(4)("dd") ++
      Seq.fill(2)("ee") ++ Seq("ff")).mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.operators.TextAnalysis.zipf(spark, tmp).collect()
      .map(r => r.getAs[Long]("rank") ->
        ((r.getAs[String]("word"), r.getAs[Long]("c"),
          Option(r.getAs[java.lang.Long]("c_next")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("doubling_ratio")).map(_.toDouble))))
      .toMap
    // only the power-of-two ranks that exist in a 6-word vocab: 1, 2, 4
    assert(out.keySet === Set(1L, 2L, 4L))
    assert(out(1L) === (("aa", 16L, Some(8L), Some(2.0))))
    assert(out(2L) === (("bb", 8L, Some(4L), Some(2.0))))
    // rank 4 is the LAST power rank present -> next-doubling count null
    assert(out(4L) === (("dd", 4L, None, None)))
    // the slope scalar (kept out of the hash contract): s = log2(ratio)
    // — the planted profile halves per doubling, so s = 1 exactly
    val slopes = out.values.flatMap(_._4)
      .map(r => math.log(r) / math.log(2.0))
    assert(slopes.forall(s => math.abs(s - 1.0) < 1e-12))
  }

  test("zipf: a count tie straddling the limit-1024 cut resolves deterministically " +
      "by word order") {
    // r19 verdict item 6: rank 1024 is deterministic under (c desc,
    // word asc), but no spec planted a tie ACROSS the cut boundary —
    // this corpus has one head word then 1040 singletons, so the cut
    // falls mid-tie and must keep exactly the 1023 lexicographically
    // smallest singletons.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_zipf_tie").toString
    val singletons = (0 until 1040).map(i => f"w$i%04d")
    val text = (Seq("aa", "aa") ++ singletons).mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.operators.TextAnalysis.zipf(spark, tmp).collect()
      .map(r => r.getAs[Long]("rank") ->
        ((r.getAs[String]("word"), r.getAs[Long]("c"),
          Option(r.getAs[java.lang.Long]("c_next")).map(_.toLong))))
      .toMap
    // all 11 power ranks exist; rank 1 is the head word, every power
    // rank r >= 2 is the singleton at alphabetical index r-2
    assert(out.keySet === (0 to 10).map(1L << _).toSet)
    assert(out(1L) === (("aa", 2L, Some(1L))))
    for (r <- (1 to 10).map(1 << _))
      assert(out(r.toLong)._1 === f"w${r - 2}%04d",
        s"rank $r must be the (r-2)th singleton — the tie broke wrong")
    // the cut boundary itself: rank 1024 = w1022 (w1023..w1039 are the
    // SAME count but lexicographically greater, so they fall outside),
    // and its doubling partner (rank 2048) is out of range -> null
    assert(out(1024L) === (("w1022", 1L, None)))
  }

  test("hapax: hand-computed corpus vocabulary tail") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_hapax").toString
    // corpus tokens: the x3, cat x2, dog x1, bird x1 -> 7 tokens,
    // 4 types, 2 hapax (dog, bird), 1 dis (cat)
    val rows = Seq((1L, "the cat the dog"), (2L, "THE cat... bird!"))
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = graft.operators.TextAnalysis.hapax(spark, tmp).head()
    assert(r.getAs[Long]("n_tokens") === 7L)
    assert(r.getAs[Long]("n_types") === 4L)
    assert(r.getAs[Long]("n_hapax") === 2L)
    assert(r.getAs[Long]("n_dis") === 1L)
    assert(r.getAs[Double]("hapax_type_share") === 0.5)
    assert(r.getAs[Double]("unseen_mass_gt") === 2.0 / 7.0)
  }
}
