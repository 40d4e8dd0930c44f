package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool behind SURVEY §6's scaling-curve table: replicates the
  * documents / embeddings / events tables of a testdata dir N× into a
  * sibling fixture dir, so the heavy queries can be timed at 10× the
  * gate's largest SF on this box (the driver only generates up to
  * sf0.1).
  *
  * The replication is SEMANTICS-PRESERVING for scaling purposes:
  *  - `documents`: copy k keeps copy 0's duplicate/near-dup STRUCTURE
  *    but is textually disjoint from every other copy — each word gets
  *    a per-copy suffix (`applez3`), so every shingle differs across
  *    copies and the near-dup pair density stays CONSTANT instead of
  *    exploding combinatorially (10 verbatim copies of the corpus would
  *    make every doc a 10-way exact dup — a 100× pair blow-up that
  *    measures the data, not the engine). Copy 0 is the original text.
  *  - `embeddings`: ids shift by copy stride; copy k's vector is the
  *    original CIRCULARLY SHIFTED by k dimensions — a permutation, so
  *    norms and every within-copy pairwise cosine are exactly
  *    preserved (each copy has copy 0's near-dup structure), while
  *    cross-copy cosines fall to background level (verbatim copies
  *    would make every vector a 10-way exact dup: a 100× same-bucket
  *    pair blow-up that measures the data, not the engine — observed
  *    38× on dedup_embed_lsh before this fix).
  *  - `events`: ids and user_ids shift (10× users, same time range —
  *    a 10×-busier service: window count constant, rows per window
  *    10×). `ts` passes through unconverted (whatever the source
  *    generation stores) so `Tables.events` and the file-stream
  *    schema read the fixture exactly like the original.
  *
  * Usage: runMain graft.ScaleFixture <srcDir> <outDir> <copies>
  */
object ScaleFixture {

  private val Stride = 10000000L

  /** Id-shifting only disambiguates copies while every source id is
    * under the stride — a silent collision would create the exact-dup
    * explosion this fixture exists to prevent, so fail loudly instead.
    */
  private def requireIdsUnderStride(df: DataFrame, idCols: Seq[String], table: String): Unit = {
    val maxes = df.select(idCols.map(c => max(col(c)).as(c)): _*).head()
    idCols.zipWithIndex.foreach { case (c, i) =>
      val m = maxes.getLong(i)
      require(m < Stride,
        s"$table.$c max id $m >= stride $Stride — copies would collide; raise Stride")
    }
  }

  private def writeSingleFile(df: DataFrame, outDir: String, name: String): Unit = {
    val tmp = s"$outDir/_tmp_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file written for $name"))
    val dest = new java.io.File(outDir, s"$name.parquet")
    if (dest.exists()) dest.delete()
    if (!part.renameTo(dest)) sys.error(s"rename failed for $name")
    new java.io.File(tmp).listFiles().foreach(_.delete())
    new java.io.File(tmp).delete()
  }

  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesS) = args.take(3)
    val copies = copiesS.toInt
    // Optional 4th arg (r15 verdict item 4): fixed-eval mode. The
    // decontam rows define their eval suite as vec_id % evalMod == 0,
    // and Stride % 50 == 0, so plain copying grows the eval suite with
    // the corpus — a stress case, not the production contract (a
    // benchmark suite is FIXED while the corpus grows). With a mod
    // passed here, copies k > 0 drop their eval-slice rows: the fixture
    // keeps the base generation's eval suite verbatim and scales only
    // the corpus side. Pass the same mod the measured row uses
    // (default 50 everywhere).
    val fixedEvalMod: Option[Long] = args.lift(3).map(_.toLong)
    // the mode only holds when id-shifting cannot move a copy's rows
    // INTO the eval residue class: shifted ids are vec_id + k·Stride,
    // so Stride % m == 0 is load-bearing (with mod 7, 10⁷ % 7 = 3 and
    // copies' rows land at residue 0 again — the exact artifact the
    // mode removes, silently). Fail loudly instead (r16 review).
    fixedEvalMod.foreach(m => require(m > 0 && Stride % m == 0,
      s"fixedEvalMod=$m must divide the id stride $Stride or copies' " +
        "shifted ids re-enter the eval slice"))
    new java.io.File(out).mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-scale-fixture")
      .getOrCreate()
    // the fixture's single-file tables must stay SPLITTABLE: with the
    // parquet default 128 MB block size every table here is one row
    // group and a 32-core scan runs on one core (measured 17× on the
    // 100× documents full scan — GraftConfig.ParquetRowGroupBytes)
    GraftConfig.useSplittableWrites(spark)
    import spark.implicits._

    val docs = graft.sources.Tables.documents(spark, src)
    requireIdsUnderStride(docs, Seq("doc_id"), "documents")
    val docCopies = (0 until copies).map { k =>
      val text =
        if (k == 0) $"text"
        else regexp_replace(graft.functions.Text.normalizeFast($"text"),
          "([a-z0-9]+)", s"$$1z$k")
      docs.select(($"doc_id" + lit(k * Stride)).as("doc_id"), text.as("text"),
        $"lang", $"source", length(text).cast("long").as("n_chars"))
    }.reduce(_ unionByName _)
    writeSingleFile(docCopies, out, "documents")

    val emb = graft.sources.Tables.embeddings(spark, src)
    requireIdsUnderStride(emb, Seq("vec_id"), "embeddings")
    val dim = emb.select($"embedding").head().getSeq[Float](0).length
    // Circular shifts alone give only `dim` distinct transforms — copy
    // dim would silently be a VERBATIM duplicate of copy 0 (k % dim
    // wraps), recreating the exact-dup pair explosion this fixture
    // exists to prevent. Copies in the second dim-block compose a
    // REVERSAL with the shift (another norm/within-copy-cosine
    // preserving permutation, near-background across blocks); beyond
    // 2·dim fail loudly rather than duplicate.
    require(copies <= 2 * dim,
      s"only ${2 * dim} distinct embedding transforms at dim=$dim; got copies=$copies")
    val embCopies = (0 until copies).map { k =>
      val rolled =
        if (k % dim == 0) $"embedding"
        else concat(slice($"embedding", k % dim + 1, dim - k % dim),
          slice($"embedding", 1, k % dim))
      val shifted = if (k < dim) rolled else reverse(rolled)
      val cols = Seq(($"vec_id" + lit(k * Stride)).as("vec_id"),
        shifted.as("embedding")) ++
        emb.columns.filter(c => c != "vec_id" && c != "embedding").map(col)
      val src0 = fixedEvalMod match {
        case Some(m) if k > 0 => emb.filter($"vec_id" % m =!= 0)
        case _ => emb
      }
      src0.select(cols: _*)
    }.reduce(_ unionByName _)
    writeSingleFile(embCopies, out, "embeddings")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ts passes through UNCONVERTED (raw nanos-long in older testdata
    // generations, TIMESTAMP(MICROS) in current ones) so the fixture's
    // events file reads through the schema-adaptive loaders exactly like
    // the original
    val ev = spark.read.parquet(s"$src/events.parquet")
    requireIdsUnderStride(ev, Seq("event_id", "user_id"), "events")
    val evCopies = (0 until copies).map { k =>
      ev.select(($"event_id" + lit(k * Stride)).as("event_id"), $"ts",
        ($"user_id" + lit(k * Stride)).as("user_id"),
        $"event_type", $"value", $"props")
    }.reduce(_ unionByName _)
    writeSingleFile(evCopies, out, "events")

    // the TPC-H tables are not scaled (no query consumes them at the
    // fixture SFs) but Bench's staging phase reads some of them, so a
    // fixture dir without them fails staging (r16 find: the fixed-eval
    // fixture's first Bench run died on lineitem.parquet — the main
    // fixture had been hand-symlinked in r14 and the step was never
    // folded into the generator). Symlink them from the source dir.
    // guards (r16 review): createSymbolicLink happily creates DANGLING
    // links (the fixture would "succeed" and fail later inside Bench
    // staging — the exact trap this step closes), and out == src would
    // delete the REAL source tables before self-linking them.
    require(java.nio.file.Paths.get(out).toAbsolutePath.normalize !=
      java.nio.file.Paths.get(src).toAbsolutePath.normalize,
      s"fixture outDir must differ from srcDir ($src)")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      val target = java.nio.file.Paths.get(src, s"$t.parquet").toAbsolutePath
      require(java.nio.file.Files.exists(target),
        s"source table missing: $target — refusing to create a dangling symlink")
      val link = java.nio.file.Paths.get(out, s"$t.parquet")
      // only replace a prior SYMLINK: a real parquet directory here (a
      // hand-copied table from before this generator change) would make
      // deleteIfExists throw a raw DirectoryNotEmptyException — and a
      // real FILE would be silently destroyed and replaced by a link
      // (r16 ADVICE). Refuse with a message instead.
      if (java.nio.file.Files.isSymbolicLink(link)) {
        java.nio.file.Files.delete(link)
      } else {
        require(!java.nio.file.Files.exists(link),
          s"$link exists and is not a symlink — a stale real table is " +
            s"sitting in the fixture dir; clear it by hand before regenerating")
      }
      java.nio.file.Files.createSymbolicLink(link, target)
    }
    println(s"wrote ${copies}x fixture to $out" +
      fixedEvalMod.map(m => s" (fixed eval slice: vec_id % $m)").getOrElse(""))
    spark.stop()
  }
}

/** Dev tool: time the sketch pipeline's native-expression path against
  * its UDF twin on the same corpus (SURVEY §6's dedup-family cut).
  *
  * Usage: runMain graft.SketchBench <sfDir>
  */
object SketchBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-sketch-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.functions.{MinhashSig, ShingleGramHashes, SimHash64, Text}
    val docs = graft.sources.Tables.documents(spark, dir).select($"text")
    docs.write.format("noop").mode("overwrite").save() // page-fault warmup
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Double = {
      // one warm pass then three measured, best-of (JIT settles)
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-14s ${ts.min}%.3f s (best of 3)")
      ts.min
    }
    val native = time("native") {
      docs.select(MinhashSig(ShingleGramHashes($"text")).as("sig"),
        SimHash64(ShingleGramHashes($"text")).as("sh"))
    }
    val viaUdf = time("udf") {
      docs.select(Text.minhashSigUdf(Text.shingleHashesFastUdf($"text")).as("sig"),
        Text.simhashUdf(Text.shingleHashesFastUdf($"text")).as("sh"))
    }
    println(f"""{"native_sec":$native%.3f,"udf_sec":$viaUdf%.3f,"speedup":${viaUdf / native}%.2f}""")
    spark.stop()
  }
}

/** Dev tool behind SURVEY §6's delta-LSH bounded-state decade: drive
  * the CONTINUOUS LSH dedup gate through a full feed → compact →
  * restart cycle at fixture scale, recording state rows/bytes per
  * wave. Each wave feeds one slice of the delta docs into the SAME
  * checkpoint (state survives restarts), then "compaction" publishes
  * the next index generation containing everything fed so far — so the
  * next wave's probes carry the compaction receipt (handoff eviction)
  * and the quiet-bucket TTL (short here; contract TTL ≥ compaction
  * cadence) drops buckets the next generation owns. Bounded state =
  * per-wave state rows/bytes PLATEAU instead of accumulating across
  * waves.
  *
  * Usage: runMain graft.DeltaLshCycle <sfDir> [waves=3] [ttlSec=5]
  */
object DeltaLshCycle {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val waves = args.lift(1).map(_.toInt).getOrElse(3)
    val ttlSec = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // retain only the live state version: the default (100) keeps a
      // growing archive of historical .delta/SST versions in the
      // checkpoint, which would confound the heap-vs-rocksdb on-disk
      // comparison below with retention format rather than state size
      .config("spark.sql.streaming.minBatchesToRetain", "1")
      .appName("graft-delta-lsh-cycle")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ROCKSDB=1 runs the cycle under the spec-pinned
    // production provider flip (GraftConfig.useRocksDbStateStore) —
    // the r13 cycle measured 1.88 GB of heap-provider state at 100×,
    // exactly the size the flip exists for, but never measured under it.
    // SPARK_GRAFT_ROCKSDB=changelog adds RocksDB changelog
    // checkpointing (r16 verdict item 4): the Section B itemization
    // showed the steady-state premium is COMMIT-dominated (SST
    // flush/copy/fileSync — 871 MB copied in one wave), which is the
    // exact cost class changelog checkpointing defers to async snapshot
    // maintenance; the third interleaved arm measures whether the
    // 1.3-1.9× premium is inherent or configuration.
    // "1" = plain RocksDB (changelog OFF — the pre-r17 shape, kept as
    // its own arm so the Section C A/B reruns against the new default);
    // "changelog" = the shipped default (changelog ON)
    val provider = sys.env.get("SPARK_GRAFT_ROCKSDB") match {
      case Some("1") =>
        graft.GraftConfig.useRocksDbStateStore(spark,
          changelogCheckpointing = false)
        "rocksdb"
      case Some("changelog") =>
        graft.GraftConfig.useRocksDbStateStore(spark)
        "rocksdb_cl"
      case _ => "heap"
    }
    import spark.implicits._
    import graft.functions.{MinhashBands, MinhashSig, ShingleGramHashes}
    import graft.operators.{Dedup, StreamQueries}

    val work = java.nio.file.Files.createTempDirectory("graft_lsh_cycle").toString
    val feedDir = s"$work/feed"
    val outDir = s"$work/out"
    val ckpt = s"$work/ckpt"
    val delta = graft.sources.Tables.documents(spark, dir)
      .filter($"doc_id" % 5 === 0)
      .select($"doc_id", $"text")

    // generation 0 = the staged base index (doc_id % 5 != 0)
    def writeGen(k: Int, extraPred: org.apache.spark.sql.Column): String = {
      val gen = s"$work/gen$k"
      val extra = graft.sources.Tables.documents(spark, dir)
        .filter(extraPred)
        .select($"doc_id", ShingleGramHashes($"text").as("hashes"))
        .filter(size($"hashes") > 0)
        .select($"doc_id", MinhashSig($"hashes").as("sig"))
        .select($"doc_id", $"sig", MinhashBands($"sig").as("bands"))
      StreamQueries.groupBandBuckets(
        Dedup.baseMinhashIndex(spark, dir).unionByName(extra))
        .write.mode("overwrite").parquet(gen)
      gen
    }
    var gen = writeGen(0, lit(false))
    (1 to waves).foreach { k =>
      // wave k's arrivals: the k-th residue slice of the delta docs
      delta.filter(($"doc_id" / 5).cast("long") % waves === (k - 1))
        .coalesce(4).write.mode("append").parquet(feedDir)
      val docs = spark.readStream.schema("doc_id LONG, text STRING").parquet(feedDir)
      val t0 = System.nanoTime()
      val q = graft.operators.StreamQueries.deltaLshTopologyOnBuckets(
        docs, spark.read.parquet(gen), bucketTtl = s"$ttlSec seconds")
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      val so = q.lastProgress.stateOperators
      // on-disk state footprint (provider-agnostic): RocksDB's
      // memoryUsedBytes reports only its block-cache slice, so the
      // checkpoint state dir is the comparable heap-vs-rocksdb number
      val stateDisk = {
        val p = java.nio.file.Paths.get(ckpt, "state")
        if (java.nio.file.Files.exists(p)) {
          // close the walk stream, and tolerate ANYTHING the state-store
          // maintenance thread deletes mid-walk — the traversal itself
          // (not just the stat) throws when a version directory vanishes
          // between enumeration steps, and a lost-metric wave beats a
          // crashed multi-hour cycle (r14 review)
          try {
            val walk = java.nio.file.Files.walk(p)
            try walk.filter(java.nio.file.Files.isRegularFile(_))
              .mapToLong { f =>
                try java.nio.file.Files.size(f)
                catch { case _: java.io.IOException | _: java.io.UncheckedIOException => 0L }
              }.sum()
            finally walk.close()
          } catch {
            case _: java.io.IOException | _: java.io.UncheckedIOException => -1L
          }
        } else 0L
      }
      // provider-internal attribution (r15 — the r14 wave-1 anomaly):
      // the nonzero state-store custom metrics, summed across operators,
      // name WHERE a wave's wall went (RocksDB commit/flush/compact/
      // fileSync/snapshot latencies vs the heap provider's near-empty
      // map) instead of leaving a 25 s gap unexplained
      val custom = {
        import scala.jdk.CollectionConverters._
        so.flatMap(_.customMetrics.asScala)
          .groupBy(_._1).view.mapValues(_.map(_._2.longValue()).sum)
          .filter(_._2 != 0L).toSeq.sortBy(_._1)
          .map { case (k2, v) => s""""$k2":$v""" }.mkString("{", ",", "}")
      }
      println(f"""{"wave":$k,"provider":"$provider","sec":$sec%.2f,""" +
        s""""state_rows":${so.map(_.numRowsTotal).sum},""" +
        s""""state_bytes":${so.map(_.memoryUsedBytes).sum},""" +
        s""""state_disk_bytes":$stateDisk,""" +
        s""""pairs_total":${spark.read.parquet(outDir).count()},""" +
        s""""custom_metrics":$custom}""")
      // compaction: the next generation owns every wave fed so far
      gen = writeGen(k, $"doc_id" % 5 === 0 && ($"doc_id" / 5).cast("long") % waves < k)
      Thread.sleep(ttlSec * 1000L + 500L) // let this wave's buckets go quiet
    }
    spark.stop()
    // the work dir holds waves+1 full band-index generations plus the
    // checkpoint — ~22 GB at the 100× fixture; leaving it behind is how
    // a measurement box runs out of disk mid-round (it did, r14)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
  }
}

/** Dev tool (r15, verdict item 4): itemize `q_stream_audit`'s wall —
  * N isolated runs each of (a) the full ladder, (b) the ladder with the
  * near rung's sketch + band probe switched off (the measurement-only
  * `nearRung=false` flag), and (c) `q_stream_pii` as the harness+source
  * floor (same readStream → memory-sink AvailableNow shape, one
  * stateless map). full−noNear ≈ the near rung (sketch+probe+fold);
  * noNear−pii ≈ the three stateless gate probes; pii ≈ harness. One
  * JSON line per run; a warm-up pass of each variant runs first so JIT
  * and dump staging bill nobody.
  *
  * Usage: runMain graft.AuditItemize <sfDir> [runs]
  */
object AuditItemize {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-audit-itemize")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val variants: Seq[(String, () => Long)] = Seq(
      "audit_full" -> (() =>
        graft.operators.StreamQueries.streamAudit(spark, dir).count()),
      "audit_no_near" -> (() =>
        graft.operators.StreamQueries.streamAudit(spark, dir,
          nearRung = false).count()),
      "pii_floor" -> (() =>
        graft.operators.StreamQueries.streamPii(spark, dir).count()))
    variants.foreach { case (_, f) => f() } // warm-up: JIT + dumps
    (1 to runs).foreach { r =>
      variants.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        val n = f()
        println(s"""{"variant":"$name","run":$r,"sec":${
          (System.nanoTime() - t0) / 1e9},"rows":$n}""")
      }
    }
    spark.stop()
  }
}

/** Dev tool (r15, verdict item 1): candidate-stream itemization for
  * the SimHash clique collapse — doc-level vs signature-level blocking
  * volumes for both sketch variants at an arbitrary fixture, the
  * numbers behind decades_r15 Section B.
  *
  * Usage: runMain graft.SimhashCandProbe <sfDir>
  */
object SimhashCandProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-simhash-cand-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.sources.Tables

    // the SAME block expression the shipped plans use (r16 review: a
    // third hand-copy here could silently measure a different scheme)
    def blockCols(sigCol: String) =
      graft.operators.Dedup.simhashBlockCols(col(sigCol))

    def report(name: String, sigs: org.apache.spark.sql.DataFrame): Unit = {
      sigs.cache().count()
      val docBlocked = sigs.select($"doc_id", $"sig", blockCols("sig").as("e"))
        .select($"doc_id", $"e.blk", $"e.bh")
      val docCand = docBlocked.as("a").join(docBlocked.as("b"),
        $"a.blk" === $"b.blk" && $"a.bh" === $"b.bh" &&
          $"a.doc_id" < $"b.doc_id").count()
      val reps = sigs.groupBy($"sig").agg(count(lit(1)).as("c"))
      val nSigs = reps.count()
      val repBlocked = reps.select($"sig", blockCols("sig").as("e"))
        .select($"sig", $"e.blk", $"e.bh")
      val repCand = repBlocked.as("a").join(repBlocked.as("b"),
        $"a.blk" === $"b.blk" && $"a.bh" === $"b.bh" &&
          $"a.sig" < $"b.sig").count()
      val maxClique = reps.agg(max($"c")).head().getLong(0)
      println(s"[cand] $name docs=${sigs.count()} distinct_sigs=$nSigs " +
        s"max_sig_clique=$maxClique doc_level_candidates=$docCand " +
        s"sig_level_candidates=$repCand")
      sigs.unpersist()
    }

    report("mm_simhash(byte-gram)", Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, p) =>
        (id, graft.functions.Text.simhash64(
          graft.operators.Multimodal.byteGramHashes(p)))
      }.toDF("doc_id", "sig"))
    report("dedup_simhash(word-shingle)", Tables.documents(spark, dir)
      .select($"doc_id", graft.functions.SimHash64(
        graft.functions.ShingleGramHashes($"text")).as("sig")))
    spark.stop()
  }
}

/** Dev tool (r15, verdict item 6): driver-local CellIndex coarse-train
  * wall at synthetic codebook sizes — the measurement behind
  * `CellIndex.MaxDriverTrainK`'s pinned boundary.
  *
  * Usage: runMain graft.CoarseTrainProbe
  */
object CoarseTrainProbe {
  def main(args: Array[String]): Unit = {
    val dim = 64
    val rnd = new scala.util.Random(11)
    for (k <- Seq(10000, 30000, 100000, 300000)) {
      val fine = Array.fill(k)(Array.fill(dim)(rnd.nextDouble()))
      val t0 = System.nanoTime()
      val idx = graft.operators.Similarity.CellIndex.of(fine)
      println(f"[coarse] k=$k%7d kc=${idx.coarse.length}%5d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
  }
}

/** Dev tool: run a streaming harness query and print its final
  * StreamingQueryProgress — the state-store row/byte counts behind
  * SURVEY §6's O(log²W) DGIM state audit.
  *
  * Usage: runMain graft.StateProbe <queryKey> <sfDir>
  */
object StateProbe {
  def main(args: Array[String]): Unit = {
    val Array(key, dir) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-state-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConfig.useSplittableWrites(spark)
    val n = SparkEntry.queries(key)(spark, dir).count()
    println(s"""{"query":"$key","rows":$n,"progress":${
      graft.operators.StreamQueries.lastProgress.getOrElse("null")}}""")
    spark.stop()
  }
}

/** Dev tool (r16, r15 verdict item 5): stage itemization of
  * `dedup_containment`'s zero-join plan — times each named sub-plan
  * ([[graft.operators.Dedup.containmentPlan]]: shingle explode →
  * bounded posting agg → lazy pair stream → pair-count agg → verified)
  * with an independent count, so the marginal deltas attribute the
  * row's wall (and the in-suite vs isolated gap) to a stage instead of
  * a guess. Each count re-executes its upstream (no caching — the
  * point is the operator's own cost shape), so stage k's marginal is
  * t(k) − t(k−1) — with ONE caveat under the r16 plan (review find):
  * the grouped stage internally derives `base` TWICE (the df-count
  * pass and the anti-join's left side), so t(posting_agg) −
  * t(base_explode) OVERSTATES the collector machinery by about one
  * extra base pass (~19 s at 100×). A warm-up pass of the full plan
  * runs first.
  *
  * Usage: runMain graft.ContainmentProbe <sfDir> [runs]
  */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-containment-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val plan = graft.operators.Dedup.containmentPlan(spark, dir)
    val stages: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "base_explode" -> plan.base,
      "posting_agg" -> plan.grouped,
      "pair_stream" -> plan.pairStream,
      "pair_agg" -> plan.co,
      "verified" -> plan.verified)
    plan.verified.count() // warm-up: JIT + parquet footer cache
    (1 to runs).foreach { r =>
      stages.foreach { case (name, df) =>
        val t0 = System.nanoTime()
        val n = df.count()
        println(s"""{"stage":"$name","run":$r,"sec":${
          (System.nanoTime() - t0) / 1e9},"rows":$n}""")
      }
    }
    spark.stop()
  }
}

/** Dev tool (r16, r15 verdict item 5 follow-through): the containment
  * stage probe attributed the row's 100× wall to the POSTING
  * AGGREGATION (the CappedPostings typed-Aggregator groupBy: ~50-60 s
  * marginal over the 19 s shingle explode), NOT the pair stream the
  * scaladoc blamed (double-explode marginal ≈ 0). This probe times the
  * collector variants that could replace it, same fixture, same
  * upstream:
  *   count_floor — groupBy(s).count(): the exchange+agg machinery floor
  *   udaf        — the r15 CappedPostings collector (retired by this
  *                 probe's measurement; kept HERE as a local class so
  *                 the comparison stays reproducible)
  *   collect     — native collect_list + post-hoc size filter (the
  *                 UNSHIPPABLE baseline: unbounded hot-group buffers)
  *   shipped     — the r16 plan: df-count pass → anti-join hot
  *                 shingles → native collect_list (bounded BY
  *                 CONSTRUCTION: no group above cap ever reaches the
  *                 collector; ≈ the machinery floor because the
  *                 anti-join's SMJ pre-sorts the rows the fallback
  *                 sort-aggregation needs anyway)
  *
  * Measured at the 100× fixture (decades_r16 Section E): floor
  * 47.6-49.6 s, udaf 74.7-80.1, collect 75.4-77.0, shipped 47.9-51.7.
  *
  * Usage: runMain graft.PostingAggProbe <sfDir> [runs]
  */
object PostingAggProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-posting-agg-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val plan = graft.operators.Dedup.containmentPlan(spark, dir)
    val base = plan.base
    val cap = graft.operators.Dedup.containmentDfCapFor(
      graft.sources.Tables.documents(spark, dir).count())
    val collector = udaf(new CappedPostings(
        math.min(cap, Int.MaxValue.toLong).toInt),
      org.apache.spark.sql.Encoders.product[(Long, Long)])
    val variants: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "base_explode" -> base,
      "count_floor" -> base.groupBy($"s").count(),
      "udaf" -> base.groupBy($"s")
        .agg(collector($"doc_id", $"n").as("ds")).filter(!$"ds.over"),
      "collect" -> base.groupBy($"s")
        .agg(collect_list(struct($"doc_id".as("id"), $"n")).as("es"))
        .filter(size($"es") <= cap),
      "shipped" -> plan.grouped)
    variants.foreach { case (_, df) => df.count() } // warm-up
    (1 to runs).foreach { r =>
      variants.foreach { case (name, df) =>
        val t0 = System.nanoTime()
        val n = df.count()
        println(s"""{"variant":"$name","run":$r,"sec":${
          (System.nanoTime() - t0) / 1e9},"rows":$n}""")
      }
    }
    spark.stop()
  }
}

/** Dev tool (r17, r16 verdict item 1): full-row A/B of
  * `dedup_containment`'s grouping shapes — the r16 two-pass collector
  * re-derives the scan+shingle-explode once per consumer (the df-count
  * pass and the anti-join's left side each consume `base`, ~20 s at
  * 100×), and this probe adjudicates the two candidate cures against
  * the shipped shape on the FULL row (verified.count — the r16 lesson:
  * the collector rewrite's 27 s stage win shrank to ~13 s at the row
  * because the extra base pass clawed half back; stage deltas lie):
  *   anti    — shipped r16 shape (two base passes + hot anti-join)
  *   window  — one base pass: df rides count(*) OVER (PARTITION BY s)
  *             on the same exchange+sort the collector needs; filter
  *             df<=cap BEFORE any list materializes; same-partitioning
  *             collect_list (zero joins, zero second exchange)
  *   persist — the anti shape over a persisted slim base (one
  *             materialization, two cached reads); the probe clears the
  *             cache after each run so every run pays materialization
  * Variants are interleaved per run (a/w/p, a/w/p, ...) so the box's
  * drift brackets every arm — the only valid A/B on this box
  * (decades_r16 Section A).
  *
  * Usage: runMain graft.ContainmentShapeProbe <sfDir> [runs]
  */
object ContainmentShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-containment-shape-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val variants = Seq("anti", "window", "persist")
    // warm-up: JIT + parquet footer cache, shipped shape
    graft.operators.Dedup.containmentPlan(spark, dir).verified.count()
    (1 to runs).foreach { r =>
      variants.foreach { name =>
        val plan = graft.operators.Dedup.containmentPlan(
          spark, dir, grouping = name)
        val t0 = System.nanoTime()
        val n = plan.verified.count()
        println(s"""{"variant":"$name","run":$r,"sec":${
          (System.nanoTime() - t0) / 1e9},"rows":$n}""")
        if (name == "persist") spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}

/** Dev tool (r17, r16 verdict item 5): stage itemization of
  * `q_stream_session_paths` — five legs over the same events stream
  * ([[graft.operators.StreamQueries.sessionPathsItemize]]) whose
  * marginal deltas split the row's wall into source+harness floor /
  * session-store merge machinery / in-state event accumulation /
  * ordered path build, plus the `slim` dictionary-coded candidate the
  * verdict asked to check. Legs interleave per run so box drift
  * brackets every arm; each line carries the state operator's
  * memoryUsedBytes and commit/update times from the final
  * StreamingQueryProgress.
  *
  * Usage: runMain graft.SessionPathsProbe <sfDir> [runs]
  */
object SessionPathsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-session-paths-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val legs = Seq("floor_tumble", "session_count", "session_nosort",
      "shipped", "slim")
    def metric(json: String, key: String): String =
      s""""$key"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(json)
        .map(_.group(1)).getOrElse("null")
    // warm-up: events-stream first-touch lands on the FIRST streaming
    // query in a JVM (r12 attribution) — keep it off leg 1
    graft.operators.StreamQueries.sessionPathsItemize(spark, dir,
      "floor_tumble").count()
    (1 to runs).foreach { r =>
      legs.foreach { leg =>
        val t0 = System.nanoTime()
        val n = graft.operators.StreamQueries
          .sessionPathsItemize(spark, dir, leg).count()
        val p = graft.operators.StreamQueries.lastProgress.getOrElse("")
        println(s"""{"leg":"$leg","run":$r,"sec":${
          (System.nanoTime() - t0) / 1e9},"rows":$n,"state_bytes":${
          metric(p, "memoryUsedBytes")},"commit_ms":${
          metric(p, "commitTimeMs")},"update_ms":${
          metric(p, "allUpdatesTimeMs")}}""")
      }
    }
    spark.stop()
  }
}

/** Dev tool (r18, r17 verdict item 4): stage itemization of
  * `q_stream_delta_lsh` — four legs over the same arriving docs
  * ([[graft.operators.StreamQueries.deltaLshItemize]]) whose marginal
  * deltas split the wall into source+harness floor / map-side
  * shingle→minhash→band sketch / stream-static index join / stateful
  * verify fold. Legs interleave per run so box drift brackets every
  * arm; each line carries the state operator's memoryUsedBytes and
  * commit/update times from the final StreamingQueryProgress.
  *
  * Usage: runMain graft.DeltaLshProbe <sfDir> [runs]
  */
object DeltaLshProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-delta-lsh-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val legs = Seq("floor_source", "sketch", "probe_join", "shipped")
    def metric(json: String, key: String): String =
      s""""$key"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(json)
        .map(_.group(1)).getOrElse("null")
    // warm-up: docs-stream first-touch + index staging land on the
    // first query in a JVM — keep them off leg 1
    graft.operators.StreamQueries.deltaLshItemize(spark, dir,
      "probe_join").count()
    (1 to runs).foreach { r =>
      legs.foreach { leg =>
        val t0 = System.nanoTime()
        val n = graft.operators.StreamQueries
          .deltaLshItemize(spark, dir, leg).count()
        val p = graft.operators.StreamQueries.lastProgress.getOrElse("")
        println(s"""{"leg":"$leg","run":$r,"sec":${
          (System.nanoTime() - t0) / 1e9},"rows":$n,"state_bytes":${
          metric(p, "memoryUsedBytes")},"commit_ms":${
          metric(p, "commitTimeMs")},"update_ms":${
          metric(p, "allUpdatesTimeMs")}}""")
      }
    }
    spark.stop()
  }
}

/** Dev tool (r18, r17 verdict item 5): full-row A/B of the three
  * `text_tfidf` df-attach shapes
  * ([[graft.operators.TextAnalysis.tfidfShape]]) — join (shipped r16),
  * window (join-free df over the word exchange, the containment
  * device), bcast (broadcast df, zero word-shuffles of tf). Interleaved
  * arms, warm-up excluded, per-run row counts printed so arm
  * equivalence is verified in the raw output.
  *
  * Usage: runMain graft.TfidfShapeProbe <sfDir> [runs]
  */
object TfidfShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-tfidf-shape-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shapes = Seq("join", "window", "bcast")
    // warm-up: JIT + parquet footer cache, shipped shape
    graft.operators.TextAnalysis.tfidf(spark, dir).count()
    (1 to runs).foreach { r =>
      shapes.foreach { name =>
        val t0 = System.nanoTime()
        val n = graft.operators.TextAnalysis
          .tfidfShape(spark, dir, name).count()
        println(s"""{"shape":"$name","run":$r,"sec":${
          (System.nanoTime() - t0) / 1e9},"rows":$n}""")
      }
    }
    spark.stop()
  }
}

/** The r15 bounded posting collector, RETIRED r16 ([[PostingAggProbe]]'s
  * measurement): it enforced the df cap inside the aggregation buffer
  * (over-marker past cap), but every object-collector aggregation falls
  * back to sort-based past 128 hash-map keys, and the shipped two-pass
  * plan gets the same bound by construction at the machinery floor.
  * Lives here only so the probe's comparison stays reproducible.
  */
private final case class PostingBuf(
    over: Boolean, entries: Vector[(Long, Long)])

private final class CappedPostings(cap: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      (Long, Long), PostingBuf, PostingBuf] {
  def zero: PostingBuf = PostingBuf(over = false, Vector.empty)
  def reduce(b: PostingBuf, a: (Long, Long)): PostingBuf =
    if (b.over) b
    else if (b.entries.length >= cap) PostingBuf(over = true, Vector.empty)
    else PostingBuf(over = false, b.entries :+ ((a._1, a._2)))
  def merge(x: PostingBuf, y: PostingBuf): PostingBuf =
    if (x.over || y.over || x.entries.length + y.entries.length > cap)
      PostingBuf(over = true, Vector.empty)
    else PostingBuf(over = false, x.entries ++ y.entries)
  def finish(b: PostingBuf): PostingBuf = b
  def bufferEncoder: org.apache.spark.sql.Encoder[PostingBuf] =
    org.apache.spark.sql.Encoders.product[PostingBuf]
  def outputEncoder: org.apache.spark.sql.Encoder[PostingBuf] =
    org.apache.spark.sql.Encoders.product[PostingBuf]
}
