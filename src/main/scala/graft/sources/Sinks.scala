package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sink-side demonstration: hive-style partitioned parquet write +
  * partition-pruned read-back.
  *
  * At 100 TB, the LAYOUT of what you write determines every downstream
  * read: partitioning the corpus by a low-cardinality column (here
  * `lang`) means a language-filtered scan never opens the other
  * partitions' files — the filter resolves at the FILE LISTING level
  * (visible as `PartitionFilters` in the plan, distinct from row-group
  * `PushedFilters`). The read-back query below proves the round trip is
  * lossless (hash-matches the oracle computed on the original table)
  * and prunes.
  */
object Sinks {

  /** Write documents partitioned by lang (once per source dir — the
    * testdata is immutable), then aggregate a language-filtered read.
    */
  def partitionedRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = DumpCache.ensure(
      DumpCache.dirFor("graft_docs_by_lang", dir, "documents.parquet")) { tmp =>
      Tables.documents(spark, dir)
        .write.mode("overwrite").partitionBy("lang").parquet(tmp)
    }
    spark.read.parquet(out)
      .filter($"lang" =!= "zh") // partition-pruned: zh files never open
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
  }

  val partitionedRoundTripSql: String = """
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE lang != 'zh' GROUP BY lang"""

  /** Schema-ful CSV round trip: write the documents' metadata columns as
    * headered CSV (the interchange format everything speaks), read back
    * with an EXPLICIT schema (never inferSchema at scale — it double-scans
    * and guesses), aggregate. Hash-matches the same aggregate computed on
    * the original parquet — proving the text round trip is lossless for
    * the typed columns.
    */
  def csvRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // explicit null/empty markers on BOTH sides: Spark's CSV default writes
    // null and "" identically (empty field), which would silently turn an
    // empty string into null on read-back and break the lossless claim
    val nullMark = "\\N"
    val out = DumpCache.ensure(
      DumpCache.dirFor("graft_docs_csv", dir, "documents.parquet")) { tmp =>
      Tables.documents(spark, dir)
        .select($"doc_id", $"lang", $"source", $"n_chars")
        .write.mode("overwrite").option("header", "true")
        .option("nullValue", nullMark).option("emptyValue", "\"\"").csv(tmp)
    }
    val schema = "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT"
    spark.read.schema(schema).option("header", "true")
      .option("nullValue", nullMark).option("emptyValue", "").csv(out)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
  }

  val csvRoundTripSql: String = """
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1, 2"""

  /** JSONL round trip — the interchange format LLM corpora actually move
    * in (one JSON object per line: The Pile, C4, RedPajama, FineWeb all
    * ship this way). Write the FULL document rows (text included) as
    * JSON lines, read back with an EXPLICIT schema (inferSchema at scale
    * double-scans), and prove losslessness by hash-matching a per-group
    * aggregate that covers every column: counts, n_chars sums, and an
    * order-independent text checksum (sum of each doc's first-14-hex of
    * md5(text) as a BIGINT — any mutation of any text byte moves it).
    * 14 hex digits keep each term < 2^56, so per-group sums stay far
    * inside int64 at gate scale and hash identically across engines —
    * a 16-hex term forces a DECIMAL(38,0) sum that the comparison layer
    * coerces through float64 differently per engine. (At unbounded group
    * sizes you'd switch the sum to a BIT_XOR fold, which never grows.)
    *
    * Scale: JSONL is splittable (line-delimited), so both the write and
    * the read-back parallelize per-partition with no coordination; the
    * aggregate is one map-side-combined group-key shuffle.
    */
  def jsonlRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = DumpCache.ensure(
      DumpCache.dirFor("graft_docs_jsonl", dir, "documents.parquet")) { tmp =>
      Tables.documents(spark, dir)
        .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
        .write.mode("overwrite").json(tmp)
    }
    val schema = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    spark.read.schema(schema).json(out)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        sum(conv(substring(md5($"text"), 1, 14), 16, 10).cast("long"))
          .as("text_checksum"),
        min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
  }

  val jsonlRoundTripSql: String = """
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CAST(('0x' || substring(md5(text), 1, 14)) AS BIGINT)) AS BIGINT) AS text_checksum,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM documents GROUP BY 1, 2"""

  /** Bucketed tables + co-located join: the shuffle is PRE-PAID once at
    * write time. Both tables are written `bucketBy(8, doc_id)` +
    * `sortBy(doc_id)`, so the doc_id equi-join between them needs NO
    * exchange — at 100 TB this turns every recurring join or
    * aggregation on the bucket key (the fact-fact join case broadcast
    * can't cover) from a full-corpus shuffle into a local merge of
    * co-located buckets. The join-side sorts are additionally elided
    * when each bucket is a single file (Spark only trusts the sortBy
    * order then; a multi-task write leaves a local per-bucket sort —
    * still never an exchange). PlanShapeSpec pins the no-exchange
    * property.
    *
    * The bucket metadata lives in the session catalog (in-memory here),
    * so each run re-registers the external tables; files land under the
    * fingerprint-keyed cache path. The final per-lang aggregate
    * hash-matches the same join computed directly by the oracle.
    *
    * Round 10: the bucketed GENERATIONS stage through DumpCache like
    * every other derived artifact — a production pipeline pays the
    * bucketed write once per ingest and amortizes it over every
    * co-located join that follows, so a warm run should measure the
    * no-exchange join, not re-pay the write (r9's bench flagged exactly
    * that). The sf0.01 cold gate wipes /tmp, so the write path itself
    * stays exercised every round; each run (new JVM, fresh in-memory
    * catalog) re-registers the staged files as external bucketed tables
    * via DDL.
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = DumpCache.dirFor("graft_bucketed", dir, "documents.parquet")
    val docs = Tables.documents(spark, dir)
    // bucketBy can only write through saveAsTable, and DumpCache's
    // atomic publish renames the directory afterwards — so the write
    // registers a throwaway *_stage entry whose metadata is dropped once
    // the files move, and the durable name is (re-)created as external
    // bucketed DDL over the staged location
    def ensureTable(table: String, path: String, ddl: String)(
        write: String => Unit): Unit = {
      if (!DumpCache.isReady(path)) {
        DumpCache.ensure(path)(write)
        spark.sql(s"DROP TABLE IF EXISTS ${table}_stage")
      }
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"CREATE TABLE $table ($ddl) USING PARQUET " +
        s"CLUSTERED BY (doc_id) SORTED BY (doc_id) INTO 8 BUCKETS " +
        s"LOCATION '$path'")
    }
    ensureTable("graft_docs_bucketed", s"$base/docs",
        "doc_id BIGINT, lang STRING, n_chars BIGINT") { tmp =>
      docs.select($"doc_id", $"lang", $"n_chars")
        .write.mode("overwrite").option("path", tmp)
        .bucketBy(8, "doc_id").sortBy("doc_id")
        .saveAsTable("graft_docs_bucketed_stage")
    }
    ensureTable("graft_docstats_bucketed", s"$base/stats",
        "doc_id BIGINT, n_words BIGINT") { tmp =>
      docs.select($"doc_id",
          size(graft.functions.Text.wordsFast($"text")).cast("long").as("n_words"))
        .write.mode("overwrite").option("path", tmp)
        .bucketBy(8, "doc_id").sortBy("doc_id")
        .saveAsTable("graft_docstats_bucketed_stage")
    }
    spark.table("graft_docs_bucketed")
      .join(spark.table("graft_docstats_bucketed"), "doc_id")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_words").as("total_words"),
        sum($"n_chars").as("total_chars"))
  }

  // ---- Z-order layout ---------------------------------------------------

  /** Interleave-spread a 16-bit value to even bit positions (the classic
    * mask ladder); decimal mask literals so the identical arithmetic is
    * emitted in the DuckDB oracle.
    */
  private def spread16(c: Column): Column = {
    val m = Seq(16711935L, 252645135L, 858993459L, 1431655765L) // 0x00FF00FF ...
    Seq(8, 4, 2, 1).zip(m).foldLeft(c) { case (x, (s, mask)) =>
      (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(mask))
    }
  }

  private def spread16Sql(x: String): String = {
    val m = Seq(16711935L, 252645135L, 858993459L, 1431655765L)
    Seq(8, 4, 2, 1).zip(m).foldLeft(x) { case (e, (s, mask)) =>
      s"((($e) | (($e) << $s)) & $mask)"
    }
  }

  /** Z-order (Morton) layout: interleave the bits of two 16-bit
    * dimensions — (user_id mod 2^16, integer-cents mod 2^16) — into one
    * sort key, range-partition + sort the write on it, and read back.
    *
    * Why it matters at 100 TB: a single-column sort clusters ONE
    * predicate dimension; the Z-curve keeps BOTH dimensions locally
    * clustered, so per-file min/max statistics prune scans for filters
    * on either column (the technique behind Delta/Iceberg Z-ORDER
    * optimization). The oracle hash-matches the interleave arithmetic
    * per row (pure bit ops, engine-identical); SinkLayoutSpec asserts
    * the written files cover DISJOINT z ranges — the property pruning
    * depends on.
    */
  def zorderRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = DumpCache.ensure(
      DumpCache.dirFor("graft_events_zorder", dir, "events.parquet")) { tmp =>
      val cents = round($"value" * 100).cast("long")
      val z = spread16(cents.bitwiseAND(lit(65535L)))
        .bitwiseOR(shiftleft(spread16($"user_id".bitwiseAND(lit(65535L))), 1))
      Tables.events(spark, dir)
        .select($"event_id", $"user_id", $"value", z.as("zval"))
        .repartitionByRange(8, $"zval", $"event_id")
        .sortWithinPartitions($"zval", $"event_id")
        .write.mode("overwrite").parquet(tmp)
    }
    spark.read.parquet(out).select($"event_id", $"zval")
  }

  val zorderRoundTripSql: String = {
    val a = spread16Sql("(CAST(round(value * 100) AS BIGINT) & 65535)")
    val b = spread16Sql("(user_id & 65535)")
    s"""SELECT event_id, ($a | ($b << 1)) AS zval FROM events"""
  }

  /** FILE-level stats manifest + manifest-driven pruning — the skipping
    * mechanism Delta/Iceberg layer ON TOP of partition pruning: per-file
    * min/max column stats let a range predicate drop whole files that a
    * partition filter can't touch. Composes with [[zorderRoundTrip]]'s
    * layout: BECAUSE the files cover disjoint z ranges, a z-range
    * predicate prunes almost all of them; on an unsorted layout every
    * file would straddle the predicate and nothing could be skipped —
    * the manifest is only as good as the layout under it.
    *
    * Mechanics: build the manifest by aggregating (min, max, count) per
    * `_metadata.file_path` (one scan of the slim columns — at scale
    * this is written ONCE at commit time, like a Delta log); evaluate
    * the predicate against the MANIFEST (file-cardinality rows);
    * hard-assert real skipping (pruned < total); read back ONLY the
    * surviving paths. The returned rows hash-match the full-scan
    * filter oracle — pruning is proven side-effect-free.
    */
  def manifestPrune(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    zorderRoundTrip(spark, dir) // ensure the z-ordered dump exists
    val out = DumpCache.dirFor("graft_events_zorder", dir, "events.parquet")
    // zval < 2^24 ⟺ cents < 4096 and user_id < 4096 (interleave bits)
    val hi = 1L << 24
    val manifest = spark.read.parquet(out)
      .select($"zval", col("_metadata.file_path").as("f"))
      .groupBy($"f")
      .agg(min($"zval").as("zmin"), max($"zval").as("zmax"),
        count(lit(1)).as("n_rows"))
      .collect() // file-cardinality: one row per written file
    val keep = manifest.filter(r => r.getAs[Long]("zmin") < hi)
      .map(_.getAs[String]("f"))
    require(keep.nonEmpty, "manifest pruning dropped every file")
    require(keep.length < manifest.length,
      s"manifest pruned nothing: ${keep.length}/${manifest.length} files " +
        "survive — the z layout no longer clusters the predicate range")
    spark.read.parquet(keep.toIndexedSeq: _*)
      .filter($"zval" < hi)
      .select($"event_id", $"zval")
  }

  val manifestPruneSql: String =
    s"""SELECT event_id, zval FROM ($zorderRoundTripSql)
        WHERE zval < ${1L << 24}"""

  val bucketedJoinSql: String = """
    WITH d AS (
      SELECT doc_id, lang, n_chars,
             len(string_split(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')), ' ')) AS n_words
      FROM documents)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM d GROUP BY lang"""

  /** Dynamic partition pruning: join the lang-PARTITIONED table against
    * a runtime-derived dimension (languages holding >15% of corpus
    * chars — not knowable at plan time), and let Spark prune the fact
    * scan's partitions AT RUNTIME from the broadcast dim's build side.
    * This is the scan-elimination mechanism star-schema queries live on
    * at 100 TB: the fact side never lists, opens, or reads the pruned
    * partitions, even though no static filter mentions them. The spec
    * pins the `dynamicpruning` subquery in the scan's PartitionFilters;
    * the driver gate hash-matches the join result.
    */
  def dppJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = DumpCache.ensure(
      DumpCache.dirFor("graft_docs_by_lang", dir, "documents.parquet")) { tmp =>
      Tables.documents(spark, dir)
        .write.mode("overwrite").partitionBy("lang").parquet(tmp)
    }
    val fact = spark.read.parquet(out)
    val docs = Tables.documents(spark, dir)
    // one-scalar driver action: the 15%-of-corpus threshold. The dim
    // REMAINS runtime-derived (an aggregate over the table), so no
    // static partition filter exists at plan time — DPP must do it.
    val threshold = docs.agg(sum($"n_chars")).as[Long].head * 0.15
    val dim = docs.groupBy($"lang")
      .agg(sum($"n_chars").as("total"))
      .filter($"total" > threshold)
      .select($"lang")
    fact.join(broadcast(dim), "lang")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
  }

  val dppJoinSql: String = """
    WITH keep AS (
      SELECT lang FROM documents GROUP BY lang
      HAVING SUM(n_chars) > (SELECT SUM(n_chars) * 0.15 FROM documents))
    SELECT d.lang, COUNT(*) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
    FROM documents d JOIN keep USING (lang)
    GROUP BY d.lang"""

  /** Small-file compaction (lakehouse OPTIMIZE): rewrite a
    * pathologically fragmented table (64 shards of a few KB each — the
    * classic output of an over-parallel or incremental writer) into
    * right-sized files, and prove the rewrite is LOSSLESS by aggregating
    * the compacted read-back against the original-table oracle.
    *
    * Why it's a first-class 100 TB operation: every downstream scan pays
    * per-file open/footer/listing costs, so millions of tiny files
    * throttle a cluster at the metadata layer long before IO — which is
    * why every table format ships OPTIMIZE/compaction as a maintenance
    * primitive. The rewrite here targets file count = ceil(rows /
    * rowsPerFile) via `repartitionByRange` on the layout key, so
    * compacted files also carry tight min/max stats on that key (the
    * same pruning benefit as sink_zorder's curve, for the 1-D case).
    */
  def compactRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frag = DumpCache.ensure(
      DumpCache.dirFor("graft_events_frag", dir, "events.parquet")) { tmp =>
      Tables.events(spark, dir)
        .select($"event_id", $"user_id", $"event_type", $"ts")
        .repartition(64) // the fragmented state under repair
        .write.mode("overwrite").parquet(tmp)
    }
    val target = math.max(1, math.ceil(
      spark.read.parquet(frag).count().toDouble / 50000).toInt)
    val compacted = DumpCache.ensure(
      DumpCache.dirFor("graft_events_compact", dir, "events.parquet")) { tmp =>
      spark.read.parquet(frag)
        .repartitionByRange(target, $"event_id")
        .write.mode("overwrite").parquet(tmp)
    }
    val nCompacted = new java.io.File(compacted).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    // the contract is right-SIZING (files ≈ ceil(rows / rowsPerFile)),
    // not an absolute count — a hardcoded `<= 8` here was correct only
    // at the gate SFs and failed the 10×/100× fixtures, where 20/200
    // right-sized files ARE the compacted state (fixture-found)
    require(nCompacted <= target,
      s"compaction left $nCompacted files for a <=$target-file target")
    spark.read.parquet(compacted)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), min($"event_id").as("min_id"),
        max($"event_id").as("max_id"))
  }

  val compactRoundTripSql: String = """
    SELECT event_type, COUNT(*) AS n,
           MIN(event_id) AS min_id, MAX(event_id) AS max_id
    FROM events GROUP BY event_type"""

  /** Targeted DELETE with manifest-driven file selection — the
    * GDPR/right-to-erasure maintenance primitive (Delta/Iceberg
    * DELETE + copy-on-write): "remove one tenant's rows" must NOT
    * rewrite a 100 TB table. The table is range-laid-out on doc_id, so
    * a tenant's contiguous id block lives in few files; a per-file
    * (min, max) manifest (same device as `sink_manifest`) selects ONLY
    * the overlapping files for rewrite, and every other file is carried
    * into the next generation untouched (here a file copy — in a table
    * format, a metadata-only manifest re-reference). In-query asserts
    * pin both sides: some files rewritten AND some carried (a layout
    * that scattered the tenant would silently degrade to a full
    * rewrite). The read-back aggregate hash-matches a plain NOT BETWEEN
    * oracle — deletion proven exact and side-effect-free.
    */
  def deleteRewrite(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lo = 100L
    val hi = 199L
    val gen0 = DumpCache.ensure(
      DumpCache.dirFor("graft_docs_gen0", dir, "documents.parquet")) { tmp =>
      Tables.documents(spark, dir)
        .repartitionByRange(10, $"doc_id")
        .write.mode("overwrite").parquet(tmp)
    }
    val gen1 = DumpCache.ensure(
      DumpCache.dirFor("graft_docs_gen1", dir, "documents.parquet")) { tmp =>
      val manifest = spark.read.parquet(gen0)
        .select($"doc_id", col("_metadata.file_path").as("f"))
        .groupBy($"f")
        .agg(min($"doc_id").as("mn"), max($"doc_id").as("mx"))
        .collect() // file-cardinality rows, like sink_manifest
      val (affected, untouched) = manifest
        .map(r => (r.getAs[String]("f"),
          r.getAs[Long]("mn"), r.getAs[Long]("mx")))
        .partition { case (_, mn, mx) => mn <= hi && mx >= lo }
      require(affected.nonEmpty, "delete range matched no file")
      require(untouched.nonEmpty,
        s"delete touched all ${manifest.length} files — the range " +
          "layout no longer clusters tenant ids")
      // rewrite ONLY the overlapping files, minus the tenant's rows
      spark.read.parquet(affected.map(_._1).toIndexedSeq: _*)
        .filter(!$"doc_id".between(lo, hi))
        .write.mode("overwrite").parquet(tmp)
      // carry every untouched file over by reference (prefixing keeps
      // names disjoint from the rewritten part files)
      untouched.foreach { case (f, _, _) =>
        val src = java.nio.file.Paths.get(new java.net.URI(f))
        java.nio.file.Files.copy(src,
          java.nio.file.Paths.get(tmp, "carry-" + src.getFileName.toString))
      }
    }
    spark.read.parquet(gen1)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"),
        min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
  }

  val deleteRewriteSql: String = """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM documents
    WHERE doc_id NOT BETWEEN 100 AND 199
    GROUP BY lang"""

  /** SNAPSHOT isolation / time travel — the property that makes
    * [[deleteRewrite]]'s copy-on-write safe to run live: the delete
    * PUBLISHED generation 1, but generation 0's files were never
    * touched, so a reader pinned to the old snapshot still sees the
    * full pre-delete table (Delta/Iceberg VERSION AS OF). This query
    * runs the delete (ensuring both generations exist), then reads
    * gen0 and hash-matches the ORIGINAL table's aggregate — proving
    * history survived the rewrite byte-for-byte.
    */
  def snapshotRead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    deleteRewrite(spark, dir).count() // publish gen1 (and gen0) first
    val gen0 = DumpCache.dirFor("graft_docs_gen0", dir, "documents.parquet")
    spark.read.parquet(gen0)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"),
        min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
  }

  val snapshotReadSql: String = """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM documents GROUP BY lang"""

  /** Schema evolution across file generations: an early write without a
    * column, a later write with it, one `mergeSchema` read spanning both
    * — the drift every long-lived corpus accumulates (new annotations,
    * new quality scores) without ever rewriting old files. Old-file rows
    * surface the new column as NULL; the aggregate proves the merged
    * read is lossless and the null accounting exact. At scale the same
    * mechanism is what lets a 100 TB table gain a column for free
    * (metadata-only evolution), with per-file schemas reconciled at scan
    * planning, not by a backfill job.
    */
  def evolveRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = DumpCache.ensure(
      DumpCache.dirFor("graft_docs_evolve", dir, "documents.parquet")) { tmp =>
      val docs = Tables.documents(spark, dir)
      // generation 1: metadata only (written before scoring existed)
      docs.filter($"doc_id" % 2 === 0)
        .select($"doc_id", $"lang", $"n_chars")
        .write.mode("overwrite").parquet(tmp + "/gen=1")
      // generation 2: same table, now carrying a quality score column
      docs.filter($"doc_id" % 2 === 1)
        .select($"doc_id", $"lang", $"n_chars",
          ($"n_chars" % 100).as("quality"))
        .write.mode("overwrite").parquet(tmp + "/gen=2")
      // mark the composite dump complete for DumpCache.isReady
      new java.io.File(tmp, "_SUCCESS").createNewFile()
    }
    spark.read.option("mergeSchema", "true").parquet(out)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"quality".isNull.cast("long")).as("n_unscored"),
        sum(coalesce($"quality", lit(0L))).as("sum_quality"))
  }

  val evolveRoundTripSql: String = """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unscored,
           CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars % 100 ELSE 0 END) AS BIGINT) AS sum_quality
    FROM documents GROUP BY lang"""

  /** MERGE INTO (lakehouse upsert): apply a changelog of updates and
    * deletes to a base snapshot and emit the next snapshot — the table-
    * maintenance primitive behind every CDC-fed / incrementally-refined
    * corpus (Delta/Iceberg MERGE, Hudi upsert). The changelog here is
    * derived deterministically from the base table (doc_id % 7 → update
    * that patches `source` and bumps n_chars, doc_id % 13 → delete) so
    * the oracle sees the identical input.
    *
    * Semantics: last-write-wins per key by changelog sequence number,
    * then drop deletes — exactly a keyed window over base ∪ changelog.
    * Plan: ONE doc_id shuffle (the window), no join at all; at lakehouse
    * scale the changelog is usually ≪ base, and partition-pruned
    * copy-on-write rewrites only touched files — the declarative
    * union+window form is what those engines compile to per file group.
    */
  /** The reusable MERGE core: apply a (key, …, seq, op) changelog over a
    * base snapshot — keep each key's highest-seq row, drop it if that
    * row is a delete. Both inputs must share the schema (base rows carry
    * seq 0, op 'I'); a key may appear at MANY sequence numbers (ordinary
    * CDC), including delete-then-reinsert histories — last write wins by
    * (seq, op-insert-over-delete never arises: seqs are unique per key
    * by contract, ties broken deterministically by op desc so a
    * malformed equal-seq pair still resolves reproducibly). ONE keyed
    * window shuffle, no join.
    */
  def applyChangelog(base: DataFrame, changes: DataFrame,
      key: String = "doc_id"): DataFrame = {
    import base.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy($"seq".desc, $"op".desc)
    base.union(changes)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"op" =!= "D")
      .drop("rn", "seq", "op")
  }

  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"n_chars",
        lit(0L).as("seq"), lit("I").as("op"))
    val changes = Tables.documents(spark, dir)
      .filter($"doc_id" % 7 === 0 || $"doc_id" % 13 === 0)
      .select($"doc_id", $"lang",
        when($"doc_id" % 13 === 0, $"source").otherwise(lit("patched")).as("source"),
        when($"doc_id" % 13 === 0, $"n_chars").otherwise($"n_chars" + 1000).as("n_chars"),
        lit(1L).as("seq"),
        when($"doc_id" % 13 === 0, "D").otherwise("U").as("op"))
    applyChangelog(base, changes)
  }

  val mergeUpsertSql: String = """
    WITH base AS (
      SELECT doc_id, lang, source, n_chars, 0 AS seq, 'I' AS op
      FROM documents),
    changes AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id % 13 = 0 THEN source ELSE 'patched' END AS source,
             CASE WHEN doc_id % 13 = 0 THEN n_chars ELSE n_chars + 1000 END AS n_chars,
             1 AS seq,
             CASE WHEN doc_id % 13 = 0 THEN 'D' ELSE 'U' END AS op
      FROM documents WHERE doc_id % 7 = 0 OR doc_id % 13 = 0),
    merged AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
      FROM (SELECT * FROM base UNION ALL SELECT * FROM changes))
    SELECT doc_id, lang, source, n_chars
    FROM merged WHERE rn = 1 AND op <> 'D'"""

  /** SCD Type-2 history build — the lakehouse dimension pattern
    * [[mergeUpsert]]'s changelog flattening deliberately discards:
    * instead of keeping only each key's latest row, collapse the key's
    * event stream into VERSIONED VALIDITY INTERVALS (valid_from /
    * valid_to / is_current), so any past state is one predicate away
    * (`valid_from <= d AND (valid_to IS NULL OR d < valid_to)`).
    *
    * Input: each customer's orders as a status-change stream, ordered
    * by (o_orderdate, o_orderkey) — the unique orderkey breaks same-day
    * ties, which is what makes the whole operator deterministic. Runs
    * of equal consecutive status collapse to one version: a change mark
    * via lag(), a running sum() for the version id, one group-by for
    * the run, and a lead() for the closing bound.
    *
    * Scale shape: every window and the run aggregation partition on the
    * DIMENSION KEY (o_custkey) with time-ordering inside the partition
    * — one hash exchange total, reused by all four steps (Catalyst
    * plans a single Exchange; the sorts share it). Per-key state is the
    * key's own history, never the table, so a 100 TB fact stream SCD2s
    * with per-reducer memory O(orders per key). No collect anywhere.
    */
  def scd2Build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byEvent = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
    val marked = Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderstatus", $"o_orderdate", $"o_orderkey")
      .withColumn("prev", lag($"o_orderstatus", 1).over(byEvent))
      .withColumn("chg",
        when($"prev".isNull || $"prev" =!= $"o_orderstatus", 1L).otherwise(0L))
      .withColumn("version", sum($"chg").over(byEvent))
    val runs = marked.groupBy($"o_custkey", $"version")
      .agg(min($"o_orderstatus").as("status"), // constant within the run
        min($"o_orderdate").as("valid_from"),
        count(lit(1)).as("n_orders"))
    val byVersion = Window.partitionBy($"o_custkey").orderBy($"version")
    runs
      .withColumn("valid_to", lead($"valid_from", 1).over(byVersion))
      .withColumn("is_current", $"valid_to".isNull)
      .select($"o_custkey", $"version", $"status", $"valid_from",
        $"valid_to", $"n_orders", $"is_current")
  }

  val scd2BuildSql: String = """
    WITH marked AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             CASE WHEN lag(o_orderstatus) OVER w IS DISTINCT FROM o_orderstatus
                  THEN 1 ELSE 0 END AS chg
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
    versioned AS (
      SELECT *, CAST(SUM(chg) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS version
      FROM marked),
    runs AS (
      SELECT o_custkey, version, MIN(o_orderstatus) AS status,
             MIN(o_orderdate) AS valid_from,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM versioned GROUP BY o_custkey, version)
    SELECT o_custkey, version, status, valid_from,
           lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version)
             AS valid_to,
           n_orders,
           lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version)
             IS NULL AS is_current
    FROM runs"""
}
