package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
