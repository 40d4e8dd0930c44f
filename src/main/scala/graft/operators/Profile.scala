package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** ANALYZE-style data profiling — the stats pass every engine (and every
  * corpus-curation decision) runs before anything else: per-group row
  * counts, null counts, distinct cardinalities, and value ranges.
  */
object Profile {

  /** Per-lang profile of the documents table: one pass, one shuffle on
    * the group key with map-side partial aggregation. All-integer
    * output (no float aggregates → no association-order hash hazards).
    *
    * Scale: the exact `countDistinct` rewrites to a two-phase expand +
    * aggregate — fine while per-group distinct sources are bounded (they
    * are: sources is a small enum). For a genuinely high-cardinality
    * column at 100 TB the one-token swap is `approx_count_distinct`
    * (HLL, fixed-size sketch state), the same trade `q_approx_distinct`
    * demonstrates and oracle-bounds.
    */
  def statsProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct($"source").as("n_sources"),
        sum($"text".isNull.cast("long")).as("null_text"),
        min($"n_chars").as("min_chars"),
        max($"n_chars").as("max_chars"),
        sum($"n_chars").as("sum_chars"),
        min(length($"text")).cast("long").as("min_len"),
        max(length($"text")).cast("long").as("max_len"))
  }

  val statsProfileSql: String = """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(length(text)) AS BIGINT) AS min_len,
           CAST(MAX(length(text)) AS BIGINT) AS max_len
    FROM documents
    GROUP BY lang"""
}
