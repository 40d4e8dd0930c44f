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
    val out = DumpCache.dirFor("graft_docs_by_lang", dir, "documents.parquet")
    if (!DumpCache.isReady(out)) {
      Tables.documents(spark, dir)
        .write.mode("overwrite").partitionBy("lang").parquet(out)
    }
    spark.read.parquet(out)
      .filter($"lang" =!= "zh") // partition-pruned: zh files never open
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
  }

  val partitionedRoundTripSql: String = """
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE lang != 'zh' GROUP BY lang"""
}
