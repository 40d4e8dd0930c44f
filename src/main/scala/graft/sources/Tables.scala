package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed accessors for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst gets native
  * parquet scans with predicate pushdown and column pruning; callers
  * `.select` early so `ReadSchema` stays minimal.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` is SCHEMA-ADAPTIVE across testdata generations: older
    * driver data stored parquet TIMESTAMP(NANOS) — which Spark 4 refuses
    * to map to TimestampType, so it reads as raw INT64 nanos under the
    * legacy conf and floor-divides to microseconds (identical to DuckDB's
    * ns→µs truncation) — while current data stores TIMESTAMP(MICROS)
    * without UTC adjustment, which reads as TIMESTAMP_NTZ and casts
    * 1:1 to TimestampType under the UTC session timezone every graft
    * main sets. Both paths emit the SAME TimestampType micros column,
    * so every downstream operator and oracle is generation-agnostic.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(spark, dir, "events"))
  }

  /** The two-generation `ts` dispatch, shared by the batch loader and
    * the file-stream readers so both paths can never read the same file
    * differently: raw INT64 nanos floor-divide to micros; native
    * timestamp columns (NTZ in current testdata) cast 1:1 under the
    * UTC session timezone.
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
