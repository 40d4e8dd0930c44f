package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Kafka wiring for the traffic pipeline, mirroring the reference's
  * broker I/O: the JSON source topic DDL
  * (/root/reference/src/main/java/com/bencejdanko/flink/StreamingJob.java:41-55)
  * and the upsert sink keyed by window end (StreamingJob.java:60-83,
  * `upsert-kafka` with PRIMARY KEY window_end).
  *
  * The build sandbox has no broker and no spark-sql-kafka connector jar,
  * so these paths are compile-checked wiring, not locally runnable:
  * `format("kafka")` resolves its DataSource at RUNTIME, deployed with
  * the standard connector (`--packages
  * org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>`). All
  * non-Kafka logic they compose (TrafficSource.parse, TrafficJobs.*) is
  * the same code the file-backed specs and Verify queries exercise.
  */
object KafkaTraffic {

  /** Raw message stream from the reference's source topic: one `raw`
    * string column per record, exactly what [[TrafficSource.parse]]
    * expects (the file/rate sources produce the same shape).
    */
  def source(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(col("value").cast("string").as("raw"))

  /** Keyed upsert write: Kafka key = window_end (the reference sink's
    * primary key), value = the row as JSON. A consumer of the compacted
    * topic observes last-write-wins per key — the same contract
    * `TrafficJobs.compactedView` materializes from the parquet changelog.
    * Update output mode re-produces a key on every in-window change,
    * which is precisely the upsert-kafka emission pattern.
    */
  def upsertSink(updates: DataFrame, bootstrap: String, topic: String,
      checkpoint: String): StreamingQuery =
    updates
      .select(col("window_end").cast("string").cast("binary").as("key"),
        to_json(struct(col("*"))).cast("binary").as("value"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .start()

  /** The reference's Job 1 end-to-end on a real broker: topic → lenient
    * JSON decode → tumbling DGIM → keyed upsert topic. Flag-gated at the
    * call site by broker availability; everything between the two Kafka
    * hops is the locally-verified pipeline.
    */
  def runTumbleDgim(spark: SparkSession, bootstrap: String, inTopic: String,
      outTopic: String, checkpoint: String, size: String = "60 seconds",
      windowSeconds: Long = 60L): StreamingQuery = {
    val parsed = TrafficSource.parse(source(spark, bootstrap, inTopic))
    val agg = graft.streaming.TrafficJobs.tumbleDgim(parsed, size, windowSeconds)
    upsertSink(agg.toDF(), bootstrap, outTopic, checkpoint)
  }
}
