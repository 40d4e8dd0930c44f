package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TrafficSource

/** Deterministic analog of the reference's traffic producer
  * (/root/reference/generate-traffic.py): a stream of JSON messages
  * `{"value": "0"|"1", "timestamp": ISO-micros}` where P(value=1) flips
  * between 0.1 and 0.8 every 15 seconds.
  *
  * Built on the `rate` source (so it runs anywhere, no Kafka needed);
  * the Bernoulli draw is a hash of the row — deterministic given the
  * rate-source offsets, unlike the reference's random.random(), which
  * makes specs reproducible.
  */
object TrafficGen {

  def stream(spark: SparkSession, rowsPerSecond: Int = 50): DataFrame =
    jsonify(spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load())

  /** rate-source schema (timestamp, value) → raw traffic JSON strings. */
  def jsonify(rate: DataFrame): DataFrame = {
    // P(1)=0.8 in odd 15 s slots, 0.1 in even ones (the reference flips
    // between MIN/MAX_PROBABILITY every PROBABILITY_CHANGE_INTERVAL=15 s)
    val slotOdd = (floor(unix_timestamp(col("timestamp")) / 15L) % 2) === 1
    val threshold = when(slotOdd, lit(80)).otherwise(lit(10))
    val draw = pmod(hash(col("timestamp"), col("value")), lit(100))
    rate.select(to_json(struct(
      when(draw < threshold, "1").otherwise("0").as("value"),
      date_format(col("timestamp"), TrafficSource.IsoMicros).as("timestamp")
    )).as("raw"))
  }
}
