package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{BitEvent, DgimBitAggregator}

/** Structured Streaming equivalents of the reference's two Flink jobs.
  *
  * Input: the parsed traffic frame from `TrafficSource.parse`
  * (value, event_ts, ts_sec). Output mirrors the reference sinks:
  *  - tumble: (window_end, count_estimate) keyed by window_end
  *    (StreamingJob.java:60-100)
  *  - hop:    (window_start, window_end, count_estimate)
  *    (SlidingWindowStreamingJob.java:70-121)
  *
  * Scale: event-time windows + watermark bound the state store; DGIM
  * state itself is O(log² W) per window via the mergeable aggregator —
  * this is the constant-memory path for unbounded streams, exactly DGIM's
  * reason to exist. Works under both `append` (production: finalized
  * windows only, state evicted past the watermark) and `complete`
  * (test harness) output modes.
  */
object TrafficJobs {

  private def dgimAgg(windowSeconds: Long) =
    udaf(new DgimBitAggregator(windowSeconds))

  /** Tumbling-window DGIM estimate; reference Job 1 (60 s tumble). */
  def tumbleDgim(parsed: DataFrame, size: String = "60 seconds",
      windowSeconds: Long = 60L, watermark: String = "2 minutes"): DataFrame =
    parsed
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), size))
      .agg(dgimAgg(windowSeconds)(col("value"), col("ts_sec")).as("count_estimate"))
      .select(col("window.end").as("window_end"), col("count_estimate"))

  /** Hop-window DGIM estimate; reference Job 2 (60 s size / 10 s slide). */
  def hopDgim(parsed: DataFrame, size: String = "60 seconds",
      slide: String = "10 seconds", windowSeconds: Long = 60L,
      watermark: String = "2 minutes"): DataFrame =
    parsed
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), size, slide))
      .agg(dgimAgg(windowSeconds)(col("value"), col("ts_sec")).as("count_estimate"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("count_estimate"))
}
