package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Dgim
import graft.sources.Tables

/** DGIM approximate 1-bit counting per event-time window — the reference's
  * flagship capability (tumble + hop DGIM estimates), deterministic batch
  * form.
  *
  * Plan shape: filter → window-assign → ONE shuffle on the window key
  * (groupByKey) → per-group sort of click epoch-seconds → sequential DGIM
  * fold. Per-group state is one window's worth of clicks; at 100 TB the
  * group key (window[, interface/user]) keeps groups bounded, and the
  * mergeable `DgimAggregator` is the constant-memory streaming path
  * (graft.streaming.TrafficJobs).
  */
object DgimQueries {

  private def dgimOverWindows(spark: SparkSession, dir: String,
      duration: String, slide: Option[String]): DataFrame = {
    import spark.implicits._
    val win = slide match {
      case Some(s) => window($"ts", duration, s)
      case None    => window($"ts", duration)
    }
    val windowSeconds = 3600L // both variants use a 1 h window size
    Tables.events(spark, dir)
      .filter($"event_type" === "click")
      .select(win.as("w"), unix_timestamp($"ts").as("ts_sec"))
      .select($"w.start".cast("long").as("ws"), $"w.end".cast("long").as("we"), $"ts_sec")
      .as[(Long, Long, Long)]
      .groupByKey { case (ws, we, _) => (ws, we) }
      .mapGroups { (key: (Long, Long), rows: Iterator[(Long, Long, Long)]) =>
        val (ws, we) = key
        val arr = rows.map(_._3).toArray
        java.util.Arrays.sort(arr)
        (new Timestamp(ws * 1000L), new Timestamp(we * 1000L),
          Dgim.estimateSorted(arr, windowSeconds), arr.length.toLong)
      }
      .toDF("window_start", "window_end", "count_estimate", "exact_count")
  }

  /** Tumbling 1 h DGIM estimate (reference Job 1; StreamingJob.java:85-99). */
  def dgimTumble(spark: SparkSession, dir: String): DataFrame =
    dgimOverWindows(spark, dir, "1 hour", None)

  /** Hop 1 h / 15 min DGIM estimate (reference Job 2;
    * SlidingWindowStreamingJob.java:96-118).
    */
  def dgimSlide(spark: SparkSession, dir: String): DataFrame =
    dgimOverWindows(spark, dir, "1 hour", Some("15 minutes"))
}
