package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.plans.{DgimStrategy, DgimWindowAggPlan}
import graft.sources.Tables

/** DGIM approximate 1-bit counting per event-time window — the reference's
  * flagship capability (tumble + hop DGIM estimates), deterministic batch
  * form.
  *
  * Executed by the custom [[graft.plans.DgimWindowAggExec]] physical
  * operator: filter → window-assign → ONE shuffle on the window key +
  * SPILLABLE external sort (both planned by EnsureRequirements from the
  * operator's declared distribution/ordering requirements) → streaming
  * per-group DGIM fold with O(log² W) state. Unlike groupByKey.mapGroups,
  * no group is ever materialized in task memory, so a hot window cannot
  * OOM a task at 100 TB. The mergeable `DgimAggregator` remains the
  * incremental streaming path (graft.streaming.TrafficJobs).
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
    // ts null guard: the exec's child contract is 3 non-null LONG columns —
    // a null ts would make window() emit a null struct whose getLong reads
    // 0 and lands the row in the 1970 epoch window instead of failing
    val child = Tables.events(spark, dir)
      .filter($"event_type" === "click" && $"ts".isNotNull)
      .select(win.as("w"), unix_timestamp($"ts").as("ts_sec"))
      .select($"w.start".cast("long").as("ws"), $"w.end".cast("long").as("we"), $"ts_sec")
    DgimStrategy.ensureRegistered(spark)
    ColumnBridge.ofRows(spark,
      DgimWindowAggPlan(windowSeconds, ColumnBridge.logicalPlan(child)))
  }

  /** Tumbling 1 h DGIM estimate (reference Job 1; StreamingJob.java:85-99). */
  def dgimTumble(spark: SparkSession, dir: String): DataFrame =
    dgimOverWindows(spark, dir, "1 hour", None)

  /** Hop 1 h / 15 min DGIM estimate (reference Job 2;
    * SlidingWindowStreamingJob.java:96-118).
    */
  def dgimSlide(spark: SparkSession, dir: String): DataFrame =
    dgimOverWindows(spark, dir, "1 hour", Some("15 minutes"))

  /** The reference's literal USAGE pattern, end-to-end through graft's
    * SQL surface: `DGIM_ESTIMATE` called from SQL text over a windowed
    * GROUP BY (StreamingJob.java:57-58 registers the aggregate;
    * :85-99 is the SQL shape mirrored here). Exercises the registered
    * UDAF path ([[graft.GraftFunctions]], mergeable partial aggregation
    * — the canonical DGIM bucket merge across partitions) rather than
    * the deterministic sort-then-fold custom operator, proving a
    * pure-SQL user gets the full pipeline without touching the
    * DataFrame API.
    *
    * Rows-only driver check; DgimPlanSpec pins it against
    * [[dgimTumble]]: identical window set, identical exact counts, and
    * both estimates within the DGIM error bound of the exact count
    * (merge order may legally shift bucket boundaries, so estimate
    * EQUALITY across the two execution strategies is not the contract —
    * the published approximation bound is).
    */
  def sqlDgimTumble(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.register(spark)
    Tables.events(spark, dir).createOrReplaceTempView("events_sql")
    spark.sql("""
      SELECT window.start AS window_start, window.end AS window_end,
             dgim_estimate(value, ts_sec) AS count_estimate,
             COUNT(*) AS exact_count
      FROM (SELECT ts, '1' AS value, unix_timestamp(ts) AS ts_sec
            FROM events_sql
            WHERE event_type = 'click' AND ts IS NOT NULL)
      GROUP BY window(ts, '1 hour')""")
  }

  /** DGIM generalized from counting to SUMS (Datar et al. 2002 §5 — the
    * published companion of the reference's counting sketch): per
    * tumbling hour, the sketch estimate of the click VALUE sum (cents)
    * over the trailing 1 h, next to the exact integer sum. Each amount
    * feeds its set bits into 17 independent DGIM instances; the estimate
    * is the 2^j-weighted instance total, state 17×O(log²W) per window.
    * This answers "approximate revenue/bytes in the last W" the way the
    * reference answers "approximate request count in the last W" —
    * mergeable partial aggregation across partitions included.
    *
    * Rows-only driver check (merge order may legally shift bucket
    * boundaries, like `q_dgim_sql`); DgimSpec pins hand-computed exact
    * vectors, window expiry, and the ≤ 50% published bound against the
    * in-query exact twin.
    */
  def dgimSumTumble(spark: SparkSession, dir: String): DataFrame =
    dgimSumOver(spark, dir, window(org.apache.spark.sql.functions.col("ts"), "1 hour"))

  /** Hop-window (1 h / 15 min) twin of [[dgimSumTumble]] — the sum
    * sketch in the reference Job 2's sliding shape; same mergeable
    * per-bit state, ×4 hop fan-out before the partial agg.
    */
  def dgimSumSlide(spark: SparkSession, dir: String): DataFrame =
    dgimSumOver(spark, dir,
      window(org.apache.spark.sql.functions.col("ts"), "1 hour", "15 minutes"))

  private def dgimSumOver(spark: SparkSession, dir: String,
      win: org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    val agg = udaf(new graft.functions.DgimSumAggregator(3600L))
    Tables.events(spark, dir)
      .filter($"event_type" === "click" && $"ts".isNotNull)
      .select(win.as("w"),
        round($"value" * 100).cast("long").as("cents"),
        unix_timestamp($"ts").as("ts_sec"))
      .groupBy($"w")
      .agg(agg($"cents", $"ts_sec").as("sum_estimate"),
        sum($"cents").as("exact_cents"))
      .select($"w.start".as("window_start"), $"w.end".as("window_end"),
        $"sum_estimate", $"exact_cents")
  }
}
