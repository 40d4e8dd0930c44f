package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event-time windowing over the `events` stream table — the batch analog
  * of the reference's Flink jobs (tumble / hop / session), with the
  * reference's "traffic bit" mapped to `event_type = 'click'`.
  *
  * Reference semantics mirrored (see SURVEY.md §1):
  *  - tumbling 60 s count → tumbling 1 h count here
  *    (/root/reference/src/main/java/com/bencejdanko/flink/StreamingJob.java:85-99)
  *  - HOP slide 10 s / size 60 s → 15 min / 1 h here
  *    (SlidingWindowStreamingJob.java:96-118)
  *
  * Scale: each query is one shuffle on the window (+user) key with map-side
  * partial aggregation; hop windows fan each row out ×(size/slide)=4 before
  * the partial agg — a bounded constant, never a data explosion.
  */
object Windows {

  /** Tumbling 1 h window, exact count of 1-bits (clicks). */
  def tumbleCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"event_type" === "click")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start".as("window_start"), $"window.end".as("window_end"), $"cnt")
  }

  val tumbleCountSql: String = """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           COUNT(*) AS cnt
    FROM events WHERE event_type = 'click'
    GROUP BY 1"""

  /** Sliding (hop) window: 1 h size, 15 min slide, exact count. */
  def slideCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"event_type" === "click")
      .groupBy(window($"ts", "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start".as("window_start"), $"window.end".as("window_end"), $"cnt")
  }

  /** Oracle: each event belongs to the 4 hop windows whose start is
    * floor15(ts) - i·15min, i ∈ 0..3 (Spark aligns hop starts to epoch
    * multiples of the slide, same as time_bucket).
    */
  val slideCountSql: String = """
    SELECT time_bucket(INTERVAL '15 minutes', ts) - i * INTERVAL '15 minutes' AS window_start,
           time_bucket(INTERVAL '15 minutes', ts) - i * INTERVAL '15 minutes' + INTERVAL '1 hour' AS window_end,
           COUNT(*) AS cnt
    FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) k(i)
    WHERE event_type = 'click'
    GROUP BY 1, 2"""

  /** Distinct users per hop window — the "unique visitors per sliding
    * hour" shape every traffic dashboard runs on the reference's stream.
    * Exact `countDistinct` rewrites to the two-phase expand + aggregate
    * (distinct-key partial agg, then the window rollup) — one logical
    * shuffle on (window, user). The 100 TB swap for an unbounded key
    * space is `approx_count_distinct` (fixed-size HLL state, mergeable
    * across hops), the same trade `q_approx_distinct` oracle-bounds.
    */
  def slideDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "1 hour", "15 minutes"))
      .agg(countDistinct($"user_id").as("n_users"), count(lit(1)).as("n_events"))
      .select($"window.start".as("window_start"), $"window.end".as("window_end"),
        $"n_users", $"n_events")
  }

  val slideDistinctSql: String = """
    SELECT time_bucket(INTERVAL '15 minutes', ts) - i * INTERVAL '15 minutes' AS window_start,
           time_bucket(INTERVAL '15 minutes', ts) - i * INTERVAL '15 minutes' + INTERVAL '1 hour' AS window_end,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           COUNT(*) AS n_events
    FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) k(i)
    GROUP BY 1, 2"""

  /** Session windows per user, 30 min inactivity gap: Spark's native
    * `session_window` (merge-on-overlap, end = last event + gap).
    */
  def sessionWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"session_window.start".as("session_start"),
        $"session_window.end".as("session_end"), $"n_events")
  }

  /** Gaps-and-islands twin. New session when diff >= gap (Spark windows are
    * half-open [ts, ts+gap)).
    */
  val sessionWindowSql: String = """
    WITH marked AS (
      SELECT user_id, ts,
        CASE WHEN ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
               OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT user_id, ts,
        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, sid"""

  /** Lenient JSON field extraction from `props` (the reference's
    * json.ignore-parse-errors source semantics): extract k, aggregate per
    * event_type. get_json_object returns NULL on malformed input instead
    * of failing — same as DuckDB's TRY json path.
    */
  def eventsParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type", get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), count($"k").as("n_valid"),
        sum($"k").as("sum_k"), max($"k").as("max_k"))
  }

  val eventsParseSql: String = """
    SELECT event_type, COUNT(*) AS n, COUNT(k) AS n_valid,
           CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k
    FROM (SELECT event_type,
            TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    GROUP BY event_type"""

  /** Time-series resampling with gap filling: per-user DAILY event
    * counts over each user's [first, last] active span, emitting an
    * explicit zero row for silent days — the regularization step every
    * downstream time-series model (and windowed feature pipeline)
    * needs, since raw event streams have holes.
    *
    * Plan shape: one (user, day) aggregation shuffle; spans reuse the
    * SAME aggregate (a second tiny agg over it, not a rescan); the
    * calendar densification is `sequence` + `explode` — bounded fan-out
    * of span/1-day rows per user, generated in the scan stage, never a
    * cross join against a calendar table; the left join back is keyed
    * on (user, day). All counts integer.
    */
  def resample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.events(spark, dir)
      .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n"))
    val days = per.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id",
        explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("day"))
    days.join(per, Seq("user_id", "day"), "left")
      .select($"user_id", $"day", coalesce($"n", lit(0L)).as("n_events"))
  }

  val resampleSql: String = """
    WITH per AS (
      SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
             FROM per GROUP BY 1),
    days AS (SELECT user_id,
               unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
             FROM span)
    SELECT d.user_id, d.day, CAST(COALESCE(p.n, 0) AS BIGINT) AS n_events
    FROM days d LEFT JOIN per p ON d.user_id = p.user_id AND d.day = p.day"""

  /** Traffic anomaly detection: z-score of each tumbling-hour click count
    * against the corpus-wide mean/std — the alerting query a traffic
    * monitor (the reference's domain) runs on top of its window counts.
    *
    * The moments (n, Σc, Σc²) are EXACT integer aggregates of the window
    * counts — order-independent BIGINTs, the same device as
    * [[Profile.statsCorr]] — and z is derived by one FIXED double
    * expression `(n·c − Σc) / sqrt(n·Σc² − (Σc)²)` (algebraically
    * (c − mean)/std_pop), so the float column is hash-comparable across
    * engines. Window counts at gate scale keep every moment far below
    * 2^53.
    *
    * Scale: the windowed count is one map-side-combined shuffle; the
    * moments frame is ONE ROW (aggregated from window-cardinality rows,
    * not events) and joins back as a broadcast — no second pass over the
    * corpus, no driver collect.
    */
  def anomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cached: window-cardinality rows (corpus-size-independent), read by
    // both the z branch and the moments branch — ONE corpus scan total
    val counts = Tables.events(spark, dir)
      .filter($"event_type" === "click")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start".as("window_start"), $"cnt")
      .cache()
    val m = counts.agg(
      count(lit(1)).as("n_w"),
      sum($"cnt").as("sum_c"),
      sum($"cnt" * $"cnt").as("sum_cc"))
    // zero-variance guard: all-equal counts (or a single window) make the
    // variance term 0 — Spark's Divide yields NULL there while DuckDB's
    // double division yields inf/NaN, so both engines must short-circuit
    // to NULL explicitly (same CASE mirrored in anomalySql)
    val varTerm = $"n_w".cast("double") * $"sum_cc".cast("double") -
      $"sum_c".cast("double") * $"sum_c".cast("double")
    val z = when(varTerm > lit(0.0),
      ($"n_w".cast("double") * $"cnt".cast("double") -
        $"sum_c".cast("double")) / sqrt(varTerm))
    counts.crossJoin(broadcast(m))
      .select($"window_start", $"cnt", z.as("z"),
        coalesce(abs(z) > lit(2.0), lit(false)).as("is_anomaly"))
  }

  val anomalySql: String = """
    WITH c AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, COUNT(*) AS cnt
      FROM events WHERE event_type = 'click' GROUP BY 1),
    m AS (SELECT COUNT(*) AS n_w,
                 CAST(SUM(cnt) AS BIGINT) AS sum_c,
                 CAST(SUM(cnt * cnt) AS BIGINT) AS sum_cc
          FROM c),
    v AS (SELECT *,
                 CAST(n_w AS DOUBLE) * CAST(sum_cc AS DOUBLE) -
                 CAST(sum_c AS DOUBLE) * CAST(sum_c AS DOUBLE) AS var_term
          FROM m)
    SELECT window_start, cnt,
           CASE WHEN var_term > 0 THEN
             (CAST(n_w AS DOUBLE) * CAST(cnt AS DOUBLE) - CAST(sum_c AS DOUBLE)) /
             sqrt(var_term) END AS z,
           coalesce(abs(CASE WHEN var_term > 0 THEN
             (CAST(n_w AS DOUBLE) * CAST(cnt AS DOUBLE) - CAST(sum_c AS DOUBLE)) /
             sqrt(var_term) END) > 2.0, false) AS is_anomaly
    FROM c, v"""

  /** Anomalous windows grouped into INCIDENTS — the page an on-call
    * actually receives: consecutive anomalous hours ([[anomaly]]'s
    * |z| > 2 windows) collapse into one incident row with start/end,
    * window count, total clicks and peak z (gaps-and-islands over the
    * anomaly set).
    *
    * The unpartitioned order window here is NOT the corpus anti-pattern:
    * its input is the ANOMALOUS-WINDOW set — bounded by hours-in-
    * time-range (and usually far smaller), never by event volume. The
    * corpus-sized work all happens inside [[anomaly]]'s one
    * map-side-combined pass.
    */
  def incidents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val a = anomaly(spark, dir).filter($"is_anomaly")
    val ord = Window.orderBy($"window_start")
    val marked = a.withColumn("brk",
      when(lag($"window_start", 1).over(ord).isNull ||
        lag($"window_start", 1).over(ord) =!=
          $"window_start" - expr("interval 1 hour"), 1L).otherwise(0L))
    marked
      .withColumn("incident_id", sum($"brk").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"incident_id")
      .agg(min($"window_start").as("incident_start"),
        (max($"window_start") + expr("interval 1 hour")).as("incident_end"),
        count(lit(1)).as("n_windows"),
        sum($"cnt").as("total_clicks"),
        max($"z").as("peak_z"))
  }

  val incidentsSql: String = s"""
    WITH a AS (SELECT window_start, cnt, z FROM ($anomalySql) WHERE is_anomaly),
    mk AS (SELECT window_start, cnt, z,
             CASE WHEN lag(window_start) OVER (ORDER BY window_start) IS NULL
                    OR lag(window_start) OVER (ORDER BY window_start)
                       != window_start - INTERVAL '1 hour' THEN 1 ELSE 0 END AS brk
           FROM a),
    nm AS (SELECT window_start, cnt, z,
             CAST(SUM(brk) OVER (ORDER BY window_start
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS incident_id
           FROM mk)
    SELECT incident_id, MIN(window_start) AS incident_start,
           MAX(window_start) + INTERVAL '1 hour' AS incident_end,
           COUNT(*) AS n_windows,
           CAST(SUM(cnt) AS BIGINT) AS total_clicks,
           MAX(z) AS peak_z
    FROM nm GROUP BY 1"""

  /** CUSUM changepoint detection over the hourly click counts — the
    * sequential drift detector monitoring stacks run NEXT to the
    * z-score point alarm ([[anomaly]] flags single outlier windows;
    * CUSUM accumulates small sustained shifts until they cross a
    * threshold). Uses the closed form s_k = prefix_k − min_{j≤k}
    * prefix_j (the running-sum-minus-running-min identity of
    * max(0, s_{k−1} + x_k)), so the recurrence becomes two plain window
    * functions instead of a sequential fold.
    *
    * ALL integer: deviations are scaled by n (n·c − S instead of
    * c − S/n), keeping every prefix an exact BIGINT; the alarm
    * threshold is 50·n (a 50-click sustained excess). The order window
    * runs over the WINDOW-COUNT frame (bounded by hours-in-range, like
    * [[incidents]]); the corpus-sized work is one map-side-combined
    * pass.
    */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.events(spark, dir)
      .filter($"event_type" === "click")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start".as("window_start"), $"cnt")
      .cache()
    val m = counts.agg(count(lit(1)).as("n_w"), sum($"cnt").as("sum_c"))
    val ord = Window.orderBy($"window_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.crossJoin(broadcast(m))
      .withColumn("pref", sum($"n_w" * $"cnt" - $"sum_c").over(ord))
      .withColumn("cusum", $"pref" - min($"pref").over(ord))
      .select($"window_start", $"cnt", $"cusum",
        ($"cusum" > $"n_w" * 50L).as("is_alarm"))
  }

  val changepointSql: String = """
    WITH c AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, COUNT(*) AS cnt
      FROM events WHERE event_type = 'click' GROUP BY 1),
    m AS (SELECT COUNT(*) AS n_w, CAST(SUM(cnt) AS BIGINT) AS sum_c FROM c),
    p AS (SELECT window_start, cnt, n_w,
            CAST(SUM(n_w * cnt - sum_c) OVER (ORDER BY window_start
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pref
          FROM c, m)
    SELECT window_start, cnt,
           CAST(pref - MIN(pref) OVER (ORDER BY window_start
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cusum,
           pref - MIN(pref) OVER (ORDER BY window_start
                ROWS UNBOUNDED PRECEDING) > n_w * 50 AS is_alarm
    FROM p"""

  /** Per-user burst detection — the rate-limiter / abuse readout: users
    * whose event count in ANY sliding hour (15 min hop) reaches the
    * threshold, with how many windows tripped and the peak rate.
    *
    * Scale: one (user, window) keyed agg with map-side combine (×4 hop
    * fan-out before the partials — a constant), then a user-cardinality
    * rollup; the threshold filter happens between the aggs, so the
    * second shuffle carries only violators.
    */
  def rateSpikes(spark: SparkSession, dir: String, threshold: Long = 3L): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id", window($"ts", "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .filter($"n" >= threshold)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_windows_over"), max($"n").as("peak"))
  }

  /** Oracle for [[rateSpikes]] — threshold derives from the same
    * parameter as the query. */
  def rateSpikesSql(threshold: Long = 3L): String = s"""
    WITH u AS (
      SELECT user_id,
             time_bucket(INTERVAL '15 minutes', ts) - i * INTERVAL '15 minutes' AS w,
             COUNT(*) AS n
      FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) k(i)
      GROUP BY 1, 2)
    SELECT user_id, COUNT(*) AS n_windows_over, MAX(n) AS peak
    FROM u WHERE n >= $threshold GROUP BY 1"""

  /** Half-life DECAYED activity score per user — the recency-weighted
    * counter behind trending/abuse/engagement readouts (a plain count
    * weighs a month-old click like a fresh one; an exponential decay
    * forgets smoothly). Each event contributes 2^(−age_hours); scores
    * and ranks shift as time passes with NO mutable state — recompute
    * from the log at any `now`.
    *
    * Hash parity: exponential decay is normally `exp(−λ·age)` — a
    * transcendental, which the determinism rules keep OUT of compared
    * columns (JVM vs libm last-ulp drift, measured at `text_cooccur`).
    * With a 1-hour half-life the weight is EXACTLY a right-shift:
    * score_scaled = Σ 2^40 >> age_hours (0 past 40 h) — pure BIGINT
    * arithmetic, bit-identical on both engines, monotone in the true
    * exponential. Σ ≤ n·2^40 stays far under 2^63 at any gate SF.
    *
    * Shape: `now` = 1-row max broadcast; weights are scan-stage
    * expressions; ONE user-keyed map-side-combined agg.
    */
  def decayScores(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", unix_timestamp($"ts").as("sec"))
    val now = ev.agg(max($"sec").as("now_sec"))
    ev.crossJoin(broadcast(now))
      .select($"user_id",
        expr("(now_sec - sec) div 3600").as("age_h"))
      .select($"user_id",
        when($"age_h" <= 40,
          expr("shiftright(CAST(1099511627776 AS BIGINT), CAST(age_h AS INT))"))
          .otherwise(lit(0L)).as("w"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"w").as("decay_scaled"))
  }

  val decayScoresSql: String = """
    WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
               FROM events),
    m AS (SELECT MAX(sec) AS now_sec FROM e),
    aged AS (SELECT user_id, (now_sec - sec) // 3600 AS age_h FROM e, m),
    wts AS (SELECT user_id,
                   CASE WHEN age_h <= 40
                        THEN (CAST(1 AS BIGINT) << 40) >> age_h
                        ELSE 0 END AS w
            FROM aged)
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(w) AS BIGINT) AS decay_scaled
    FROM wts GROUP BY 1"""
}
