package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Behavioral / product analytics the reference's traffic pipeline feeds
  * into downstream (funnels, cohorts, distribution profiling) plus the SQL
  * set-operation surface — each shaped for 100 TB:
  *
  *  - set ops compile to partial-agg'd HashAggregate + shuffle on the row
  *    key (INTERSECT/EXCEPT are keyed joins, never materialized sets);
  *  - ntile is PARTITIONED (per-nation) — a global ORDER BY ntile would
  *    serialize the corpus through one task, the classic window anti-
  *    pattern, so the partition key is part of the contract;
  *  - the funnel is a cascade of keyed aggregations where every stage's
  *    input is the (shrinking) survivor set of the previous stage — each
  *    arrow is one user_id-keyed join against an aggregate, all
  *    broadcastable when the funnel narrows, shuffle-joins otherwise;
  *  - retention is two keyed shuffles (first-touch agg, then cohort/offset
  *    agg) — the cohort table is user-cardinality, joined on its key;
  *  - the histogram is a single map-side-combined agg on a computed
  *    integer bucket key (cardinality = value range / width, tiny).
  */
object Behavior {

  /** SQL set operations: customers ordering URGENT ∩/∖ customers ordering
    * HIGH, tagged. Spark INTERSECT/EXCEPT lower to distinct-aggregated
    * semi/anti hash joins (partial agg on both sides — no full-set
    * materialization), exactly the 100 TB plan a hand-written
    * dedup+join would pick.
    */
  def qSetops(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val urgent = orders.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".as("c_key"))
    val high = orders.filter($"o_orderpriority" === "2-HIGH")
      .select($"o_custkey".as("c_key"))
    urgent.intersect(high).withColumn("tag", lit("both"))
      .unionByName(urgent.except(high).withColumn("tag", lit("urgent_only")))
      .unionByName(high.except(urgent).withColumn("tag", lit("high_only")))
  }

  val qSetopsSql: String = """
    WITH u AS (SELECT o_custkey AS c_key FROM orders WHERE o_orderpriority = '1-URGENT'),
         h AS (SELECT o_custkey AS c_key FROM orders WHERE o_orderpriority = '2-HIGH')
    SELECT c_key, 'both' AS tag FROM (SELECT c_key FROM u INTERSECT SELECT c_key FROM h)
    UNION ALL
    SELECT c_key, 'urgent_only' AS tag FROM (SELECT c_key FROM u EXCEPT SELECT c_key FROM h)
    UNION ALL
    SELECT c_key, 'high_only' AS tag FROM (SELECT c_key FROM h EXCEPT SELECT c_key FROM u)"""

  /** Partitioned quantile bucketing: acctbal quartile per nation via
    * ntile(4) over a TOTAL order (balance desc, key asc — dup balances
    * can't flip buckets between engines). Partitioning by nation keeps
    * every window task bounded; a global ntile would be the
    * one-task-sorts-everything anti-pattern, so the partitioned form IS
    * the scalable contract (a global variant belongs to the two-pass
    * range-partitioned index pattern of `pipeline_shuffle`).
    */
  def qNtile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    Tables.customer(spark, dir)
      .select($"c_custkey", $"c_nationkey", $"c_acctbal",
        ntile(4).over(w).as("bal_quartile"))
  }

  val qNtileSql: String = """
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(ntile(4) OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey) AS INT) AS bal_quartile
    FROM customer"""

  /** Conversion funnel view → click → purchase with STRICT event-time
    * ordering between stages (a click counts only after the user's first
    * view; a purchase only after that first qualifying click). One row:
    * users at each stage. Each stage is a keyed agg over the previous
    * stage's survivors joined back to the event scan — the stage tables
    * shrink monotonically, and every join is keyed on user_id.
    */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"user_id", $"event_type", $"ts")
    val s1 = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val s2 = ev.filter($"event_type" === "click")
      .join(s1, "user_id").filter($"ts" > $"t1")
      .groupBy($"user_id").agg(min($"ts").as("t2"))
    val s3 = ev.filter($"event_type" === "purchase")
      .join(s2, "user_id").filter($"ts" > $"t2")
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    val n1 = s1.agg(count(lit(1)).as("n_view")).withColumn("j", lit(1))
    val n2 = s2.agg(count(lit(1)).as("n_click_after")).withColumn("j", lit(1))
    val n3 = s3.agg(count(lit(1)).as("n_purchase_after")).withColumn("j", lit(1))
    n1.join(n2, "j").join(n3, "j").select($"n_view", $"n_click_after", $"n_purchase_after")
  }

  val qFunnelSql: String = """
    WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM s1) AS n_view,
           (SELECT COUNT(*) FROM s2) AS n_click_after,
           (SELECT COUNT(*) FROM s3) AS n_purchase_after"""

  /** Cohort retention: users grouped by first-seen day, counted once per
    * (cohort_day, day_offset) they were active. Two keyed shuffles: the
    * first-touch aggregate (user-cardinality), then the distinct+count on
    * (cohort, offset); the events⋈cohort join is keyed on user_id and
    * the cohort side is the smaller aggregate.
    */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("d"))
    val cohort = ev.groupBy($"user_id").agg(min($"d").as("d0"))
    ev.join(cohort, "user_id")
      .select($"d0".as("cohort_day"), datediff($"d", $"d0").as("day_offset"), $"user_id")
      .distinct()
      .groupBy($"cohort_day", $"day_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  val qRetentionSql: String = """
    WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id)
    SELECT d0 AS cohort_day,
           CAST(datediff('day', d0, CAST(e.ts AS DATE)) AS INT) AS day_offset,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN f USING (user_id)
    GROUP BY 1, 2"""

  /** Fixed-width value histogram of order totals: bucket = ⌊price/25k⌋.
    * ONE map-side-combined aggregation on a computed integer key whose
    * cardinality is (range/width) — constant-size output at any corpus
    * size, the profiling primitive behind every range-partitioning /
    * skew decision. Min/max per bucket double as exact bucket-edge
    * evidence.
    */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select(floor($"o_totalprice" / 25000.0).as("bucket"), $"o_totalprice")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"), min($"o_totalprice").as("lo"),
        max($"o_totalprice").as("hi"))
  }

  val qHistogramSql: String = """
    SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM orders GROUP BY 1"""

  /** Event-type transition matrix (first-order Markov model of user
    * behavior): for every consecutive pair of events in each user's
    * timeline, count (prev_type → next_type) and derive the row-
    * normalized transition probability. The sequence order is a TOTAL
    * order (ts, then event_id) so duplicate timestamps cannot flip
    * neighbors between engines.
    *
    * Scale: ONE user_id shuffle for the lag window (per-user sequences
    * sort within their partition — bounded by the max per-user history,
    * the same contract as `q_moving_window`), then one map-side-combined
    * aggregation onto |types|² rows. The probability denominator is a
    * window over that aggregated frame — |types|² rows, constant-size at
    * any corpus scale — and p is a fixed double expression over exact
    * integer counts, so it hash-matches across engines.
    */
  def qTransitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val steps = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
    val agg = steps.groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("n"))
    val byPrev = Window.partitionBy($"prev_type")
    agg.select($"prev_type", $"next_type", $"n",
      sum($"n").over(byPrev).as("n_from"),
      ($"n".cast("double") / sum($"n").over(byPrev).cast("double")).as("p"))
  }

  val qTransitionsSql: String = """
    WITH s AS (
      SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events),
    c AS (SELECT prev_type, event_type AS next_type, COUNT(*) AS n
          FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2)
    SELECT prev_type, next_type, n,
           CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS n_from,
           CAST(n AS DOUBLE) /
           CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
    FROM c"""

  /** Top-20 session PATHS — the "how do users actually move" readout on
    * top of sessionization: each 30-min-gap session rendered as its
    * ordered event-type sequence (`view>click>purchase`), counted across
    * all sessions. Path order is a TOTAL order (ts, then event_id), so
    * duplicate timestamps cannot flip steps between engines; the top-20
    * cut orders by (count desc, path asc) — fully deterministic.
    *
    * Scale: session assignment is Spark's native `session_window`
    * aggregation (ONE user_id shuffle, merge-on-overlap); the in-group
    * sort is `array_sort` over one session's events (bounded by session
    * length, never a window over the corpus); path counting is a second
    * map-side-combined agg on the path key; the final cut is
    * TakeOrdered (per-partition partial top-k), not a global sort.
    */
  def qSessionPaths(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val paths = Tables.events(spark, dir)
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct($"ts", $"event_id", $"event_type"))),
          x => x.getField("event_type")), ">").as("path"))
    paths.groupBy($"path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy($"n_sessions".desc, $"path".asc)
      .limit(20)
  }

  /** Gaps-and-islands twin of the session assignment (same break
    * condition as `Windows.sessionWindowSql`: new session when
    * diff >= gap), with the path ordered by the identical total order.
    */
  val qSessionPathsSql: String = """
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
        CASE WHEN ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
               OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, event_id, event_type,
        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ), p AS (
      SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM numbered GROUP BY 1, 2
    )
    SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY 1
    ORDER BY n_sessions DESC, path LIMIT 20"""

  /** LAST-TOUCH attribution — which channel gets credit for each
    * purchase: the same user's most recent prior-or-simultaneous
    * non-purchase event within a 7-day lookback, else 'direct'; revenue
    * and purchase counts rolled up per attributed type. The marketing
    * readout every event pipeline ships next to funnels/retention.
    *
    * Shape: [[AsofJoin]]'s union-and-carry-forward device (NOT an
    * inequality join — that is a per-key cross product): union touches
    * and purchases with a side tag, ONE user_id shuffle + in-partition
    * sort, `last(touch, ignoreNulls)` carries the newest touch forward
    * with O(1) state per row, purchases read it; then one map-side agg
    * onto |event types| rows. Total order (ts, side, event_id) makes
    * same-instant ties deterministic on both engines; revenue in exact
    * integer cents.
    */
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val touches = ev.filter($"event_type" =!= "purchase")
      .select($"user_id", $"ts", lit(0).as("side"), $"event_id",
        $"event_type".as("touch_type"),
        lit(null).cast("long").as("cents"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", lit(1).as("side"), $"event_id",
        lit(null).cast("string").as("touch_type"),
        round($"value" * 100).cast("long").as("cents"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"side", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    touches.unionByName(purchases)
      .withColumn("carry", last(
        when($"side" === 0, struct($"ts".as("t_ts"), $"touch_type".as("t_type"))),
        ignoreNulls = true).over(w))
      .filter($"side" === 1)
      .select($"cents",
        when($"carry".isNotNull &&
            $"carry.t_ts" >= $"ts" - expr("INTERVAL 7 DAYS"),
          $"carry.t_type").otherwise(lit("direct")).as("attributed_type"))
      .groupBy($"attributed_type")
      .agg(count(lit(1)).as("n_purchases"), sum($"cents").as("total_cents"))
  }

  /** The identical carry-forward in DuckDB SQL — the formulation is
    * engine-portable (plain window functions), so the oracle replays it
    * rather than approximating it with an inequality join.
    */
  val qAttributionSql: String = """
    WITH u AS (
      SELECT user_id, ts, 0 AS side, event_id, event_type AS touch_type,
             CAST(NULL AS BIGINT) AS cents
      FROM events WHERE event_type != 'purchase'
      UNION ALL
      SELECT user_id, ts, 1 AS side, event_id, CAST(NULL AS VARCHAR),
             CAST(round(value * 100) AS BIGINT)
      FROM events WHERE event_type = 'purchase'),
    carried AS (
      SELECT side, cents, ts,
             last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
               OVER w AS t_ts,
             last_value(CASE WHEN side = 0 THEN touch_type END IGNORE NULLS)
               OVER w AS t_type
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
                   ROWS UNBOUNDED PRECEDING)),
    attributed AS (
      SELECT cents,
             CASE WHEN t_ts IS NOT NULL AND t_ts >= ts - INTERVAL 7 DAY
                  THEN t_type ELSE 'direct' END AS attributed_type
      FROM carried WHERE side = 1)
    SELECT attributed_type, COUNT(*) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM attributed GROUP BY 1"""
}
