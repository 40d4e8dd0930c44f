package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Range (band) join — match rows whose timestamps fall within ±W of each
  * other. Spark's own planner turns `a.ts BETWEEN b.ts - W AND b.ts + W`
  * into a broadcast nested-loop or cartesian product, which is O(n·m):
  * unusable at scale. The scalable form is the binned band join:
  *
  *  1. bucket both sides by `bin = floor(ts / W)`,
  *  2. each probe row expands to 3 rows probing bins {b-1, b, b+1}
  *     (a bounded ×3 fan-out, like a hop window — never a data explosion),
  *  3. equi-join on (key, bin) — a plain shuffle-hash join Catalyst can
  *     plan, AQE-skew-splittable,
  *  4. re-check the exact |Δts| ≤ W predicate post-join.
  *
  * Each matching pair is produced exactly once (a build row lives in ONE
  * bin; only the probe side fans out), so no dedup pass is needed.
  *
  * Demonstrated on `events`: for every error event, how many clicks the
  * same user made within ±5 minutes (diagnostic "what was the user doing
  * around the failure" — inner count then left-joined back so zero-click
  * errors survive). Oracle: DuckDB's native inequality join.
  */
object RangeJoin {

  private val W = 300L // seconds

  def errorClicksWithin5Min(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts",
        floor(unix_micros($"ts") / (W * 1000000L)).as("bin"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"),
        floor(unix_micros($"c_ts") / (W * 1000000L)).as("c_bin"))

    val probed = errors.select($"event_id", $"user_id", $"ts",
      explode(array($"bin" - 1, $"bin", $"bin" + 1)).as("probe_bin"))
    val matched = probed.join(clicks,
        $"user_id" === $"c_user" && $"probe_bin" === $"c_bin" &&
          abs(unix_micros($"c_ts") - unix_micros($"ts")) <= W * 1000000L)
      .groupBy($"event_id").agg(count(lit(1)).as("n"))

    errors.select($"event_id", $"user_id", $"ts")
      .join(matched, Seq("event_id"), "left")
      .select($"event_id", $"user_id", $"ts",
        coalesce($"n", lit(0L)).as("n_clicks_5min"))
  }

  val errorClicksWithin5MinSql: String = """
    SELECT e.event_id, e.user_id, e.ts, count(c.c_ts) AS n_clicks_5min
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT user_id AS c_user, ts AS c_ts FROM events WHERE event_type = 'click') c
      ON e.user_id = c.c_user
     AND c.c_ts BETWEEN e.ts - INTERVAL 5 MINUTE AND e.ts + INTERVAL 5 MINUTE
    GROUP BY 1, 2, 3"""
}
