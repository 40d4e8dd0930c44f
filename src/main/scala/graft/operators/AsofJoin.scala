package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of (temporal) join — for each left row, the single most recent right
  * row with the same key at or before the left timestamp. Spark has no
  * native as-of join; the naive formulation (inequality join + argmax) is
  * a cross-product per key. This implementation is the scalable
  * union-and-carry-forward form:
  *
  *  1. union both sides with a side tag (right rows sort BEFORE left rows
  *     at equal timestamps, so "at or before" includes same-instant rows),
  *  2. one shuffle on the key, one in-partition sort by (ts, side),
  *  3. `last(right_payload, ignoreNulls) OVER (... ROWS UNBOUNDED
  *     PRECEDING)` carries the latest right row forward — a running
  *     aggregate, evaluated in a single pass with O(1) state per row,
  *  4. keep only left rows.
  *
  * Cost at scale: exactly one shuffle + sort on (key) — the same cost as
  * any keyed window; no data explosion, no per-key cross product. Skewed
  * keys degrade to a sort of that key's rows, never a quadratic join.
  *
  * Demonstrated on `events`: every click joined to the same user's most
  * recent prior-or-simultaneous purchase. Ties (several purchases at one
  * (user, ts)) resolve to the max value — not via a pre-dedup groupBy
  * (that would cost a second shuffle) but by adding `p_value` to the
  * window sort: the carry-forward `last` then lands on the max-value
  * purchase of the tied group. The whole operator is ONE exchange.
  * Oracle: DuckDB's native `ASOF LEFT JOIN` over a max-deduped right side.
  */
object AsofJoin {

  def clicksLastPurchase(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value".as("p_value"))

    val unioned = clicks
      .select($"user_id", $"ts", lit(1).as("side"), $"event_id",
        lit(null).cast("timestamp").as("p_ts"), lit(null).cast("double").as("p_value"))
      .unionByName(purchases
        .select($"user_id", $"ts", lit(0).as("side"),
          lit(null).cast("bigint").as("event_id"), $"ts".as("p_ts"), $"p_value"))

    val w = Window.partitionBy($"user_id").orderBy($"ts", $"side", $"p_value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("carry", last(
        when($"side" === 0, struct($"p_ts", $"p_value")), ignoreNulls = true).over(w))
      .filter($"side" === 1)
      .select($"event_id", $"user_id", $"ts",
        $"carry.p_ts".as("purchase_ts"), $"carry.p_value".as("purchase_value"))
  }

  val clicksLastPurchaseSql: String = """
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
    purchases AS (
      SELECT user_id, ts, max(value) AS p_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS purchase_ts, p.p_value AS purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts"""
}
