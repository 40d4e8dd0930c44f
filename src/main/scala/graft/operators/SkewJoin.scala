package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Salted join — the standard treatment for hot-key skew in shuffle
  * joins at cluster scale. A shuffle join sends every row of a key to
  * ONE reducer; a hot key (a bot user with 10⁹ events, an empty-string
  * join key…) turns that reducer into the job's straggler. Salting
  * splits each key across S reducers: the probe side derives a
  * deterministic salt from a high-cardinality column, the build side
  * replicates each row ×S, and the join key becomes (key, salt).
  *
  * Order of remedies at 100 TB: (1) broadcast the small side — no
  * shuffle at all (q3/q5 do this); (2) AQE skew-join splitting —
  * automatic, post-shuffle; (3) explicit salting (this operator) — when
  * both sides must shuffle AND the hot keys aren't known in advance or
  * AQE's split granularity isn't enough. Salting is semantics-neutral:
  * this query hash-matches the plain-join DuckDB oracle.
  *
  * At test scale Catalyst may still broadcast the tiny ×S dim — the
  * query's SHAPE (salt derivation, ×S replicate, compound key) is what
  * carries to the 1000-executor case where the dim side is too big to
  * broadcast and a per-key reducer would melt.
  */
object SkewJoin {

  /** events ⋈ customer on user_id with an 8-way salt, aggregated per
    * customer segment — identical result to the unsalted join.
    */
  def saltedJoin(spark: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type",
        // deterministic salt from a high-cardinality column — NO rand():
        // reproducible across retries/partitionings, oracle-safe
        pmod(xxhash64($"event_id"), lit(salts)).as("salt"))
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment",
        explode(sequence(lit(0), lit(salts - 1))).as("salt"))
    events
      .join(cust, $"user_id" === $"c_custkey" && events("salt") === cust("salt"))
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        count(when($"event_type" === "click", 1)).as("n_clicks"),
        countDistinct($"user_id").as("n_users"))
  }

  val saltedJoinSql: String = """
    SELECT c_mktsegment,
           count(*) AS n_events,
           count(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
           count(DISTINCT user_id) AS n_users
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1"""
}
