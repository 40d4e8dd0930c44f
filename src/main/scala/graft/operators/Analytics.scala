package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Core batch analytics: grouped aggregation, multi-way joins, window
  * ranking, rollups, sketch counting.
  *
  * Oracle-determinism rule: money arithmetic runs in exact DECIMAL on both
  * Spark and DuckDB, with a single final cast to DOUBLE, so results
  * hash-match regardless of floating-point association order across
  * partitions.
  *
  * Scale notes are inline per operator (SURVEY.md §4).
  */
object Analytics {

  private val Dec = DecimalType(18, 2)

  /** TPC-H Q1-style pricing summary.
    *
    * One shuffle on the (tiny-cardinality) group key; Spark plans a
    * partial_sum/partial_count map-side aggregate, so the shuffle carries
    * ~#groups × #partitions rows — scales to any fact size.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_linestatus", $"l_quantity", $"l_extendedprice", $"l_discount")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity".cast(Dec)).cast(DoubleType).as("sum_qty"),
        sum($"l_extendedprice".cast(Dec)).cast(DoubleType).as("sum_base_price"),
        sum($"l_extendedprice".cast(Dec) * (lit(BigDecimal(1)).cast(Dec) - $"l_discount".cast(Dec)))
          .cast(DoubleType).as("sum_disc_price"),
        (sum($"l_quantity".cast(Dec)).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
  }

  val q1AggSql: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus"""

  /** TPC-H Q3-style: revenue of top 10 orders for one market segment.
    *
    * customer is the small side → Catalyst broadcasts it (checked via
    * explain); orders⋈lineitem shuffles on the order key only. Top-10 via
    * sort-limit = per-partition partial top-k then a single-reducer merge
    * of 10-row partials — no global sort of the fact table.
    */
  def q3Join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(sum($"l_extendedprice".cast(Dec) * (lit(BigDecimal(1)).cast(Dec) - $"l_discount".cast(Dec)))
        .cast(DoubleType).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey".asc)
      .limit(10)
  }

  val q3JoinSql: String = """
    SELECT l_orderkey, o_orderdate,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10"""

  /** TPC-H Q5-style: revenue by nation through a 5-way join.
    *
    * region⋈nation⋈customer collapse into one broadcast chain (all dims);
    * only orders⋈lineitem shuffles. At 100 TB the customer dim may exceed
    * the broadcast threshold — Catalyst then falls back to shuffled hash
    * join on the same plan; nothing here hard-codes broadcast for it.
    */
  def q5Join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val region = Tables.region(spark, dir).filter($"r_name" === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey")
    val ord = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sum($"l_extendedprice".cast(Dec) * (lit(BigDecimal(1)).cast(Dec) - $"l_discount".cast(Dec)))
        .cast(DoubleType).as("revenue"))
  }

  val q5JoinSql: String = """
    SELECT n_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name"""

  /** TPC-H Q14-style promo revenue share: per ship month, the share of
    * revenue from one part-type class ('ECONOMY' in this corpus's
    * taxonomy) — the conditional-aggregation-over-a-dim-join shape.
    *
    * part broadcasts (dim); ONE map-side-combined shuffle on the month
    * key; both revenue sums are exact DECIMAL and the share is a single
    * double expression over their casts — no float aggregate anywhere.
    */
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val part = Tables.part(spark, dir).select($"p_partkey", $"p_type")
    val li = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_extendedprice", $"l_discount", $"l_shipdate")
    val rev = $"l_extendedprice".cast(Dec) *
      (lit(BigDecimal(1)).cast(Dec) - $"l_discount".cast(Dec))
    li.join(broadcast(part), $"l_partkey" === $"p_partkey")
      .groupBy(date_trunc("month", $"l_shipdate").as("ship_month"))
      .agg(
        sum(when($"p_type" === "ECONOMY", rev)
          .otherwise(lit(BigDecimal(0)).cast(Dec))).as("promo_dec"),
        sum(rev).as("total_dec"))
      .select($"ship_month",
        $"promo_dec".cast(DoubleType).as("promo_revenue"),
        $"total_dec".cast(DoubleType).as("total_revenue"),
        (lit(100.0) * $"promo_dec".cast(DoubleType) /
          $"total_dec".cast(DoubleType)).as("promo_share"))
  }

  val q14PromoSql: String = """
    SELECT date_trunc('month', l_shipdate) AS ship_month,
      CAST(SUM(CASE WHEN p_type = 'ECONOMY'
        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
      100.0 * CAST(SUM(CASE WHEN p_type = 'ECONOMY'
        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1"""

  /** TPC-H Q2-style min-cost supplier: for every small part (p_size ≤ 10),
    * the supplier observed selling it cheapest (min line price over the
    * fact table, exact integer cents), with supplier/nation names attached.
    *
    * Shape: ONE (part, supplier) map-side-combined agg over the fact
    * scan, a PARTITIONED rank window (per-part frames, bounded by
    * suppliers-per-part — never a global sort), and broadcast dim
    * attaches (part filter prunes in its scan). The classic "argmin per
    * group" done without a self-join.
    */
  def q2MinCost(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val part = Tables.part(spark, dir)
      .filter($"p_size" <= 10).select($"p_partkey", $"p_name", $"p_size")
    val supp = Tables.supplier(spark, dir)
      .select($"s_suppkey", $"s_name", $"s_nationkey")
    val nation = Tables.nation(spark, dir).select($"n_nationkey", $"n_name")
    val offers = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey",
        round($"l_extendedprice" * 100).cast("long").as("cents"))
      .join(broadcast(part), $"l_partkey" === $"p_partkey")
      .groupBy($"p_partkey", $"p_name", $"l_suppkey")
      .agg(min($"cents").as("min_cents"))
    val w = Window.partitionBy($"p_partkey")
      .orderBy($"min_cents".asc, $"l_suppkey".asc)
    offers.withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .select($"p_partkey", $"p_name", $"min_cents",
        $"s_name", $"n_name")
  }

  val q2MinCostSql: String = """
    WITH offers AS (
      SELECT p_partkey, p_name, l_suppkey,
             MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS min_cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size <= 10
      GROUP BY 1, 2, 3),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY p_partkey
               ORDER BY min_cents ASC, l_suppkey ASC) AS rk
      FROM offers)
    SELECT p_partkey, p_name, min_cents, s_name, n_name
    FROM ranked
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE rk = 1"""

  /** Top-3 orders per customer by total price (window ranking).
    *
    * Single shuffle on o_custkey; rank + filter stays in one whole-stage
    * codegen span after the sort. Ties broken by orderkey for determinism.
    */
  def qTopkWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
  }

  val qTopkWindowSql: String = """
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
      FROM orders) WHERE rk <= 3"""

  /** Rollup aggregate: order counts and totals by (status, priority) with
    * subtotals. Same partial-agg + single shuffle shape as q1.
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast(Dec)).cast(DoubleType).as("total"))
  }

  val qRollupSql: String = """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"""

  /** The GENERAL grouping-sets form (rollup and cube are its two named
    * specializations): an explicit set list — per-status totals,
    * per-priority totals, and the grand total, but NOT the (status,
    * priority) cross — plus `grouping()` indicator columns, which is how
    * consumers distinguish "NULL because aggregated away" from a genuine
    * NULL key. Same physical shape as rollup/cube: Spark expands each
    * row ×|sets| then runs ONE map-side-combined aggregation — the
    * expansion factor is the set-list length (a query constant), never
    * data-dependent.
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq()),
        $"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast(Dec)).cast(DoubleType).as("total"),
        grouping($"o_orderstatus").cast("int").as("g_status"),
        grouping($"o_orderpriority").cast("int").as("g_priority"))
  }

  val qGroupingSetsSql: String = """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""

  /** Sketch counting: exact distinct per group. The Spark side ALSO computes
    * approx_count_distinct (HLL) and asserts it in the spec; the oracled
    * output is the exact twin so hashes match (HLL implementations differ
    * across engines by construction).
    */
  def qDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_partkey")
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_parts"))
  }

  val qDistinctSql: String =
    "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts FROM lineitem GROUP BY l_returnflag"

  /** Mergeable sketches AT REST: per-day HLL sketches of distinct users
    * built once (`hll_sketch_agg`, lgK=12), PERSISTED as binary parquet
    * columns, then re-read and merged (`hll_union_agg`) into the
    * all-days distinct estimate — plus the per-day estimates off the
    * same stored sketches.
    *
    * This is the incremental-analytics counterpart of DGIM's windowed
    * bit-counting (SURVEY §1): at 100 TB you never re-scan history to
    * answer "distinct users this quarter" — each day's partition is
    * sketched ONCE at ingest (fixed-size state, map-side mergeable), and
    * any date-range rollup is a union over |days| kilobyte-sized
    * sketches. HLL registers are max-of-hashes, so the union is
    * associative/commutative/idempotent — partitioning-independent and
    * deterministic, which is what makes the estimate column stable
    * enough to verify at all.
    *
    * Driver check is rows-only (DuckDB's approx sketch is a different
    * implementation by construction); SketchSpec pins (a) merged == one
    * direct sketch over the whole corpus (mergeability, exact equality),
    * (b) every estimate within HLL lgK=12 error of the exact distinct
    * count, (c) byte-identical sketches on rebuild.
    */
  def qHllMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = graft.sources.DumpCache.ensure(
      graft.sources.DumpCache.dirFor("graft_hll_daily", dir, "events.parquet")) { tmp =>
      Tables.events(spark, dir)
        .select(to_date($"ts").as("d"), $"user_id")
        .groupBy($"d")
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sketch"))
        .write.mode("overwrite").parquet(tmp)
    }
    val daily = spark.read.parquet(out)
    val perDay = daily.select($"d".cast("string").as("d"),
      expr("hll_sketch_estimate(sketch)").as("est_users"))
    val merged = daily
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch, true))").as("est_users"))
      .select(lit("ALL").as("d"), $"est_users")
    perDay.unionByName(merged)
  }

  /** Cube aggregate: all grouping-set combinations of (status, priority).
    * Same partial-agg single-shuffle shape as rollup, 4 grouping sets.
    */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast(Dec)).cast(DoubleType).as("total"))
  }

  val qCubeSql: String = """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)"""

  /** Left-semi join: customers with at least one urgent order. The semi
    * join shuffles only the distinct key set of the right side (no
    * right-side payload, no row multiplication) — at 100 TB Catalyst can
    * also turn this into a broadcast of the filtered key set.
    */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urgent = Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    Tables.customer(spark, dir)
      .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_nationkey")
  }

  val qSemiJoinSql: String = """
    SELECT c_custkey, c_name, c_nationkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')"""

  /** Left-anti join: customers who never placed an urgent order. Same
    * cost shape as the semi join (only the filtered key set shuffles).
    */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urgent = Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    Tables.customer(spark, dir)
      .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_acctbal")
  }

  val qAntiJoinSql: String = """
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')"""

  /** Exact distributed quantiles per group: Spark's `percentile` (exact,
    * sort-based) is bit-identical to DuckDB's `quantile_cont` (verified:
    * both interpolate `lo + (hi-lo)·frac` at 1-based position `(n-1)·p`).
    * The approximate twin (`approx_percentile`, the 100 TB path — a
    * bounded-memory KLL-style sketch vs a full per-group sort) is asserted
    * within its error bound against this exact output in AnalyticsSpec.
    */
  def qQuantile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_extendedprice")
      .groupBy($"l_returnflag")
      .agg(percentile($"l_extendedprice",
        array(lit(0.25), lit(0.5), lit(0.75), lit(0.95))).as("q"))
      .select($"l_returnflag",
        element_at($"q", 1).as("p25"), element_at($"q", 2).as("p50"),
        element_at($"q", 3).as("p75"), element_at($"q", 4).as("p95"))
  }

  val qQuantileSql: String = """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.5)  AS p50,
           quantile_cont(l_extendedprice, 0.75) AS p75,
           quantile_cont(l_extendedprice, 0.95) AS p95
    FROM lineitem GROUP BY l_returnflag"""

  /** Window-frame analytics over each user's event sequence: previous /
    * next deltas (`lag`/`lead`) and a 3-row trailing moving sum — the
    * sequence-feature surface (sessionized deltas, rolling windows) that
    * rounds out the window-function coverage beyond rank-based top-k.
    *
    * ONE shuffle on user_id; the frame functions then run in a single
    * per-partition sorted pass. Values are converted to exact integer
    * cents first (`round(value·100)` is bit-identical across engines)
    * so every emitted column is an integer — no FP association hazards
    * in frames, and `lag`/`lead` nulls at partition edges are coalesced
    * to the current row on both sides.
    */
  def qMovingWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts",
        round($"value" * 100).cast("long").as("cents"))
      .select($"user_id", $"event_id", $"ts", $"cents",
        ($"cents" - coalesce(lag($"cents", 1).over(w), $"cents")).as("delta_cents"),
        (coalesce(lead($"cents", 1).over(w), $"cents") - $"cents").as("next_delta_cents"),
        sum($"cents").over(w.rowsBetween(-2, 0)).as("mov3_cents"))
  }

  val qMovingWindowSql: String = """
    WITH e AS (SELECT user_id, event_id, ts,
                      CAST(round(value * 100) AS BIGINT) AS cents
               FROM events)
    SELECT user_id, event_id, ts, cents,
           cents - coalesce(lag(cents, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), cents) AS delta_cents,
           coalesce(lead(cents, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), cents) - cents AS next_delta_cents,
           CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov3_cents
    FROM e"""

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot (long→wide reshaping): daily event counts spread into one
    * column per event type, via `RelationalGroupedDataset.pivot` WITH
    * EXPLICIT values — the values list is what keeps the plan one pass
    * (without it Spark first runs a distinct scan to discover columns,
    * and the schema becomes data-dependent — a 100 TB anti-pattern).
    * Spark compiles it to the standard two-level rewrite: an aggregate
    * on (day, event_type) then the pivot aggregate on day — two KEYED
    * shuffles, the second over already-reduced per-(day, type) rows, so
    * both stages partial-aggregate map-side. Absent cells canonicalized
    * to 0; the oracle states the equivalent conditional aggregation.
    */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wide = Tables.events(spark, dir)
      .groupBy(date_trunc("day", $"ts").as("day"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    wide.select($"day" +: EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
  }

  val qPivotSql: String = {
    val cols = EventTypes.map(t =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t")
    s"""SELECT date_trunc('day', ts) AS day, ${cols.mkString(", ")}
    FROM events GROUP BY 1"""
  }
}
