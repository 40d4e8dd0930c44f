package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dgim
import graft.operators.DgimQueries

/** Validates the custom DgimWindowAggExec physical operator end-to-end:
  * its output must equal the reference semantics computed independently
  * (collect → group per window → sort → Dgim.estimateSorted), and the
  * planned physical tree must contain the operator above a planner-inserted
  * Exchange + Sort.
  */
class DgimPlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("physical plan is DgimWindowAgg over planner-inserted Exchange + Sort") {
    val plan = DgimQueries.dgimTumble(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("DgimWindowAgg"))
    assert(plan.contains("Exchange"))
    assert(plan.contains("Sort"))
  }

  test("physical plan is DgimSumWindowAgg over planner-inserted Exchange + Sort") {
    val plan = DgimQueries.dgimSumTumble(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("DgimSumWindowAgg"))
    assert(plan.contains("Exchange"))
    assert(plan.contains("Sort"))
  }

  test("sum exec output equals an independent 17-instance sort-then-fold reference") {
    import spark.implicits._
    val got = DgimQueries.dgimSumTumble(spark, sf)
      .select($"window_start".cast("long"), $"sum_estimate", $"exact_cents")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val rows = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === "click" && $"ts".isNotNull)
      .select($"ts".cast("long"),
        org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.round($"value" * 100).cast("long"),
          org.apache.spark.sql.functions.lit(0L)).as("cents"))
      .as[(Long, Long)].collect()
    val expected = rows.groupBy(_._1 / 3600 * 3600).map { case (ws, grp) =>
      val sorted = grp.sortBy(_._1)
      val exact = grp.map(_._2).sum
      val builders = Array.fill(17)(new Dgim.Builder(3600L))
      var latest = 0L
      sorted.foreach { case (ts, cents) =>
        if (cents > 0L) {
          val v = math.min(cents, (1L << 17) - 1)
          latest = math.max(latest, ts)
          (0 until 17).foreach { j =>
            if (((v >> j) & 1L) == 1L) builders(j).add(ts)
          }
        }
      }
      val est = (0 until 17).map(j =>
        (1L << j) * builders(j).state.estimateAt(latest, roundUp = true)).sum
      ws -> (est, exact)
    }
    assert(got === expected)
  }

  test("custom exec output equals independent sort-then-fold reference (tumble + hop)") {
    import spark.implicits._
    for (q <- Seq(DgimQueries.dgimTumble _, DgimQueries.dgimSlide _)) {
      val got = q(spark, sf)
        .select($"window_start".cast("long"), $"window_end".cast("long"),
          $"count_estimate", $"exact_count")
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
        .toMap

      // independent reference: same window assignment done by hand
      val clicks = graft.sources.Tables.events(spark, sf)
        .filter($"event_type" === "click")
        .select($"ts".cast("long")).as[Long].collect()
      val isSlide = got.keys.exists { case (ws, we) => we - ws != 0 } &&
        got.size > clicks.map(_ / 3600 * 3600).distinct.length
      val expected = clicks
        .flatMap { ts =>
          if (isSlide) (0 until 4).map(i => (ts / 900 * 900 - i * 900L, ts))
          else Seq((ts / 3600 * 3600, ts))
        }
        .groupBy(_._1)
        .map { case (ws, rows) =>
          val sorted = rows.map(_._2).sorted
          val we = if (isSlide) ws + 3600 else ws + 3600
          ((ws, we), (Dgim.estimateSorted(sorted, 3600L), sorted.length.toLong))
        }
      assert(got === expected)
    }
  }

  test("SQL-surface dgim_estimate agrees with the custom operator per window") {
    import spark.implicits._
    def byWindow(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      df.select($"window_start".cast("long"), $"count_estimate", $"exact_count")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaExec = byWindow(DgimQueries.dgimTumble(spark, sf))
    val viaSql = byWindow(DgimQueries.sqlDgimTumble(spark, sf))
    assert(viaSql.keySet === viaExec.keySet, "window sets differ")
    viaExec.foreach { case (ws, (estExec, exact)) =>
      val (estSql, exactSql) = viaSql(ws)
      // exact counts are deterministic on both strategies
      assert(exactSql === exact, s"exact count differs in window $ws")
      // estimates come from different (both canonical) merge orders, so
      // the contract is the published DGIM bound, not equality: the only
      // uncertainty is half the oldest bucket, ≤ 50% of the true count
      for (est <- Seq(estExec, estSql))
        assert(math.abs(est - exact) <= math.max(1L, exact / 2),
          s"window $ws: estimate $est vs exact $exact breaks the DGIM bound")
    }
  }

  test("exec enforces its non-null child contract instead of silently reading 0") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a null ts slipped past the query-level guard must FAIL the task,
    // not land the row in the 1970 epoch window
    val child = Seq((3600L, 7200L, Some(3700L)), (3600L, 7200L, None))
      .toDF("ws", "we", "ts_sec")
      .select($"ws", $"we", $"ts_sec".cast("long").as("ts_sec"))
    graft.plans.DgimStrategy.ensureRegistered(spark)
    val df = org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
      graft.plans.DgimWindowAggPlan(3600L,
        org.apache.spark.sql.graft.ColumnBridge.logicalPlan(child)))
    val e = intercept[Exception] { df.collect() }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("emitted a null column")), s"got: ${chain(e).take(3)}")
  }

  test("operator streams groups (no OOM-prone per-group materialization): many tiny groups") {
    import spark.implicits._
    // sanity: outputs one row per distinct window even when #groups >> partitions
    val n = DgimQueries.dgimSlide(spark, sf).count()
    val distinctWindows = DgimQueries.dgimSlide(spark, sf)
      .select("window_start", "window_end").distinct().count()
    assert(n === distinctWindows)
  }

  test("SQL-registered dgim_sum_estimate works from SQL text within the bound") {
    graft.GraftFunctions.register(spark)
    graft.sources.Tables.events(spark, sf).createOrReplaceTempView("events_sum_sql")
    val rows = spark.sql("""
      SELECT window.start AS ws,
             dgim_sum_estimate(cents, ts_sec) AS est,
             SUM(cents) AS exact
      FROM (SELECT ts, CAST(round(value * 100) AS BIGINT) AS cents,
                   unix_timestamp(ts) AS ts_sec
            FROM events_sum_sql
            WHERE event_type = 'click' AND ts IS NOT NULL)
      GROUP BY window(ts, '1 hour')""").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est")
      val exact = r.getAs[Long]("exact")
      assert(math.abs(est - exact) <= exact / 2 + 17,
        s"window ${r.get(0)}: est=$est exact=$exact")
    }
  }

  test("q_dgim_sum: every window's sum estimate within the §5 bound of its exact twin") {
    for (df <- Seq(DgimQueries.dgimSumTumble(spark, sf),
        DgimQueries.dgimSumSlide(spark, sf))) {
      val rows = df.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val est = r.getAs[Long]("sum_estimate")
        val exact = r.getAs[Long]("exact_cents")
        // per-bit DGIM 50% bound weighted by 2^j -> 50% of the sum, plus
        // <= 1 round-up slack per bit instance (17 bits)
        assert(math.abs(est - exact) <= exact / 2 + 17,
          s"window ${r.get(0)}: est=$est exact=$exact")
      }
    }
  }
}
