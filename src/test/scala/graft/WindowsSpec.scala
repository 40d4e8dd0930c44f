package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Windows

/** Semantic oracles for the windows-family operators where the gate data
  * does not exercise every path (the DuckDB compare proves engine parity
  * on real data; this proves the MATH on planted shapes).
  */
class WindowsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("incidents merge CONSECUTIVE anomalous hours into one row") {
    // gate data happens to contain only isolated anomalous hours, so the
    // island-merging path needs a planted burst: 38 quiet hours of 2
    // clicks + 3 consecutive hours of 50 -> exactly ONE 3-window incident
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_incidents").toString
    val baseNanos = 1704067200L * 1000000000L
    val rows = (0 until 41).flatMap { h =>
      val clicks = if (h >= 10 && h <= 12) 50 else 2
      (0 until clicks).map { i =>
        (h * 1000L + i, baseNanos + (h * 3600L + i) * 1000000000L,
          i.toLong % 7, "click", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Windows.incidents(spark, tmp).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("incident_start"),
        r.getAs[java.sql.Timestamp]("incident_end"),
        r.getAs[Long]("n_windows"), r.getAs[Long]("total_clicks")))
    assert(out.length === 1, s"expected one merged incident, got ${out.toSeq}")
    val (start, end, n, total) = out.head
    assert(start === new java.sql.Timestamp((1704067200L + 10 * 3600L) * 1000L))
    assert(end === new java.sql.Timestamp((1704067200L + 13 * 3600L) * 1000L))
    assert(n === 3L)
    assert(total === 150L)
  }

  test("CUSUM alarms on a sustained shift and stays quiet before it") {
    // same planted corpus shape as the incidents test: 38 quiet hours of
    // 2 clicks + 3 consecutive hours of 50. The z-alarm flags the burst
    // hours pointwise; CUSUM accumulates them — it must be silent before
    // the burst and cross the 50·n threshold by the burst's end
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cusum").toString
    val baseNanos = 1704067200L * 1000000000L
    val rows = (0 until 41).flatMap { h =>
      val clicks = if (h >= 10 && h <= 12) 50 else 2
      (0 until clicks).map { i =>
        (h * 1000L + i, baseNanos + (h * 3600L + i) * 1000000000L,
          i.toLong % 7, "click", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Windows.changepoint(spark, tmp).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start").getTime / 1000L
          - 1704067200L) / 3600L ->
        ((r.getAs[Long]("cusum"), r.getAs[Boolean]("is_alarm"))))
      .toMap
    assert((0 until 10).forall(h => !out(h.toLong)._2),
      s"false alarm before the shift: ${out.filter(_._2._2)}")
    assert(out(12L)._2, s"no alarm by burst end: ${out(12L)}")
    assert(out.values.forall(_._1 >= 0L), "cusum must be non-negative")
  }

  test("observe() metrics ride the query for free and match a recompute") {
    // production pipelines attach row-count / quality expectations to
    // the SAME pass that computes the result (Spark's observe API) —
    // no second scan. Pin that the observed metrics on a windows query
    // equal an independent aggregation.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val obs = new org.apache.spark.sql.Observation("win_metrics")
    val sf = "/root/testdata/sf0.001"
    val df = Windows.tumbleCount(spark, sf)
      .observe(obs, count(lit(1)).as("n_windows"), sum($"cnt").as("n_clicks"),
        max($"cnt").as("peak"))
    df.write.format("noop").mode("overwrite").save()
    val m = obs.get
    val check = Windows.tumbleCount(spark, sf)
      .agg(count(lit(1)), sum($"cnt"), max($"cnt")).head()
    assert(m("n_windows") === check.getLong(0))
    assert(m("n_clicks") === check.getLong(1))
    assert(m("peak") === check.getLong(2))
  }

  test("rate spikes flag exactly the users whose hop windows reach the threshold") {
    // planted: user 1 fires 5 events in one 15-min span (peak sliding-hour
    // rate 5), user 2 fires 2, user 3 fires once an hour (never >= 3)
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_spikes").toString
    val baseNanos = 1704067200L * 1000000000L
    val rows =
      (0 until 5).map(i => (100L + i, baseNanos + i * 60L * 1000000000L, 1L, "view", 1.0, "{}")) ++
      (0 until 2).map(i => (200L + i, baseNanos + i * 60L * 1000000000L, 2L, "view", 1.0, "{}")) ++
      (0 until 6).map(i => (300L + i, baseNanos + i * 3600L * 1000000000L, 3L, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Windows.rateSpikes(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_windows_over"), r.getAs[Long]("peak")))
      .toMap
    assert(out.keySet === Set(1L), s"got $out")
    assert(out(1L)._2 === 5L)
  }
}
