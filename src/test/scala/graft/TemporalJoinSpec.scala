package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsofJoin, RangeJoin}

/** Edge-semantics oracles for the temporal joins (beyond the driver's
  * DuckDB hash gate): tie handling, no-match nulls, and band-boundary
  * inclusivity — pinned on the real events table at sf0.001.
  */
class TemporalJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("asof join matches a brute-force argmax per click (at-or-before, max-value ties)") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"ts", $"event_type", $"value").collect()
    val purchases = ev.filter(_.getString(3) == "purchase")
      .groupBy(r => (r.getLong(1), r.getTimestamp(2)))
      .map { case ((u, ts), rs) => (u, ts, rs.map(_.getDouble(4)).max) }.toSeq
    val expected = ev.filter(_.getString(3) == "click").map { c =>
      val best = purchases
        .filter(p => p._1 == c.getLong(1) && !p._2.after(c.getTimestamp(2)))
        .sortBy(_._2.getTime)
        .lastOption
      (c.getLong(0), best.map(p => (p._2, p._3)))
    }.toMap

    val got = AsofJoin.clicksLastPurchase(spark, sf).collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(3)) None
        else Some((r.getTimestamp(3), r.getDouble(4))))
    }.toMap
    assert(got === expected)
    assert(expected.values.exists(_.isEmpty),
      "test data should include clicks with no prior purchase (null path)")
    assert(expected.values.exists(_.nonEmpty))
  }

  test("range join counts match brute force and the band is inclusive") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"ts", $"event_type").collect()
    val clicks = ev.filter(_.getString(3) == "click")
      .map(r => (r.getLong(1), r.getTimestamp(2).getTime))
    val expected = ev.filter(_.getString(3) == "error").map { e =>
      val t = e.getTimestamp(2).getTime
      val n = clicks.count(c => c._1 == e.getLong(1) &&
        math.abs(c._2 - t) <= 300000L)
      (e.getLong(0), n.toLong)
    }.toMap
    val got = RangeJoin.errorClicksWithin5Min(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got === expected)
    assert(expected.values.sum > 0)
  }
}
