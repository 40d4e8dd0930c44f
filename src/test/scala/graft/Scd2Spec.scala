package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Interval-algebra oracles for the SCD2 dimension build: the DuckDB
  * replay checks engine parity; these check the HISTORY laws every
  * type-2 dimension must satisfy.
  */
class Scd2Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private case class Run(cust: Long, version: Long, status: String,
    from: java.time.LocalDateTime, to: Option[java.time.LocalDateTime],
    n: Long, current: Boolean)

  private lazy val hist: Map[Long, Seq[Run]] =
    graft.sources.Sinks.scd2Build(spark, sf).collect()
      .map(r => Run(r.getLong(0), r.getLong(1), r.getString(2),
        r.getAs[java.time.LocalDateTime](3),
        Option(r.getAs[java.time.LocalDateTime](4)),
        r.getLong(5), r.getBoolean(6)))
      .groupBy(_.cust).view.mapValues(_.sortBy(_.version).toSeq).toMap

  test("exactly one current version per customer, and it is the last") {
    hist.foreach { case (cust, runs) =>
      assert(runs.count(_.current) === 1, s"cust $cust")
      assert(runs.last.current, s"cust $cust")
      assert(runs.last.to.isEmpty, s"cust $cust")
    }
  }

  test("versions are consecutive from 1 and intervals chain exactly") {
    hist.foreach { case (cust, runs) =>
      assert(runs.map(_.version) === (1L to runs.size), s"cust $cust")
      runs.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.to.contains(b.from), s"cust $cust v${a.version} gap")
          assert(!a.from.isAfter(b.from), s"cust $cust ordering")
        case _ =>
      }
    }
  }

  test("consecutive versions always change status (runs are maximal)") {
    hist.foreach { case (cust, runs) =>
      runs.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.status !== b.status, s"cust $cust v${a.version}")
        case _ =>
      }
    }
  }

  test("run sizes and first dates reconcile with the raw order stream") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1)))
    val byCust = orders.groupBy(_._1)
    assert(hist.keySet === byCust.keySet)
    hist.foreach { case (cust, runs) =>
      assert(runs.map(_.n).sum === byCust(cust).length.toLong, s"cust $cust")
      assert(runs.head.from === byCust(cust).map(_._2).min(
        Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _)), s"cust $cust")
    }
  }
}
