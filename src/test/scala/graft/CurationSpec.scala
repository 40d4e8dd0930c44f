package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("top-k threshold stratified sample equals the rank form row-for-row") {
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Int)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val rank = rows(Curation.sampleStratified(spark, sf))
    val topk = rows(Curation.sampleStratifiedThreshold(spark, sf))
    assert(rank.nonEmpty)
    assert(topk === rank,
      s"diff: ${topk.diff(rank).take(3)} / ${rank.diff(topk).take(3)}")
  }

  test("sample picks exactly ceil(10%) of each stratum") {
    val byLang = Curation.sampleStratifiedThreshold(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = graft.sources.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet === totals.keySet)
    byLang.foreach { case (lang, n) =>
      assert(n === math.ceil(totals(lang) * 0.1).toLong, s"lang=$lang")
    }
  }
}
