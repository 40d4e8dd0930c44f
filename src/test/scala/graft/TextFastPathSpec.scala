package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text

/** The dedup operators use the single-pass Scala shingle path
  * (Text.shingleSet / xx64) for speed; the Column pipeline
  * (normalize→words→shingles→xxhash64→array_distinct) remains the
  * declarative statement of the semantics. This spec pins the two paths
  * bit-identical on real testdata documents plus adversarial edge cases.
  */
class TextFastPathSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val edgeCases = Seq(
    "", " ", "  a  ", "a b", "a b c", "A  B!!C d", "ONE two THREE four",
    "tabs\tand\nnewlines are non-alnum", "ünïcödé ÀÇCÉNTS and ß sharp",
    "123 456 789 0", "trailing punct...", "...leading", "a!b@c#d$e%f",
    "repeat repeat repeat repeat repeat repeat")

  test("normalizeString matches the Column normalize on testdata + edge cases") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").as[String].collect().toSeq ++ edgeCases
    val viaColumn = docs.toDF("text")
      .select(Text.normalize($"text")).as[String].collect()
    docs.zip(viaColumn).foreach { case (in, col) =>
      assert(Text.normalizeString(in) === col, s"input=<$in>")
    }
  }

  test("shingleSet matches array_distinct(shingles(words)) on testdata + edge cases") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").as[String].collect().toSeq ++ edgeCases
    val viaColumn = docs.toDF("text")
      .select(array_distinct(Text.shingles(Text.words($"text"), 3)))
      .as[Seq[String]].collect()
    docs.zip(viaColumn).foreach { case (in, col) =>
      assert(Text.shingleSet(in, 3).toSeq === col, s"input=<$in>")
    }
  }

  test("native NormalizeText expression is bit-equal to the Column normalize") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").as[String].collect().toSeq ++ edgeCases
    val both = docs.toDF("text")
      .select(Text.normalize($"text").as("col"), Text.normalizeFast($"text").as("nat"))
      .as[(String, String)].collect()
    docs.zip(both).foreach { case (in, (col, nat)) =>
      assert(nat === col, s"input=<$in>")
    }
    // null propagates
    val n = Seq((1, null: String)).toDF("i", "text")
      .select(Text.normalizeFast($"text")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("xx64 matches the Column xxhash64 (seed 42) exactly") {
    import spark.implicits._
    val strings = edgeCases ++ Seq("the quick brown fox", "a", "0") ++
      (0 until 100).map(i => s"shingle number $i padding")
    val viaColumn = strings.toDF("s").select(xxhash64($"s")).as[Long].collect()
    strings.zip(viaColumn).foreach { case (in, col) =>
      assert(Text.xx64(in) === col, s"input=<$in>")
    }
  }
}
