package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{FloatDotProduct, Vectors}

/** Pins the native codegen'd FloatDotProduct expression bit-identical to
  * the declarative HOF fold (Vectors.dotExpr) — on real embeddings, on
  * edge shapes, and on both the codegen and interpreted eval paths.
  */
class VectorExprSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("float_dot matches the declarative fold bit-for-bit on real embeddings") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = emb.select($"vec_id", $"embedding")
    val pairs = a.as("x").join(a.as("y"), $"x.vec_id" < $"y.vec_id").limit(2000)
      .select(
        FloatDotProduct($"x.embedding", $"y.embedding").as("fast"),
        Vectors.dotExpr($"x.embedding", $"y.embedding").as("ref"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      // bit-identical, not approximately equal: same sequential fold
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("float_dot handles edge shapes and nulls") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),   // plain
      (Some(Seq(1.0f, 2.0f, 9.0f)), Some(Seq(3.0f, 4.0f))), // length mismatch -> common prefix
      (Some(Seq.empty[Float]), Some(Seq(1.0f))),         // empty -> 0.0
      (None, Some(Seq(1.0f))),                           // null -> null
      (Some(Seq(1.0f)), None)
    ).toDF("a", "b")
    val out = df.select(FloatDotProduct($"a", $"b").as("d")).collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).getDouble(0) === 11.0)
    assert(out(2).getDouble(0) === 0.0)
    assert(out(3).isNullAt(0) && out(4).isNullAt(0))
  }

  test("float_dot agrees between codegen and interpreted eval paths") {
    import spark.implicits._
    val df = Seq((Seq(0.5f, -1.25f, 3.75f), Seq(2.0f, 4.0f, -0.5f))).toDF("a", "b")
    def run(mode: String): Double = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(FloatDotProduct($"a", $"b")).collect()(0).getDouble(0)
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val cg = run("CODEGEN_ONLY")
    val interp = run("NO_CODEGEN")
    assert(java.lang.Double.doubleToLongBits(cg) ===
      java.lang.Double.doubleToLongBits(interp))
    assert(cg === 0.5 * 2.0 + -1.25 * 4.0 + 3.75 * -0.5)
  }
}
