package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway r15 profiling main for dedup_containment's stage costs.
  * Not part of the library surface; deleted once the round's decade
  * measurements are committed.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .appName("scratch").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "100g")
      .getOrCreate()
    import spark.implicits._
    import graft.sources.Tables
    import graft.functions.Text

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val sh = Tables.documents(spark, dir)
      .select($"doc_id", explode(Text.shinglesFastUdf($"text")).as("s"))

    time("sh_explode")(sh.count())
    time("sz_groupby")(sh.groupBy($"doc_id").agg(count(lit(1)).as("n")).count())
    val grouped = sh.groupBy($"s").agg(collect_list($"doc_id").as("ds"))
    time("postings_groupby")(grouped.count())
    val pairsGen = grouped
      .select(explode($"ds").as("ida"), $"ds")
      .select($"ida", explode($"ds").as("idb"))
      .filter($"ida" < $"idb")
    time("pair_generate")(pairsGen.count())
    val co = pairsGen.groupBy($"ida", $"idb").agg(count(lit(1)).as("inter"))
    time("pair_agg")(co.count())

    // old plan pieces
    val df = sh.groupBy($"s").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy($"doc_id")
    val ranked = sh.join(df, "s")
      .withColumn("n", count(lit(1)).over(wDoc))
      .withColumn("rk", row_number().over(wDoc.orderBy($"df", $"s")))
    val probe = ranked
      .filter($"rk" <= $"n" - floor(($"n" * 9 + 9) / 10) + 1)
      .select($"doc_id".as("ida"), $"s", $"n".as("na"))
    time("old_probe_prefix")(probe.count())
    val candRaw = probe.join(sh.toDF("idb", "s"), "s")
      .filter($"ida" =!= $"idb")
      .select($"ida", $"idb", $"na")
    time("old_cand_raw")(candRaw.count())
    val cand = candRaw.distinct()
    time("old_cand_distinct")(cand.count())
    val docSets = Tables.documents(spark, dir)
      .select($"doc_id", Text.shinglesFastUdf($"text").as("ss"))
    val verified = cand
      .join(docSets.toDF("ida", "sa"), "ida")
      .join(docSets.toDF("idb", "sb"), "idb")
      .select($"ida", $"idb", $"na",
        size(array_intersect($"sa", $"sb")).cast("long").as("inter"))
      .filter($"inter" * lit(1.0) / $"na" >= 0.9)
    time("old_verify_attach")(verified.count())
    spark.stop()
  }
}
