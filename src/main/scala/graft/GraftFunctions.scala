package graft

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions.udaf

import graft.functions.{DgimBitAggregator, Text}

/** Session-scoped SQL function registration — the UDF/UDAF companions to
  * [[GraftExtensions]] (which injects native expressions). Together they
  * give pure-SQL users the reference engine's registered-function surface:
  * the Flink job registers `DGIM_ESTIMATE` as a SQL aggregate
  * (/root/reference/src/main/java/com/bencejdanko/flink/StreamingJob.java:57-58);
  * graft registers the same name over the same (value, ts_seconds)
  * signature.
  *
  * {{{
  * GraftFunctions.register(spark)
  * spark.sql("""
  *   SELECT window_start, dgim_estimate(value, ts_sec) AS count_estimate
  *   FROM traffic GROUP BY window_start""")
  * }}}
  */
object GraftFunctions {

  /** Window size of the registered `dgim_estimate`, in seconds. The
    * reference fixes 60 s at registration time (its jobs use 60 s
    * windows); graft's batch queries use 1 h windows over the events
    * table, so that is the registered default here. Register another name
    * via [[registerDgim]] for other window sizes.
    */
  val DefaultDgimWindowSeconds = 3600L

  def register(spark: SparkSession): Unit = {
    registerDgim(spark, "dgim_estimate", DefaultDgimWindowSeconds)
    // the PyFlink variant's semantics (floor of the oldest bucket,
    // job.py:37-46) under its own name
    registerDgim(spark, "dgim_estimate_floor", DefaultDgimWindowSeconds,
      roundUp = false)
    // the sum generalization (Datar et al. §5): dgim_sum_estimate(amount
    // BIGINT, ts_sec BIGINT) -> BIGINT over the same 1 h window
    spark.udf.register("dgim_sum_estimate",
      udaf(new graft.functions.DgimSumAggregator(DefaultDgimWindowSeconds),
        Encoders.product[graft.functions.SumEvent]))
    spark.udf.register("rolling_hash61", Text.rollingHashUdf)
    // the text-pipeline primitives for pure-SQL users (same single-pass
    // fast paths the operators use, spec-pinned to the Column semantics)
    spark.udf.register("graft_normalize", Text.normalizeFastUdf)
    spark.udf.register("graft_shingles", Text.shinglesFastUdf)
    spark.udf.register("graft_shingle_hashes", Text.shingleHashesFastUdf)
    spark.udf.register("graft_minhash_sig", Text.minhashSigUdf)
    spark.udf.register("graft_minhash_bands", Text.bandsFromSigUdf)
    spark.udf.register("graft_simhash64", Text.simhashUdf)
    // the Z-order layout key (sink_zorder's interleave, SQL-callable so
    // pure-SQL writers can ORDER BY the same curve)
    spark.udf.register("graft_zvalue32", (a: Long, b: Long) => zvalue32(a, b))
  }

  /** Morton interleave of two 16-bit dimensions (low 16 bits of each
    * input): a's bits land on even positions, b's on odd — bit-identical
    * to the Column-expression ladder in `sources.Sinks.spread16`
    * (ExtensionsSpec pins the equivalence).
    */
  def zvalue32(a: Long, b: Long): Long = spreadBits16(a) | (spreadBits16(b) << 1)

  private def spreadBits16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Register a DGIM estimate aggregate bound to `windowSeconds`:
    * `name(value STRING, ts_sec BIGINT) -> BIGINT` — lenient accumulate
    * (non-"1" values ignored), canonical bucket merge across partitions.
    */
  def registerDgim(spark: SparkSession, name: String, windowSeconds: Long,
      roundUp: Boolean = true): Unit =
    spark.udf.register(name,
      udaf(new DgimBitAggregator(windowSeconds, roundUp),
        Encoders.product[graft.functions.BitEvent]))
}
