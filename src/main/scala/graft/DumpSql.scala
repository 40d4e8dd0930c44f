package graft

/** Dev tool: write a PARAMETERIZED oracle SQL text to a file for
  * ad-hoc DuckDB runs — the builders' non-default resolutions
  * (fixture-scale `trainLimit`, `bits`, `k`) are exactly what the
  * static `SparkEntry.oracleSql` map cannot expose, and the driver's
  * gate never executes them; this is how the sampled-training replay
  * (`ivfTrainedCorpusSql(trainLimit > 0)`) was proven to run and to
  * reproduce the full-training replay row-for-row whenever the cap
  * covers the corpus (r13).
  *
  * Usage: runMain graft.DumpSql <outPath> <trainLimit>
  */
object DumpSql {
  def main(a: Array[String]): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(a(0)),
      graft.operators.Similarity.semDedupSql(k = 10, trainLimit = a(1).toInt))
  }
}
