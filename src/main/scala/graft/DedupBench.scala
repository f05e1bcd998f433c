package graft

import org.apache.spark.sql.SparkSession

/** Dev measurement main for the d06 dup-rate gate (r10 verdict item 5):
  * times simhashNeardupPairs with the gate FORCED each way on the same
  * corpus, so the dedup-first overhead (or win) is a committed number
  * rather than an inference from suite-level runs. Prints one JSON line:
  * {"sf":…,"n_docs":N,"dup_rate_est":…,"raw_sec":…,"dedup_first_sec":…}.
  * min-of-2 per path, same discipline as Bench. */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val stats = docs.agg(
      org.apache.spark.sql.functions.approx_count_distinct(
        org.apache.spark.sql.functions.md5(org.apache.spark.sql.functions.col("text")))).head()
    val dupRate = 1.0 - stats.getLong(0).toDouble / n
    // warmup (classloading/codegen) outside the timed loop
    graft.ext.Dedup.simhashNeardupPairs(docs, "doc_id", "text")
      .write.format("noop").mode("overwrite").save()
    def time(minRate: Double): Double =
      (1 to 2).map { _ =>
        GraftSession.sweepBlocks(spark)
        val t0 = System.nanoTime()
        graft.ext.Dedup.simhashNeardupPairs(docs, "doc_id", "text",
            dedupFirstMinDupRate = minRate)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    val raw = time(minRate = 2.0)        // threshold above any rate -> raw path
    val dedupFirst = time(minRate = 0.0) // dupRate >= 0 always -> dedup-first
    println(f"""{"sf":"$sfDir","n_docs":$n,"dup_rate_est":$dupRate%.4f,"raw_sec":$raw%.3f,"dedup_first_sec":$dedupFirst%.3f}""")
    spark.stop()
  }
}
