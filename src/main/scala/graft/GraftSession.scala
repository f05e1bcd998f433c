package graft

import org.apache.spark.sql.SparkSession

/** Session factory pinning the semantics the engine is tested under.
  *
  * Mirrors the reference's driver-visible defaults where they still
  * matter (reference: sql/core/src/main/scala/org/apache/spark/sql/SQLConf.scala:217-243 —
  * 10 MB autoBroadcastJoinThreshold, adaptive execution), upgraded to
  * modern Spark: AQE stays ON (coalescing + skew-join + runtime join
  * re-selection replace the reference's off-by-default
  * ExchangeCoordinator).
  *
  * Shuffle parallelism is sized to the local core count here; on a
  * real cluster you'd leave AQE's coalescing to shrink
  * an intentionally-high initial partition count.
  */
object GraftSession {
  def local(threads: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$threads]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Block-manager sweep shared by the Bench and Verify runners:
    * localCheckpoint()ed results register as persistent RDDs and linger
    * until GC collects their DataFrame refs; across a ~120-query run in
    * one JVM they accumulate and evict genuinely-persisted mid-query
    * tables (the round-4 phantom-regression signature). Blocking
    * unpersist removes the blocks synchronously; deliberately NO
    * System.gc() — a forced full GC's concurrent phases bleed ~0.5-1s
    * into the next timed region (measured). */
  def sweepBlocks(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }
}
