package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for 1000-executor scale. AQE's skew-join
  * splitting handles most cases at runtime; these are the explicit
  * patterns for when the skew is known up front (a hot grouping key, a
  * hot join key) and you want the plan shape guaranteed.
  */
object Scale {

  /** Two-phase (salted) aggregation: spread each hot grouping key over
    * `saltBuckets` partial groups, aggregate, then merge. `partialAggs`
    * and `mergeAggs` must be an associative pair, e.g.
    * partial `count(*) as c` merged by `sum(c) as c`.
    *
    * Phase 1 shuffles on (key, salt) — hot keys fan out across
    * `saltBuckets` reducers instead of melting one; phase 2 shuffles the
    * tiny partial table on key alone. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                      partialAggs: Seq[Column], mergeAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keys.map(col): _*).agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Salted broadcast-replicated join for a skewed LEFT side against a
    * small right side: the right side is exploded `saltBuckets` times
    * (one copy per salt) so the left's hot keys spread over
    * `saltBuckets` reducers. Right side must be small enough to
    * replicate (it is, or you would broadcast it outright — this is the
    * pattern for when the join must shuffle, e.g. right side just over
    * the broadcast cap). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val replicatedRight = right
      .withColumn("__salt", explode(expr(s"sequence(0, ${saltBuckets - 1})")))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Co-located fact-fact join via bucketed storage: both sides are
    * written bucketed (and sorted) by their join key with the same bucket
    * count into the session catalog, so the sort-merge join reads
    * pre-partitioned, pre-sorted buckets with NO shuffle exchange on
    * either side (BucketingSpec pins the exchange-free plan). This is the
    * storage-level lever for the 100 TB fact-fact join: pay the shuffle
    * once at write time and every subsequent join over the stored tables
    * is exchange-free.
    *
    * `.hint("merge")` pins SMJ so the bucketed layout — not a broadcast —
    * carries the join: at real scale neither fact side fits a broadcast.
    * Size `buckets` so one bucket of the bigger side fits an executor
    * core (buckets ~ table_bytes / 128 MB at write time). */
  def bucketedJoin(spark: SparkSession,
                   left: DataFrame, leftKey: String, leftTable: String,
                   right: DataFrame, rightKey: String, rightTable: String,
                   buckets: Int): DataFrame = {
    dropManagedTable(spark, leftTable)
    dropManagedTable(spark, rightTable)
    left.write.bucketBy(buckets, leftKey).sortBy(leftKey)
      .mode("overwrite").saveAsTable(leftTable)
    right.write.bucketBy(buckets, rightKey).sortBy(rightKey)
      .mode("overwrite").saveAsTable(rightTable)
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
  }

  /** DROP TABLE IF EXISTS plus removal of any orphaned managed location:
    * the default in-memory catalog forgets tables across JVMs while their
    * warehouse directories survive on disk, and CTAS then refuses the
    * non-empty location (LOCATION_ALREADY_EXISTS). Every managed-table
    * writer in the query surface calls this first so re-runs in a fresh
    * session succeed. */
  def dropManagedTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val base = java.nio.file.Paths.get(
      if (wh.startsWith("file:")) new java.net.URI(wh).getPath else wh)
    val loc = base.resolve(table.toLowerCase)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
