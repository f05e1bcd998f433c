package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed accessors for the driver-generated TPC-H-ish test tables
  * (see /root/repo/TESTDATA.md). Each is a plain parquet scan so
  * Catalyst keeps full pushdown/pruning freedom — filters and column
  * selections applied downstream reach the parquet reader
  * (PushedFilters / ReadSchema in .explain).
  *
  * At 100 TB these would be partitioned/bucketed external tables; the
  * accessor layer is the single seam where that swap happens.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "lineitem")
  /** events.ts normalized to a UTC-instant TimestampType regardless of the
    * file's physical layout — read the schema the footer declares, don't
    * assume last month's. Three layouts seen in the wild:
    *   - TIMESTAMP_NANOS surfaced as raw Long (nanosAsLong): floor-truncate
    *     to µs with integer `div` (not `/`, which would round through
    *     double and lose precision above 2^53) — the same truncation DuckDB
    *     applies casting TIMESTAMP_NS → TIMESTAMP, so oracles line up;
    *   - TIMESTAMP_MICROS with isAdjustedToUTC=false (TimestampNTZ): cast
    *     to TimestampType — the session is pinned to UTC, so the wall-clock
    *     reinterpretation is the identity on the stored µs value;
    *   - already-instant TIMESTAMP: pass through. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def events(spark: SparkSession, dir: String): DataFrame = {
    // Harmless when the file is µs; required to read a ns-precision file at all.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(t(spark, dir, "events"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")

  /** A table spread across the session's parallelism BEFORE per-row-heavy
    * work (regex/JSON parsing, shingling, interpreted HOF lambdas): a
    * small single-file parquet table yields ONE input split, so a
    * shuffle-free projection — and the map side of the first exchange —
    * would serialize on one core no matter how many executor threads
    * exist (the s10 lesson; measured 9.7x -> 2.0x per-10x-rows on s60).
    * The shuffle moves only the tiny raw table bytes; at 100 TB the
    * corpus arrives as many splits and the source layout makes this
    * decision instead — which is exactly why it lives HERE, in the
    * accessor seam where the 100 TB table swap happens. Queries whose
    * first operation is already a wide shuffle on a high-cardinality key
    * (plain groupBy/join shapes) don't need it and don't pay it. */
  def documentsSpread(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).repartition(col("doc_id"))
  def eventsSpread(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).repartition(col("event_id"))
  def customerSpread(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir).repartition(col("c_custkey"))
}
