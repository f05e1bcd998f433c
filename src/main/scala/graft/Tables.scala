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
  /** events.ts is nanosecond-precision parquet, which Spark 4 rejects as a
    * timestamp by default. Read it as raw nanos and floor-truncate to µs
    * (integer `div`, not `/`, which would go through double and lose
    * precision above 2^53) — the same truncation DuckDB applies when
    * casting TIMESTAMP_NS → TIMESTAMP, so oracle comparisons line up. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
