package graft

import org.apache.spark.sql.functions._

class WindowGroupingSpec extends SparkSpec {

  test("w01 ranks at most 3 rows per customer, rn unique within customer") {
    val df = SparkEntry.queries("w01_top_orders_per_customer")(spark, sf001)
    val bad = df.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), countDistinct(col("rn")).as("d"))
      .filter(col("n") > 3 || col("n") =!= col("d"))
    assert(bad.count() === 0)
  }

  test("w02 running total ends at the order total") {
    val df = SparkEntry.queries("w02_running_order_total")(spark, sf001)
    val last = df.groupBy("l_orderkey").agg(max("running_total").as("rt"))
    val expected = Tables.lineitem(spark, sf001)
      .groupBy("l_orderkey")
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
        .cast("bigint").as("total"))
    assert(last.join(expected, "l_orderkey")
      .filter(col("rt") =!= col("total")).count() === 0)
  }

  test("g01 rollup emits per-group, subtotal and grand-total rows") {
    val rows = SparkEntry.queries("g01_rollup_returns")(spark, sf001).collect()
    val grand = rows.filter(r => r.getAs[Byte]("g_flag") == 1 && r.getAs[Byte]("g_status") == 1)
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("n") === Tables.lineitem(spark, sf001).count())
  }

  test("g06 HLL++ estimate within rsd of exact distinct count") {
    // raw estimate vs exact (the query itself reduces this to a boolean
    // the DuckDB oracle can agree on)
    val approx = Tables.events(spark, sf001).groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("a"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("a")).toMap
    val exact = Tables.events(spark, sf001).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("d")).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.1, s"$k: approx=${approx(k)} exact=$e")
    }
    val gated = SparkEntry.queries("g06_approx_distinct_users")(spark, sf001).collect()
    assert(gated.forall(_.getAs[Boolean]("within_5se")))
  }

  test("events loader truncates nanos to microsecond timestamps") {
    val schema = Tables.events(spark, sf001).schema
    assert(schema("ts").dataType.typeName === "timestamp")
  }
}
