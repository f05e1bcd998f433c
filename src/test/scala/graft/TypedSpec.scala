package graft

import graft.queries.{CentsAggregator, OrderRow}
import org.apache.spark.sql.functions._

/** Typed-API invariants the oracle can't see: udaf registration of the
  * Aggregator, and partitioning-independence of the typed pipelines. */
class TypedSpec extends SparkSpec {

  test("Aggregator registers as a SQL udaf (UserDefinedAggregateFunction parity)") {
    import spark.implicits._
    spark.udf.register("cents_stats", udaf(CentsAggregator))
    Seq(OrderRow(1, 1, "O", 10.555, "1-URGENT"),
        OrderRow(2, 1, "O", 20.004, "2-HIGH"))
      .toDS().createOrReplaceTempView("typed_orders")
    val r = spark.sql(
      "SELECT cents_stats(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority) s FROM typed_orders")
      .select("s.n", "s.total_cents").collect().head
    assert(r.getLong(0) === 2)
    assert(r.getLong(1) === 1056 + 2000) // round(1055.5) + round(2000.4)
  }

  test("typed aggregation is identical under different partitionings") {
    import spark.implicits._
    val base = Tables.orders(spark, sf001)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    def run(parts: Int) = base.repartition(parts).as[OrderRow]
      .groupByKey(_.o_orderstatus).agg(CentsAggregator.toColumn)
      .collect().map { case (k, v) => k -> v }.toMap
    assert(run(2) === run(13))
  }
}
