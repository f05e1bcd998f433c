package graft

import graft.ext.Scale
import org.apache.spark.sql.functions._

/** Salting utilities must be result-transparent: same answer as the
  * direct aggregation/join, while spreading hot keys across buckets. */
class ScaleSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation on a skewed key") {
    val li = Tables.lineitem(spark, sf001) // l_returnflag is a 3-value hot key
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(l_extendedprice * 100) as bigint)")).as("cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Scale.saltedAggregate(li, Seq("l_returnflag"), saltBuckets = 8,
      partialAggs = Seq(count(lit(1)).as("n"),
        sum(expr("cast(round(l_extendedprice * 100) as bigint)")).as("cents")),
      mergeAggs = Seq(sum("n").as("n"), sum("cents").as("cents")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted === direct)
  }

  test("salted join equals direct join") {
    val o = Tables.orders(spark, sf001).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sf001).select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val direct = o.join(c, "o_custkey").count()
    val salted = Scale.saltedJoin(o, c, "o_custkey", saltBuckets = 4).count()
    assert(salted === direct)
    // every original row keeps exactly one salt copy
    assert(salted === o.count())
  }
}
