package graft

import org.apache.spark.sql.functions._

/** Bucketed tables = co-located joins: writing both join sides bucketed
  * by the join key lets the sort-merge join read pre-partitioned data
  * with NO shuffle exchange on either side. This is the storage-level
  * lever for the 100 TB fact-fact join (lineitem x orders): at scale you
  * pay the shuffle once at write time and every subsequent join is
  * exchange-free. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS l_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    // the production helper: writes both sides bucketed+sorted by the
    // join key, returns the SMJ over the stored tables. Assert on the
    // join-only plan — the downstream agg legitimately adds its own
    // exchange on the grouping key.
    val joined = graft.ext.Scale.bucketedJoin(spark,
      Tables.lineitem(spark, sf001)
        .select("l_orderkey", "l_extendedprice", "l_quantity"),
      "l_orderkey", "l_bucketed",
      Tables.orders(spark, sf001)
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      "o_orderkey", "o_bucketed", buckets = 8)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(800))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 0,
      s"bucketed join must not shuffle either side, found $exchanges exchanges:\n${plan.take(1500)}")
    // and the computation over it matches the unbucketed one
    val got = joined.groupBy("o_custkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
    val expected = Tables.lineitem(spark, sf001)
      .join(Tables.orders(spark, sf001), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
    assert(got.collect().toSet === expected.collect().toSet)
    spark.sql("DROP TABLE IF EXISTS l_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
  }
}
