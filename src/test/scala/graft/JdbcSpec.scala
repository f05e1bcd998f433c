package graft

import java.util.Properties

/** JDBC source/sink (SURVEY §2.1: EXEC/datasources/jdbc/JDBCRDD.scala —
  * partitioned range reads; DataFrameWriter.jdbc) against embedded Derby
  * (ships with Spark). */
class JdbcSpec extends SparkSpec {

  private val url = {
    System.setProperty("derby.system.home", "/tmp/graft_derby")
    s"jdbc:derby:memory:graftdb;create=true"
  }
  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("jdbc write + read round-trips a table") {
    val nation = Tables.nation(spark, sf001)
    nation.write.mode("overwrite").jdbc(url, "nation_j", props)
    val back = spark.read.jdbc(url, "nation_j", props)
    assert(back.count() === nation.count())
    assert(back.columns.map(_.toLowerCase).sorted === nation.columns.sorted)
  }

  test("partitioned jdbc read splits the key range across tasks") {
    val orders = Tables.orders(spark, sf001).select("o_orderkey", "o_custkey", "o_totalprice")
    orders.write.mode("overwrite").jdbc(url, "orders_j", props)
    val maxKey = orders.agg(org.apache.spark.sql.functions.max("o_orderkey"))
      .collect().head.getLong(0)
    val part = spark.read.jdbc(url, "orders_j",
      columnName = "o_orderkey", lowerBound = 0L, upperBound = maxKey + 1,
      numPartitions = 4, connectionProperties = props)
    assert(part.rdd.getNumPartitions === 4)
    assert(part.count() === orders.count())
    // predicate-list variant
    val pred = spark.read.jdbc(url, "orders_j",
      predicates = Array("\"o_custkey\" < 50", "\"o_custkey\" >= 50"), props)
    assert(pred.rdd.getNumPartitions === 2)
    assert(pred.count() === orders.count())
  }
}
