package graft

import graft.functions.{JaroWinklerKernel, StringFunctions => S}
import org.apache.spark.sql.functions._

/** Native Jaro-Winkler expression: kernel parity with DuckDB's
  * jaro_winkler_similarity (constants below probed from DuckDB 1.x in
  * this sandbox — the same engine the oracle gate runs), codegen
  * participation, null handling, and SQL registration. */
class StringExprSpec extends SparkSpec {

  test("kernel matches DuckDB jaro_winkler_similarity on probed constants") {
    val probed = Seq(
      ("martha", "marhta", 0.9611111111111111),           // transpositions
      ("dwayne", "duane", 0.84),                          // classic pair
      ("dixon", "dicksonx", 0.8133333333333332),          // window + boost
      ("abc", "abc", 1.0),                                // equal
      ("abcdef", "abczzzzzz", 0.6111111111111112),        // jaro <= 0.7: NO boost
      ("a", "b", 0.0),                                    // no matches
      ("ab", "", 0.0), ("", "", 0.0),                     // empty => 0, like DuckDB
      ("customer#000000001", "customer#000000002", 0.9777777777777779), // prefix cap 4
      // equal multisets, 3 displaced positions: an ODD raw mismatch count —
      // floor(3/2)=1, the case that separates integer from float halving
      ("Customer#000001200", "Customer#000000102", 0.9888888888888889))
    probed.foreach { case (a, b, want) =>
      val got = JaroWinklerKernel.sim(a, b)
      assert(math.abs(got - want) < 1e-12, s"sim($a, $b) = $got, want $want")
    }
  }

  test("symmetric, bounded in [0,1], boost only above the 0.7 threshold") {
    val words = Seq("alpha", "alphabet", "beta", "betamax", "gamma", "", "a")
    for (a <- words; b <- words) {
      val s = JaroWinklerKernel.sim(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s === JaroWinklerKernel.sim(b, a))
    }
  }

  test("expression runs inside whole-stage codegen, null input yields null") {
    val c = Tables.customer(spark, sf001)
    val df = c.select(S.jaroWinkler(col("c_name"), lit("customer#000000000")).as("s"))
    df.collect()
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("codegen id"), formatted.take(500))
    assert(!df.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    import spark.implicits._
    val r = Seq((Option.empty[String], Some("x"))).toDF("a", "b")
      .select(S.jaroWinkler(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("SQL registration: graft_jaro_winkler callable after extension injection") {
    graft.functions.StringFunctions.registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    val got = spark.sql("SELECT graft_jaro_winkler('martha', 'marhta') AS s")
      .head().getDouble(0)
    assert(math.abs(got - 0.9611111111111111) < 1e-12)
  }
}
