package graft

import graft.queries.ModernSql

/** Modern ANSI-SQL surface (recursive CTEs, SQL-defined functions, session
  * variables, EXECUTE IMMEDIATE) — behavior pinned beyond the DuckDB
  * oracle: spine shape, gap-fill zeros, SQL-UDF inlining (no JVM closure
  * in the plan), table-UDF parameter rebinding, and variable re-binding.
  */
class ModernSqlSpec extends SparkSpec {

  test("h04 recursive spine: 24 consecutive months, zero-filled past the data horizon") {
    val rows = ModernSql.defs("h04_recursive_cte")(spark, sf001).collect()
    assert(rows.length === 24)
    val months = rows.map(_.getDate(0).toLocalDate)
    assert(months.head.toString === "2000-07-01")
    assert(months.last.toString === "2002-06-01")
    // consecutive: each step is exactly one month
    months.sliding(2).foreach { case Array(a, b) => assert(a.plusMonths(1) === b) }
    // the data ends 2001-08 — every later month must be an explicit zero row
    val tail = rows.filter(_.getDate(0).toLocalDate.isAfter(java.time.LocalDate.parse("2001-08-01")))
    assert(tail.nonEmpty)
    tail.foreach { r => assert(r.getLong(1) === 0L && r.getLong(2) === 0L) }
    // and at least one in-range month carries real revenue
    assert(rows.exists(_.getLong(2) > 0L))
  }

  test("h05 SQL scalar UDF inlines into the plan — no ScalaUDF, stays in codegen") {
    val df = ModernSql.defs("h05_sql_scalar_udf")(spark, sf001)
    // equals the hand-inlined formulation (and materializes, finalizing AQE)
    val inlined = spark.sql(
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS net_cents
        |FROM ms_lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    assert(df.collect().toSeq === inlined.collect().toSeq)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("ScalaUDF"), "SQL UDF body must inline, not wrap a closure")
    // post-execution the adaptive plan is final; "*(n)" marks codegen stages
    // and the cents expression must sit inside one (inlined into the agg)
    assert(physical.contains("isFinalPlan=true"))
    assert(physical.linesIterator.exists(l => l.contains("*(") && l.contains("HashAggregate")))
  }

  test("h06 SQL table UDF: band predicate reaches the scan and rebinding works") {
    val df = ModernSql.defs("h06_sql_table_udf")(spark, sf001)
    val all = df.collect()
    assert(all.forall { r => val c = r.getLong(2); c >= 10000000L && c < 12000000L })
    // the parameterized band is pushed to the parquet scan, not post-filtered
    assert(df.queryExecution.executedPlan.toString.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThanOrEqual(o_totalprice,100000.0"))
    // rebinding with different arguments reuses the same function
    val narrow = spark.sql("SELECT count(*) FROM ms_orders_in_band(110000.0D, 120000.0D)")
      .collect().head.getLong(0)
    assert(narrow < all.length)
  }

  test("h08 lateral top-k decorrelates: WindowGroupLimit + one equi-join, no nested loop") {
    val df = graft.queries.ModernSql.defs("h08_lateral_topk")(spark, sf001)
    val opt = df.queryExecution.optimizedPlan.toString
    // the correlated ORDER BY/LIMIT becomes a per-key group limit (partial
    // top-k BEFORE the shuffle) feeding a plain inner join — the plan that
    // survives a 100x customer table; a per-nation re-scan would not
    assert(opt.contains("WindowGroupLimit"), s"expected group-limit rewrite:\n$opt")
    assert(opt.contains("Join Inner"))
    assert(!opt.toLowerCase.contains("nestedloop"), s"lateral must not plan a nested loop:\n$opt")
    assert(df.collect().length === 50) // 25 nations x top 2
  }

  test("h12 named WINDOW: both OVER w expressions share ONE Window operator (one shuffle)") {
    val df = ModernSql.defs("h12_named_window")(spark, sf001)
    val rows = df.collect()
    // 5 priorities x top 5 (rank() can over-admit only on cents+key ties,
    // which the unique o_orderkey tiebreak rules out)
    assert(rows.length === 25)
    // WindowsSubstitution resolved both references into the same spec, so
    // the physical plan carries exactly one Window node computing both
    // functions — not one shuffle per OVER clause
    // AQE's toString prints the final AND initial plans — count the final only
    val physical = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val windowLines = physical.linesIterator.filter(l =>
      l.contains("Window ") && l.contains("windowspecdefinition")).toSeq
    assert(windowLines.size === 1, s"expected one shared Window operator:\n$physical")
    // ...and that single node computes BOTH functions
    assert(windowLines.head.contains("rank(") && windowLines.head.contains("sum("))
    // running sum is monotone within each priority under the DESC ordering
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val runs = g.sortBy(_.getLong(2)).map(_.getLong(3))
      assert(runs.sameElements(runs.sorted), "run_cents must be non-decreasing in rank")
    }
  }

  test("h07 session variable: SET VAR re-binds and EXECUTE IMMEDIATE sees the new value") {
    ModernSql.defs("h07_execute_immediate")(spark, sf001).collect() // declares ms_thr
    spark.sql("SET VAR ms_thr = 0.0")
    val nAll = spark.sql(
      "EXECUTE IMMEDIATE 'SELECT count(*) FROM ms_orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) > ?' USING ms_thr")
      .collect().head.getLong(0)
    val total = Tables.orders(spark, sf001).count()
    assert(nAll === total, "threshold 0 must admit every order")
  }
}
