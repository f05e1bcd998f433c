package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** HiveQL-dialect SQL surface (SURVEY §2.11; reference parser
  * `HIVE/HiveQl.scala:951-960,1110-1116`): LATERAL VIEW, DISTRIBUTE BY /
  * SORT BY / CLUSTER BY, and TABLESAMPLE. Modern Spark parses all three
  * natively in `spark.sql`, so each query is the dialect form run through
  * the SQL entry point over a temp view, oracle-gated like everything
  * else:
  *
  *  - h01 LATERAL VIEW explode ≡ the generator pipeline f07 builds with
  *    the DataFrame API — same oracle shape, different front-end.
  *  - h02 DISTRIBUTE BY / CLUSTER BY are physical re-distribution hints
  *    with NO semantic effect on a downstream aggregate (the x01 salting
  *    convention: the oracle proves result-transparency). Both branches
  *    must agree with the plain DuckDB aggregate.
  *  - h03 TABLESAMPLE: the Bernoulli PERCENT draw is RNG-specific, so the
  *    oracle encodes the n07 statistical contract (6σ binomial bound);
  *    the ROWS clause is an exact-count limit and checks exactly.
  *
  * Scale notes: LATERAL VIEW lowers to the same Generate operator as
  * explode (narrow, no shuffle); DISTRIBUTE BY is one hash exchange the
  * downstream aggregate then reuses (no second shuffle — the classic
  * pre-partitioning idiom); TABLESAMPLE PERCENT pushes a per-partition
  * Bernoulli filter into the scan, never a global pass.
  */
object HiveDialect {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h01_lateral_view" -> { (s, dir) =>
      Tables.documents(s, dir).createOrReplaceTempView("hq_documents")
      s.sql("""SELECT token, count(*) AS freq
              |FROM hq_documents
              |LATERAL VIEW explode(split(text, ' ')) t AS token
              |GROUP BY token
              |ORDER BY freq DESC, token
              |LIMIT 50""".stripMargin)
    },

    // DISTRIBUTE BY ... SORT BY (branch d) and CLUSTER BY (branch c —
    // sugar for DISTRIBUTE BY x SORT BY x) feed identical aggregates;
    // joining the branches pins BOTH to the oracle's plain group-by.
    "h02_distribute_cluster_by" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("hq_lineitem")
      s.sql("""SELECT d.l_returnflag, d.n, c.n AS n_clustered
              |FROM (SELECT l_returnflag, count(*) AS n
              |      FROM (SELECT l_returnflag FROM hq_lineitem
              |            DISTRIBUTE BY l_returnflag SORT BY l_returnflag)
              |      GROUP BY l_returnflag) d
              |JOIN (SELECT l_returnflag, count(*) AS n
              |      FROM (SELECT l_returnflag FROM hq_lineitem
              |            CLUSTER BY l_returnflag)
              |      GROUP BY l_returnflag) c
              |  ON d.l_returnflag = c.l_returnflag
              |ORDER BY d.l_returnflag""".stripMargin)
    },

    // TABLESAMPLE (10 PERCENT) REPEATABLE(42): the drawn subset is
    // engine-RNG-specific even seeded, so assert the 6σ binomial bound
    // (n07's contract); TABLESAMPLE (500 ROWS) caps exactly 500 rows and
    // is checked exactly. All three counts and the bound check are
    // cross-joined 1-row aggregates INSIDE the returned plan — no driver
    // action in the query.
    "h03_tablesample" -> { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("hq_orders")
      s.sql(
        """SELECT CAST(0.1 AS DOUBLE) AS fraction,
          |  abs(p.k - t.n * 0.1) <= 6 * sqrt(t.n * 0.1 * 0.9) AS within_bounds,
          |  r.k AS rows_clause
          |FROM (SELECT count(*) AS k FROM hq_orders
          |      TABLESAMPLE (10 PERCENT) REPEATABLE (42)) p
          |CROSS JOIN (SELECT count(*) AS n FROM hq_orders) t
          |CROSS JOIN (SELECT count(*) AS k FROM hq_orders
          |            TABLESAMPLE (500 ROWS)) r""".stripMargin)
    }
  )

  // ---- DuckDB mirrors ----------------------------------------------------

  val oracles: Map[String, String] = Map(
    "h01_lateral_view" ->
      """SELECT token, COUNT(*) AS freq FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |) t GROUP BY token
        |ORDER BY freq DESC, token
        |LIMIT 50""".stripMargin,

    "h02_distribute_cluster_by" ->
      """WITH g AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
        |           FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n, n AS n_clustered
        |FROM g ORDER BY l_returnflag""".stripMargin,

    "h03_tablesample" ->
      """SELECT 0.1::DOUBLE AS fraction, TRUE AS within_bounds,
        |  500::BIGINT AS rows_clause""".stripMargin
  )
}
