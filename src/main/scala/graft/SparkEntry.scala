package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 surfaces here as a named query
  * over the /root/testdata tables, with (where SQL-expressible) a DuckDB
  * oracle that must hash-match.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.defs ++
      graft.queries.Windows.defs ++
      graft.queries.Grouping.defs ++
      graft.queries.Functions.defs ++
      graft.queries.Dedup.defs ++
      graft.queries.Similarity.defs ++
      graft.queries.TextAnalysis.defs ++
      graft.queries.Media.defs ++
      graft.queries.Typed.defs ++
      graft.queries.Stats.defs ++
      graft.queries.IO.defs ++
      graft.queries.Streams.defs ++
      graft.queries.Graphs.defs ++
      graft.queries.Joins.defs ++
      graft.queries.Scale.defs ++
      graft.queries.HiveDialect.defs ++
      graft.queries.ModernSql.defs ++
      graft.queries.Ml.defs ++
      graft.queries.MlEval.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Windows.oracles ++
      graft.queries.Grouping.oracles ++
      graft.queries.Functions.oracles ++
      graft.queries.Dedup.oracles ++
      graft.queries.Similarity.oracles ++
      graft.queries.TextAnalysis.oracles ++
      graft.queries.Media.oracles ++
      graft.queries.Typed.oracles ++
      graft.queries.Stats.oracles ++
      graft.queries.IO.oracles ++
      graft.queries.Streams.oracles ++
      graft.queries.Graphs.oracles ++
      graft.queries.Joins.oracles ++
      graft.queries.Scale.oracles ++
      graft.queries.HiveDialect.oracles ++
      graft.queries.ModernSql.oracles ++
      graft.queries.Ml.oracles ++
      graft.queries.MlEval.oracles
}
