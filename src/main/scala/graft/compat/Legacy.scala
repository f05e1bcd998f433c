package graft.compat

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 1.6-era API names preserved as a thin shim (SURVEY §7.3: `unionAll`,
  * `registerTempTable`, `DataFrame.explode` — reference
  * CORE/DataFrame.scala:1008,1122; CORE/SQLContext.scala registerTempTable
  * path), each delegating to the modern call so plans and optimizations
  * are identical. Import graft.compat.Legacy._ to activate.
  */
object Legacy {

  implicit class LegacyDataFrameOps(private val df: DataFrame) {

    /** 1.6 `unionAll` = bag union by position (modern `union`). */
    def unionAll(other: DataFrame): DataFrame = df.union(other)

    /** 1.6 `registerTempTable` (modern `createOrReplaceTempView`). */
    def registerTempTable(name: String): Unit = df.createOrReplaceTempView(name)

    /** 1.6 `DataFrame.explode(input, output)(f)` for the common
      * String => Seq[String] case: modern select + explode of a UDF —
      * the generator (CAT/plans/logical/basicOperators.scala:57 Generate)
      * is what the old API produced under the hood. */
    def explodeColumn(input: String, output: String)(f: String => Seq[String]): DataFrame = {
      val gen = udf(f)
      df.withColumn(output, explode(gen(col(input))))
    }

    /** 1.6 `sqlContext`-style eager schema validation: analysis happens at
      * construction in both eras; exposed for parity. */
    def assertAnalyzed(): DataFrame = { df.queryExecution.assertAnalyzed(); df }
  }

  /** 1.6 DataFrame-DSL function aliases that were renamed later. */
  def approxCountDistinct(c: Column): Column = approx_count_distinct(c)
  def rowNumber(): Column = row_number()
  def denseRank(): Column = dense_rank()
  def percentRank(): Column = percent_rank()
  def cumeDist(): Column = cume_dist()
}
