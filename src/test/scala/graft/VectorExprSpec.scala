package graft

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.functions._

/** Native vector expressions (graft.functions.DotProduct / L2Norm):
  * value parity with the interpreted SQL-lambda formulation, whole-stage
  * codegen participation, and SQL registration via GraftExtensions'
  * builders. */
class VectorExprSpec extends SparkSpec {

  private def vecs = Tables.embeddings(spark, sf001)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("dot and norm match the interpreted aggregate/zip_with formulation exactly") {
    val paired = vecs.limit(50).crossJoin(
      vecs.limit(50).select(col("vec_id").as("id2"), col("v").as("w")))
      .filter(col("vec_id") < col("id2"))
    val checked = paired.select(
      V.dot(col("v"), col("w")).as("dot_native"),
      expr("aggregate(zip_with(v, w, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)")
        .as("dot_lambda"),
      V.l2norm(col("v")).as("norm_native"),
      expr("sqrt(aggregate(v, cast(0 as double), (acc, x) -> acc + x * x))").as("norm_lambda"))
    // bit-exact: both accumulate left-to-right in double
    assert(checked.filter(col("dot_native") =!= col("dot_lambda")).count() === 0)
    assert(checked.filter(col("norm_native") =!= col("norm_lambda")).count() === 0)
    assert(checked.count() > 0)
  }

  test("null array input yields null, not a crash") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    val r = df.select(V.dot(col("a"), col("b")).as("d"), V.l2norm(col("b")).as("n")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("expressions run inside whole-stage codegen (no ScalaUDF boundary)") {
    val df = vecs.select(V.dot(col("v"), col("v")).as("d"), V.l2norm(col("v")).as("n"))
    df.collect()
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("codegen id"), formatted.take(500))
    assert(!df.queryExecution.executedPlan.toString.contains("ScalaUDF"))
  }

  test("several kernel instances in one projection compile (fresh codegen locals)") {
    // With non-nullable inputs nullSafeCodeGen inlines each kernel's block
    // without a brace scope, so locals MUST come from ctx.freshName or the
    // second instance redeclares them and janino rejects the stage. Disable
    // the silent interpreted fallback so a compile failure fails the test.
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(3).select(col("id").cast("double").as("x"))
        .select(array(col("x"), col("x") + 1).as("a"),
                array(col("x") + 2, col("x") + 3).as("b"))
        .select(
          V.dot(col("a"), col("a")).as("aa"),
          V.dot(col("a"), col("b")).as("ab"),
          V.l2norm(col("a")).as("na"),
          V.l2norm(col("b")).as("nb"))
      val rows = df.collect().map(r =>
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
      // x=0: a=(0,1) b=(2,3); x=1: a=(1,2) b=(3,4); x=2: a=(2,3) b=(4,5)
      assert(rows === Set(
        (1.0, 3.0, 1.0, math.sqrt(13.0)),
        (5.0, 11.0, math.sqrt(5.0), 5.0),
        (13.0, 23.0, math.sqrt(13.0), math.sqrt(41.0))))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("SQL registration: graft_dot / graft_norm callable from SQL") {
    V.registrations.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.Bridge.registerFunction(spark, id, info, builder)
    }
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d, " +
        "graft_norm(array(3.0D, 4.0D)) AS n").head()
    assert(r.getDouble(0) === 32.0)
    assert(r.getDouble(1) === 5.0)
  }

  test("brute-force top-k via native kernels matches a lambda-only reimplementation") {
    val e = Tables.embeddings(spark, sf001)
    val native = graft.ext.Similarity
      .bruteForceTopK(e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    // independent reimplementation with interpreted lambdas only
    val n = e.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(v, cast(0 as double), (a, x) -> a + x * x))"))
    val probes = n.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("pid"), col("v").as("pv"), col("nrm").as("pnrm"))
    val scored = probes.crossJoin(n).filter(col("pid") =!= col("vec_id"))
      .withColumn("cosine",
        expr("aggregate(zip_with(pv, v, (x, y) -> x * y), cast(0 as double), (a, x) -> a + x)")
          / (col("pnrm") * col("nrm")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("pid")
          .orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= 3)
      .select(col("pid"), col("rank"), col("vec_id"), round(col("cosine"), 4).as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(native === scored)
  }
}
