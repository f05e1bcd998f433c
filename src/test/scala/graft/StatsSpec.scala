package graft

import org.apache.spark.sql.functions._

/** Stat-helper surface that is approximate or engine-specific (no DuckDB
  * mirror): freqItems, sampleBy, approxQuantile, describe, seeded sampling
  * — asserted on structural/deterministic properties instead. */
class StatsSpec extends SparkSpec {

  private def orders = Tables.orders(spark, sf001)
  private def lineitem = Tables.lineitem(spark, sf001)

  test("freqItems finds every truly frequent value") {
    val freq = lineitem.stat.freqItems(Array("l_returnflag"), 0.4)
      .collect().head.getSeq[String](0).toSet
    // values with frequency > 40% must be present (N is ~half of lineitem)
    val truth = lineitem.groupBy("l_returnflag").count()
      .filter(col("count") > lineitem.count() * 0.4)
      .collect().map(_.getString(0)).toSet
    assert(truth.subsetOf(freq))
  }

  test("approxQuantile brackets the exact median") {
    val Array(q50) = orders.stat.approxQuantile("o_totalprice", Array(0.5), 0.01)
    val exact = orders.select(expr("percentile(o_totalprice, 0.5)"))
      .collect().head.getDouble(0)
    val spread = orders.agg(max("o_totalprice") - min("o_totalprice"))
      .collect().head.getDouble(0)
    assert(math.abs(q50 - exact) <= spread * 0.05)
  }

  test("describe emits the five standard rows") {
    val rows = orders.describe("o_totalprice").collect()
      .map(_.getString(0)).toSet
    assert(rows === Set("count", "mean", "stddev", "min", "max"))
  }

  test("seeded sample and randomSplit are reproducible and sized right") {
    val n = orders.count()
    val s1 = orders.sample(withReplacement = false, 0.2, seed = 42).collect()
    val s2 = orders.sample(withReplacement = false, 0.2, seed = 42).collect()
    assert(s1.map(_.getLong(0)).toSeq === s2.map(_.getLong(0)).toSeq)
    assert(s1.length > n * 0.1 && s1.length < n * 0.3)
    val Array(a, b) = orders.randomSplit(Array(0.7, 0.3), seed = 7)
    assert(a.count() + b.count() === n)
    assert(a.intersect(b).count() === 0)
  }

  test("sampleBy honors per-stratum fractions") {
    val frac = Map("O" -> 0.5, "F" -> 0.1, "P" -> 1.0)
    val sampled = orders.stat.sampleBy("o_orderstatus", frac, seed = 11)
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = orders.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every stratum present in the sample obeys its ceiling-ish bound
    sampled.foreach { case (k, c) => assert(c <= totals(k)) }
    assert(sampled.getOrElse("P", 0L) === totals.getOrElse("P", 0L)) // fraction 1.0 keeps all
  }

  test("datasketches mergeability: union of per-group sketches == one-pass corpus sketch") {
    Tables.events(spark, sf001).createOrReplaceTempView("sk_events")
    // the union of per-type sketches must estimate IDENTICALLY to a
    // sketch built in one pass over the corpus — the property that lets
    // 100 TB rollups store per-partition sketches and union ad hoc
    val r = spark.sql(
      """SELECT
        |  hll_sketch_estimate(hll_union_agg(hsk)) AS hll_merged,
        |  theta_sketch_estimate(theta_union_agg(tsk)) AS theta_merged,
        |  (SELECT hll_sketch_estimate(hll_sketch_agg(user_id)) FROM sk_events) AS hll_direct,
        |  (SELECT theta_sketch_estimate(theta_sketch_agg(user_id)) FROM sk_events) AS theta_direct,
        |  (SELECT count(DISTINCT user_id) FROM sk_events) AS exact
        |FROM (SELECT event_type, hll_sketch_agg(user_id) AS hsk,
        |        theta_sketch_agg(user_id) AS tsk
        |      FROM sk_events GROUP BY event_type)""".stripMargin).collect().head
    assert(r.getLong(0) === r.getLong(2), "HLL union must equal the direct sketch")
    assert(r.getLong(1) === r.getLong(3), "theta union must equal the direct sketch")
    // 15 distinct users at sf0.001: both sketches are exact in this regime
    assert(r.getLong(0) === r.getLong(4))
    assert(r.getLong(1) === r.getLong(4))
  }

  test("ks-normal: small D under the true null, large D under a shifted mean") {
    import spark.implicits._
    // the gated query: planted standard gaussian vs N(0, 1) — D sits
    // near the sampling floor (95% critical value ≈ 1.36/√n ≈ 35000
    // micro at n = 1500)
    val r = graft.queries.Scale.defs("n27_ks_normal")(spark, sf001).head()
    assert(r.getAs[Long]("n") >= 1000L)
    assert(r.getAs[Long]("d_micro") < 60000L,
      s"true-null D ${r.getAs[Long]("d_micro")} should be near the sampling floor")
    // a misspecified null (mean shifted by 2σ) must blow D up to ≈ 0.47
    val rnd = new java.util.Random(42)
    val vals = (1L to 2000L).map(i => (i, math.round(rnd.nextGaussian() * 1000)))
      .toDF("id", "y")
    val shifted = graft.ext.Learn.ksNormal(vals, "id", "y",
      meanMilli = 2000L, sdMilli = 1000L).head()
    assert(shifted.getAs[Long]("d_micro") > 300000L,
      s"shifted D ${shifted.getAs[Long]("d_micro")} should be large")
    // the A&S CDF convention itself: |Φ_as − Φ_exact| < 1e-7 on a grid
    val zs = (-40 to 40).map(_ / 10.0)
    val cdf = zs.toDF("z").selectExpr(
        s"${graft.ext.Learn.normCdfExpr("z")} AS f")
      .collect().map(_.getDouble(0))
    zs.zip(cdf).foreach { case (z, f) =>
      val exact = 0.5 * (1.0 + org.apache.commons.math3.special.Erf.erf(z / math.sqrt(2.0)))
      assert(math.abs(f - exact) < 1e-7, s"z=$z: $f vs $exact")
    }
  }

  test("covariance matrix cells equal mllib RowMatrix.computeCovariance") {
    import org.apache.spark.mllib.linalg.Vectors
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val rows = graft.Tables.lineitem(spark, sf001)
      .selectExpr("CAST(round(l_quantity) AS BIGINT) AS xq",
        "CAST(round(l_extendedprice) AS BIGINT) AS xp",
        "CAST(round(l_discount * 100) AS BIGINT) AS xd")
    val rm = new RowMatrix(rows.rdd.map(r =>
      Vectors.dense(r.getLong(0).toDouble, r.getLong(1).toDouble,
        r.getLong(2).toDouble)))
    val ref = rm.computeCovariance() // 0 = qty, 1 = price, 2 = disc
    val got = graft.queries.Stats.defs("n26_covariance_matrix")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val idx = Map("qty" -> 0, "price" -> 1, "disc" -> 2)
    got.foreach { case ((a, b), micro) =>
      val expect = ref(idx(a), idx(b)) * 1e6
      assert(math.abs(micro - expect) <= math.max(1.0, math.abs(expect) * 1e-9),
        s"cell ($a, $b): $micro vs mllib $expect")
    }
  }
}
