package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** df.na / df.stat / describe-class surface (SURVEY §2.12:
  * CORE/DataFrameNaFunctions.scala drop/fill/replace,
  * CORE/DataFrameStatFunctions.scala cov/corr/crosstab).
  *
  * Numeric policy: moments are assembled from EXACT integer sums (unit
  * cents, decimal(38,0) for squares) and only converted to double for the
  * final closed-form formula — so corr/stddev/cov are bit-deterministic
  * under any partitioning, where a naive double sum would drift at 1000
  * executors.
  */
object Stats {

  private val cents = "cast(round(o_totalprice * 100) as bigint)"

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // na.replace + na.fill over injected nulls.
    "n01_na_handling" -> { (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("status"),
          when(col("o_totalprice") > 300000, col("o_totalprice")).as("big_price"))
        .na.replace("status", Map("F" -> "FIN"))
        .na.fill(Map("status" -> "OPEN", "big_price" -> -1.0))
        .orderBy("o_orderkey")
    },

    // describe-style summary from exact integer sums.
    "n02_summary_stats" -> { (s, dir) =>
      Tables.orders(s, dir)
        .agg(
          count(lit(1)).as("n"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"),
          sum(expr(cents)).as("sum_cents"),
          sum(expr(s"cast($cents as decimal(38,0)) * $cents")).as("sumsq_cents"))
        .select(col("n"), col("min_price"), col("max_price"),
          round(col("sum_cents") / col("n"), 4).as("mean_cents"),
          round(sqrt(
            (col("sumsq_cents").cast("double") - col("sum_cents").cast("double") * col("sum_cents") / col("n"))
              / (col("n") - 1)), 4).as("stddev_cents"))
    },

    // stat.crosstab shape: returnflag x linestatus contingency counts.
    "n03_crosstab" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .stat.crosstab("l_returnflag", "l_linestatus")
        .orderBy("l_returnflag_l_linestatus")
    },

    // Exact interpolated percentiles per group.
    "n05_quantiles" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
        .orderBy("o_orderstatus")
    },

    // df.stat.approxQuantile (Greenwald-Khanna sketch): a driver-returning
    // API by design. The sketch's answers differ across engines, so the
    // oracle encodes the GK ERROR CONTRACT instead of the values: for each
    // target p, the exact rank interval covered by the returned quantile
    // must intersect [(p-eps)*n, (p+eps)*n]. One scan for the sketch, one
    // aggregate pass for all rank checks.
    "n06_approx_quantile_bounds" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val eps = 0.01
      val probs = Array(0.25, 0.5, 0.9)
      val qs = o.stat.approxQuantile("o_totalprice", probs, eps)
      val ranks = o.agg(
        count(lit(1)).as("n"),
        sum(when(col("o_totalprice") <= qs(0), 1L).otherwise(0L)).as("le0"),
        sum(when(col("o_totalprice") < qs(0), 1L).otherwise(0L)).as("lt0"),
        sum(when(col("o_totalprice") <= qs(1), 1L).otherwise(0L)).as("le1"),
        sum(when(col("o_totalprice") < qs(1), 1L).otherwise(0L)).as("lt1"),
        sum(when(col("o_totalprice") <= qs(2), 1L).otherwise(0L)).as("le2"),
        sum(when(col("o_totalprice") < qs(2), 1L).otherwise(0L)).as("lt2")).head()
      val n = ranks.getAs[Long]("n").toDouble
      val checks = probs.zipWithIndex.map { case (p, i) =>
        val le = ranks.getAs[Long](s"le$i").toDouble
        val lt = ranks.getAs[Long](s"lt$i").toDouble
        (p, le >= math.floor((p - eps) * n) && lt <= math.ceil((p + eps) * n))
      }
      s.createDataFrame(checks.toSeq).toDF("p", "within_bounds")
        .orderBy("p")
    },

    // Seeded Bernoulli sampling (SURVEY §2.2 sample): the drawn subset is
    // RNG-specific, so the oracle encodes the statistical contract — the
    // sample size must sit within 6 sigma of Binomial(n, frac). Both
    // counts and the bound check live in the returned plan (two 1-row
    // aggregates cross-joined) — no driver action inside the query.
    "n07_sample_bounds" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val frac = 0.1
      val k = o.sample(withReplacement = false, frac, seed = 42)
        .agg(count(lit(1)).as("k"))
      val n = o.agg(count(lit(1)).as("n"))
      k.crossJoin(n).select(lit(frac).as("fraction"),
        (abs(col("k") - col("n") * frac) <=
          lit(6.0) * sqrt(col("n") * frac * (1 - frac))).as("within_bounds"))
    },

    // df.stat.countMinSketch (CORE/DataFrameStatFunctions.scala): the CMS
    // point estimates are hash-seed-specific, so the oracle encodes the
    // sketch's one-sided error CONTRACT: for any key,
    // true <= estimate <= true + eps * N. NOTE the upper bound is
    // probabilistic (holds with prob >= confidence per key, ~3% combined
    // failure odds over three keys for an ARBITRARY seed): seed=42 is
    // load-bearing — it is a verified-passing draw, making the query
    // deterministic. Changing eps/confidence/seed requires re-verifying
    // the bound holds, or the oracle's hardcoded TRUE goes permanently red.
    "n08_cms_bounds" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val eps = 0.001
      // the sketch itself is a driver object by API design (reference
      // CORE/DataFrameStatFunctions) — building it is the one inherent
      // action; the truth counts and bound checks stay in the plan
      val cms = o.stat.countMinSketch(col("o_custkey"), eps, 0.99, 42)
      val keys = Seq(1L, 7L, 101L)
      val n = cms.totalCount().toDouble
      import s.implicits._
      val ests = keys.map(k => (k, cms.estimateCount(k))).toDF("key", "est")
      val truth = o.filter(col("o_custkey").isin(keys: _*))
        .groupBy(col("o_custkey").as("key")).agg(count(lit(1)).as("t"))
      ests.join(truth, Seq("key"), "left")
        .select(col("key"),
          (col("est") >= coalesce(col("t"), lit(0L)) &&
            col("est") <= coalesce(col("t"), lit(0L)) + eps * n).as("within_bounds"))
        .orderBy("key")
    },

    // df.stat.bloomFilter: membership contract — ZERO false negatives over
    // every present order key, and the false-positive rate on 10k absent
    // keys within 3x the configured fpp.
    "n09_bloom_contract" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val fpp = 0.01
      // the filter is a driver object by API design — building it is the
      // one inherent action; both membership checks run in the plan
      val bf = o.stat.bloomFilter(col("o_orderkey"), 200000L, fpp)
      val bfB = s.sparkContext.broadcast(bf)
      val mightContain = udf { (k: Long) => bfB.value.mightContainLong(k) }
      val nfn = o
        .agg((count(when(!mightContain(col("o_orderkey")), lit(1))) === 0L).as("ok"))
        .select(lit("no_false_negatives").as("check"), col("ok"))
      // order keys are < 10^7 at every test SF; probe a disjoint range
      val fp = s.range(20000000L, 20010000L)
        .agg((count(when(mightContain(col("id")), lit(1))) <=
          lit((3 * fpp * 10000).toLong)).as("ok"))
        .select(lit("fp_rate_within_3x").as("check"), col("ok"))
      fp.union(nfn).orderBy("check")
    },

    // df.stat.freqItems (a Karp/Misra-Gries style sweep): its possible-
    // false-positive extras are partition-order-specific, but its GUARANTEE
    // is no false negatives — every value with frequency > support*n is in
    // the result. The query emits exactly the truly-frequent values found,
    // which the oracle recomputes exactly.
    "n10_freq_items_contract" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val support = 0.3
      // the sweep's 1-row result joins the truly-frequent values inside
      // the plan — no driver action anywhere in this query
      val found = li.stat.freqItems(Array("l_returnflag"), support)
        .select(explode(col("l_returnflag_freqItems")).as("l_returnflag"))
        .withColumn("hit", lit(true))
      val tot = li.agg(count(lit(1)).as("n"))
      li.groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
        .crossJoin(tot)
        .filter(col("cnt") > col("n") * support)
        .join(found, Seq("l_returnflag"), "left")
        .select(col("l_returnflag"), coalesce(col("hit"), lit(false)).as("found"))
        .orderBy("l_returnflag")
    },

    // Pearson corr + sample covariance from exact sums.
    "n04_corr_cov" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(expr("cast(l_quantity as bigint)").as("q"),
          expr("cast(round(l_extendedprice * 100) as bigint)").as("c"))
        .agg(count(lit(1)).as("n"),
          sum("q").as("sx"), sum("c").as("sy"),
          sum(expr("q * q")).as("sxx"),
          sum(expr("cast(c as decimal(38,0)) * c")).as("syy"),
          sum(expr("q * c")).as("sxy"))
        .select(col("n"),
          round((col("n").cast("double") * col("sxy") - col("sx").cast("double") * col("sy")) /
            (sqrt(col("n").cast("double") * col("sxx") - col("sx").cast("double") * col("sx")) *
              sqrt(col("n").cast("double") * col("syy").cast("double") - col("sy").cast("double") * col("sy"))), 6)
            .as("pearson_r"),
          round((col("sxy") - col("sx").cast("double") * col("sy") / col("n")) / (col("n") - 1), 4)
            .as("cov_samp"))
    },

    // df.stat.sampleBy (stratified sampling — class-balancing a training
    // corpus): per-stratum fractions, gated on the binomial 6-sigma
    // CONTRACT per stratum (the draw itself is seed/partitioning-specific;
    // the guarantee is the expected rate). Same contract style as n07.
    "n11_stratified_sample" -> { (s, dir) =>
      import s.implicits._
      val o = Tables.orders(s, dir)
      val fractions = Map("O" -> 0.05, "F" -> 0.15, "P" -> 0.30)
      // per-stratum counts and the 6-sigma checks all join inside the
      // plan (the fraction table is 3 literal rows) — no driver action
      val fracDf = fractions.toSeq.sortBy(_._1).toDF("o_orderstatus", "fraction")
      val sampled = o.stat.sampleBy("o_orderstatus", fractions, seed = 42L)
        .groupBy("o_orderstatus").agg(count(lit(1)).as("k"))
      val totals = o.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      fracDf.join(totals, Seq("o_orderstatus"), "left")
        .join(sampled, Seq("o_orderstatus"), "left")
        .select(col("o_orderstatus"), col("fraction"),
          (abs(coalesce(col("k"), lit(0L)) - coalesce(col("n"), lit(0L)) * col("fraction")) <=
            lit(6.0) * sqrt(coalesce(col("n"), lit(0L)) * col("fraction") * (lit(1.0) - col("fraction"))))
            .as("within_bounds"))
        .orderBy("o_orderstatus")
    },

    // Equal-width histogram (the groupBy-bucket shape that scales to any
    // row count) in pure integer arithmetic — bucket edges computed in
    // cents with integer division, so both engines bin identically with
    // no float-edge ambiguity.
    "n12_price_histogram" -> { (s, dir) =>
      Tables.orders(s, dir)
        .select(expr(cents).as("c"))
        .withColumn("bucket", least(expr("(c * 10) div 60000000"), lit(9L)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_orders"), sum("c").as("sum_cents"))
        .orderBy("bucket")
    },

    // Apache DataSketches aggregates (HLL + Theta): per-group sketches,
    // then sketch UNION to the corpus total — the mergeability that makes
    // sketches the 100 TB rollup currency (per-partition/day sketches
    // stored once, any ad-hoc slice unioned later without re-scanning).
    // Contract-gated like n08: per-group and merged estimates within 5%
    // of the exact distinct count (deterministic hashes — a verified draw,
    // not a probabilistic hope; lgK=12 HLL is ~1.6% here, theta is exact
    // below its 4096-entry threshold).
    "n13_datasketches" -> { (s, dir) =>
      Tables.events(s, dir).createOrReplaceTempView("nx_events")
      s.sql(
        """WITH grp AS (
          |  SELECT event_type,
          |    hll_sketch_agg(user_id) AS hsk,
          |    theta_sketch_agg(user_id) AS tsk,
          |    count(DISTINCT user_id) AS exact_d
          |  FROM nx_events GROUP BY event_type
          |),
          |per AS (
          |  SELECT event_type AS scope,
          |    abs(hll_sketch_estimate(hsk) - exact_d) <= 0.05 * exact_d AS hll_ok,
          |    abs(theta_sketch_estimate(tsk) - exact_d) <= 0.05 * exact_d AS theta_ok
          |  FROM grp
          |),
          |merged AS (
          |  SELECT 'ALL' AS scope,
          |    abs(hll_sketch_estimate(hll_union_agg(hsk)) - t.d) <= 0.05 * t.d AS hll_ok,
          |    abs(theta_sketch_estimate(theta_union_agg(tsk)) - t.d) <= 0.05 * t.d AS theta_ok
          |  FROM grp, (SELECT count(DISTINCT user_id) AS d FROM nx_events) t
          |  GROUP BY t.d
          |)
          |SELECT * FROM per UNION ALL SELECT * FROM merged
          |ORDER BY scope""".stripMargin)
    },

    // Pearson chi-squared independence test, TWICE: MLlib's ChiSquareTest
    // (the reference's mllib.stat thin-slice) and the first-principles
    // sum((obs-exp)^2/exp) over the same contingency table computed in
    // the plan — the query gates that they agree. Per-cell terms are
    // micro-quantized BIGINTs before the sum (the t13 trick) so the
    // statistic is partition-order-free and engine-identical; the ML
    // statistic is a driver-side scalar by API design (the n08
    // convention) compared within 1e-3 of the quantized value.
    // One-sample Kolmogorov-Smirnov vs the uniform CDF on [min, max]
    // (reference mllib/stat/test/KolmogorovSmirnovTest.scala): the
    // relational D over the x05 two-pass distributed ranking, gated
    // against the oracle's plain-window formulation; MLlib parity is
    // pinned in LearnSpec (the mllib RDD path is exercised there on a
    // parallelized fixture — parquet-backed `.rdd` inside the bench
    // harness trips a Kryo serializer gap, documented in the spec).
    "n16_ks_uniform" -> { (s, dir) =>
      graft.ext.Learn.ksUniform(
        Tables.orders(s, dir).select(col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("y")),
        "o_orderkey", "y")
    },

    // Spearman rank correlation with average tied ranks (reference
    // mllib/stat/correlation/SpearmanCorrelation.scala): price cents vs
    // rounded quantity over lineitem — extendedprice is quantity-derived,
    // so rho is strongly positive, and quantity's ~50 distinct values
    // exercise the tied-rank averaging hard. Ranking runs on the
    // DISTINCT-value tables through the x05 prefix-sum machinery; doubled
    // ranks keep ties integer-exact.
    "n17_spearman" -> { (s, dir) =>
      graft.ext.Learn.spearman(
        Tables.lineitem(s, dir).select(
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("xc"),
          expr("CAST(round(l_quantity) AS BIGINT)").as("yc")),
        "xc", "yc")
    },

    // Welch's unequal-variance t-test (reference mllib/stat/test/
    // StreamingTestMethod.scala:78 WelchTTest — the default method behind
    // StreamingTest): purchase vs click event values in exact milli
    // units; one conditional-aggregate scan of six integer sums, t and
    // the Welch–Satterthwaite df through Learn.welchExprs' shared formula
    // strings. The raw sums ride along in the result so the oracle gates
    // them directly.
    "n18_welch_ttest" -> { (s, dir) =>
      graft.ext.Learn.welchTTest(
        Tables.events(s, dir).select(col("event_type"),
          expr("CAST(round(value * 1000) AS BIGINT)").as("vm")),
        "event_type", "purchase", "click", "vm")
    },

    // Student's pooled-variance t-test (reference mllib/stat/test/
    // StreamingTestMethod.scala:120 StudentTTest, the second registered
    // method at :155): signup vs error values — same six sums as n18,
    // the pooled statistic and the EXACT integer df n1+n2-2.
    "n19_student_ttest" -> { (s, dir) =>
      graft.ext.Learn.welchTTest(
        Tables.events(s, dir).select(col("event_type"),
          expr("CAST(round(value * 1000) AS BIGINT)").as("vm")),
        "event_type", "signup", "error", "vm", method = "student")
    },

    // Column summary statistics (reference mllib/stat/
    // MultivariateOnlineSummarizer.scala via Statistics.colStats,
    // Statistics.scala:46 — semantics notes on Learn.colStats): the
    // three lineitem measures in exact integer units (quantity units,
    // whole dollars, centi-discount), one stack-unpivot scan, one row
    // per column with the seven raw accumulators + derived
    // mean/variance/L2 in milli-units.
    "n20_col_stats" -> { (s, dir) =>
      graft.ext.Learn.colStats(Tables.lineitem(s, dir), Seq(
          "qty" -> "round(l_quantity)",
          "price" -> "round(l_extendedprice)",
          "disc" -> "round(l_discount * 100)"))
        .orderBy("c")
    },

    // Pearson correlation matrix (reference mllib/stat/correlation/
    // PearsonCorrelation.scala:73 computeCorrelationMatrixFromCovariance,
    // surfaced as Statistics.corr(X, "pearson")): the same three
    // quantized measures, ONE scan of ten exact integer sums (the d²
    // Gramian shape the reference gets from RowMatrix.computeGramianMatrix),
    // then the strict upper triangle as micro-unit rows.
    "n21_pearson_matrix" -> { (s, dir) =>
      import graft.ext.Learn.pearsonExpr
      val pairs = Seq(
        ("qty", "price", pearsonExpr("sq", "sp", "ssq", "ssp", "sqp")),
        ("disc", "qty", pearsonExpr("sd", "sq", "ssd", "ssq", "sqd")),
        ("disc", "price", pearsonExpr("sd", "sp", "ssd", "ssp", "spd")))
      val stackArgs = pairs
        .map { case (a, b, e) => s"'$a', '$b', $e" }.mkString(", ")
      Tables.lineitem(s, dir)
        .selectExpr("CAST(round(l_quantity) AS BIGINT) AS xq",
          "CAST(round(l_extendedprice) AS BIGINT) AS xp",
          "CAST(round(l_discount * 100) AS BIGINT) AS xd")
        .agg(count(lit(1)).as("n"),
          sum("xq").as("sq"), sum("xp").as("sp"), sum("xd").as("sd"),
          sum(col("xq") * col("xq")).as("ssq"),
          sum(col("xp") * col("xp")).as("ssp"),
          sum(col("xd") * col("xd")).as("ssd"),
          sum(col("xq") * col("xp")).as("sqp"),
          sum(col("xq") * col("xd")).as("sqd"),
          sum(col("xp") * col("xd")).as("spd"))
        .selectExpr(s"stack(3, $stackArgs) AS (c1, c2, corr_micro)")
        .orderBy("c1", "c2")
    },

    // Covariance MATRIX (reference mllib/linalg/distributed/RowMatrix
    // .scala:327 computeCovariance — Cov = (G − n·m·mᵀ)/(n−1) from the
    // same one-scan Gramian as s42/n21; the matrix companion to n21's
    // Pearson): the full 3×3 upper triangle over (qty, price, disc) in
    // micro-units of the input units' product, every cell one shared
    // exact-integer-sums formula. ONE aggregate scan at any scale —
    // nine BIGINT sums, d(d+1)/2 projected cells. StatsSpec pins the
    // cells against mllib RowMatrix.computeCovariance itself.
    "n26_covariance_matrix" -> { (s, dir) =>
      import graft.ext.Learn.covExpr
      val cells = Seq(
        ("disc", "disc", covExpr("sd", "sd", "ssd")),
        ("disc", "price", covExpr("sd", "sp", "spd")),
        ("disc", "qty", covExpr("sd", "sq", "sqd")),
        ("price", "price", covExpr("sp", "sp", "ssp")),
        ("price", "qty", covExpr("sp", "sq", "sqp")),
        ("qty", "qty", covExpr("sq", "sq", "ssq")))
      val stackArgs = cells
        .map { case (a, b, e) => s"'$a', '$b', $e" }.mkString(", ")
      Tables.lineitem(s, dir)
        .selectExpr("CAST(round(l_quantity) AS BIGINT) AS xq",
          "CAST(round(l_extendedprice) AS BIGINT) AS xp",
          "CAST(round(l_discount * 100) AS BIGINT) AS xd")
        .agg(count(lit(1)).as("n"),
          sum("xq").as("sq"), sum("xp").as("sp"), sum("xd").as("sd"),
          sum(col("xq") * col("xq")).as("ssq"),
          sum(col("xp") * col("xp")).as("ssp"),
          sum(col("xd") * col("xd")).as("ssd"),
          sum(col("xq") * col("xp")).as("sqp"),
          sum(col("xq") * col("xd")).as("sqd"),
          sum(col("xp") * col("xd")).as("spd"))
        .selectExpr(s"stack(6, $stackArgs) AS (c1, c2, cov_micro)")
        .orderBy("c1", "c2")
    },

    // Gaussian kernel density (reference mllib/stat/KernelDensity
    // .scala:83 — mechanics and the pico-quantization determinism
    // argument on Learn.kernelDensity): order values in whole dollars,
    // bandwidth 25000, five evaluation points spanning the price range.
    "n22_kernel_density" -> { (s, dir) =>
      graft.ext.Learn.kernelDensity(
        Tables.orders(s, dir)
          .selectExpr("CAST(round(o_totalprice) AS BIGINT) AS vm"),
        "vm", 25000.0, Seq(50000L, 100000L, 150000L, 250000L, 350000L))
    },

    "n15_chi_square" -> { (s, dir) =>
      import org.apache.spark.ml.linalg.Vectors
      import s.implicits._
      val ev = Tables.events(s, dir)
      val labeled = ev.selectExpr(
        "CAST(user_id % 3 AS DOUBLE) AS label",
        """CAST(CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
          |  WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END AS DOUBLE) AS f""".stripMargin)
        .map(r => (r.getDouble(0), Vectors.dense(r.getDouble(1)))).toDF("label", "features")
      val ml = org.apache.spark.ml.stat.ChiSquareTest.test(labeled, "features", "label").head()
      val mlStat = ml.getAs[org.apache.spark.ml.linalg.Vector]("statistics")(0)
      val mlDof = ml.getSeq[Int](1).head.toLong
      ev.createOrReplaceTempView("nx_events")
      s.sql(
        s"""WITH ct AS (SELECT user_id % 3 AS lab, event_type AS f,
           |    CAST(count(*) AS BIGINT) AS o
           |  FROM nx_events GROUP BY 1, 2),
           |rm AS (SELECT lab, CAST(sum(o) AS BIGINT) AS rl FROM ct GROUP BY 1),
           |cm AS (SELECT f, CAST(sum(o) AS BIGINT) AS cl FROM ct GROUP BY 1),
           |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM ct),
           |cells AS (
           |  SELECT coalesce(ct.o, CAST(0 AS BIGINT)) AS o,
           |    CAST(rm.rl AS DOUBLE) * CAST(cm.cl AS DOUBLE) / CAST(tot.n AS DOUBLE) AS e
           |  FROM rm CROSS JOIN cm CROSS JOIN tot
           |  LEFT JOIN ct ON ct.lab = rm.lab AND ct.f = cm.f),
           |stat AS (SELECT CAST(sum(CAST(round((o - e) * (o - e) / e * 1e6) AS BIGINT)) AS BIGINT)
           |    AS stat_micro FROM cells)
           |SELECT CAST((SELECT count(*) - 1 FROM rm) * (SELECT count(*) - 1 FROM cm) AS BIGINT) AS dof,
           |  stat_micro,
           |  abs(stat_micro / 1e6 - ${mlStat}D) < 1e-3 AS ml_agrees,
           |  CAST(${mlDof}L AS BIGINT) = CAST((SELECT count(*) - 1 FROM rm) * (SELECT count(*) - 1 FROM cm) AS BIGINT) AS dof_agrees
           |FROM stat""".stripMargin)
    },

    // Chi-squared goodness-of-fit vs uniform (reference mllib/stat/test/
    // ChiSqTest.scala:105 — the Statistics.chiSqTest(Vector) one-sample
    // overload with its default uniform expected, :89; n15's
    // independence test is the matrix overload): are event types
    // uniformly distributed? Dual-pathed: the relational micro-exact
    // statistic AND mllib's own chiSqTest over the (bounded, one row per
    // event type) collected count vector must agree.
    "n23_chisq_gof" -> { (s, dir) =>
      val cells = graft.ext.Learn.chiSqGof(
        Tables.events(s, dir).select(col("event_type")), "event_type")
      val counts = cells.select("f", "o").orderBy("f").collect() // k rows, bounded
      val ml = org.apache.spark.mllib.stat.Statistics.chiSqTest(
        org.apache.spark.mllib.linalg.Vectors.dense(
          counts.map(_.getLong(1).toDouble)))
      cells
        .withColumn("ml_agrees",
          expr(s"abs((CAST(stat_micro AS DOUBLE) / 1000000.0) - ${ml.statistic}D) < 1e-3"))
        .withColumn("dof_agrees", expr(s"dof = CAST(${ml.degreesOfFreedom} AS BIGINT)"))
        .orderBy("f")
    },

    // approx_top_k heavy hitters: one pass, bounded tracking state. With
    // maxItemsTracked >= the true cardinality the counts are EXACT (the
    // regime here — deterministic, value-gated); past that bound it
    // degrades to frequency estimation and n10's contract style applies.
    // The re-sort after explode pins tie order, which the sketch does not.
    "n14_approx_top_k" -> { (s, dir) =>
      Tables.events(s, dir).createOrReplaceTempView("nx_events")
      s.sql(
        """SELECT x.item, x.count AS n
          |FROM (SELECT explode(approx_top_k(event_type, 3, 1000)) AS x
          |      FROM nx_events)
          |ORDER BY n DESC, item""".stripMargin)
    },

    // Spearman correlation MATRIX (reference Correlations.scala
    // corrMatrix with method = "spearman": rank every column with
    // averaged ties, Pearson matrix on the ranks — closes the matrix
    // leg next to n17's pairwise and n21's Pearson matrix) over the
    // n21 triple: quantity's ~50 distinct values tie-stress all three
    // rankings.
    "n25_spearman_matrix" -> { (s, dir) =>
      graft.ext.Learn.spearmanMatrix(
          Tables.lineitem(s, dir).select(
            expr("CAST(round(l_quantity) AS BIGINT)").as("qty"),
            expr("CAST(round(l_extendedprice) AS BIGINT)").as("price"),
            expr("CAST(round(l_discount * 100) AS BIGINT)").as("disc")),
          Seq("qty", "price", "disc"))
        .orderBy("c1", "c2")
    },

    // sampleByKeyExact (reference PairRDDFunctions.scala:291): the
    // EXACT-size companion to n11's rate contract — every stratum
    // yields exactly ceil(n_k · f_k) rows, and the hash-order draw is
    // deterministic, so the oracle gates the SAMPLED ROWS themselves,
    // not a bounds check. Fractions in ppm: O 5%, F 15%, P 30%.
    "n24_sample_by_key_exact" -> { (s, dir) =>
      graft.ext.Scale.sampleByKeyExact(
          Tables.orders(s, dir), "o_orderstatus", "o_orderkey",
          Map("O" -> 50000L, "F" -> 150000L, "P" -> 300000L))
        .orderBy("grp", "pick")
    }
  )

  val oracles: Map[String, String] = Map(
    // Mirror of Learn.kernelDensity: the same pico-quantized kernel
    // formula string per (sample, point), one aggregate.
    "n22_kernel_density" -> {
      val k = graft.ext.Learn.kernelPicoExpr("vm", "pt", 25000.0)
      s"""WITH s AS (SELECT CAST(round(o_totalprice) AS BIGINT) AS vm FROM orders),
         |p AS (SELECT unnest([50000, 100000, 150000, 250000, 350000]) AS pt),
         |k AS (SELECT pt, $k AS k FROM s CROSS JOIN p),
         |g AS (SELECT pt, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(k) AS BIGINT) AS sum_pico
         |  FROM k GROUP BY 1)
         |SELECT CAST(pt AS BIGINT) AS pt, n, sum_pico,
         |  CAST(sum_pico // n AS BIGINT) AS density_pico
         |FROM g ORDER BY pt""".stripMargin
    },

    // Mirror of Learn.colStats: UNION-ALL unpivot of the same quantized
    // columns, the seven sums, and the shared derived-stat formula
    // strings (DIV -> // on the non-negative operands).
    "n20_col_stats" -> {
      val stats = graft.ext.Learn.colStatsExprs
        .map { case (name, e) => s"${e.replace(" DIV ", " // ")} AS $name" }
        .mkString(",\n  ")
      s"""WITH ux AS (
         |  SELECT 'qty' AS c, CAST(round(l_quantity) AS BIGINT) AS x FROM lineitem
         |  UNION ALL
         |  SELECT 'price', CAST(round(l_extendedprice) AS BIGINT) FROM lineitem
         |  UNION ALL
         |  SELECT 'disc', CAST(round(l_discount * 100) AS BIGINT) FROM lineitem),
         |g AS (SELECT c, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN x <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nnz,
         |    min(x) AS mn, max(x) AS mx,
         |    CAST(sum(x) AS BIGINT) AS s, CAST(sum(abs(x)) AS BIGINT) AS l1,
         |    CAST(sum(x * x) AS BIGINT) AS ss
         |  FROM ux GROUP BY 1)
         |SELECT c, n, nnz, mn, mx, s, l1, ss,
         |  $stats
         |FROM g ORDER BY c""".stripMargin
    },

    // Mirror of n21: the identical ten sums and the shared Pearson
    // formula strings, upper triangle via UNION ALL.
    "n21_pearson_matrix" -> {
      import graft.ext.Learn.pearsonExpr
      s"""WITH q AS (SELECT CAST(round(l_quantity) AS BIGINT) AS xq,
         |    CAST(round(l_extendedprice) AS BIGINT) AS xp,
         |    CAST(round(l_discount * 100) AS BIGINT) AS xd FROM lineitem),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(xq) AS BIGINT) AS sq, CAST(sum(xp) AS BIGINT) AS sp,
         |    CAST(sum(xd) AS BIGINT) AS sd,
         |    CAST(sum(xq * xq) AS BIGINT) AS ssq,
         |    CAST(sum(xp * xp) AS BIGINT) AS ssp,
         |    CAST(sum(xd * xd) AS BIGINT) AS ssd,
         |    CAST(sum(xq * xp) AS BIGINT) AS sqp,
         |    CAST(sum(xq * xd) AS BIGINT) AS sqd,
         |    CAST(sum(xp * xd) AS BIGINT) AS spd
         |  FROM q)
         |SELECT c1, c2, corr_micro FROM (
         |  SELECT 'qty' AS c1, 'price' AS c2,
         |    ${pearsonExpr("sq", "sp", "ssq", "ssp", "sqp")} AS corr_micro FROM g
         |  UNION ALL
         |  SELECT 'disc', 'qty', ${pearsonExpr("sd", "sq", "ssd", "ssq", "sqd")} FROM g
         |  UNION ALL
         |  SELECT 'disc', 'price', ${pearsonExpr("sd", "sp", "ssd", "ssp", "spd")} FROM g)
         |ORDER BY c1, c2""".stripMargin
    },

    // The n21 sums with the shared covariance cell formula per pair.
    "n26_covariance_matrix" -> {
      import graft.ext.Learn.covExpr
      s"""WITH q AS (SELECT CAST(round(l_quantity) AS BIGINT) AS xq,
         |    CAST(round(l_extendedprice) AS BIGINT) AS xp,
         |    CAST(round(l_discount * 100) AS BIGINT) AS xd FROM lineitem),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(xq) AS BIGINT) AS sq, CAST(sum(xp) AS BIGINT) AS sp,
         |    CAST(sum(xd) AS BIGINT) AS sd,
         |    CAST(sum(xq * xq) AS BIGINT) AS ssq,
         |    CAST(sum(xp * xp) AS BIGINT) AS ssp,
         |    CAST(sum(xd * xd) AS BIGINT) AS ssd,
         |    CAST(sum(xq * xp) AS BIGINT) AS sqp,
         |    CAST(sum(xq * xd) AS BIGINT) AS sqd,
         |    CAST(sum(xp * xd) AS BIGINT) AS spd
         |  FROM q)
         |SELECT c1, c2, cov_micro FROM (
         |  SELECT 'disc' AS c1, 'disc' AS c2,
         |    ${covExpr("sd", "sd", "ssd")} AS cov_micro FROM g
         |  UNION ALL SELECT 'disc', 'price', ${covExpr("sd", "sp", "spd")} FROM g
         |  UNION ALL SELECT 'disc', 'qty', ${covExpr("sd", "sq", "sqd")} FROM g
         |  UNION ALL SELECT 'price', 'price', ${covExpr("sp", "sp", "ssp")} FROM g
         |  UNION ALL SELECT 'price', 'qty', ${covExpr("sp", "sq", "sqp")} FROM g
         |  UNION ALL SELECT 'qty', 'qty', ${covExpr("sq", "sq", "ssq")} FROM g)
         |ORDER BY c1, c2""".stripMargin
    },

    // Mirror of the Student variant: same sums, the pooled formula
    // strings.
    "n19_student_ttest" -> {
      val stats = graft.ext.Learn.studentExprs
        .map { case (name, e) => s"$e AS $name" }.mkString(",\n  ")
      s"""WITH g AS (SELECT
         |    CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN event_type = 'signup' THEN vm ELSE 0 END) AS BIGINT) AS s1,
         |    CAST(sum(CASE WHEN event_type = 'signup' THEN vm * vm ELSE 0 END) AS BIGINT) AS ss1,
         |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |    CAST(sum(CASE WHEN event_type = 'error' THEN vm ELSE 0 END) AS BIGINT) AS s2,
         |    CAST(sum(CASE WHEN event_type = 'error' THEN vm * vm ELSE 0 END) AS BIGINT) AS ss2
         |  FROM (SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS vm
         |        FROM events WHERE event_type IN ('signup', 'error')))
         |SELECT n1, s1, ss1, n2, s2, ss2,
         |  $stats
         |FROM g""".stripMargin
    },

    // Mirror of Learn.welchTTest: the identical six conditional sums and
    // the shared t / df formula strings over them.
    "n18_welch_ttest" -> {
      val stats = graft.ext.Learn.welchExprs
        .map { case (name, e) => s"$e AS $name" }.mkString(",\n  ")
      s"""WITH g AS (SELECT
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN vm ELSE 0 END) AS BIGINT) AS s1,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN vm * vm ELSE 0 END) AS BIGINT) AS ss1,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN vm ELSE 0 END) AS BIGINT) AS s2,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN vm * vm ELSE 0 END) AS BIGINT) AS ss2
         |  FROM (SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS vm
         |        FROM events WHERE event_type IN ('purchase', 'click')))
         |SELECT n1, s1, ss1, n2, s2, ss2,
         |  $stats
         |FROM g""".stripMargin
    },

    "n01_na_handling" ->
      """SELECT o_orderkey,
        |  COALESCE(CASE WHEN nullif(o_orderstatus, 'O') = 'F' THEN 'FIN'
        |                ELSE nullif(o_orderstatus, 'O') END, 'OPEN') AS status,
        |  COALESCE(CASE WHEN o_totalprice > 300000 THEN o_totalprice END, -1.0) AS big_price
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "n02_summary_stats" ->
      """WITH s AS (SELECT count(*) n, min(o_totalprice) min_price, max(o_totalprice) max_price,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) sum_cents,
        |  sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)
        |      * CAST(round(o_totalprice * 100) AS BIGINT)) sumsq_cents
        |FROM orders)
        |SELECT n, min_price, max_price,
        |  round(sum_cents / CAST(n AS DOUBLE), 4) AS mean_cents,
        |  round(sqrt((CAST(sumsq_cents AS DOUBLE) - CAST(sum_cents AS DOUBLE) * sum_cents / n) / (n - 1)), 4) AS stddev_cents
        |FROM s""".stripMargin,

    "n03_crosstab" ->
      """SELECT l_returnflag AS l_returnflag_l_linestatus,
        |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "n05_quantiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,

    "n06_approx_quantile_bounds" ->
      """SELECT * FROM (VALUES (0.25::DOUBLE, TRUE), (0.5::DOUBLE, TRUE),
        |  (0.9::DOUBLE, TRUE)) t(p, within_bounds)
        |ORDER BY p""".stripMargin,

    "n07_sample_bounds" ->
      """SELECT 0.1::DOUBLE AS fraction, TRUE AS within_bounds""".stripMargin,

    "n08_cms_bounds" ->
      """SELECT * FROM (VALUES (1::BIGINT, TRUE), (7::BIGINT, TRUE),
        |  (101::BIGINT, TRUE)) t(key, within_bounds)
        |ORDER BY key""".stripMargin,

    "n09_bloom_contract" ->
      """SELECT * FROM (VALUES ('fp_rate_within_3x', TRUE),
        |  ('no_false_negatives', TRUE)) t("check", ok)
        |ORDER BY "check"""".stripMargin,

    "n10_freq_items_contract" ->
      """SELECT l_returnflag, TRUE AS found FROM lineitem
        |GROUP BY l_returnflag
        |HAVING count(*) > 0.3 * (SELECT count(*) FROM lineitem)
        |ORDER BY l_returnflag""".stripMargin,

    "n04_corr_cov" ->
      """WITH s AS (SELECT count(*) n,
        |  sum(CAST(l_quantity AS BIGINT)) sx,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) sy,
        |  sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) sxx,
        |  sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)
        |      * CAST(round(l_extendedprice * 100) AS BIGINT)) syy,
        |  sum(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) sxy
        |FROM lineitem)
        |SELECT n,
        |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        |    (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
        |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)), 6) AS pearson_r,
        |  round((sxy - CAST(sx AS DOUBLE) * sy / n) / (n - 1), 4) AS cov_samp
        |FROM s""".stripMargin,

    "n11_stratified_sample" ->
      """SELECT * FROM (VALUES ('F', 0.15::DOUBLE, TRUE), ('O', 0.05::DOUBLE, TRUE),
        |  ('P', 0.30::DOUBLE, TRUE)) t(o_orderstatus, fraction, within_bounds)
        |ORDER BY o_orderstatus""".stripMargin,

    "n12_price_histogram" ->
      """WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) c FROM orders)
        |SELECT least((c * 10) // 60000000, 9) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(c) AS BIGINT) AS sum_cents
        |FROM c GROUP BY 1 ORDER BY bucket""".stripMargin,

    "n13_datasketches" ->
      """SELECT scope, TRUE AS hll_ok, TRUE AS theta_ok FROM (
        |  SELECT DISTINCT event_type AS scope FROM events
        |  UNION ALL SELECT 'ALL')
        |ORDER BY scope""".stripMargin,

    "n14_approx_top_k" ->
      """SELECT event_type AS item, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1
        |ORDER BY n DESC, item LIMIT 3""".stripMargin,

    // The identical first-principles chi-squared; the ML agreement flags
    // are the contract side (TRUE — a verified draw, n08 convention).
    // Plain-window ECDF formulation — its equality with the Spark side's
    // two-pass distributed ranking is half the gate's point.
    "n16_ks_uniform" ->
      """WITH o AS (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS y
        |  FROM orders),
        |b AS (SELECT min(y) AS lo, max(y) AS hi, CAST(count(*) AS BIGINT) AS nn FROM o),
        |r AS (SELECT y, CAST(row_number() OVER (ORDER BY y, o_orderkey) AS BIGINT) AS gi FROM o),
        |d AS (SELECT max(greatest(
        |    CAST(round(((CAST(gi AS DOUBLE) / CAST(nn AS DOUBLE)) - (CAST(y - lo AS DOUBLE) / CAST(hi - lo AS DOUBLE))) * 1e6) AS BIGINT),
        |    CAST(round(((CAST(y - lo AS DOUBLE) / CAST(hi - lo AS DOUBLE)) - (CAST(gi - 1 AS DOUBLE) / CAST(nn AS DOUBLE))) * 1e6) AS BIGINT))) AS d_micro
        |  FROM r CROSS JOIN b)
        |SELECT b.nn AS n, d.d_micro FROM b CROSS JOIN d""".stripMargin,

    // Doubled-average-rank formulation: r2(v) = 2·|{u < v}| + cnt(v) + 1
    // per distinct value (a window cumsum over the tiny counts table
    // mirrors the Spark side's distributed prefix sum), then the shared
    // Pearson-on-ranks formula string; DuckDB's HUGEINT sums mirror the
    // Spark side's DECIMAL(38,0) exactly.
    "n17_spearman" -> {
      s"""WITH p AS MATERIALIZED (
         |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS xc,
         |         CAST(round(l_quantity) AS BIGINT) AS yc
         |  FROM lineitem),
         |rx AS (SELECT v AS xc, (2 * cb) + cnt + 1 AS ax FROM (
         |  SELECT v, cnt, COALESCE(sum(cnt) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM (SELECT xc AS v, CAST(count(*) AS BIGINT) AS cnt FROM p GROUP BY 1))),
         |ry AS (SELECT v AS yc, (2 * cb) + cnt + 1 AS ay FROM (
         |  SELECT v, cnt, COALESCE(sum(cnt) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM (SELECT yc AS v, CAST(count(*) AS BIGINT) AS cnt FROM p GROUP BY 1))),
         |j AS (SELECT ax, ay FROM p JOIN rx USING (xc) JOIN ry USING (yc)),
         |sums AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(ax) AS sa, sum(ay) AS sb,
         |    sum(ax * ax) AS saa, sum(ay * ay) AS sbb,
         |    sum(ax * ay) AS sab
         |  FROM j)
         |SELECT CAST(n AS BIGINT) AS n, ${graft.ext.Learn.spearmanRhoExpr} AS rho_micro
         |FROM sums""".stripMargin
    },

    // Mirror of Learn.chiSqGof: same count aggregate, same shared cell
    // formula string, per-cell micro quantization before the exact sum.
    "n23_chisq_gof" ->
      s"""WITH ct AS (SELECT event_type AS f, CAST(count(*) AS BIGINT) AS o
         |  FROM events GROUP BY 1),
         |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k FROM ct),
         |cells AS (SELECT f, o, ${graft.ext.Learn.gofCellExpr} AS contrib_micro, k
         |  FROM ct CROSS JOIN tot),
         |st AS (SELECT CAST(sum(contrib_micro) AS BIGINT) AS stat_micro FROM cells)
         |SELECT f, o, contrib_micro, stat_micro, CAST(k - 1 AS BIGINT) AS dof,
         |  TRUE AS ml_agrees, TRUE AS dof_agrees
         |FROM cells CROSS JOIN st ORDER BY f""".stripMargin,

    "n15_chi_square" ->
      """WITH ct AS (SELECT user_id % 3 AS lab, event_type AS f,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |rm AS (SELECT lab, CAST(sum(o) AS BIGINT) AS rl FROM ct GROUP BY 1),
        |cm AS (SELECT f, CAST(sum(o) AS BIGINT) AS cl FROM ct GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM ct),
        |cells AS (
        |  SELECT coalesce(ct.o, CAST(0 AS BIGINT)) AS o,
        |    CAST(rm.rl AS DOUBLE) * CAST(cm.cl AS DOUBLE) / CAST(tot.n AS DOUBLE) AS e
        |  FROM rm CROSS JOIN cm CROSS JOIN tot
        |  LEFT JOIN ct ON ct.lab = rm.lab AND ct.f = cm.f),
        |stat AS (SELECT CAST(sum(CAST(round((o - e) * (o - e) / e * 1e6) AS BIGINT)) AS BIGINT)
        |    AS stat_micro FROM cells)
        |SELECT CAST((SELECT count(*) - 1 FROM rm) * (SELECT count(*) - 1 FROM cm) AS BIGINT) AS dof,
        |  stat_micro, TRUE AS ml_agrees, TRUE AS dof_agrees
        |FROM stat""".stripMargin,

    // The n17 double-rank CTEs once per column, one sums row, the
    // shared Pearson string per pair.
    "n25_spearman_matrix" -> {
      import graft.ext.Learn.pearsonExpr
      def rankCte(c: String): String =
        s"""r_$c AS (SELECT v AS $c, (2 * cb) + cnt + 1 AS rk_$c FROM (
           |  SELECT v, cnt, COALESCE(sum(cnt) OVER (ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           |  FROM (SELECT $c AS v, CAST(count(*) AS BIGINT) AS cnt FROM p GROUP BY 1)))""".stripMargin
      val prs = Seq(("qty", "price"), ("qty", "disc"), ("price", "disc"))
      val stackRows = prs.map { case (a, b) =>
        s"SELECT '$a' AS c1, '$b' AS c2, ${pearsonExpr(s"s_$a", s"s_$b", s"ss_$a", s"ss_$b", s"sp_${a}_$b")} AS rho_micro FROM sums"
      }.mkString("\n  UNION ALL ")
      s"""WITH p AS MATERIALIZED (
         |  SELECT CAST(round(l_quantity) AS BIGINT) AS qty,
         |         CAST(round(l_extendedprice) AS BIGINT) AS price,
         |         CAST(round(l_discount * 100) AS BIGINT) AS disc
         |  FROM lineitem),
         |${rankCte("qty")},
         |${rankCte("price")},
         |${rankCte("disc")},
         |j AS (SELECT rk_qty, rk_price, rk_disc
         |  FROM p JOIN r_qty USING (qty) JOIN r_price USING (price) JOIN r_disc USING (disc)),
         |sums AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(rk_qty) AS s_qty, sum(rk_price) AS s_price, sum(rk_disc) AS s_disc,
         |    sum(rk_qty * rk_qty) AS ss_qty, sum(rk_price * rk_price) AS ss_price,
         |    sum(rk_disc * rk_disc) AS ss_disc,
         |    sum(rk_qty * rk_price) AS sp_qty_price,
         |    sum(rk_qty * rk_disc) AS sp_qty_disc,
         |    sum(rk_price * rk_disc) AS sp_price_disc
         |  FROM j)
         |$stackRows
         |ORDER BY c1, c2""".stripMargin
    },

    // Mirror of Scale.sampleByKeyExact: same md5 rank order, same pure
    // integer ceil quota ((n·ppm + 999999) // 1000000 on BIGINTs —
    // both engines truncate positive operands identically).
    "n24_sample_by_key_exact" ->
      """WITH base AS (SELECT o_orderstatus AS grp, o_orderkey AS id FROM orders),
        |q AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST((count(*) * ppm + 999999) // 1000000 AS BIGINT) AS quota
        |  FROM base
        |  JOIN (VALUES ('O', CAST(50000 AS BIGINT)), ('F', CAST(150000 AS BIGINT)),
        |               ('P', CAST(300000 AS BIGINT))) f(grp, ppm) USING (grp)
        |  GROUP BY grp, ppm),
        |r AS (SELECT grp, id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY grp
        |      ORDER BY CAST('0x' || substr(md5('sbke:' || CAST(id AS VARCHAR)), 1, 15) AS BIGINT),
        |               id) AS BIGINT) AS pick
        |  FROM base)
        |SELECT r.grp, r.id, r.pick, q.n, q.quota
        |FROM r JOIN q ON q.grp = r.grp
        |WHERE r.pick <= q.quota
        |ORDER BY r.grp, r.pick""".stripMargin
  )
}
