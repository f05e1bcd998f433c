package graft.queries

import graft.Tables
import graft.ext.{Scale => S}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-utility queries: the salted two-phase aggregate and the salted
  * replicated join from [[graft.ext.Scale]], run over real tables and
  * gated on RESULT TRANSPARENCY — the whole point of salting is that the
  * answer is identical to the unsalted plan, so each DuckDB oracle is the
  * plain (unsalted) formulation. All sums go through exact integer cents
  * (cast(round(x*100) as bigint)) so partial/merge order can't drift.
  */
object Scale {

  private val qtyCents = "cast(round(l_quantity * 100) as bigint)"
  private val priceCents = "cast(round(o_totalprice * 100) as bigint)"

  /** x15's counter-based generator pieces — shared verbatim with the
    * oracle. One glibc-constant LCG step mod 2^31 (all operands stay
    * under 2^63 for ids to ~8e9); the exponential is the exact inverse
    * CDF on the r1 stream, milli-quantized (mean 500). */
  private val LcgMod = 2147483648L
  private def lcgExpr(st: String): String =
    s"CAST((($st * 1103515245) + 12345) % $LcgMod AS BIGINT)"
  private val expMilliExpr =
    s"CAST(round(-500.0 * ln(1.0 - (CAST(r1 AS DOUBLE) / $LcgMod.0))) AS BIGINT)"

  /** x20's Box-Muller pieces, shared verbatim with the oracle. `unif`
    * maps an LCG residue in [0, 2^31) to (0, 1] — strictly positive so
    * ln never sees 0. Every decimal literal is CAST through DOUBLE (the
    * w2vUpdExpr/dct4Expr convention) and the 2π literal is the nearest
    * double spelled out, so both engines evaluate libm on IDENTICAL
    * doubles; milli rounding tolerates the 1-ulp libm slack (the
    * s57/expMilli precedent). */
  private def unif(r: String): String =
    s"((CAST($r AS DOUBLE) + CAST(1.0 AS DOUBLE)) / CAST($LcgMod AS DOUBLE))"
  private def bmZ1(u1: String, u2: String): String =
    s"(sqrt(CAST(-2.0 AS DOUBLE) * ln($u1)) * cos(CAST(6.283185307179586 AS DOUBLE) * $u2))"
  private def bmZ2(u1: String, u2: String): String =
    s"(sqrt(CAST(-2.0 AS DOUBLE) * ln($u1)) * sin(CAST(6.283185307179586 AS DOUBLE) * $u2))"
  /** x27's Poisson inverse CDF as ONE shared threshold CASE: the
    * cumulative probabilities for Poisson(λ) are fixed constants, so
    * inversion (the reference's sampling method — mllib/random/
    * RandomRDDs.scala:149 poissonRDD via commons-math
    * PoissonDistribution inversion) becomes a precomputed driver-side
    * table of double literals embedded VERBATIM in both engines'
    * expressions — the smallest k with CDF(k) ≥ u. Declared deviation:
    * the table stops at `kMax` and lumps the residual tail mass
    * (≈1.2e-6 at λ = 3, kMax = 12) into kMax, where the reference's
    * search is unbounded. */
  private def poissonInvCdf(lam: Double, kMax: Int, u: String): String = {
    var p = math.exp(-lam)
    var cdf = p
    val cases = (0 until kMax).map { k =>
      val w = s"WHEN $u <= CAST($cdf AS DOUBLE) THEN $k"
      p = p * lam / (k + 1)
      cdf += p
      w
    }
    cases.mkString("(CASE ", " ", s" ELSE $kMax END)")
  }

  /** x27's Gamma(shape 3, scale 2) draw in milli-units — the sum of
    * three exponentials (reference RandomRDDs.scala:260 gammaRDD /
    * RandomDataGenerator.scala GammaGenerator; at integer shape the
    * Marsaglia-Tsang sampler's law equals Σ_k Exp(θ), the form both
    * engines reproduce exactly through shared ln calls — the x15
    * expMilli convention, θ·1000 = 2000 folded into one round). */
  private val gammaMilliExpr: String = {
    def e(r: String) = s"ln(1.0 - (CAST($r AS DOUBLE) / $LcgMod.0))"
    s"CAST(round(-2000.0 * ((${e("g1")} + ${e("g2")}) + ${e("g3")})) AS BIGINT)"
  }

  /** Cluster center: r = 10 × the unit Gaussian of the cluster-seeded
    * draws (ca, cb); point offset: unit Gaussian of the id-seeded draws
    * (p1, p2). */
  private val kgCenter1 = s"(CAST(10.0 AS DOUBLE) * ${bmZ1(unif("ca"), unif("cb"))})"
  private val kgCenter2 = s"(CAST(10.0 AS DOUBLE) * ${bmZ2(unif("ca"), unif("cb"))})"
  private val kgPointZ1 = bmZ1(unif("p1"), unif("p2"))
  private val kgPointZ2 = bmZ2(unif("p1"), unif("p2"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Two-phase salted aggregation over the biggest fact table: hot
    // (returnflag, linestatus) keys fan out over 8 salt buckets in phase
    // 1, the tiny partial table merges on the true key in phase 2.
    "x01_salted_aggregate" -> { (s, dir) =>
      S.saltedAggregate(Tables.lineitem(s, dir),
          keys = Seq("l_returnflag", "l_linestatus"), saltBuckets = 8,
          partialAggs = Seq(count(lit(1)).as("pc"),
            sum(expr(qtyCents)).as("pq")),
          mergeAggs = Seq(sum("pc").as("n_rows"), sum("pq").as("qty_cents")))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Distributed matrix-type conversions (reference mllib/linalg/
    // distributed/CoordinateMatrix.scala:74 transpose / :80
    // toIndexedRowMatrix / :61 dims; closes the directory 4-for-4 next
    // to s42 RowMatrix and x13 BlockMatrix): supplier x order-bucket
    // quantity entries, transposed, assembled into sparse rows with the
    // block-coordinate arithmetic and matrix dims gated alongside.
    // Bounded per-key top-k (reference mllib/rdd/MLPairRDDFunctions
    // .scala:41 topByKey over core/util/BoundedPriorityQueue.scala):
    // top-3 suppliers by account balance per nation through the
    // k-bounded Aggregator — partial buffers cap at k, so the shuffle
    // carries at most k rows per (nation, map task) instead of the
    // window formulation's every-row shuffle + whole-group sort; at
    // 100 TB that's the difference between an all-rows exchange and a
    // keys-times-k one. Gated on result transparency: the oracle IS the
    // window-rank formulation.
    "x19_topk_by_key" -> { (s, dir) =>
      val sup = Tables.supplier(s, dir).select(col("s_nationkey"),
        expr("CAST(round(s_acctbal * 100) AS BIGINT)").as("bal_cents"),
        col("s_suppkey"))
      S.topKByKey(sup, "s_nationkey", "bal_cents", "s_suppkey", k = 3)
        .orderBy("s_nationkey", "rk")
    },

    "x18_matrix_conversions" -> { (s, dir) =>
      val entries = Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey").as("i"), (col("l_orderkey") % 50).as("j"))
        .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("v"))
      S.coordinateTransposeRows(entries, rowsPerBlock = 8)
        .orderBy("i")
    },

    // Tree aggregation (RDD.treeAggregate re-expressed relationally):
    // the full-lineitem summary reduces through 64 leaf buckets and an
    // 8-way intermediate level, bounding every merge task's fan-in to 8
    // — the plan shape mllib's GradientDescent relies on for wide
    // aggregation state. Gated on result transparency: the oracle is the
    // plain one-shot aggregate.
    "x16_tree_aggregate" -> { (s, dir) =>
      S.treeAggregate(Tables.lineitem(s, dir),
        bucketExpr = "l_orderkey", leaves = 64, fanout = 8,
        partials = Seq(count(lit(1)).as("n_rows"),
          sum(expr(qtyCents)).as("qty_cents"),
          min(expr(qtyCents)).as("min_cents"),
          max(expr(qtyCents)).as("max_cents")),
        merges = Seq(sum("n_rows").as("n_rows"),
          sum("qty_cents").as("qty_cents"),
          min("min_cents").as("min_cents"),
          max("max_cents").as("max_cents")))
    },

    // Accumulator-audited cleanse: one pass computes the clean quantity
    // aggregate while named accumulators count total/suspect rows in the
    // map stage — zero-extra-pass observability (the reference's
    // sc.accumulator side channel; exactly-once caveat in
    // ext.Scale.auditedCleanse's scaladoc). The oracle recomputes all
    // four numbers relationally, gating that the audited pass counted
    // every row exactly once.
    "x17_accumulator_audit" -> { (s, dir) =>
      import s.implicits._
      S.auditedCleanse(
        Tables.lineitem(s, dir).select(expr(qtyCents).as("c")).as[Long],
        suspectAbove = 4500L)
    },

    // Salted replicated join: skewed lineitem fans its hot supplier keys
    // over 8 salts; the small supplier side is replicated once per salt.
    // Rolled up per nation so the gate compares a compact exact result.
    "x02_salted_join" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_suppkey").as("suppkey"), expr(qtyCents).as("cents"))
      val supp = Tables.supplier(s, dir)
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      S.saltedJoin(li, supp, "suppkey", saltBuckets = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"), sum("cents").as("item_cents"))
        .orderBy("s_nationkey")
    },

    // Bucketed co-located fact-fact join: lineitem and orders are stored
    // bucketed by orderkey so the sort-merge join reads both sides with
    // no shuffle exchange (BucketingSpec pins the plan shape). Gated on
    // result transparency: the oracle is the plain unbucketed join.
    "x03_bucketed_join" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), expr(qtyCents).as("cents"))
      val ord = Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
      S.bucketedJoin(s, li, "l_orderkey", "x03_li_bkt",
          ord, "o_orderkey", "x03_ord_bkt", buckets = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), sum("cents").as("qty_cents"))
        .orderBy("o_orderpriority")
    },

    // Skew diagnostic report — the observability pass you run BEFORE
    // choosing salting buckets or trusting AQE: key-count distribution
    // stats plus the hottest key, in two small aggregations over the
    // per-key count table (itself one map-side-combined shuffle of the
    // fact table).
    "x09_skew_report" -> { (s, dir) =>
      val counts = Tables.lineitem(s, dir)
        .groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val stats = counts.agg(
          count(lit(1)).as("n_keys"),
          sum("cnt").as("n_rows"),
          max("cnt").as("max_cnt"),
          round(expr("percentile(cnt, 0.5)"), 4).as("p50_cnt"),
          round(expr("percentile(cnt, 0.99)"), 4).as("p99_cnt"))
        .withColumn("skew_ratio",
          round(col("max_cnt").cast("double") * col("n_keys") / col("n_rows"), 4))
      val top = counts.orderBy(col("cnt").desc, col("l_suppkey")).limit(1)
        .select(col("l_suppkey").as("top_key"), col("cnt").as("top_cnt"))
      val out = stats.crossJoin(top).localCheckpoint()
      counts.unpersist()
      out
    },

    // Global row numbering without a single-partition sort: range
    // repartition + per-partition counts + broadcast offsets. The oracle
    // is the plain ORDER BY row_number the parallel plan must equal.
    "x05_global_row_index" -> { (s, dir) =>
      S.globalRowIndex(Tables.orders(s, dir).select("o_orderkey"), "o_orderkey")
        .orderBy("o_orderkey")
    },

    // Token-budget packing for a training-data export: exclusive running
    // token total in doc_id order (range repartition + broadcast offsets,
    // never a single-partition window), pack id by exact integer division.
    // The oracle is the plain global-window formulation the parallel plan
    // must equal.
    "x10_token_packing" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), expr("cast(size(split(text, ' ')) as bigint)").as("n_tokens"))
      S.packByTokenBudget(d, "doc_id", "n_tokens", budget = 512L)
        .orderBy("doc_id")
    },

    // Small-files compaction: fragment orders into 64 files, compact to 4
    // range-partitioned key-sorted files, scan the compacted copy. Gated
    // on result transparency (oracle = the plain table); ScaleSpec pins
    // the file counts and the disjoint per-file key ranges.
    "x07_compacted_scan" -> { (s, dir) =>
      // collision-free per-dir key (same discipline as x04/d18): two data
      // dirs sharing a basename must not share a compaction scratch path
      val base = s"/tmp/graft_scale/compact_${Dedup.dirKey(dir)}"
      Tables.orders(s, dir).select(col("o_orderkey"), expr(priceCents).as("cents"))
        .repartition(64).write.mode("overwrite").parquet(s"$base/frag")
      S.compact(s, s.read.parquet(s"$base/frag"), "o_orderkey", 4, s"$base/tidy")
        .orderBy("o_orderkey")
    },

    // Z-order layout scan: orders rewritten in an interleaved (o_custkey,
    // cents) layout, then read back through selective predicates on BOTH
    // dimensions. The layout must be invisible in the result (oracle =
    // the plain-scan formulation); the dual-dimension file-pruning power
    // is asserted in ScaleSpec from per-file footer ranges.
    // Block-matrix multiply (reference mllib/linalg/distributed/
    // BlockMatrix.scala:399 multiply / :369 simulateMultiply): the
    // customer×supplier purchase-count matrix times the supplier×nation
    // indicator — C(i,j) = how many of customer i's lineitems came from
    // nation j. Two-phase block-coordinate product (Scale.blockMultiply);
    // the oracle is the DIRECT join+group formulation, so the block
    // routing must be result-transparent. Cohort i <= 300 for output.
    // Random data generation (reference mllib/random/RandomRDDs.scala
    // uniformRDD/exponentialRDD + random/RandomDataGenerator.scala and
    // util/LinearDataGenerator.scala:131 generateLinearRDD — y = w·x +
    // intercept + eps·noise). DECLARED DEVIATIONS, the oracle-gate
    // convention: the reference seeds an XORShift per partition; here
    // the generator is COUNTER-BASED — two LCG steps per stream keyed by
    // the row id — so the value at any index is engine-exact and
    // independent of partitioning (the splittable-generator property
    // RandomRDDs needs, in its strongest form). Gaussian noise becomes
    // centered-uniform (no Box-Muller: cos is not in the engine-shared
    // libm set), exponential comes from the exact inverse CDF. The
    // generated stream is validated THROUGH ITS PURPOSE: the s14 OLS fit
    // Clustered synthetic data generation (reference mllib/util/
    // KMeansDataGenerator.scala:48 generateKMeansRDD — k centers drawn
    // from a d-dim Gaussian scaled by r (:59), each point = center(idx %
    // k) + unit Gaussian (:62-:64); LinearDataGenerator's labeled-point
    // analog is x15). Randomness is the house counter-based LCG +
    // Box-Muller instead of the reference's java.util.Random — a
    // DECLARED deviation that makes generation driver-free and
    // reproducible at ANY parallelism (the reference already re-seeds
    // per point, `new Random(42 + idx)`, for the same reason — :63).
    // The center is a pure function of the cluster id, so no center
    // table materializes anywhere: at 100 TB generation is one narrow
    // codegen projection over a key range — write bandwidth is the only
    // cost. Gated on per-cluster recovery: milli-quantized point means
    // vs the exact center both engines compute from the same draws.
    // The mean's integer division runs over NEGATIVE sums here (all five
    // seeded centers land negative): Spark DIV and DuckDB BIGINT `//`
    // both truncate toward zero (verified on the gated path; DuckDB's
    // floor-vs-trunc caveat in the verify notes applies to its DOUBLE
    // `//` overload, not BIGINT).
    // Matrix-factorization data generation (reference mllib/util/
    // MFDataGenerator.scala:30 — A = U·Vᵀ at a chosen rank, a sampled
    // subset of entries emitted as the training set, optional noise;
    // the last member of the generator family). Thin-slice conventions,
    // DECLARED: rank 2, integer-uniform factor entries in [−1000, 1000]
    // milli from the shared LCG stream in place of randn (the house
    // no-RNG rule), deterministic LCG-residue sampling of ~1/4 of the
    // (i, j) key pairs in place of the oversampling-factor draw, and
    // bounded ±10000 LCG noise in place of gaussian sigma. The four
    // LCG streams (u factors 1..400, v factors 200001..200200, sampling
    // 10M+i·200+j, noise 20M+i·200+j) use DISJOINT seed ranges so no
    // sampled/noise cell shares a seed with the factor entry it
    // perturbs — MFDataGenerator's streams are independent. Every row
    // carries its factor entries, so the oracle gates the LOW-RANK
    // STRUCTURE itself: rating − noise factors exactly through u·v.
    "x25_mf_datagen" -> { (s, dir) =>
      Tables.orders(s, dir)
        .selectExpr("CAST(o_orderkey % 200 AS BIGINT) AS i",
          "CAST((o_orderkey DIV 200) % 100 AS BIGINT) AS j")
        .distinct()
        .filter(expr(s"${lcgExpr("(10000000 + ((i * 200) + j))")} % 4 = 0"))
        .selectExpr("i", "j",
          s"CAST((${lcgExpr("((i * 2) + 1)")} % 2001) - 1000 AS BIGINT) AS u1",
          s"CAST((${lcgExpr("((i * 2) + 2)")} % 2001) - 1000 AS BIGINT) AS u2",
          s"CAST((${lcgExpr("(200000 + ((j * 2) + 1))")} % 2001) - 1000 AS BIGINT) AS v1",
          s"CAST((${lcgExpr("(200000 + ((j * 2) + 2))")} % 2001) - 1000 AS BIGINT) AS v2",
          s"CAST((${lcgExpr("(20000000 + ((i * 200) + j))")} % 20001) - 10000 AS BIGINT) AS noise_micro2")
        .selectExpr("i", "j", "u1", "u2", "v1", "v2",
          "CAST(((u1 * v1) + (u2 * v2)) + noise_micro2 AS BIGINT) AS rating_micro2")
        .filter(col("i") <= 20)
        .orderBy("i", "j")
    },

    // Logistic-regression data generation (reference mllib/util/
    // LogisticRegressionDataGenerator.scala:55 — y = idx % 2, features
    // gaussian + y·eps: class-shifted Gaussians; closes the generator
    // family next to x15's linear stream and x20's k-means clusters).
    // Same no-RNG machinery as x20: per-id LCG seeds -> one Box-Muller
    // pair -> the +y·eps shift, all ONE codegen projection over the key
    // scan; the per-class recovery aggregate (counts + milli feature
    // means, which land near 0 and near eps) is the gated value, and
    // its signed sums ride the BIGINT-division seam x20 established.
    "x24_logit_datagen" -> { (s, dir) =>
      Tables.orders(s, dir)
        .selectExpr("o_orderkey AS id", "CAST(o_orderkey % 2 AS BIGINT) AS y")
        .selectExpr("id", "y", s"${lcgExpr("id")} AS p0")
        .selectExpr("id", "y", s"${lcgExpr("p0")} AS p1")
        .selectExpr("id", "y", "p1", s"${lcgExpr("p1")} AS p2")
        .selectExpr("y",
          s"CAST(round(($kgPointZ1 + (CAST(y AS DOUBLE) * CAST(3.0 AS DOUBLE))) * 1000.0) AS BIGINT) AS x1_milli",
          s"CAST(round(($kgPointZ2 + (CAST(y AS DOUBLE) * CAST(3.0 AS DOUBLE))) * 1000.0) AS BIGINT) AS x2_milli")
        .groupBy("y")
        .agg(count(lit(1)).as("n"),
          expr("CAST(sum(x1_milli) DIV count(*) AS BIGINT)").as("mean1_milli"),
          expr("CAST(sum(x2_milli) DIV count(*) AS BIGINT)").as("mean2_milli"))
        .orderBy("y")
    },

    // Log-normal data generation (reference mllib/random/RandomRDDs
    // .scala logNormalRDD + random/RandomDataGenerator.scala:126
    // LogNormalGenerator — exp of a (mean, std) gaussian; extends the
    // x15/x20/x24/x25 generator family with the heavy-tailed member).
    // Same no-RNG machinery: per-id LCG seeds -> one Box-Muller draw ->
    // exp(mu + sigma·z) at mu = 0, sigma = 0.5, micro-quantized through
    // ONE shared libm expression. Gated through the purpose: per
    // id-residue class the exact count/sum/extremes and the integer
    // mean, whose log-normal expectation exp(mu + sigma^2/2) ≈ 1.133
    // the recovered means sit on.
    "x26_lognormal_datagen" -> { (s, dir) =>
      Tables.orders(s, dir)
        .selectExpr("o_orderkey AS id")
        .selectExpr("id", s"${lcgExpr("id")} AS p0")
        .selectExpr("id", s"${lcgExpr("p0")} AS p1")
        .selectExpr("id", "p1", s"${lcgExpr("p1")} AS p2")
        .selectExpr("CAST(id % 4 AS BIGINT) AS grp",
          s"CAST(round(exp(CAST(0.0 AS DOUBLE) + (CAST(0.5 AS DOUBLE) * $kgPointZ1)) * 1000000.0) AS BIGINT) AS x_micro")
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("x_micro").as("sx"),
          min("x_micro").as("min_micro"), max("x_micro").as("max_micro"))
        .selectExpr("grp", "n", "sx", "min_micro", "max_micro",
          "CAST(sx DIV n AS BIGINT) AS mean_micro")
        .orderBy("grp")
    },

    // SVM data generation (reference mllib/util/SVMDataGenerator
    // .scala:57-69 — uniform features in [−1, 1], a fixed true weight
    // vector, label = [w·x + 0.1·gaussian ≥ 0]; the last member of the
    // util data-generator directory next to x15/x20/x24/x25/x26/x27).
    // House replica: milli features from the LCG uniform stream,
    // PLANTED weights (0.700, −0.400) declared in place of the
    // reference's seeded gaussian weights (the no-RNG rule — the
    // reference's own trueWeights are frozen by seed 94720 anyway),
    // noise = 0.1·Box-Muller in micro, margin an exact micro integer.
    // Gated through planted-weight recovery: per label, exact counts,
    // feature means (signed BIGINT division — the x20 convention) and
    // the margin sum; w1 > 0 puts mean x1 | y=1 above mean x1 | y=0,
    // w2 < 0 reverses it (ScaleSpec pins both separations + the ~50%
    // base rate of the symmetric hyperplane).
    "x28_svm_datagen" -> { (s, dir) =>
      Tables.orders(s, dir)
        .selectExpr("o_orderkey AS id")
        .selectExpr("id", s"${lcgExpr("id")} AS r0")
        .selectExpr("id", s"${lcgExpr("r0")} AS r1")
        .selectExpr("id", "r1", s"${lcgExpr("r1")} AS r2")
        .selectExpr("id", "r1", "r2", s"${lcgExpr("r2")} AS p1")
        .selectExpr("id", "r1", "r2", "p1", s"${lcgExpr("p1")} AS p2")
        .selectExpr(
          s"CAST((r1 * 2000) DIV $LcgMod AS BIGINT) - 1000 AS x1",
          s"CAST((r2 * 2000) DIV $LcgMod AS BIGINT) - 1000 AS x2",
          s"CAST(round($kgPointZ1 * 100000.0) AS BIGINT) AS nz")
        .selectExpr("x1", "x2",
          "CAST(((700 * x1) + ((-400) * x2)) + nz AS BIGINT) AS m_micro")
        .selectExpr("x1", "x2", "m_micro",
          "CAST(CASE WHEN m_micro >= 0 THEN 1 ELSE 0 END AS BIGINT) AS y")
        .groupBy("y")
        .agg(count(lit(1)).as("n"),
          sum("x1").as("s1"), sum("x2").as("s2"), sum("m_micro").as("sm"))
        .selectExpr("y", "n", "s1", "s2", "sm",
          "CAST(CAST(s1 AS BIGINT) DIV CAST(n AS BIGINT) AS BIGINT) AS mean_x1_milli",
          "CAST(CAST(s2 AS BIGINT) DIV CAST(n AS BIGINT) AS BIGINT) AS mean_x2_milli")
        .orderBy("y")
    },

    // KS test against a theoretical NORMAL CDF (reference mllib/stat/
    // test/KolmogorovSmirnovTest.scala's "norm" branch — n16 gates the
    // uniform one): the sample is a PLANTED standard gaussian (the x20
    // LCG → Box-Muller chain, milli-quantized), tested against
    // Φ((x − 0)/1) through Learn.normCdfExpr's declared
    // Abramowitz–Stegun convention. The correctly-specified null keeps
    // D small (≈ the quantization floor) — the planted-parameter
    // recovery; StatsSpec pins a mean-shifted alternative to a LARGE D.
    // Ranking is the x05 prefix-sum machinery; one scan + one bounded
    // aggregate at any scale.
    "n27_ks_normal" -> { (s, dir) =>
      val zs = Tables.orders(s, dir)
        .selectExpr("o_orderkey AS id")
        .selectExpr("id", s"${lcgExpr("id")} AS p0")
        .selectExpr("id", s"${lcgExpr("p0")} AS p1")
        .selectExpr("id", "p1", s"${lcgExpr("p1")} AS p2")
        .selectExpr("id", s"CAST(round($kgPointZ1 * 1000.0) AS BIGINT) AS y")
      graft.ext.Learn.ksNormal(zs, "id", "y", meanMilli = 0L, sdMilli = 1000L)
    },

    // Poisson + gamma data generation (reference mllib/random/
    // RandomRDDs.scala:149 poissonRDD + :260 gammaRDD — the two
    // remaining members of the distribution directory next to
    // x15/x20/x24/x25/x26). Counter-based LCG streams as ever: the
    // Poisson draw inverts a precomputed CDF threshold table at λ = 3
    // (one shared literal CASE — see poissonInvCdf's deviation note),
    // the gamma draw is the exact sum of three Exp(2) inverse-CDF
    // draws (shape 3, scale 2). Gated through planted-parameter
    // recovery per id-residue class: exact integer sums and sums of
    // squares ride the rows (mean ≈ λ = 3000 milli and ≈ kθ = 6000
    // milli; ScaleSpec re-derives the variances ≈ λ and kθ²).
    "x27_poisson_gamma_datagen" -> { (s, dir) =>
      val uP = s"(CAST(r1 AS DOUBLE) / $LcgMod.0)"
      Tables.orders(s, dir)
        .selectExpr("o_orderkey AS id")
        .selectExpr("id", s"${lcgExpr("id")} AS r0")
        .selectExpr("id", s"${lcgExpr("r0")} AS r1")
        .selectExpr("id", "r1", s"${lcgExpr("(id + 50000000)")} AS g0")
        .selectExpr("id", "r1", s"${lcgExpr("g0")} AS g1")
        .selectExpr("id", "r1", "g1", s"${lcgExpr("g1")} AS g2")
        .selectExpr("id", "r1", "g1", "g2", s"${lcgExpr("g2")} AS g3")
        .selectExpr("CAST(id % 4 AS BIGINT) AS grp",
          s"CAST(${poissonInvCdf(3.0, 12, uP)} * 1000 AS BIGINT) AS pois_milli",
          s"$gammaMilliExpr AS gamma_milli")
        .groupBy("grp")
        .agg(count(lit(1)).as("n"),
          sum("pois_milli").as("sp"),
          sum(expr("pois_milli * pois_milli")).as("spp"),
          max("pois_milli").as("max_pois_milli"),
          sum("gamma_milli").as("sg"),
          sum(expr("gamma_milli * gamma_milli")).as("sgg"),
          max("gamma_milli").as("max_gamma_milli"))
        .selectExpr("grp", "n", "sp", "spp", "max_pois_milli",
          "sg", "sgg", "max_gamma_milli",
          "CAST(sp DIV n AS BIGINT) AS pois_mean_milli",
          "CAST(sg DIV n AS BIGINT) AS gamma_mean_milli")
        .orderBy("grp")
    },

    "x20_kmeans_datagen" -> { (s, dir) =>
      Tables.orders(s, dir)
        .selectExpr("o_orderkey AS id", "CAST(o_orderkey % 5 AS BIGINT) AS cluster")
        .selectExpr("id", "cluster", s"${lcgExpr("id")} AS p0")
        .selectExpr("id", "cluster", s"${lcgExpr("p0")} AS p1")
        .selectExpr("id", "cluster", "p1", s"${lcgExpr("p1")} AS p2")
        .selectExpr("id", "cluster", "p1", "p2",
          s"${lcgExpr("(cluster + 77)")} AS c0")
        .selectExpr("id", "cluster", "p1", "p2", s"${lcgExpr("c0")} AS ca")
        .selectExpr("id", "cluster", "p1", "p2", "ca", s"${lcgExpr("ca")} AS cb")
        .selectExpr("cluster",
          s"CAST(round($kgCenter1 * 1000.0) AS BIGINT) AS c1_milli",
          s"CAST(round($kgCenter2 * 1000.0) AS BIGINT) AS c2_milli",
          s"CAST(round(($kgCenter1 + $kgPointZ1) * 1000.0) AS BIGINT) AS x1_milli",
          s"CAST(round(($kgCenter2 + $kgPointZ2) * 1000.0) AS BIGINT) AS x2_milli")
        .groupBy("cluster", "c1_milli", "c2_milli")
        .agg(count(lit(1)).as("n"),
          expr("CAST(sum(x1_milli) DIV count(*) AS BIGINT)").as("mean1_milli"),
          expr("CAST(sum(x2_milli) DIV count(*) AS BIGINT)").as("mean2_milli"))
        .orderBy("cluster")
    },

    // over all generated rows must recover (intercept, w1, w2) — those
    // betas ride every output row. Cohort id <= 50 emits the values.
    "x15_random_data" -> { (s, dir) =>
      val gen = Tables.orders(s, dir).selectExpr("o_orderkey AS id")
        .selectExpr("id", s"${lcgExpr("id")} AS r0")
        .selectExpr("id", s"${lcgExpr("r0")} AS r1")
        .selectExpr("id", "r1", s"${lcgExpr("r1")} AS r2")
        .selectExpr("id", "r1", "r2", s"${lcgExpr("r2")} AS r3")
        .selectExpr("id",
          s"CAST((r1 * 1000) DIV $LcgMod AS BIGINT) AS x1",
          s"CAST((r2 * 1000) DIV $LcgMod AS BIGINT) AS x2",
          s"CAST((r3 * 400) DIV $LcgMod AS BIGINT) - 200 AS noise",
          s"$expMilliExpr AS exp_milli")
        .selectExpr("id", "x1", "x2", "exp_milli",
          "CAST((2000 + (3 * x1)) + ((5 * x2) + noise) AS BIGINT) AS y")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      gen.count()
      val betas = graft.ext.Learn.olsFit2(gen)
        .selectExpr(Seq("b0", "b1", "b2").map(b =>
          s"CAST(round($b * 1000000.0) AS BIGINT) AS ${b}_micro"): _*)
        .localCheckpoint()
      val out = gen.filter(col("id") <= 50)
        .crossJoin(broadcast(betas))
        .select("id", "x1", "x2", "y", "exp_milli",
          "b0_micro", "b1_micro", "b2_micro")
        .orderBy("id")
      gen.unpersist()
      out
    },

    // RDD sliding windows (reference mllib/rdd/RDDFunctions.scala:40
    // sliding + rdd/SlidingRDD.scala — windows of w consecutive elements
    // in RDD order, the primitive under the KS statistic and
    // AreaUnderCurve; SlidingRDD's per-partition windows + head-of-next-
    // partition stitching IS what a frame-bounded window over an ordered
    // partition compiles to). Per event_type (the scale-sound partition
    // key — a GLOBAL RDD order is the degenerate single-partition case),
    // sliding triples over (ts, event_id) order: exact milli-unit
    // centered moving average, only full windows emitted (:46 — the
    // reference drops partial tails). Cohort event_id <= 3000.
    "x14_rdd_sliding" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
      val wc = Window.partitionBy("event_type").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .selectExpr("event_type", "ts", "event_id",
          "CAST(round(value * 1000) AS BIGINT) AS vm")
        .select(col("event_type"), col("event_id"),
          count(lit(1)).over(w).as("wn"),
          sum("vm").over(w).as("wsum"),
          row_number().over(wc).cast("long").as("pos"))
        .filter(col("wn") === 3 && col("event_id") <= 3000)
        .selectExpr("event_type", "event_id", "pos",
          "CAST(wsum DIV 3 AS BIGINT) AS avg3_milli")
        .orderBy("event_type", "pos")
    },

    // Tall-skinny SVD (reference mllib/linalg/distributed/RowMatrix
    // .scala:113 computeGramianMatrix + :210 computeSVD small-d path:
    // σ = sqrt(eig(AᵀA)), V its eigenvectors, U = A·V·Σ⁻¹ at :290 —
    // declared orientation convention on Scale.svdLevel2; the
    // TallSkinnySVD example's exact shape): the per-order
    // (n_lineitems, qty) matrix, one Gramian scan, U for o_orderkey <=
    // 2000 as a broadcast projection with Σ/V riding every row.
    "s42_tall_skinny_svd" -> { (s, dir) =>
      val feats = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("x1"),
          expr("CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)").as("x2"))
      S.tallSkinnySvd(feats, "o_orderkey", 2000L)
    },

    // Secondary sort (reference core rdd/OrderedRDDFunctions.scala:74
    // repartitionAndSortWithinPartitions — shuffle once on the key,
    // sort INSIDE the shuffle, never globally; plan shape pinned in
    // ScaleSpec: the per-customer window consumes the layout without
    // adding an Exchange or Sort): each customer's first three orders
    // by (date, key) — the per-entity ordered-history assembly pass.
    "x22_secondary_sort" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ord = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_orderstatus"))
      val sorted = S.secondarySorted(ord, "o_custkey",
        Seq("o_orderdate", "o_orderkey"))
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      sorted.withColumn("pos", row_number().over(w).cast("long"))
        .filter(col("pos") <= 3 && col("o_custkey") <= 1500)
        .selectExpr("o_custkey", "pos", "o_orderkey", "o_orderstatus")
        .orderBy("o_custkey", "pos")
    },

    // Tall-skinny QR (reference mllib/linalg/distributed/RowMatrix
    // .scala:526 tallSkinnyQR + :545 Q = A·R⁻¹ — the other tall-skinny
    // factorization next to s42's SVD; Gramian-Cholesky re-expression
    // and the positive-diagonal R convention declared on
    // Scale.tallSkinnyQr): the same per-order (n_lineitems, qty)
    // matrix, one Gramian scan, Q for o_orderkey <= 2000 as a broadcast
    // projection with R riding every row.
    "x21_tall_skinny_qr" -> { (s, dir) =>
      val feats = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("x1"),
          expr("CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)").as("x2"))
      S.tallSkinnyQr(feats, "o_orderkey", 2000L)
    },

    // Block-matrix ADD (reference BlockMatrix.scala:327 — the remaining
    // BlockMatrix public op next to x13's multiply; zero-keeping and the
    // one-side pass-through documented on Scale.blockAdd): the low-band
    // count matrix plus the high-band quantity-sum matrix over the same
    // (custkey, suppkey) grid — the quantity bands overlap on (25, 40],
    // so the both-present branch AND both one-side pass-throughs all
    // fire on real cells of the gated hash.
    "x23_block_add" -> { (s, dir) =>
      val base = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      // the cohort bound is applied to BOTH inputs, not after the add:
      // a key predicate is safe to pre-push across a FULL OUTER join by
      // hand, but Catalyst will not do it (PushPredicateThroughJoin
      // skips full outer), and the unfiltered join is cell-linear — the
      // sf1 probe read 5.4x per 10x rows before this, 1.x after
      val a = base.filter(expr("l_quantity <= 40 AND o_custkey <= 200"))
        .groupBy(col("o_custkey").as("i"), col("l_suppkey").as("j"))
        .agg(count(lit(1)).as("va"))
      val b = base.filter(expr("l_quantity > 25 AND o_custkey <= 200"))
        .groupBy(col("o_custkey").as("i"), col("l_suppkey").as("j"))
        .agg(expr("CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)").as("vb"))
      S.blockAdd(a, b, 64)
        .orderBy("i", "j")
    },

    "x13_block_matmul" -> { (s, dir) =>
      val a = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("i"), col("l_suppkey").as("k"))
        .agg(count(lit(1)).as("va"))
      val b = Tables.supplier(s, dir)
        .select(col("s_suppkey").as("k"), col("s_nationkey").as("j"),
          lit(1L).as("vb"))
      S.blockMultiply(a, b, 64)
        .filter(col("i") <= 300)
        .orderBy("i", "j")
    },

    "x12_zorder_scan" -> { (s, dir) =>
      val path = s"/tmp/graft_scale/zorder_${Dedup.dirKey(dir)}"
      val src = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), expr(priceCents).as("cents"))
      val z = S.interleavedLayout(s, src, "o_custkey", "cents", 8, path)
      z.filter(col("o_custkey") < 50 || col("cents") >= 45000000L)
        .orderBy("o_orderkey")
    },

    // CDC merge: a deterministic change feed derived from orders itself
    // (keys %11==0 delete, else %7==0 update price +1.00, plus inserts at
    // key+20000000 for %13==0) applied to the snapshot. Oracle = the same
    // set algebra in SQL; the merge must be exactly the declarative spec.
    "x08_cdc_merge" -> { (s, dir) =>
      val snap = Tables.orders(s, dir).select(col("o_orderkey"), expr(priceCents).as("cents"))
      val upd = snap.filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 11 =!= 0)
        .select(col("o_orderkey"), (col("cents") + 100).as("cents"), lit("U").as("op"))
      val del = snap.filter(col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey"), col("cents"), lit("D").as("op"))
      val ins = snap.filter(col("o_orderkey") % 13 === 0)
        .select((col("o_orderkey") + 20000000L).as("o_orderkey"),
          col("cents"), lit("I").as("op"))
      S.applyChanges(snap, upd.unionByName(del).unionByName(ins), "o_orderkey", "op")
        .orderBy("o_orderkey")
    },

    // Deterministic balanced sharding for a training-data export: global
    // index -> round-robin shard id (shard sizes differ by at most one,
    // assignment reproducible under any partitioning). In production the
    // exploded assignment feeds write.partitionBy(shard); the query rolls
    // up per-shard doc and token counts so the gate compares a compact
    // exact result.
    "x06_deterministic_shards" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), expr("size(split(text, ' '))").as("n_tokens"))
      S.globalRowIndex(d, "doc_id")
        .withColumn("shard", (col("global_index") - 1) % 8)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("long")).as("total_tokens"))
        .orderBy("shard")
    },

    // Fixed-size deterministic per-group sample: exactly 40 events per
    // event_type by md5-hash order — the eval-set construction primitive
    // (exact counts, unlike rate-based sampleBy).
    "x11_group_sample" -> { (s, dir) =>
      S.groupSample(Tables.events(s, dir), "event_type", "event_id", m = 40)
        .orderBy("grp", "pick")
    }
  )

  val oracles: Map[String, String] = Map(
    // Relational mirror: swap (i, j), group by the new row index,
    // j-ordered string_agg for the row digest, max+1 dims.
    // The window-rank formulation the bounded aggregate must be
    // indistinguishable from (ties on bal_cents resolve to the larger
    // suppkey — the reference's descending tuple order).
    "x19_topk_by_key" ->
      """WITH r AS (
        |  SELECT s_nationkey,
        |    CAST(round(s_acctbal * 100) AS BIGINT) AS bal_cents, s_suppkey,
        |    row_number() OVER (PARTITION BY s_nationkey
        |      ORDER BY CAST(round(s_acctbal * 100) AS BIGINT) DESC,
        |               s_suppkey DESC) AS rk
        |  FROM supplier)
        |SELECT s_nationkey, CAST(rk AS BIGINT) AS rk, bal_cents,
        |  CAST(s_suppkey AS BIGINT) AS s_suppkey
        |FROM r WHERE rk <= 3 ORDER BY s_nationkey, rk""".stripMargin,

    "x18_matrix_conversions" ->
      """WITH entries AS MATERIALIZED (
        |  SELECT l_suppkey AS i, CAST(l_orderkey % 50 AS BIGINT) AS j,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS v
        |  FROM lineitem GROUP BY 1, 2),
        |t AS (SELECT j AS i, i AS j, v FROM entries),
        |dims AS (SELECT CAST(max(i) + 1 AS BIGINT) AS n_rows,
        |    CAST(max(j) + 1 AS BIGINT) AS n_cols FROM t)
        |SELECT t.i, CAST(count(*) AS BIGINT) AS nnz,
        |  CAST(sum(v) AS BIGINT) AS sum_v,
        |  md5(string_agg(CAST(j AS VARCHAR) || ':' || CAST(v AS VARCHAR), ',' ORDER BY j)) AS row_md5,
        |  CAST(t.i // 8 AS BIGINT) AS row_block,
        |  d.n_rows, d.n_cols
        |FROM t CROSS JOIN dims d
        |GROUP BY t.i, d.n_rows, d.n_cols
        |ORDER BY i""".stripMargin,

    // Mirror of the generator: the same LCG chain, noise, inverse-CDF
    // exponential, and the shared OLS Cramer strings over the generated
    // stream's nine sums.
    // Same LCG chains, same Box-Muller strings, `//` for integer div.
    // The same LCG factor/sampling/noise chain; pure integer arithmetic,
    // no division anywhere.
    "x25_mf_datagen" ->
      s"""WITH ids AS (SELECT DISTINCT CAST(o_orderkey % 200 AS BIGINT) AS i,
         |    CAST((o_orderkey // 200) % 100 AS BIGINT) AS j FROM orders),
         |samp AS (SELECT i, j FROM ids WHERE ${lcgExpr("(10000000 + ((i * 200) + j))")} % 4 = 0),
         |f AS (SELECT i, j,
         |    CAST((${lcgExpr("((i * 2) + 1)")} % 2001) - 1000 AS BIGINT) AS u1,
         |    CAST((${lcgExpr("((i * 2) + 2)")} % 2001) - 1000 AS BIGINT) AS u2,
         |    CAST((${lcgExpr("(200000 + ((j * 2) + 1))")} % 2001) - 1000 AS BIGINT) AS v1,
         |    CAST((${lcgExpr("(200000 + ((j * 2) + 2))")} % 2001) - 1000 AS BIGINT) AS v2,
         |    CAST((${lcgExpr("(20000000 + ((i * 200) + j))")} % 20001) - 10000 AS BIGINT) AS noise_micro2
         |  FROM samp)
         |SELECT i, j, u1, u2, v1, v2,
         |  CAST(((u1 * v1) + (u2 * v2)) + noise_micro2 AS BIGINT) AS rating_micro2
         |FROM f WHERE i <= 20 ORDER BY i, j""".stripMargin,

    // The same LCG -> Box-Muller -> +y·eps chain; signed mean sums
    // divide on the BIGINT//BIGINT seam (truncates toward zero, matching
    // Spark's DIV — the x20 precedent).
    "x24_logit_datagen" ->
      s"""WITH ids AS (SELECT o_orderkey AS id,
         |    CAST(o_orderkey % 2 AS BIGINT) AS y FROM orders),
         |q0 AS (SELECT id, y, ${lcgExpr("id")} AS p0 FROM ids),
         |q1 AS (SELECT id, y, ${lcgExpr("p0")} AS p1 FROM q0),
         |q2 AS (SELECT id, y, p1, ${lcgExpr("p1")} AS p2 FROM q1),
         |pts AS (SELECT y,
         |    CAST(round(($kgPointZ1 + (CAST(y AS DOUBLE) * CAST(3.0 AS DOUBLE))) * 1000.0) AS BIGINT) AS x1_milli,
         |    CAST(round(($kgPointZ2 + (CAST(y AS DOUBLE) * CAST(3.0 AS DOUBLE))) * 1000.0) AS BIGINT) AS x2_milli
         |  FROM q2)
         |SELECT y, CAST(count(*) AS BIGINT) AS n,
         |  CAST(CAST(sum(x1_milli) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS mean1_milli,
         |  CAST(CAST(sum(x2_milli) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS mean2_milli
         |FROM pts GROUP BY 1 ORDER BY y""".stripMargin,

    // The same LCG -> Box-Muller -> exp chain; integer sums and the
    // BIGINT-division mean.
    "x26_lognormal_datagen" ->
      s"""WITH ids AS (SELECT o_orderkey AS id FROM orders),
         |q0 AS (SELECT id, ${lcgExpr("id")} AS p0 FROM ids),
         |q1 AS (SELECT id, ${lcgExpr("p0")} AS p1 FROM q0),
         |q2 AS (SELECT id, p1, ${lcgExpr("p1")} AS p2 FROM q1),
         |pts AS (SELECT CAST(id % 4 AS BIGINT) AS grp,
         |    CAST(round(exp(CAST(0.0 AS DOUBLE) + (CAST(0.5 AS DOUBLE) * $kgPointZ1)) * 1000000.0) AS BIGINT) AS x_micro
         |  FROM q2)
         |SELECT grp, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(x_micro) AS BIGINT) AS sx,
         |  CAST(min(x_micro) AS BIGINT) AS min_micro,
         |  CAST(max(x_micro) AS BIGINT) AS max_micro,
         |  CAST(CAST(sum(x_micro) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS mean_micro
         |FROM pts GROUP BY 1 ORDER BY grp""".stripMargin,

    // The same LCG/Box-Muller chain, planted weights, exact micro
    // margin; signed BIGINT-division means (both operands cast).
    "x28_svm_datagen" ->
      s"""WITH ids AS (SELECT o_orderkey AS id FROM orders),
         |c0 AS (SELECT id, ${lcgExpr("id")} AS r0 FROM ids),
         |c1 AS (SELECT id, ${lcgExpr("r0")} AS r1 FROM c0),
         |c2 AS (SELECT id, r1, ${lcgExpr("r1")} AS r2 FROM c1),
         |c3 AS (SELECT id, r1, r2, ${lcgExpr("r2")} AS p1 FROM c2),
         |c4 AS (SELECT id, r1, r2, p1, ${lcgExpr("p1")} AS p2 FROM c3),
         |v AS (SELECT
         |    CAST((r1 * 2000) // $LcgMod AS BIGINT) - 1000 AS x1,
         |    CAST((r2 * 2000) // $LcgMod AS BIGINT) - 1000 AS x2,
         |    CAST(round($kgPointZ1 * 100000.0) AS BIGINT) AS nz
         |  FROM c4),
         |g AS (SELECT x1, x2,
         |    CAST(((700 * x1) + ((-400) * x2)) + nz AS BIGINT) AS m_micro
         |  FROM v),
         |lab AS (SELECT x1, x2, m_micro,
         |    CAST(CASE WHEN m_micro >= 0 THEN 1 ELSE 0 END AS BIGINT) AS y
         |  FROM g)
         |SELECT y, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         |  CAST(sum(m_micro) AS BIGINT) AS sm,
         |  CAST(CAST(sum(x1) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS mean_x1_milli,
         |  CAST(CAST(sum(x2) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS mean_x2_milli
         |FROM lab GROUP BY 1 ORDER BY y""".stripMargin,

    // The x20 generator chain, then n16's ranked-sweep shape with the
    // shared A&S normal-CDF string in place of the uniform CDF.
    "n27_ks_normal" -> {
      val f = graft.ext.Learn.normCdfExpr("(CAST(y - 0 AS DOUBLE) / CAST(1000 AS DOUBLE))")
      s"""WITH ids AS (SELECT o_orderkey AS id FROM orders),
         |q0 AS (SELECT id, ${lcgExpr("id")} AS p0 FROM ids),
         |q1 AS (SELECT id, ${lcgExpr("p0")} AS p1 FROM q0),
         |q2 AS (SELECT id, p1, ${lcgExpr("p1")} AS p2 FROM q1),
         |o AS (SELECT id, CAST(round($kgPointZ1 * 1000.0) AS BIGINT) AS y FROM q2),
         |b AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM o),
         |r AS (SELECT y, CAST(row_number() OVER (ORDER BY y, id) AS BIGINT) AS gi FROM o),
         |d AS (SELECT max(greatest(
         |    CAST(round(((CAST(gi AS DOUBLE) / CAST(nn AS DOUBLE)) - $f) * 1e6) AS BIGINT),
         |    CAST(round(($f - (CAST(gi - 1 AS DOUBLE) / CAST(nn AS DOUBLE))) * 1e6) AS BIGINT))) AS d_micro
         |  FROM r CROSS JOIN b)
         |SELECT b.nn AS n, d.d_micro FROM b CROSS JOIN d""".stripMargin
    },

    // The same LCG chains, the shared Poisson threshold CASE and the
    // three-exponential gamma sum; integer sums + BIGINT-division means.
    "x27_poisson_gamma_datagen" -> {
      val uP = s"(CAST(r1 AS DOUBLE) / $LcgMod.0)"
      s"""WITH ids AS (SELECT o_orderkey AS id FROM orders),
         |c0 AS (SELECT id, ${lcgExpr("id")} AS r0 FROM ids),
         |c1 AS (SELECT id, ${lcgExpr("r0")} AS r1 FROM c0),
         |d0 AS (SELECT id, r1, ${lcgExpr("(id + 50000000)")} AS g0 FROM c1),
         |d1 AS (SELECT id, r1, ${lcgExpr("g0")} AS g1 FROM d0),
         |d2 AS (SELECT id, r1, g1, ${lcgExpr("g1")} AS g2 FROM d1),
         |d3 AS (SELECT id, r1, g1, g2, ${lcgExpr("g2")} AS g3 FROM d2),
         |pts AS (SELECT CAST(id % 4 AS BIGINT) AS grp,
         |    CAST(${poissonInvCdf(3.0, 12, uP)} * 1000 AS BIGINT) AS pois_milli,
         |    $gammaMilliExpr AS gamma_milli
         |  FROM d3)
         |SELECT grp, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(pois_milli) AS BIGINT) AS sp,
         |  CAST(sum(pois_milli * pois_milli) AS BIGINT) AS spp,
         |  CAST(max(pois_milli) AS BIGINT) AS max_pois_milli,
         |  CAST(sum(gamma_milli) AS BIGINT) AS sg,
         |  CAST(sum(gamma_milli * gamma_milli) AS BIGINT) AS sgg,
         |  CAST(max(gamma_milli) AS BIGINT) AS max_gamma_milli,
         |  CAST(CAST(sum(pois_milli) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS pois_mean_milli,
         |  CAST(CAST(sum(gamma_milli) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS gamma_mean_milli
         |FROM pts GROUP BY 1 ORDER BY grp""".stripMargin
    },

    "x20_kmeans_datagen" ->
      s"""WITH ids AS (SELECT o_orderkey AS id,
         |    CAST(o_orderkey % 5 AS BIGINT) AS cluster FROM orders),
         |q0 AS (SELECT id, cluster, ${lcgExpr("id")} AS p0 FROM ids),
         |q1 AS (SELECT id, cluster, ${lcgExpr("p0")} AS p1 FROM q0),
         |q2 AS (SELECT id, cluster, p1, ${lcgExpr("p1")} AS p2 FROM q1),
         |q3 AS (SELECT id, cluster, p1, p2, ${lcgExpr("(cluster + 77)")} AS c0 FROM q2),
         |q4 AS (SELECT id, cluster, p1, p2, ${lcgExpr("c0")} AS ca FROM q3),
         |q5 AS (SELECT id, cluster, p1, p2, ca, ${lcgExpr("ca")} AS cb FROM q4),
         |pts AS (SELECT cluster,
         |    CAST(round($kgCenter1 * 1000.0) AS BIGINT) AS c1_milli,
         |    CAST(round($kgCenter2 * 1000.0) AS BIGINT) AS c2_milli,
         |    CAST(round(($kgCenter1 + $kgPointZ1) * 1000.0) AS BIGINT) AS x1_milli,
         |    CAST(round(($kgCenter2 + $kgPointZ2) * 1000.0) AS BIGINT) AS x2_milli
         |  FROM q5)
         |SELECT cluster, c1_milli, c2_milli, CAST(count(*) AS BIGINT) AS n,
         |  CAST(CAST(sum(x1_milli) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS mean1_milli,
         |  CAST(CAST(sum(x2_milli) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS mean2_milli
         |FROM pts GROUP BY 1, 2, 3 ORDER BY cluster""".stripMargin,

    "x15_random_data" -> {
      val betaSel = graft.ext.Learn.olsBetaExprs
        .map { case (n, e) => s"CAST(round($e * 1000000.0) AS BIGINT) AS ${n}_micro" }
        .mkString(",\n    ")
      s"""WITH ids AS (SELECT o_orderkey AS id FROM orders),
         |c0 AS (SELECT id, ${lcgExpr("id")} AS r0 FROM ids),
         |c1 AS (SELECT id, ${lcgExpr("r0")} AS r1 FROM c0),
         |c2 AS (SELECT id, r1, ${lcgExpr("r1")} AS r2 FROM c1),
         |c3 AS (SELECT id, r1, r2, ${lcgExpr("r2")} AS r3 FROM c2),
         |v AS (SELECT id,
         |    CAST((r1 * 1000) // $LcgMod AS BIGINT) AS x1,
         |    CAST((r2 * 1000) // $LcgMod AS BIGINT) AS x2,
         |    CAST((r3 * 400) // $LcgMod AS BIGINT) - 200 AS noise,
         |    $expMilliExpr AS exp_milli
         |  FROM c3),
         |g AS MATERIALIZED (SELECT id, x1, x2, exp_milli,
         |    CAST((2000 + (3 * x1)) + ((5 * x2) + noise) AS BIGINT) AS y
         |  FROM v),
         |sums AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         |    CAST(sum(x1 * x1) AS BIGINT) AS s11, CAST(sum(x1 * x2) AS BIGINT) AS s12,
         |    CAST(sum(x2 * x2) AS BIGINT) AS s22, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x1 * y) AS BIGINT) AS s1y, CAST(sum(x2 * y) AS BIGINT) AS s2y
         |  FROM g),
         |betas AS (SELECT
         |    $betaSel
         |  FROM sums)
         |SELECT id, x1, x2, y, exp_milli, b0_micro, b1_micro, b2_micro
         |FROM g CROSS JOIN betas
         |WHERE id <= 50 ORDER BY id""".stripMargin
    },

    // Mirror of the sliding windows: the same frame over the same order.
    "x14_rdd_sliding" ->
      """WITH e AS (
        |  SELECT event_type, ts, event_id,
        |         CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events),
        |w AS (SELECT event_type, event_id,
        |    CAST(count(*) OVER win AS BIGINT) AS wn,
        |    CAST(sum(vm) OVER win AS BIGINT) AS wsum,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS BIGINT) AS pos
        |  FROM e
        |  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
        |                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
        |SELECT event_type, event_id, pos, CAST(wsum // 3 AS BIGINT) AS avg3_milli
        |FROM w WHERE wn = 3 AND event_id <= 3000
        |ORDER BY event_type, pos""".stripMargin,

    // The layout is result-invisible: the oracle is the plain ranked
    // formulation.
    "x22_secondary_sort" ->
      """WITH r AS (SELECT o_custkey, o_orderkey, o_orderstatus,
        |    CAST(row_number() OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS pos
        |  FROM orders)
        |SELECT o_custkey, pos, o_orderkey, o_orderstatus
        |FROM r WHERE pos <= 3 AND o_custkey <= 1500
        |ORDER BY o_custkey, pos""".stripMargin,

    // Mirror of Scale.tallSkinnyQr: the same Gramian sums, the shared
    // Cholesky formula strings layered through two CTEs, Q per row.
    "x21_tall_skinny_qr" -> {
      val l1 = S.qrLevel1.map { case (n, e) => s"$e AS $n" }.mkString(",\n    ")
      val l2 = S.qrLevel2.map { case (n, e) => s"$e AS $n" }.mkString(",\n    ")
      val q = S.qr2RowExprs.map { case (n, e) => s"$e AS $n" }.mkString(",\n  ")
      val rmicro = Seq("r11", "r12", "r22")
        .map(c => s"CAST(round($c * 1000000.0) AS BIGINT) AS ${c}_micro").mkString(",\n  ")
      s"""WITH feats AS MATERIALIZED (
         |  SELECT l_orderkey AS o_orderkey, CAST(count(*) AS BIGINT) AS x1,
         |         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS x2
         |  FROM lineitem GROUP BY 1),
         |g AS (SELECT CAST(sum(x1 * x1) AS BIGINT) AS g11,
         |             CAST(sum(x1 * x2) AS BIGINT) AS g12,
         |             CAST(sum(x2 * x2) AS BIGINT) AS g22 FROM feats),
         |e1 AS (SELECT g11, g12, g22,
         |    $l1
         |  FROM g),
         |f AS (SELECT g11, g12, g22, r11,
         |    $l2
         |  FROM e1)
         |SELECT o_orderkey AS id,
         |  $q,
         |  $rmicro
         |FROM feats CROSS JOIN f
         |WHERE o_orderkey <= 2000
         |ORDER BY id""".stripMargin
    },

    // Mirror of Scale.tallSkinnySvd: the same Gramian sums, the shared
    // eigen/σ/V formula strings layered through two CTEs, U per row.
    "s42_tall_skinny_svd" -> {
      val l1 = S.svdLevel1.map { case (n, e) => s"$e AS $n" }.mkString(",\n    ")
      val l2 = S.svdLevel2.map { case (n, e) => s"$e AS $n" }.mkString(",\n    ")
      val u = S.svd2RowExprs.map { case (n, e) => s"$e AS $n" }.mkString(",\n  ")
      val fmicro = Seq("sv1", "sv2", "v11", "v21", "v12", "v22")
        .map(c => s"CAST(round($c * 1000000.0) AS BIGINT) AS ${c}_micro").mkString(",\n  ")
      s"""WITH feats AS MATERIALIZED (
         |  SELECT l_orderkey AS o_orderkey, CAST(count(*) AS BIGINT) AS x1,
         |         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS x2
         |  FROM lineitem GROUP BY 1),
         |g AS (SELECT CAST(sum(x1 * x1) AS BIGINT) AS g11,
         |             CAST(sum(x1 * x2) AS BIGINT) AS g12,
         |             CAST(sum(x2 * x2) AS BIGINT) AS g22 FROM feats),
         |e1 AS (SELECT g11, g12, g22,
         |    $l1
         |  FROM g),
         |f AS (SELECT g11, g12, g22, lam1, lam2,
         |    $l2
         |  FROM e1)
         |SELECT o_orderkey AS id,
         |  $u,
         |  $fmicro
         |FROM feats CROSS JOIN f
         |WHERE o_orderkey <= 2000
         |ORDER BY id""".stripMargin
    },

    // Unsalted formulations: salting must be invisible in the result.
    "x01_salted_aggregate" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
        |FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "x17_accumulator_audit" ->
      """WITH v AS (SELECT CAST(round(l_quantity * 100) AS BIGINT) AS c FROM lineitem)
        |SELECT CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(sum(CASE WHEN c > 4500 THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect,
        |  CAST(sum(CASE WHEN c <= 4500 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
        |  CAST(sum(CASE WHEN c <= 4500 THEN c ELSE 0 END) AS BIGINT) AS clean_cents
        |FROM v""".stripMargin,

    "x16_tree_aggregate" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
        |  CAST(min(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS min_cents,
        |  CAST(max(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS max_cents
        |FROM lineitem""".stripMargin,

    "x02_salted_join" ->
      """SELECT s_nationkey, count(*) AS n_items,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS item_cents
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY s_nationkey""".stripMargin,

    "x03_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "x09_skew_report" ->
      """WITH c AS (SELECT l_suppkey, count(*) cnt FROM lineitem GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) n_keys, CAST(sum(cnt) AS BIGINT) n_rows,
        |    CAST(max(cnt) AS BIGINT) max_cnt,
        |    round(quantile_cont(cnt, 0.5), 4) p50_cnt,
        |    round(quantile_cont(cnt, 0.99), 4) p99_cnt
        |  FROM c),
        |t AS (SELECT l_suppkey top_key, CAST(cnt AS BIGINT) top_cnt FROM c
        |  ORDER BY cnt DESC, l_suppkey LIMIT 1)
        |SELECT n_keys, n_rows, max_cnt, p50_cnt, p99_cnt,
        |  round(max_cnt::DOUBLE * n_keys / n_rows, 4) AS skew_ratio, top_key, top_cnt
        |FROM s, t""".stripMargin,

    "x05_global_row_index" ->
      """SELECT o_orderkey,
        |  CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS global_index
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "x07_compacted_scan" ->
      """SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // Element-wise sum over the full-outer coordinate join; block ids
    // derived, zero sums kept.
    "x23_block_add" ->
      """WITH base AS MATERIALIZED (
        |  SELECT o.o_custkey, l.l_suppkey, l.l_quantity
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
        |a AS MATERIALIZED (
        |  SELECT o_custkey AS i, l_suppkey AS j, CAST(count(*) AS BIGINT) AS va
        |  FROM base WHERE l_quantity <= 40 GROUP BY 1, 2),
        |b AS MATERIALIZED (
        |  SELECT o_custkey AS i, l_suppkey AS j,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS vb
        |  FROM base WHERE l_quantity > 25 GROUP BY 1, 2)
        |SELECT CAST(i // 64 AS BIGINT) AS ib, CAST(j // 64 AS BIGINT) AS jb, i, j,
        |  CAST(coalesce(va, 0) + coalesce(vb, 0) AS BIGINT) AS v
        |FROM a FULL OUTER JOIN b USING (i, j)
        |WHERE i <= 200 ORDER BY i, j""".stripMargin,

    // The block routing must be result-transparent: the direct
    // join+group matrix product (vb = 1, so sum(va·vb) = sum(va)).
    "x13_block_matmul" ->
      """WITH a AS MATERIALIZED (
        |  SELECT o.o_custkey AS i, l.l_suppkey AS k, CAST(count(*) AS BIGINT) AS va
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1, 2)
        |SELECT CAST(a.i // 64 AS BIGINT) AS ib, CAST(b.j // 64 AS BIGINT) AS jb,
        |  a.i, b.j, CAST(sum(a.va) AS BIGINT) AS v
        |FROM a JOIN (SELECT s_suppkey AS k, s_nationkey AS j FROM supplier) b USING (k)
        |WHERE a.i <= 300
        |GROUP BY 1, 2, 3, 4 ORDER BY a.i, b.j""".stripMargin,

    // The interleaved layout must be result-transparent: plain scan SQL.
    "x12_zorder_scan" ->
      """SELECT o_orderkey, o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders
        |WHERE o_custkey < 50 OR CAST(round(o_totalprice * 100) AS BIGINT) >= 45000000
        |ORDER BY o_orderkey""".stripMargin,

    "x10_token_packing" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) cum_before
        |  FROM d)
        |SELECT doc_id, n_tokens, cum_before, cum_before // 512 AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin,

    "x08_cdc_merge" ->
      """WITH snap AS (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) cents FROM orders),
        |changes AS (
        |  SELECT o_orderkey, cents + 100 AS cents, 'U' AS op FROM snap
        |    WHERE o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0
        |  UNION ALL SELECT o_orderkey, cents, 'D' FROM snap WHERE o_orderkey % 11 = 0
        |  UNION ALL SELECT o_orderkey + 20000000, cents, 'I' FROM snap WHERE o_orderkey % 13 = 0)
        |SELECT o_orderkey, cents FROM (
        |  SELECT s.o_orderkey, s.cents FROM snap s
        |  WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM changes)
        |  UNION ALL SELECT o_orderkey, cents FROM changes WHERE op <> 'D')
        |ORDER BY o_orderkey""".stripMargin,

    "x06_deterministic_shards" ->
      """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) n_tokens,
        |    row_number() OVER (ORDER BY doc_id) rn
        |  FROM documents)
        |SELECT (rn - 1) % 8 AS shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |FROM d GROUP BY 1 ORDER BY shard""".stripMargin,

    "x11_group_sample" ->
      """SELECT grp, id, pick FROM (
        |  SELECT event_type AS grp, event_id AS id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY CAST('0x' || substr(md5('gs:' || CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT), event_id) AS INT) pick
        |  FROM events)
        |WHERE pick <= 40 ORDER BY grp, pick""".stripMargin
  )
}
