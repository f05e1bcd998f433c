package graft

import graft.ext.Pca
import org.apache.spark.sql.functions._

/** The Jacobi eigensolve beyond the oracle mirror: pinned against
  * mllib's own computePrincipalComponentsAndExplainedVariance (the free
  * second oracle on /opt/spark/jars), planted-direction recovery, and
  * layout determinism. */
class PcaSpec extends SparkSpec {

  // deterministic 4-feature fixture: x1/x2 share a dominant direction,
  // x3 adds independent spread, x4 is small-range noise
  private def fixture = {
    import spark.implicits._
    (1L to 300L).map { i =>
      val t = (i % 37) - 18L
      (t * 3 + (i % 5), t * 2 - (i % 7), (i * i) % 23, (i * 11) % 6)
    }.toDF("x1", "x2", "x3", "x4")
  }

  test("pcaK matches mllib computePrincipalComponents on all 4 components") {
    import org.apache.spark.mllib.linalg.{Vectors => MlV}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val got = Pca.pcaK(fixture, d = 4, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val rows = fixture.collect()
      .map(r => MlV.dense(Array(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        .map(_.toDouble)))
    val (pcs, evr) = new RowMatrix(spark.sparkContext.parallelize(rows.toSeq, 4))
      .computePrincipalComponentsAndExplainedVariance(4)
    for (r <- 1 to 4) {
      val ours = (1 to 4).map(i => got((r.toLong, i.toLong))._1 / 1e6)
      val ml = (0 until 4).map(i => pcs(i, r - 1))
      // eigenvector sign is arbitrary: compare |cosine| of the columns
      val dot = math.abs(ours.zip(ml).map { case (a, b) => a * b }.sum)
      val nn = math.sqrt(ours.map(x => x * x).sum) * math.sqrt(ml.map(x => x * x).sum)
      assert(dot / nn > 0.9999, s"pc$r loadings: ours $ours vs mllib $ml")
      val evrOurs = got((r.toLong, 1L))._2 / 1e6
      assert(math.abs(evrOurs - evr(r - 1)) < 1e-4,
        s"pc$r evr $evrOurs vs mllib ${evr(r - 1)}")
    }
    // sign convention: largest-|coordinate| loading is positive
    for (r <- 1 to 4) {
      val col = (1 to 4).map(i => got((r.toLong, i.toLong))._1)
      assert(col.maxBy(math.abs) >= 0, s"pc$r sign: $col")
    }
  }

  test("pcaK recovers a planted dominant direction at d = 3") {
    import spark.implicits._
    // x = t*(3, -4, 0) + tiny independent jitter: pc1 must align with
    // (0.6, -0.8, 0) and carry nearly all the variance
    val df = (1L to 240L).map { i =>
      val t = (i % 25) - 12L
      (t * 30 + (i % 3), t * -40 + ((i * 7) % 3), (i * 13) % 3)
    }.toDF("x1", "x2", "x3")
    val got = Pca.pcaK(df, d = 3, k = 1).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    val v = (1 to 3).map(i => got(i.toLong)._1 / 1e6)
    assert(math.abs(math.abs(v(0)) - 0.6) < 0.01, s"pc1 = $v")
    assert(math.abs(math.abs(v(1)) - 0.8) < 0.01, s"pc1 = $v")
    assert(math.abs(v(2)) < 0.02, s"pc1 = $v")
    assert(v(0) * v(1) < 0, s"opposite signs preserved: $v")
    assert(got(1L)._2 > 990000L, "pc1 carries ~ all variance")
  }

  test("pcaProject: scores equal the centered dot with the fitted loadings") {
    import spark.implicits._
    val df = (1L to 240L).map { i =>
      val t = (i % 25) - 12L
      (i, t * 30 + (i % 3), t * -40 + ((i * 7) % 3), (i * 13) % 3)
    }.toDF("rid", "x1", "x2", "x3")
    val load = Pca.pcaK(df.select("x1", "x2", "x3"), d = 3, k = 1).collect()
      .map(r => r.getLong(1) -> r.getLong(2) / 1e6).toMap
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (m1, m2, m3) = (rows.map(_._2).sum / 240.0, rows.map(_._3).sum / 240.0,
      rows.map(_._4).sum / 240.0)
    val got = Pca.pcaProject(df, d = 3, k = 1, idCol = "rid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, x1, x2, x3) =>
      val want = ((x1 - m1) * load(1L) + (x2 - m2) * load(2L) + (x3 - m3) * load(3L)) * 1000
      // the spec recomputes with the MICRO-rounded loadings; centered
      // coordinates are ~1e3, so the drift bound is ~d*1e3*0.5e-6*1e3
      assert(math.abs(got(id) - want) <= 3000, s"row $id: ${got(id)} vs $want")
    }
    // layout determinism
    val again = Pca.pcaProject(df.repartition(7, col("x3")), d = 3, k = 1, idCol = "rid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === got)
  }

  test("Jacobi invariants hold on randomized moment sets (eigen residual, orthonormality, evr sum)") {
    import spark.implicits._
    for ((seed, d) <- Seq((11, 3), (23, 4), (47, 5))) {
      val rows = (1L to 150L).map { i =>
        Tuple1((1 to d).map(j => ((i * (seed + j * 7)) % 19) - 9L))
      }.map(_._1)
      val df = rows.map {
        case s3 if d == 3 => (s3(0), s3(1), s3(2), 0L, 0L)
        case s4 if d == 4 => (s4(0), s4(1), s4(2), s4(3), 0L)
        case s5 => (s5(0), s5(1), s5(2), s5(3), s5(4))
      }.toDF("x1", "x2", "x3", "x4", "x5")
        .selectExpr((1 to d).map(i => s"x$i"): _*)
      val out = Pca.pcaK(df, d = d, k = d).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2) / 1e6, r.getLong(3) / 1e6))
        .toMap
      // rebuild the scaled scatter matrix M = n*S - s s' driver-side
      val n = rows.length.toDouble
      val s1 = (0 until d).map(j => rows.map(_(j)).sum.toDouble)
      val m = Array.tabulate(d, d) { (a, b) =>
        n * rows.map(r => r(a) * r(b)).sum - s1(a) * s1(b)
      }
      val trace = (0 until d).map(j => m(j)(j)).sum
      val evrSum = (1 to d).map(r => out((r.toLong, 1L))._2).sum
      assert(math.abs(evrSum - 1.0) < 1e-4, s"seed $seed evr sum $evrSum")
      for (r <- 1 to d) {
        val v = (0 until d).map(j => out((r.toLong, (j + 1).toLong))._1)
        val lam = out((r.toLong, 1L))._2 * trace
        // unit norm (micro-rounded loadings)
        assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-3, s"seed $seed pc$r norm")
        // eigen residual ||Mv - lam v|| small relative to ||Mv||
        val mv = (0 until d).map(a => (0 until d).map(b => m(a)(b) * v(b)).sum)
        val res = math.sqrt(mv.zip(v).map { case (x, y) => (x - lam * y) * (x - lam * y) }.sum)
        val scale = math.sqrt(mv.map(x => x * x).sum) + 1e-12
        assert(res / scale < 1e-3, s"seed $seed pc$r residual ${res / scale}")
        // pairwise orthogonality
        for (r2 <- r + 1 to d) {
          val v2 = (0 until d).map(j => out((r2.toLong, (j + 1).toLong))._1)
          assert(math.abs(v.zip(v2).map { case (a, b) => a * b }.sum) < 1e-3,
            s"seed $seed pc$r . pc$r2")
        }
      }
    }
  }

  test("pcaK is deterministic across partitionings and guards its bounds") {
    val a = Pca.pcaK(fixture.repartition(1), 4, 2).orderBy("pc", "dim").collect()
    val b = Pca.pcaK(fixture.repartition(13, col("x3")), 4, 2)
      .orderBy("pc", "dim").collect()
    assert(a.toSeq === b.toSeq)
    intercept[IllegalArgumentException](Pca.pcaK(fixture, d = 9, k = 2))
    intercept[IllegalArgumentException](Pca.pcaK(fixture, d = 4, k = 5))
  }
}
