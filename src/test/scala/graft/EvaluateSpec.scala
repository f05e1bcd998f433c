package graft

import graft.ext.Evaluate
import org.apache.spark.sql.functions._

/** Hand-checked fixtures for the evaluation-metrics family (s28–s31):
  * tie-aware AUC against the Mann-Whitney half-credit value, regression
  * metrics against pencil-and-paper sums, ranking metrics against the
  * textbook AP/NDCG arithmetic, multilabel metrics against a two-row
  * contingency, plus partitioning determinism. */
class EvaluateSpec extends SparkSpec {

  test("binary metrics: tie-aware trapezoid AUC equals the rank statistic") {
    import spark.implicits._
    // pos scores {3,2}, neg {3,1}: pairwise credit 0.5+1+0+1 = 2.5 of 4
    // -> AUC 0.625; the score-3 tie group exercises the half-credit path.
    val scored = Seq((3L, 1L), (3L, 0L), (2L, 1L), (1L, 0L)).toDF("score", "label")
    val rows = Evaluate.binaryMetrics(scored).orderBy(col("thr").desc).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(3L, 2L, 1L))
    assert(rows.forall(_.getLong(6) === 625000L))
    val r3 = rows(0) // thr=3: tp=1 fp=1 -> precision/recall/fpr all 0.5
    assert((r3.getLong(1), r3.getLong(2)) === ((1L, 1L)))
    assert((r3.getLong(3), r3.getLong(4), r3.getLong(5)) === ((500000L, 500000L, 500000L)))
    val r1 = rows(2) // thr=1: everything predicted positive
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(4)) === ((2L, 2L, 1000000L)))
  }

  test("binaryMetrics exact path carries no single-partition Exchange or global Sort") {
    import spark.implicits._
    // the r19-verdict item: the cumulative sweep must be the x05
    // range-repartition + broadcast-offset prefix sum, never a
    // Window.orderBy over SinglePartition — assert on the live plan
    val scored = (1L to 200L).map(i => (i % 41, i % 2)).toDF("score", "label")
    // inspect the sweep stage itself (the final 1-row AUC aggregate
    // legitimately single-partitions a handful of rows): the cumulative
    // window must be partitioned by __pid over a range exchange, never
    // an Exchange SinglePartition feeding a global Window sort
    val g = scored.groupBy(col("score").as("thr"))
      .agg(count(lit(1)).as("n"), sum("label").as("np"))
    val plan = Evaluate.cumCurve(g, materialize = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"sweep must not collapse to one partition:\n$plan")
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"),
      s"sweep must range-repartition on the threshold:\n$plan")
    // and the result is intact
    assert(Evaluate.binaryMetrics(scored).collect().length === 41)
  }

  test("binary metrics are deterministic across partitionings") {
    import spark.implicits._
    val scored = (1L to 500L).map(i => (i % 37, (i * 7 % 11) % 2)).toDF("score", "label")
    val a = Evaluate.binaryMetrics(scored.repartition(1)).orderBy("thr").collect()
    val b = Evaluate.binaryMetrics(scored.repartition(13, col("label"))).orderBy("thr").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("regression metrics match pencil-and-paper sums") {
    import spark.implicits._
    // e = (-2, 0, 4): sae 6, sse 20; sst = 200 -> R2 = 0.9
    val preds = Seq((10L, 12L), (20L, 20L), (30L, 26L)).toDF("y", "predq")
    val r = Evaluate.regressionMetrics(preds, "y", "predq").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 6L, 20L)))
    assert(r.getLong(3) === 2000L)                       // mae_milli
    assert(r.getLong(4) === 6666L)                       // mse_milli (floor)
    assert(r.getLong(5) === math.round(math.sqrt(20.0 / 3.0) * 1000.0)) // 2582
    assert(r.getLong(6) === 900000L)                     // r2_micro
    // explainedVariance = var of preds around ybar = mean(y) = 20:
    // ((12-20)^2 + 0 + (26-20)^2)/3 = 100/3 -> 33333 milli
    assert(r.getLong(7) === 33333L)
    // cross-check the formula against mllib RegressionMetrics itself
    val mllib = new org.apache.spark.mllib.evaluation.RegressionMetrics(
      spark.sparkContext.parallelize(Seq((12.0, 10.0), (20.0, 20.0), (26.0, 30.0))))
    assert(math.abs(r.getLong(7) - mllib.explainedVariance * 1000.0) <= 1.0)
  }

  test("ranking metrics: AP and NDCG on a single-key fixture") {
    import spark.implicits._
    val pred = Seq(("u", "a", 1L), ("u", "b", 2L), ("u", "c", 3L),
      ("u", "d", 4L), ("u", "e", 5L)).toDF("key", "item", "rnk")
    val rel = Seq(("u", "a"), ("u", "c"), ("u", "f"), ("u", "g")).toDF("key", "item")
    val r = Evaluate.rankingMetrics(pred, rel, 5).head()
    def disc(k: Long) = math.round(1e6 / (math.log(k + 1.0) / math.log(2.0)))
    assert((r.getLong(1), r.getLong(2)) === ((4L, 2L)))  // n_rel, hits at ranks 1 and 3
    assert(r.getLong(3) === 400000L)                     // P@5 = 2/5
    assert(r.getLong(4) === (1000000L + 2000000L / 3L) / 4L) // AP = (1/1 + 2/3)/4 floored
    val idcg = (1L to 4L).map(disc).sum                  // min(|rel|, 5) = 4 ideal slots
    assert(r.getLong(5) === (disc(1) + disc(3)) * 1000000L / idcg)
  }

  test("multilabel metrics on a two-row contingency") {
    import spark.implicits._
    // key 1: actual {A,B} pred {A}; key 2: actual {C} pred {C}
    val cells = Seq(
      (1L, "A", 1L, 1L), (1L, "B", 1L, 0L), (1L, "C", 0L, 0L),
      (2L, "A", 0L, 0L), (2L, "B", 0L, 0L), (2L, "C", 1L, 1L)
    ).toDF("key", "label", "in_actual", "in_pred")
    val r = Evaluate.multilabelMetrics(cells, 3).head()
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 500000L)  // subset accuracy: key 2 only
    assert(r.getLong(2) === 166666L)  // hamming: 1 mismatch of 6 cells
    assert(r.getLong(3) === 750000L)  // mean IoU: (1/2 + 1)/2
    assert(r.getLong(4) === 1000000L) // micro precision: 2/2
    assert(r.getLong(5) === 666666L)  // micro recall: 2/3
    assert(r.getLong(6) === 800000L)  // micro F1: 4/5
  }

  test("binaryMetrics numBins: equal-count chunks, first-score representative, small-curve no-op") {
    import spark.implicits._
    // 10 distinct scores 1..10, one row each, label = 1 for score > 5
    val scored = (1L to 10L).map(i => (i, if (i > 5) 1L else 0L)).toDF("score", "label")
    val exact = graft.ext.Evaluate.binaryMetrics(scored).collect()
    assert(exact.length === 10)
    // numBins = 5 -> grouping = 2: descending chunks {10,9},{8,7},... each
    // carrying its FIRST (max) score and both rows' counts
    val binned = graft.ext.Evaluate.binaryMetrics(scored, numBins = 5)
      .orderBy(col("thr").desc).collect()
    assert(binned.map(_.getLong(0)).toSeq === Seq(10L, 8L, 6L, 4L, 2L))
    assert(binned.map(_.getLong(1)).toSeq === Seq(2L, 4L, 5L, 5L, 5L)) // cumulative tp
    // the {6,5} chunk straddles the class boundary: the binned trapezoid
    // pays exactly that half-credit — 2·area·P·N = 1·(4+5) + 2·10 + 2·10
    assert(binned.head.getLong(6) === 980000L)
    // grouping < 2 (numBins more than half the curve) leaves the curve exact
    val noop = graft.ext.Evaluate.binaryMetrics(scored, numBins = 6).collect()
    assert(noop.length === 10)
  }

  test("rankingMeans matches mllib RankingMetrics' aggregate values") {
    import spark.implicits._
    val pred = Seq(("u", "a", 1L), ("u", "b", 2L), ("u", "c", 3L),
      ("u", "d", 4L), ("u", "e", 5L),
      ("v", "a", 1L), ("v", "f", 2L), ("v", "g", 3L), ("v", "h", 4L), ("v", "b", 5L))
      .toDF("key", "item", "rnk")
    val rel = Seq(("u", "a"), ("u", "c"), ("u", "f"), ("u", "g"),
      ("v", "f"), ("v", "b")).toDF("key", "item")
    val got = graft.ext.Evaluate.rankingMeans(pred, rel, 5).head()
    val m = new org.apache.spark.mllib.evaluation.RankingMetrics(
      spark.sparkContext.parallelize(Seq(
        (Array("a", "b", "c", "d", "e"), Array("a", "c", "f", "g")),
        (Array("a", "f", "g", "h", "b"), Array("f", "b")))))
    assert(got.getLong(0) === 2L)
    assert(math.abs(got.getLong(1) - m.precisionAt(5) * 1e6) <= 2)
    assert(math.abs(got.getLong(2) - m.meanAveragePrecision * 1e6) <= 2)
    assert(math.abs(got.getLong(3) - m.ndcgAt(5) * 1e6) <= 2)
  }

  test("prMetrics matches mllib areaUnderPR and pins the (0, 1) curve start") {
    import spark.implicits._
    // imperfect ranking so the PR curve is non-trivial
    val data = Seq((10L, 1L), (9L, 0L), (8L, 1L), (7L, 1L), (6L, 0L),
      (5L, 1L), (4L, 0L), (3L, 0L), (2L, 1L), (1L, 0L))
    val df = data.toDF("score", "label")
    val got = graft.ext.Evaluate.prMetrics(df).orderBy(col("thr").desc).collect()
    assert(got.length === 10)
    val prauc = got.head.getAs[Long]("pr_auc_micro")
    val mllibAuc = new org.apache.spark.mllib.evaluation.BinaryClassificationMetrics(
      spark.sparkContext.parallelize(data.map { case (s, l) => (s.toDouble, l.toDouble) }))
      .areaUnderPR()
    // per-point micro rounding bounds the difference by 5e-7 * points
    assert(math.abs(prauc - mllibAuc * 1e6) <= 10,
      s"pr_auc_micro $prauc vs mllib ${mllibAuc * 1e6}")
    // exact-integer F1/F2 at the full-recall end: tp=5, fp=5, pos=5
    // (F2 = 5tp/(tp+fp+4P) = 25e6/30; mllib fMeasureByThreshold(2.0)
    // at the lowest threshold agrees: p=0.5, r=1 -> 2.5/3)
    val last = got.last
    assert(last.getAs[Long]("f1_micro") === (5L * 2000000L) / 15L)
    assert(last.getAs[Long]("f2_micro") === (5L * 5000000L) / 30L)
    // a perfect ranking integrates to exactly 1.0 (the (0,1) start
    // joins the all-precision-1 staircase seamlessly)
    val perfect = (1L to 10L).map(i => (i, if (i > 5) 1L else 0L)).toDF("score", "label")
    assert(graft.ext.Evaluate.prMetrics(perfect).head()
      .getAs[Long]("pr_auc_micro") === 1000000L)
  }

  test("a continuous 2M-distinct-score table runs the exact path AND the binned path") {
    import spark.implicits._
    // the old exact-path cap is gone: 2M+ distinct scores flow through
    // the partition-parallel sweep directly...
    val wide = spark.range(1, 2000002)
      .selectExpr("id AS score", "CAST(id % 2 AS BIGINT) AS label")
    val exact = graft.ext.Evaluate.binaryMetrics(wide, numBins = 0)
    assert(exact.count() === 2000001L)
    // ...and the reference's numBins downsampling still works on top
    val ok = graft.ext.Evaluate.binaryMetrics(wide, numBins = 20)
      .orderBy(col("thr").desc).collect()
    assert(ok.length === 21)
  }
}
