package graft

import graft.ext.Recommend
import org.apache.spark.sql.functions._

/** ALS parity/property fixture (the ClusteringSpec discipline): a
  * two-block rating matrix — users {1,2,5} love items {10,11,12}, users
  * {3,4} love {20,21,22}, with one low cross-block rating per user so
  * the blocks stay connected and every user has a held-out IN-BLOCK item
  * the model must complete. The exact-parity test re-derives the first
  * solve's factors with driver-side arithmetic, pinning the quantized
  * normal-equation math bit-for-bit. */
class RecommendSpec extends SparkSpec {

  private def ratings = {
    import spark.implicits._
    Seq(
      (1L, 10L, 5L), (1L, 11L, 5L), (1L, 20L, 1L),
      (2L, 10L, 5L), (2L, 12L, 5L), (2L, 21L, 1L),
      (3L, 20L, 5L), (3L, 21L, 5L), (3L, 10L, 1L),
      (4L, 21L, 5L), (4L, 22L, 5L), (4L, 11L, 1L),
      (5L, 11L, 5L), (5L, 12L, 5L), (5L, 22L, 1L)
    ).toDF("u", "i", "r")
  }

  test("als completes every user's held-out in-block item as the top recommendation") {
    val (users, items) = Recommend.als(ratings, iters = 4)
    val rec = Recommend.recommendTop1(ratings, users, items)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each user's unrated block partner must beat all cross-block items
    assert(rec === Map(1L -> 12L, 2L -> 11L, 3L -> 22L, 4L -> 20L, 5L -> 10L),
      s"in-block completion failed: $rec")
  }

  test("first user solve matches a driver-side re-derivation exactly (quantized parity)") {
    val Q = Recommend.QuantScale.toDouble
    val lam = Recommend.Lambda
    // init factors exactly as initItemFactors does
    def init(i: Long): (Long, Long) =
      (Recommend.QuantScale + (i % 7) * (Recommend.QuantScale / 8),
        ((i % 5) - 2) * (Recommend.QuantScale / 4))
    val byUser = ratings.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val expected = byUser.map { case (u, rs) =>
      var (a11, a12, a22, b1, b2) = (0L, 0L, 0L, 0L, 0L)
      rs.foreach { case (_, i, r) =>
        val (y1, y2) = init(i)
        a11 += y1 * y1; a12 += y1 * y2; a22 += y2 * y2
        b1 += r * y1; b2 += r * y2
      }
      val (va11, va12, va22) = (a11 / (Q * Q) + lam, a12 / (Q * Q), a22 / (Q * Q) + lam)
      val (vb1, vb2) = (b1 / Q, b2 / Q)
      val det = (va11 * va22) - (va12 * va12)
      def quant(x: Double): Long = java.math.BigDecimal.valueOf(x * Q)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      u -> (quant(((va22 * vb1) - (va12 * vb2)) / det),
        quant(((va11 * vb2) - (va12 * vb1)) / det))
    }
    val (users, _) = Recommend.als(ratings, iters = 1)
    // iters=1 runs user-solve(init items) then item-solve; users is the
    // first half-step's output, directly comparable
    val got = users.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
  }

  test("als factors are deterministic across partitionings") {
    val (u1, i1) = Recommend.als(ratings.repartition(1), iters = 2)
    val (u7, i7) = Recommend.als(ratings.repartition(7, col("i")), iters = 2)
    assert(u1.orderBy("u").collect().toSeq === u7.orderBy("u").collect().toSeq)
    assert(i1.orderBy("i").collect().toSeq === i7.orderBy("i").collect().toSeq)
  }

  test("recommendTop1 never surfaces an already-rated pair") {
    val (users, items) = Recommend.als(ratings, iters = 2)
    val rated = ratings.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Recommend.recommendTop1(ratings, users, items).collect().foreach { r =>
      assert(!rated.contains((r.getLong(0), r.getLong(1))))
    }
  }

  test("alternating solves reduce reconstruction error on the training set") {
    val (u1, i1) = Recommend.als(ratings, iters = 1)
    val (u2, i2) = Recommend.als(ratings, iters = 2)
    def sse(users: org.apache.spark.sql.DataFrame,
            items: org.apache.spark.sql.DataFrame): Double = {
      val q2 = (Recommend.QuantScale * Recommend.QuantScale).toDouble
      ratings
        .join(users.select(col("u"), col("f1q").as("x1"), col("f2q").as("x2")), "u")
        .join(items.select(col("i"), col("f1q").as("y1"), col("f2q").as("y2")), "i")
        .select(pow(col("r") - (col("x1") * col("y1") + col("x2") * col("y2")) / lit(q2), 2).as("e"))
        .agg(sum("e")).head().getDouble(0)
    }
    assert(sse(u2, i2) <= sse(u1, i1) + 1e-6,
      "a further ALS round must not worsen training fit")
  }
}
