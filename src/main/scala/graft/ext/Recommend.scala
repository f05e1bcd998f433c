package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational ALS matrix factorization — the MLlib-slice recommendation
  * workhorse done Spark-first (reference satellite:
  * mllib/src/main/scala/org/apache/spark/mllib/recommendation/ALS.scala:91
  * runs the same alternating normal-equation solves over RDD blocks;
  * the ml wrapper mllib/.../ml/recommendation/ALS.scala adds the
  * block-partitioned in/out link machinery this DataFrame shape gets from
  * Catalyst for free: each half-step is one equi-join + one
  * map-side-combined hash aggregate on the solve key).
  *
  * Deliberate deviations from MLlib's ALS, both in service of the
  * cross-engine oracle:
  *   - rank is FIXED at 2, so the per-key normal equation
  *     (YᵀY + λI)x = Yᵀr has a closed 2x2 ridge form — three exact
  *     integer sum-of-products aggregates and a Cramer solve in plain
  *     SQL expressions, no per-row LAPACK call (MLlib uses a Cholesky
  *     per key via NormalEquation, CAT-free but opaque to an oracle).
  *   - factors are QUANTIZED to integer units (2^16 per 1.0, the k-means
  *     QuantScale recipe) after every solve: all cross-partition sums are
  *     over exact integers (bit-identical under any partitioning or
  *     engine), and the one double expression per solve consumes exact
  *     BIGINT inputs in a fixed parenthesization, so DuckDB reproduces
  *     every factor bit-for-bit. A float-summing ALS would drift at 1000
  *     executors.
  *   - init is a deterministic hash of the item id, not a seeded RNG —
  *     MLlib's XORShiftRandom stream depends on block layout; a content
  *     hash does not.
  *   - λ is plain (not ALS-WR's rating-count-weighted λ); fine for the
  *     fixed-rank demo and one less per-key divisor to mirror.
  *
  * Scale shape per half-step: join ratings (u, i, r) to the other side's
  * factor table on its key, aggregate five integer sums per solve key,
  * solve in a projection. Ratings shuffle once per half-step on the solve
  * key; the factor tables are (key, 2 longs) — broadcastable when one
  * side is small (item catalogs usually are), AQE picks that up from
  * stats. Overflow headroom: |fq| stays under ~2^25 quantized units on
  * real rating scales, so a11-class sums clear 2^63 with thousands of
  * ratings per key to spare.
  */
object Recommend {

  /** Quantization scale: 2^16 integer units per 1.0 (smaller than
    * k-means' 2^20 to leave sum-of-squares headroom — see overflow note
    * above). */
  val QuantScale: Long = 1L << 16
  private val Q: Double = QuantScale.toDouble
  private val Q2: Double = Q * Q

  /** Ridge regularizer — fixed across solves and mirrored as a
    * `0.1::DOUBLE` literal in the oracle. */
  val Lambda: Double = 0.1

  /** Deterministic item-factor init in quantized units: f1 in
    * [1, 1.75] stepped by id hash (a positive "popularity" direction —
    * every item loads on it, like the all-positive first singular
    * direction of a ratings matrix), f2 SIGN-DIVERSE in
    * {-0.5, -0.25, 0, 0.25, 0.5} (the differentiating direction). An
    * earlier all-positive init put every item in a narrow cone, the
    * first user solve encoded mostly noise along the second axis, and
    * completion came out anti-correlated with the training blocks
    * (RecommendSpec's held-out check caught it); signed spread gives the
    * alternation a real second direction from round one. Engine-exact by
    * construction — no RNG. */
  def initItemFactors(ratings: DataFrame): DataFrame =
    ratings.select("i").distinct().select(col("i"),
      (lit(QuantScale) + (col("i") % 7) * lit(QuantScale / 8)).as("f1q"),
      (((col("i") % 5) - 2) * lit(QuantScale / 4)).as("f2q"))

  /** One half-step: solve every `solveKey`'s rank-2 ridge normal equation
    * against the fixed `other`-side factors. Five exact integer sums per
    * key, then the closed-form Cramer solve in ONE double expression per
    * factor (fixed parenthesization — the oracle repeats it verbatim),
    * re-quantized on the way out. */
  private def solveSide(ratings: DataFrame, other: DataFrame,
                        solveKey: String, otherKey: String): DataFrame = {
    val sums = ratings.join(other, otherKey)
      .groupBy(solveKey)
      .agg(
        sum(col("f1q") * col("f1q")).as("a11"),
        sum(col("f1q") * col("f2q")).as("a12"),
        sum(col("f2q") * col("f2q")).as("a22"),
        sum(col("r") * col("f1q")).as("b1"),
        sum(col("r") * col("f2q")).as("b2"))
    val a11 = (col("a11") / lit(Q2)) + lit(Lambda)
    val a12 = col("a12") / lit(Q2)
    val a22 = (col("a22") / lit(Q2)) + lit(Lambda)
    val b1 = col("b1") / lit(Q)
    val b2 = col("b2") / lit(Q)
    val det = (a11 * a22) - (a12 * a12)
    def quant(x: Column): Column = round(x * lit(Q)).cast("long")
    sums.select(col(solveKey),
      quant(((a22 * b1) - (a12 * b2)) / det).as("f1q"),
      quant(((a11 * b2) - (a12 * b1)) / det).as("f2q"))
  }

  /** `iters` full ALS rounds (item-init, then per round: solve users
    * against items, solve items against the fresh users) over a
    * (u, i, r) ratings table with integer ratings. Returns the final
    * (users(u, f1q, f2q), items(i, f1q, f2q)) factor tables, each
    * generation localCheckpointed so plan depth stays constant across
    * rounds (the pregel discipline). */
  def als(ratings: DataFrame, iters: Int = 2): (DataFrame, DataFrame) = {
    val r = ratings.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    r.count() // materialize once; four half-steps re-read it
    var items = initItemFactors(r).localCheckpoint()
    var users: DataFrame = null
    for (_ <- 1 to iters) {
      users = solveSide(r, items, "u", "i").localCheckpoint()
      items = solveSide(r, users, "i", "u").localCheckpoint()
    }
    r.unpersist()
    (users, items)
  }

  /** Top-1 unrated item per user under the factor model: score every
    * (user, candidate) pair with the EXACT integer dot product
    * f1q·g1q + f2q·g2q (scale 2^32 — no float argmax, no tie drift;
    * ties break to the smallest item id), excluding already-rated pairs.
    * The item factor table is broadcast — (i, 2 longs) rows stay tiny for
    * realistic catalogs; a billion-item catalog would swap this for the
    * ANN index path (s02-s04). Returns (u, rec_item, score_q). */
  def recommendTop1(ratings: DataFrame, users: DataFrame,
                    items: DataFrame): DataFrame = {
    val cands = users.crossJoin(broadcast(
        items.select(col("i"), col("f1q").as("g1q"), col("f2q").as("g2q"))))
      .join(ratings.select("u", "i"), Seq("u", "i"), "left_anti")
      .select(col("u"), col("i"),
        (col("f1q") * col("g1q") + col("f2q") * col("g2q")).as("score_q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("score_q").desc, col("i"))
    cands.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("u"), col("i").as("rec_item"), col("score_q"))
  }
}
