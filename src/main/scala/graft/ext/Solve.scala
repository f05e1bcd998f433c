package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General d-feature ordinary least squares (reference ml/regression/
  * LinearRegression.scala fits arbitrary-width vectors; the 2-feature
  * closed-form Cramer solve [[Learn.olsBetaExprs]] is the d = 2 slice).
  *
  * One corpus scan collects the exact integer normal-equation moments
  * (second moments DECIMAL(38,0) / HUGEINT); the (d+1)×(d+1) SPD system
  * (XᵀX)β = Xᵀy then solves by GAUSSIAN ELIMINATION WITHOUT PIVOTING —
  * valid for SPD matrices, and expressible with only +, −, ×, ÷, so
  * every generated layer is IEEE-identical across engines (the s97
  * Jacobi discipline: same expression text → same doubles, no
  * driver-side mirror to drift). d ≤ 8 bounds the 1-row state.
  *
  * Row/column 0 is the intercept. Elimination touches only columns
  * ≥ the pivot (sub-pivot entries are mathematically zero and unused —
  * recomputing them would leave (x/y)·y ulp residue for no reader).
  * Betas come out as raw doubles consumed by the rounded integer
  * prediction, the [[Learn.olsPredExpr]] convention. */
object Solve {

  private def cols(d: Int): Seq[String] =
    (for { r <- 0 to d; c <- r to d } yield s"a_${r}_$c") ++
      (0 to d).map(r => s"bb_$r")

  /** Augmented-system init from the moment columns (n, s_i, s_i_j with
    * i ≤ j, sy, s_iy): upper triangle only — the system is symmetric
    * and elimination never reads below the diagonal of untouched rows.
    * `lambda` > 0 adds n·λ to the WEIGHT diagonal (never the
    * intercept) — [[Learn.ridgeBetaExprs]]' convention generalized; at
    * λ = 0 the generated text is unchanged. */
  def initExprs(d: Int, lambda: Double = 0.0): Seq[String] = {
    def m(r: Int, c: Int): String =
      if (r == 0 && c == 0) "n"
      else if (r == 0) s"s_$c"
      else s"s_${r}_$c"
    (for { r <- 0 to d; c <- r to d } yield {
      val base = s"CAST(${m(r, c)} AS DOUBLE)"
      val cell = if (lambda != 0.0 && r == c && r >= 1)
        s"($base + (CAST($lambda AS DOUBLE) * CAST(n AS DOUBLE)))" else base
      s"$cell AS a_${r}_$c"
    }) ++
      (0 to d).map(r =>
        s"CAST(${if (r == 0) "sy" else s"s_${r}y"} AS DOUBLE) AS bb_$r")
  }

  /** One elimination layer: pivot k clears column k of every row below
    * it. Only entries (r > k, c ≥ r-triangle) change; the multiplier is
    * repeated inline — identical text, identical double. */
  def elimLayer(d: Int, k: Int): Seq[String] = {
    def mult(r: Int) = s"(a_${k}_$r / a_${k}_$k)" // a_r_k ≡ a_k_r (symmetric triangle)
    val updated = for { r <- k + 1 to d; c <- r to d } yield
      s"(a_${r}_$c - (${mult(r)} * a_${k}_$c)) AS a_${r}_$c"
    val updatedB = (k + 1 to d).map(r =>
      s"(bb_$r - (${mult(r)} * bb_$k)) AS bb_$r")
    val keepA = for { r <- 0 to d; c <- r to d; if r <= k } yield s"a_${r}_$c"
    val keepB = (0 to k).map(r => s"bb_$r")
    keepA ++ updated ++ keepB ++ updatedB
  }

  /** Back-substitution layers, one β per layer from β_d down to β_0. */
  def backLayer(d: Int, r: Int): Seq[String] = {
    val solved = (r + 1 to d).map(j => s"beta_$j")
    val dot = (r + 1 to d).map(j => s"(a_${r}_$j * beta_$j)")
      .reduceOption((a, b) => s"($a + $b)")
    val rhs = dot.map(t => s"(bb_$r - $t)").getOrElse(s"bb_$r")
    cols(d) ++ solved :+ s"($rhs / a_${r}_$r) AS beta_$r"
  }

  /** Prediction in y-units under the solved betas — rounded once, the
    * olsPredExpr convention. */
  def predExpr(d: Int): String = {
    val terms = (1 to d).map(i => s"(beta_$i * CAST(x$i AS DOUBLE))")
      .foldLeft("beta_0")((acc, t) => s"($acc + $t)")
    s"CAST(round($terms) AS BIGINT) AS predq"
  }

  /** Fit y ~ 1 + x1 + … + xd over (idCol, x1..xd, y BIGINT) and score
    * every cohort row: one moment scan, ~2(d+1) 1-row projection
    * layers, one broadcast projection scan. */
  def olsK(feats: DataFrame, d: Int, idCol: String,
           lambda: Double = 0.0): DataFrame = {
    require(d >= 1 && d <= 8, s"olsK: d = $d outside [1, 8] (driver-bounded state)")
    require(lambda >= 0.0, s"olsK: lambda $lambda must be non-negative")
    val aggs = (1 to d).map(i => sum(col(s"x$i")).as(s"s_$i")) ++
      (for { i <- 1 to d; j <- i to d }
        yield sum(expr(s"CAST(x$i * x$j AS DECIMAL(38,0))")).as(s"s_${i}_$j")) ++
      Seq(sum(col("y")).as("sy")) ++
      (1 to d).map(i => sum(expr(s"CAST(x$i * y AS DECIMAL(38,0))")).as(s"s_${i}y"))
    var st = feats.agg(count(lit(1)).as("n"), aggs: _*)
      .selectExpr(initExprs(d, lambda): _*)
    (0 until d).foreach(k => st = st.selectExpr(elimLayer(d, k): _*))
    (d to 0 by -1).foreach(r => st = st.selectExpr(backLayer(d, r): _*))
    val betas = st.selectExpr((0 to d).map(i => s"beta_$i"): _*).localCheckpoint()
    feats.crossJoin(broadcast(betas))
      .selectExpr(idCol, "y", predExpr(d))
  }

  /** WEIGHTED least squares (reference ml/optim/WeightedLeastSquares
    * .scala — the normal-equation solver LinearRegression's "normal"
    * mode actually runs; weightCol per ml/PredictorParams): identical
    * elimination over the w-weighted moments — n := Σw, s_i := Σw·x_i,
    * etc. — so WLS with an integer weight w on a row equals OLS with
    * that row repeated w times BIT-exactly (the spec's pin). Weights
    * are non-negative BIGINTs; zero-weight rows drop out of the fit but
    * still score. The non-negativity of the weight COLUMN is a caller
    * contract, not checked here (a min(w) probe would cost a scan per
    * fit); a negative weight breaks the SPD precondition the
    * pivoting-free elimination relies on. */
  def wlsK(feats: DataFrame, d: Int, idCol: String, weightCol: String,
           lambda: Double = 0.0): DataFrame = {
    require(d >= 1 && d <= 8, s"wlsK: d = $d outside [1, 8]")
    require(lambda >= 0.0, s"wlsK: lambda $lambda must be non-negative")
    val w = weightCol
    val aggs = (1 to d).map(i => sum(expr(s"$w * x$i")).as(s"s_$i")) ++
      (for { i <- 1 to d; j <- i to d }
        yield sum(expr(s"CAST(($w * x$i) AS DECIMAL(38,0)) * x$j")).as(s"s_${i}_$j")) ++
      Seq(sum(expr(s"$w * y")).as("sy")) ++
      (1 to d).map(i => sum(expr(s"CAST(($w * x$i) AS DECIMAL(38,0)) * y")).as(s"s_${i}y"))
    var st = feats.agg(sum(col(w)).as("n"), aggs: _*)
      .selectExpr(initExprs(d, lambda): _*)
    (0 until d).foreach(k => st = st.selectExpr(elimLayer(d, k): _*))
    (d to 0 by -1).foreach(r => st = st.selectExpr(backLayer(d, r): _*))
    val betas = st.selectExpr((0 to d).map(i => s"beta_$i"): _*).localCheckpoint()
    feats.crossJoin(broadcast(betas))
      .selectExpr(idCol, "y", predExpr(d))
  }

  /** DuckDB mirror of [[wlsK]]: weighted moments, same layer chain. */
  def wlsOracleSql(d: Int, idCol: String, weightCol: String,
                   featsCte: String, cohortWhere: String = "",
                   lambda: Double = 0.0): String = {
    val w = weightCol
    val moments =
      s"SELECT CAST(sum($w) AS BIGINT) AS n, " +
        (1 to d).map(i => s"CAST(sum($w * x$i) AS BIGINT) AS s_$i").mkString(", ") + ", " +
        (for { i <- 1 to d; j <- i to d }
          yield s"sum(CAST(($w * x$i) AS HUGEINT) * x$j) AS s_${i}_$j").mkString(", ") +
        s", CAST(sum($w * y) AS BIGINT) AS sy, " +
        (1 to d).map(i => s"sum(CAST(($w * x$i) AS HUGEINT) * y) AS s_${i}y").mkString(", ") +
        " FROM feats"
    val layers = scala.collection.mutable.ArrayBuffer[String]()
    layers += s"SELECT ${initExprs(d, lambda).mkString(",\n    ")} FROM moments"
    (0 until d).foreach(k => layers += s"SELECT ${elimLayer(d, k).mkString(",\n    ")}")
    (d to 0 by -1).foreach(r => layers += s"SELECT ${backLayer(d, r).mkString(",\n    ")}")
    val ctes = layers.zipWithIndex.map { case (body, idx) =>
      val from = if (idx == 0) "" else s"\n  FROM t${idx - 1}"
      s"t$idx AS MATERIALIZED ($body$from)"
    }
    val last = s"t${layers.length - 1}"
    val where = if (cohortWhere.isEmpty) "" else s"\nWHERE $cohortWhere"
    s"""WITH feats AS MATERIALIZED ($featsCte),
       |moments AS MATERIALIZED ($moments),
       |${ctes.mkString(",\n")}
       |SELECT $idCol, y, ${predExpr(d)}
       |FROM feats CROSS JOIN $last$where
       |ORDER BY $idCol""".stripMargin
  }

  /** DuckDB mirror: the same generated layers as materialized 1-row
    * CTEs over a caller-supplied feats CTE, then the projection. */
  def oracleSql(d: Int, idCol: String, featsCte: String,
                cohortWhere: String = "", lambda: Double = 0.0): String = {
    val moments =
      "SELECT CAST(count(*) AS BIGINT) AS n, " +
        (1 to d).map(i => s"CAST(sum(x$i) AS BIGINT) AS s_$i").mkString(", ") + ", " +
        (for { i <- 1 to d; j <- i to d }
          yield s"sum(CAST(x$i * x$j AS HUGEINT)) AS s_${i}_$j").mkString(", ") +
        ", CAST(sum(y) AS BIGINT) AS sy, " +
        (1 to d).map(i => s"sum(CAST(x$i * y AS HUGEINT)) AS s_${i}y").mkString(", ") +
        " FROM feats"
    val layers = scala.collection.mutable.ArrayBuffer[String]()
    layers += s"SELECT ${initExprs(d, lambda).mkString(",\n    ")} FROM moments"
    (0 until d).foreach(k => layers += s"SELECT ${elimLayer(d, k).mkString(",\n    ")}")
    (d to 0 by -1).foreach(r => layers += s"SELECT ${backLayer(d, r).mkString(",\n    ")}")
    val ctes = layers.zipWithIndex.map { case (body, idx) =>
      val from = if (idx == 0) "" else s"\n  FROM t${idx - 1}"
      s"t$idx AS MATERIALIZED ($body$from)"
    }
    val last = s"t${layers.length - 1}"
    val where = if (cohortWhere.isEmpty) "" else s"\nWHERE $cohortWhere"
    s"""WITH feats AS MATERIALIZED ($featsCte),
       |moments AS MATERIALIZED ($moments),
       |${ctes.mkString(",\n")}
       |SELECT $idCol, y, ${predExpr(d)}
       |FROM feats CROSS JOIN $last$where
       |ORDER BY $idCol""".stripMargin
  }
}
