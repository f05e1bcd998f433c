package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General k-dimensional PCA (reference mllib/linalg/distributed/
  * RowMatrix.scala:385 `computePrincipalComponents` — covariance Gramian,
  * driver-side eigendecomposition, top-k columns out; s21's closed-form
  * 2-feature PCA is the d = 2 special case).
  *
  * The reference collects the d×d covariance and calls Breeze's LAPACK
  * eigensolver. Here the eigensolve is a FIXED-ORDER cyclic Jacobi sweep
  * (the classic symmetric-eigenvalue iteration) expressed as generated
  * SQL projection layers over a 1-row matrix state — the same discipline
  * as x21's closed-form Cholesky, generalized: every rotation uses only
  * +, −, ×, ÷, sqrt and abs, all IEEE-correctly-rounded in every engine,
  * so the identical expression TEXT evaluates to the identical doubles in
  * Spark and DuckDB — no libm trig seam, no driver-side mirror to drift.
  * (The rotation uses the t = sign(τ)/(|τ|+√(1+τ²)) form precisely
  * because it needs no atan/cos/sin.)
  *
  * Scale shape: ONE corpus scan for the exact integer moments (second
  * moments as DECIMAL(38,0) / HUGEINT — BIGINT Σx² would overflow at
  * 100 TB), then everything runs on a 1-row frame: d ≤ 8 guard bounds
  * the state at 2·d² ≤ 128 doubles, the x20/centers-collect convention.
  *
  * Conventions (declared like x21's Cholesky):
  *   - the eigensolved matrix is n·S − ssᵀ (n × the centered scatter) —
  *     a positive multiple of the covariance, so eigenVECTORS and
  *     explained-variance RATIOS equal the reference's exactly;
  *   - `sweeps` is FIXED (default 6), not residual-tested: cyclic Jacobi
  *     on d ≤ 8 converges quadratically and the gate pins the result;
  *   - component sign: the coordinate of largest absolute value is made
  *     positive (ties to the lowest index) — eigenvector sign is
  *     arbitrary in the reference too;
  *   - eigenvalue order: descending, ties to the lower original index.
  *
  * Output: k·d rows (pc, dim, loading_micro, evr_micro). */
object Pca {

  /** The 2·d² state columns: the symmetric matrix a_i_j being
    * diagonalized and the accumulated rotation matrix v_i_j. */
  def stateCols(d: Int): Seq[String] =
    (for { i <- 1 to d; j <- 1 to d } yield s"a_${i}_$j") ++
      (for { i <- 1 to d; j <- 1 to d } yield s"v_${i}_$j")

  /** Initial state from the integer moment columns (n, s_i, s_i_j with
    * i ≤ j): a = n·S − ssᵀ as doubles, v = identity. */
  def initExprs(d: Int): Seq[String] = {
    def sij(i: Int, j: Int) = if (i <= j) s"s_${i}_$j" else s"s_${j}_$i"
    (for { i <- 1 to d; j <- 1 to d } yield
      s"((CAST(n AS DOUBLE) * CAST(${sij(i, j)} AS DOUBLE)) - (CAST(s_$i AS DOUBLE) * CAST(s_$j AS DOUBLE))) AS a_${i}_$j") ++
      (for { i <- 1 to d; j <- 1 to d } yield
        s"CAST(${if (i == j) "1.0" else "0.0"} AS DOUBLE) AS v_${i}_$j")
  }

  /** The projection layers of one Jacobi rotation on pivot (p, q):
    * τ, then t, then (c, s), then the matrix/basis update. A zero pivot
    * makes τ = t = 0 → c = 1, s = 0, so every update is the identity —
    * no separate skip branch. Symmetric entries are written with the
    * IDENTICAL expression text so the matrix stays exactly symmetric. */
  def rotationLayers(d: Int, p: Int, q: Int): Seq[Seq[String]] = {
    val keep = stateCols(d)
    val l1 = keep :+
      s"CASE WHEN a_${p}_$q = 0.0 THEN 0.0 ELSE (a_${q}_$q - a_${p}_$p) / (2.0 * a_${p}_$q) END AS tau"
    val l2 = keep :+
      s"CASE WHEN a_${p}_$q = 0.0 THEN 0.0 ELSE (CASE WHEN tau >= 0.0 THEN 1.0 ELSE -1.0 END) / (abs(tau) + sqrt(1.0 + (tau * tau))) END AS tt"
    val l3 = keep ++ Seq("tt",
      "1.0 / sqrt((tt * tt) + 1.0) AS cc",
      "tt * (1.0 / sqrt((tt * tt) + 1.0)) AS ss")
    def newA(i: Int, j: Int): String =
      if (i == p && j == p) s"(a_${p}_$p - (tt * a_${p}_$q))"
      else if (i == q && j == q) s"(a_${q}_$q + (tt * a_${p}_$q))"
      else if ((i == p && j == q) || (i == q && j == p)) "CAST(0.0 AS DOUBLE)"
      else if (j == p && i != p && i != q) s"((cc * a_${i}_$p) - (ss * a_${i}_$q))"
      else if (j == q && i != p && i != q) s"((ss * a_${i}_$p) + (cc * a_${i}_$q))"
      else if (i == p) s"((cc * a_${j}_$p) - (ss * a_${j}_$q))" // = new a_j_p
      else if (i == q) s"((ss * a_${j}_$p) + (cc * a_${j}_$q))" // = new a_j_q
      else s"a_${i}_$j"
    def newV(i: Int, j: Int): String =
      if (j == p) s"((cc * v_${i}_$p) - (ss * v_${i}_$q))"
      else if (j == q) s"((ss * v_${i}_$p) + (cc * v_${i}_$q))"
      else s"v_${i}_$j"
    val l4 =
      (for { i <- 1 to d; j <- 1 to d } yield s"${newA(i, j)} AS a_${i}_$j") ++
        (for { i <- 1 to d; j <- 1 to d } yield s"${newV(i, j)} AS v_${i}_$j")
    Seq(l1, l2, l3, l4)
  }

  /** The fixed rotation schedule: `sweeps` row-major passes over the
    * upper triangle. */
  def schedule(d: Int, sweeps: Int): Seq[(Int, Int)] =
    for { _ <- 1 to sweeps; p <- 1 until d; q <- p + 1 to d } yield (p, q)

  /** Post-sweep layer: per-column eigenvalue rank (descending, ties to
    * the lower index) and the sign canonicalizer (largest-|coordinate|
    * positive, ties to the lowest index — the repeated greatest() text
    * is deterministic, so repetition is free of drift). */
  def rankSignExprs(d: Int): Seq[String] = {
    def rank(j: Int) = "CAST((1 + (" +
      (1 to d).filter(_ != j).map(i =>
        s"(CASE WHEN (a_${i}_$i > a_${j}_$j) OR ((a_${i}_$i = a_${j}_$j) AND ($i < $j)) THEN 1 ELSE 0 END)")
        .mkString(" + ") + s")) AS BIGINT) AS rank_$j"
    def sgn(j: Int) = {
      val m = "greatest(" + (1 to d).map(i => s"abs(v_${i}_$j)").mkString(", ") + ")"
      "CASE " + (1 to d).map(i =>
        s"WHEN abs(v_${i}_$j) = $m THEN (CASE WHEN v_${i}_$j < 0.0 THEN -1.0 ELSE 1.0 END)")
        .mkString(" ") + s" ELSE 1.0 END AS sgn_$j"
    }
    stateCols(d) ++ (1 to d).map(rank) ++ (1 to d).map(sgn)
  }

  private def trace(d: Int) =
    (1 to d).map(j => s"a_${j}_$j").reduce((a, b) => s"($a + $b)")

  /** One output row (pc = r, dim = i): the rank-r eigencolumn's i-th
    * sign-fixed loading and that column's explained-variance ratio,
    * both micro-quantized. */
  def outExprs(d: Int, r: Int, i: Int): Seq[String] = {
    val pick = "(CASE " + (1 to d).map(j =>
      s"WHEN rank_$j = $r THEN (v_${i}_$j * sgn_$j)").mkString(" ") + " END)"
    val eig = "(CASE " + (1 to d).map(j =>
      s"WHEN rank_$j = $r THEN a_${j}_$j").mkString(" ") + " END)"
    Seq(s"CAST($r AS BIGINT) AS pc", s"CAST($i AS BIGINT) AS dim",
      s"CAST(round($pick * 1000000.0) AS BIGINT) AS loading_micro",
      s"CAST(round(($eig / ${trace(d)}) * 1000000.0) AS BIGINT) AS evr_micro")
  }

  /** PCA over a frame with columns x1..xd (BIGINT features): one moment
    * scan, then the Jacobi layers on the 1-row state (localCheckpoint per
    * sweep bounds lineage — each checkpoint is a 1-row job). */
  def pcaK(feats: DataFrame, d: Int, k: Int, sweeps: Int = 6): DataFrame = {
    require(d >= 2 && d <= 8, s"pcaK: d = $d outside [2, 8] (driver-bounded state)")
    require(k >= 1 && k <= d, s"pcaK: k = $k outside [1, $d]")
    val aggs = (1 to d).map(i => sum(col(s"x$i")).as(s"s_$i")) ++
      (for { i <- 1 to d; j <- i to d }
        yield sum(expr(s"CAST(x$i * x$j AS DECIMAL(38,0))")).as(s"s_${i}_$j"))
    var st = feats.agg(count(lit(1)).as("n"), aggs: _*)
      .selectExpr(initExprs(d): _*).localCheckpoint()
    val rotsPerSweep = d * (d - 1) / 2
    schedule(d, sweeps).zipWithIndex.foreach { case ((p, q), idx) =>
      rotationLayers(d, p, q).foreach(l => st = st.selectExpr(l: _*))
      if ((idx + 1) % rotsPerSweep == 0) st = st.localCheckpoint()
    }
    val fin = st.selectExpr(rankSignExprs(d): _*).localCheckpoint()
    (for { r <- 1 to k; i <- 1 to d } yield fin.selectExpr(outExprs(d, r, i): _*))
      .reduce(_ union _)
  }

  /** One projected-row expression per output component r: the rank-r
    * sign-fixed eigencolumn dotted with the CENTERED feature row in real
    * units — the reference's RowMatrix.multiply(pc) consumer step
    * (principal-component scores). Means come off the same moment
    * columns (s_i / n), so the projection layer needs the moments CTE
    * alongside the solved state. */
  def projectExpr(d: Int, r: Int): String = {
    val terms = (1 to d).map { i =>
      val pick = "(CASE " + (1 to d).map(j =>
        s"WHEN rank_$j = $r THEN (v_${i}_$j * sgn_$j)").mkString(" ") + " END)"
      s"((CAST(x$i AS DOUBLE) - (CAST(s_$i AS DOUBLE) / CAST(n AS DOUBLE))) * $pick)"
    }.reduce((a, b) => s"($a + $b)")
    s"CAST(round($terms * 1000.0) AS BIGINT) AS score${r}_milli"
  }

  /** Principal-component scores for each row of `feats` (columns
    * idCol, x1..xd): the solved-and-ranked 1-row state broadcasts onto
    * one corpus scan — the projection costs a single narrow pass, the
    * 100 TB shape of the reference's multiply. Note the eigencolumns
    * are UNIT vectors of the scaled matrix, so scores are in centered
    * feature units (milli out). */
  def pcaProject(feats: DataFrame, d: Int, k: Int, idCol: String,
                 sweeps: Int = 6): DataFrame = {
    require(d >= 2 && d <= 8, s"pcaProject: d = $d outside [2, 8]")
    require(k >= 1 && k <= d, s"pcaProject: k = $k outside [1, $d]")
    val aggs = (1 to d).map(i => sum(col(s"x$i")).as(s"s_$i")) ++
      (for { i <- 1 to d; j <- i to d }
        yield sum(expr(s"CAST(x$i * x$j AS DECIMAL(38,0))")).as(s"s_${i}_$j"))
    val moments = feats.agg(count(lit(1)).as("n"), aggs: _*).localCheckpoint()
    var st = moments.selectExpr(initExprs(d): _*).localCheckpoint()
    val rotsPerSweep = d * (d - 1) / 2
    schedule(d, sweeps).zipWithIndex.foreach { case ((p, q), idx) =>
      rotationLayers(d, p, q).foreach(l => st = st.selectExpr(l: _*))
      if ((idx + 1) % rotsPerSweep == 0) st = st.localCheckpoint()
    }
    val fin = st.selectExpr(rankSignExprs(d): _*)
      .crossJoin(moments.selectExpr("n" +: (1 to d).map(i => s"s_$i"): _*))
      .localCheckpoint()
    feats.crossJoin(broadcast(fin))
      .selectExpr(idCol +: (1 to k).map(r => projectExpr(d, r)): _*)
  }

  /** The DuckDB mirror of [[pcaProject]]: the [[oracleSql]] CTE chain
    * plus one projection SELECT over feats × the final state × moments. */
  def projectOracleSql(d: Int, k: Int, idCol: String, featsCte: String,
                       sweeps: Int = 6, cohortWhere: String = ""): String = {
    val base = oracleSql(d, k, featsCte, sweeps)
    // strip the generated output UNION + ORDER BY; keep the CTE chain
    val cut = base.indexOf("SELECT CAST(1 AS BIGINT) AS pc")
    val ctes = base.substring(0, cut).stripSuffix("\n")
    val nLayers = 2 + schedule(d, sweeps).length * 4 // init + rotations + rank layer
    val last = s"t${nLayers - 1}"
    val where = if (cohortWhere.isEmpty) "" else s"\nWHERE $cohortWhere"
    s"""$ctes
       |SELECT $idCol, ${(1 to k).map(r => projectExpr(d, r)).mkString(",\n  ")}
       |FROM feats CROSS JOIN $last CROSS JOIN moments$where
       |ORDER BY $idCol""".stripMargin
  }

  /** The DuckDB mirror: the SAME generated layer strings as materialized
    * 1-row CTEs (plain CTEs inline per reference — the p09 exponential
    * re-evaluation lesson), over a caller-supplied feats CTE body. */
  def oracleSql(d: Int, k: Int, featsCte: String, sweeps: Int = 6): String = {
    val moments =
      "SELECT CAST(count(*) AS BIGINT) AS n, " +
        (1 to d).map(i => s"CAST(sum(x$i) AS BIGINT) AS s_$i").mkString(", ") + ", " +
        (for { i <- 1 to d; j <- i to d }
          yield s"sum(CAST(x$i * x$j AS HUGEINT)) AS s_${i}_$j").mkString(", ") +
        " FROM feats"
    val layers = scala.collection.mutable.ArrayBuffer[String]()
    layers += s"SELECT ${initExprs(d).mkString(",\n    ")} FROM moments"
    schedule(d, sweeps).foreach { case (p, q) =>
      rotationLayers(d, p, q).foreach(l => layers += s"SELECT ${l.mkString(",\n    ")}")
    }
    layers += s"SELECT ${rankSignExprs(d).mkString(",\n    ")}"
    val ctes = layers.zipWithIndex.map { case (body, idx) =>
      val from = if (idx == 0) "" else s"\n  FROM t${idx - 1}"
      s"t$idx AS MATERIALIZED ($body$from)"
    }
    val last = s"t${layers.length - 1}"
    val rows = (for { r <- 1 to k; i <- 1 to d }
      yield s"SELECT ${outExprs(d, r, i).mkString(", ")} FROM $last")
      .mkString("\nUNION ALL\n")
    s"""WITH feats AS MATERIALIZED ($featsCte),
       |moments AS MATERIALIZED ($moments),
       |${ctes.mkString(",\n")}
       |$rows
       |ORDER BY pc, dim""".stripMargin
  }
}
