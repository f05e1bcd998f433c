package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`): brute-force cosine top-k as the exactness baseline,
  * random-projection LSH and IVF-style coarse quantization as the scale
  * paths.
  *
  * Hyperplanes/anchors are ±1 sign matrices derived from md5 (seeded,
  * deterministic) and inlined as literal arrays into the expression — the
  * same constants can be embedded in any engine's SQL, so every stage is
  * oracle-checkable, and nothing is recomputed per row.
  *
  * Scale design (billions of vectors, 1000 executors):
  *   - Brute force is probe-set-only: the probe side is broadcast, the scan
  *     stays a single narrow pass over the corpus; top-k is a per-probe
  *     window after a shuffle on probe_id.
  *   - RP-LSH: signature is one map pass; candidates come from a band-key
  *     equi-join (ONE shuffle, no cross join); exact cosine re-ranks only
  *     the candidates.
  *   - IVF: each vector is assigned to its argmax anchor cluster; a probe
  *     scans only its `nprobe` best clusters — at real scale, cluster id
  *     becomes the partition key of the stored corpus so a probe reads
  *     nprobe partitions and everything else is pruned at the source.
  */
object Similarity {

  private def md5Long(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Deterministic ±1 sign matrix (`rows` x `dims`) seeded by `seed`. */
  def signPlanes(rows: Int, dims: Int, seed: String): Seq[Seq[Int]] =
    (0 until rows).map(j => (0 until dims).map(i =>
      if ((md5Long(s"$seed:$j:$i") & 1L) == 1L) 1 else -1))

  /** Spark SQL literal for a sign matrix: array(array(1,-1,...), ...). */
  def planesLiteral(planes: Seq[Seq[Int]]): String =
    planes.map(_.mkString("array(", ",", ")")).mkString("array(", ",", ")")

  /** DuckDB SQL literal for the same matrix: [[1,-1,...], ...]. */
  def planesLiteralDuck(planes: Seq[Seq[Int]]): String =
    planes.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  /** Signed-projection signature (INT, `bits` wide) of a DOUBLE-array
    * fragment: bit j set iff dot(plane_j, v) > 0. */
  def signatureSql(vecExpr: String, planesLit: String, bits: Int, dims: Int): String =
    s"cast(aggregate(sequence(0, ${bits - 1}), 0, (acc, j) -> acc + " +
      s"CASE WHEN aggregate(sequence(1, $dims), cast(0 as double), " +
      s"(a, i) -> a + element_at(element_at($planesLit, j + 1), i) * element_at($vecExpr, i)) > 0 " +
      s"THEN shiftleft(1, j) ELSE 0 END) as int)"

  /** Per-anchor dot products: DOUBLE array of length `n`. */
  def anchorDotsSql(vecExpr: String, anchorsLit: String, n: Int, dims: Int): String =
    s"transform(sequence(1, $n), j -> aggregate(sequence(1, $dims), cast(0 as double), " +
      s"(a, i) -> a + element_at(element_at($anchorsLit, j), i) * element_at($vecExpr, i)))"

  /** (id, vec as DOUBLE array, L2 norm) with `prefix`-namespaced columns. */
  private def normed(df: DataFrame, idCol: String, vecCol: String, prefix: String): DataFrame =
    df.select(col(idCol).as(s"${prefix}_id"),
        expr(s"transform($vecCol, x -> cast(x as double))").as(s"${prefix}_v"))
      .withColumn(s"${prefix}_norm",
        expr(s"sqrt(aggregate(${prefix}_v, cast(0 as double), (acc, x) -> acc + x * x))"))

  private val cosineExpr =
    "aggregate(zip_with(probe_v, vec_v, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)" +
      " / (probe_norm * vec_norm)"

  /** Rank candidate (probe, vec) pairs by exact cosine, keep top k. */
  private def rankTopK(pairs: DataFrame, k: Int): DataFrame =
    pairs
      .withColumn("cosine", expr(cosineExpr))
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id"),
        round(col("cosine"), 4).as("cosine"))

  /** Exact cosine top-k of every probe against the corpus (minus self). */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val p = broadcast(normed(probes, idCol, vecCol, "probe"))
    val q = normed(corpus, idCol, vecCol, "vec")
    rankTopK(p.join(q, col("probe_id") =!= col("vec_id")), k)
  }

  /** Random-projection LSH ANN: `bits`-bit signatures banded into
    * `bandsCount` chunks; candidates share at least one chunk; exact
    * cosine re-ranks candidates to top k. */
  def rpLshTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, dims: Int, bits: Int = 16,
                bandsCount: Int = 4, k: Int = 3): DataFrame = {
    val planes = planesLiteral(signPlanes(bits, dims, "pl"))
    val chunk = bits / bandsCount
    val mask = (1 << chunk) - 1
    val bandExpr = s"transform(sequence(0, ${bandsCount - 1}), " +
      s"j -> concat_ws(':', cast(j as string), cast((shiftright(sig, $chunk * j) & $mask) as string)))"
    def banded(df: DataFrame, prefix: String) =
      normed(df, idCol, vecCol, prefix)
        // hoist the plane constants to a once-per-row column: inside the
        // lambda a literal array would be re-constructed per element
        .withColumn("pl", expr(planes))
        .withColumn("sig", expr(signatureSql(s"${prefix}_v", "pl", bits, dims)))
        .select(col(s"${prefix}_id"), explode(expr(bandExpr)).as("nkey"))
    val cands = broadcast(banded(probes, "probe")).join(banded(corpus, "vec"), "nkey")
      .filter(col("probe_id") =!= col("vec_id"))
      .select("probe_id", "vec_id").distinct()
    val p = broadcast(normed(probes, idCol, vecCol, "probe"))
    val q = normed(corpus, idCol, vecCol, "vec")
    rankTopK(cands.join(p, "probe_id").join(q, "vec_id"), k)
  }

  /** IVF-style ANN: corpus vectors live in their argmax-anchor cluster;
    * each probe scans its `nprobe` best clusters only. */
  def ivfTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, dims: Int, nClusters: Int = 8,
              nprobe: Int = 2, k: Int = 3): DataFrame = {
    val anchors = planesLiteral(signPlanes(nClusters, dims, "anc"))
    def withDots(df: DataFrame, prefix: String) =
      normed(df, idCol, vecCol, prefix)
        .withColumn("anc", expr(anchors))
        .withColumn("dots", expr(anchorDotsSql(s"${prefix}_v", "anc", nClusters, dims)))
        .drop("anc")
    val corpusC = withDots(corpus, "vec")
      .withColumn("cluster", expr("cast(array_position(dots, array_max(dots)) as int)"))
      .drop("dots")
    val probeC = withDots(probes, "probe")
      .withColumn("ranked", expr(
        s"array_sort(transform(sequence(1, $nClusters), j -> named_struct('nd', -element_at(dots, j), 'idx', j)))"))
      .withColumn("cluster", explode(expr(
        s"transform(slice(ranked, 1, $nprobe), r -> cast(r.idx as int))")))
      .drop("dots", "ranked")
    rankTopK(broadcast(probeC).join(corpusC, Seq("cluster"))
      .filter(col("probe_id") =!= col("vec_id")), k)
  }

  /** Per-vector index card: RP signature + IVF cluster assignment. */
  def vectorIndex(df: DataFrame, idCol: String, vecCol: String, dims: Int,
                  bits: Int = 16, nClusters: Int = 8): DataFrame = {
    val planes = planesLiteral(signPlanes(bits, dims, "pl"))
    val anchors = planesLiteral(signPlanes(nClusters, dims, "anc"))
    normed(df, idCol, vecCol, "vec")
      .withColumn("plc", expr(planes))
      .withColumn("rp_sig", expr(signatureSql("vec_v", "plc", bits, dims)))
      .withColumn("ancc", expr(anchors))
      .withColumn("dots", expr(anchorDotsSql("vec_v", "ancc", nClusters, dims)))
      .withColumn("ivf_cluster", expr("cast(array_position(dots, array_max(dots)) as int)"))
      .select(col("vec_id"), col("rp_sig"), col("ivf_cluster"),
        round(col("vec_norm"), 4).as("norm"))
  }
}
