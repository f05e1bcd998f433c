package graft.queries

import graft.Tables
import graft.ext.{Similarity => S}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search surface over the embeddings table (64-dim float
  * vectors): exact top-k baseline plus the two ANN scale paths, each with a
  * DuckDB mirror built from the SAME deterministic ±1 plane constants that
  * graft.ext.Similarity inlines into the Spark expressions.
  */
object Similarity {

  private val Dims = 64
  private def probes(df: DataFrame) = df.filter(col("vec_id") % 50 === 0)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact cosine top-5 per probe: the ground-truth ranking.
    "s01_cosine_topk" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      S.bruteForceTopK(probes(e), e, "vec_id", "embedding", k = 5)
        .orderBy("probe_id", "rank")
    },

    // Random-projection LSH ANN: 16-bit signatures, 4 bands, exact re-rank.
    "s02_rp_lsh_ann" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      S.rpLshTopK(probes(e), e, "vec_id", "embedding", Dims)
        .orderBy("probe_id", "rank")
    },

    // IVF ANN: 8 anchor clusters, nprobe=2.
    "s03_ivf_ann" -> { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      S.ivfTopK(probes(e), e, "vec_id", "embedding", Dims)
        .orderBy("probe_id", "rank")
    },

    // Per-vector index card: signature + cluster + norm.
    "s04_vector_index" -> { (s, dir) =>
      S.vectorIndex(Tables.embeddings(s, dir), "vec_id", "embedding", Dims)
        .orderBy("vec_id")
    }
  )

  // ---- DuckDB mirrors ----------------------------------------------------

  private val pl = S.planesLiteralDuck(S.signPlanes(16, Dims, "pl"))
  private val anc = S.planesLiteralDuck(S.signPlanes(8, Dims, "anc"))

  private val normCte =
    """WITH n AS (
      |  SELECT vec_id, embedding::DOUBLE[] v,
      |    sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) nrm
      |  FROM embeddings)""".stripMargin

  private val dot = "list_sum(list_transform(range(1, len(p.v)+1), i -> p.v[i]*q.v[i]))"

  private def sigExpr(v: String) =
    s"CAST(list_sum(list_transform(range(0, 16), j -> CASE WHEN " +
      s"list_sum(list_transform(range(1, ${Dims + 1}), i -> $pl[j+1][i] * $v[i])) > 0 " +
      s"THEN (1 << j) ELSE 0 END)) AS INT)"

  private def dotsExpr(v: String) =
    s"list_transform(range(1, 9), j -> list_sum(list_transform(range(1, ${Dims + 1}), i -> $anc[j][i] * $v[i])))"

  val oracles: Map[String, String] = Map(
    "s01_cosine_topk" ->
      s"""$normCte
         |SELECT probe_id, rank, vec_id, round(c_raw, 4) AS cosine FROM (
         |  SELECT p.vec_id probe_id, q.vec_id vec_id, $dot / (p.nrm*q.nrm) c_raw,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY $dot / (p.nrm*q.nrm) DESC, q.vec_id) AS INT) rank
         |  FROM n p JOIN n q ON p.vec_id % 50 = 0 AND p.vec_id <> q.vec_id)
         |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,

    "s02_rp_lsh_ann" ->
      s"""$normCte,
         |sigs AS (SELECT vec_id, ${sigExpr("v")} sig FROM n),
         |bands AS (SELECT vec_id, unnest(list_transform(range(0, 4),
         |    j -> CAST(j AS VARCHAR) || ':' || CAST((sig >> (4*j)) & 15 AS VARCHAR))) nkey FROM sigs),
         |cands AS (SELECT DISTINCT pb.vec_id probe_id, qb.vec_id vec_id
         |  FROM bands pb JOIN bands qb USING (nkey)
         |  WHERE pb.vec_id % 50 = 0 AND pb.vec_id <> qb.vec_id),
         |scored AS (SELECT c.probe_id, c.vec_id, $dot / (p.nrm*q.nrm) c_raw
         |  FROM cands c JOIN n p ON c.probe_id = p.vec_id JOIN n q ON c.vec_id = q.vec_id)
         |SELECT probe_id, rank, vec_id, round(c_raw, 4) AS cosine FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY c_raw DESC, vec_id) AS INT) rank FROM scored)
         |WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin,

    "s03_ivf_ann" ->
      s"""$normCte,
         |d AS (SELECT vec_id, v, nrm, ${dotsExpr("v")} dots FROM n),
         |corp AS (SELECT vec_id, v, nrm, CAST(list_position(dots, list_max(dots)) AS INT) cl FROM d),
         |pr AS (SELECT vec_id probe_id, v pv, nrm pnrm,
         |    unnest(list_transform(list_slice(list_sort(list_transform(range(1, 9),
         |      j -> {'nd': -dots[j], 'idx': j})), 1, 2), r -> CAST(r.idx AS INT))) cl
         |  FROM d WHERE vec_id % 50 = 0),
         |scored AS (SELECT p.probe_id, q.vec_id,
         |    list_sum(list_transform(range(1, len(p.pv)+1), i -> p.pv[i]*q.v[i])) / (p.pnrm*q.nrm) c_raw
         |  FROM pr p JOIN corp q ON p.cl = q.cl AND p.probe_id <> q.vec_id)
         |SELECT probe_id, rank, vec_id, round(c_raw, 4) AS cosine FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY c_raw DESC, vec_id) AS INT) rank FROM scored)
         |WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin,

    "s04_vector_index" ->
      s"""$normCte,
         |d AS (SELECT vec_id, v, nrm, ${dotsExpr("v")} dots FROM n)
         |SELECT vec_id, ${sigExpr("v")} AS rp_sig,
         |  CAST(list_position(dots, list_max(dots)) AS INT) AS ivf_cluster,
         |  round(nrm, 4) AS norm
         |FROM d ORDER BY vec_id""".stripMargin
  )
}
