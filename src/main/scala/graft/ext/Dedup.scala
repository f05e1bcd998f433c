package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection for large-scale corpus curation: exact dedup,
  * MinHash+LSH, SimHash, n-gram Jaccard verification, embedding-cosine
  * near-dup — composable `DataFrame => DataFrame` transformers plus the SQL
  * fragments they are built from.
  *
  * Hashing is built on `md5` (reference:
  * sql/catalyst/src/main/scala/org/apache/spark/sql/catalyst/expressions/misc.scala:32)
  * because its output is bit-identical in every engine — each stage of the
  * pipeline stays oracle-checkable end-to-end. In production swap
  * [[portableHash]] for `xxhash64` (native, no hex round-trip); the
  * pipeline shape is unchanged.
  *
  * Scale design (100 TB corpus, 1000 executors):
  *   - Signatures/fingerprints are computed in a single narrow map pass per
  *     document (whole-stage codegen'd built-in expressions, no UDFs).
  *   - Candidate generation is a self-equi-join on band keys: ONE shuffle,
  *     each band bucket holds only colliding docs; never an all-pairs cross
  *     join.
  *   - Skew guard: buckets larger than `maxBucket` are dropped (a bucket
  *     that large means a degenerate band — e.g. boilerplate — whose pairs
  *     would be quadratic; standard LSH practice).
  *   - Jaccard verification joins shingle sets only for surviving candidate
  *     pairs (tiny relative to the corpus).
  */
object Dedup {

  /** 60-bit engine-portable hash of `value` salted by `seed` (both SQL
    * expression strings): first 15 hex digits of md5, decoded to BIGINT. */
  def portableHash(value: String, seed: String): String =
    s"cast(conv(substr(md5(concat($seed, ':', $value)), 1, 15), 16, 10) as bigint)"

  /** Whitespace tokens of a text column (SQL fragment). */
  def tokens(text: String): String = s"split($text, ' ')"

  /** Distinct word n-gram shingles of a text column (SQL fragment). Short
    * texts (< n tokens) yield their full token run as a single shingle. */
  def shingles(text: String, n: Int): String = {
    val t = tokens(text)
    s"array_distinct(transform(sequence(1, greatest(size($t) - ${n - 1}, 1)), " +
      s"i -> concat_ws(' ', slice($t, i, $n))))"
  }

  /** k-permutation MinHash signature over a shingle-array fragment: element
    * i is min over shingles of hash seeded by i. One map pass per doc. */
  def minhashSignature(shinglesExpr: String, k: Int): String =
    s"transform(sequence(0, ${k - 1}), i -> array_min(transform($shinglesExpr, " +
      s"s -> ${portableHash("s", "cast(i as string)")})))"

  /** LSH band keys for a signature fragment: `bands` keys, each encoding
    * `rowsPerBand` consecutive signature entries. Two docs collide on a key
    * iff that whole band of their signatures matches. */
  def bandKeys(sigExpr: String, bands: Int, rowsPerBand: Int): String = {
    val parts = (1 to rowsPerBand)
      .map(r => s"cast(element_at($sigExpr, $rowsPerBand * b + $r) as string)")
      .mkString(", ")
    s"transform(sequence(0, ${bands - 1}), b -> concat_ws(':', cast(b as string), $parts))"
  }

  /** SimHash fingerprint (`bits` wide, as INT) over a token-array fragment:
    * bit j is set iff the frequency-weighted sum of token-hash bit j signs
    * is positive. */
  def simhash(tokensExpr: String, bits: Int): String =
    s"cast(aggregate(sequence(0, ${bits - 1}), 0, (acc, j) -> acc + " +
      s"CASE WHEN aggregate($tokensExpr, 0, (a, t) -> a + " +
      s"CASE WHEN (shiftright(${portableHash("t", "'sim'")}, j) & 1) = 1 THEN 1 ELSE -1 END) > 0 " +
      s"THEN shiftleft(1, j) ELSE 0 END) as int)"

  /** Exact dedup: one row per distinct text digest with the smallest id as
    * canonical representative and the copy count. Scales as a plain
    * hash-shuffle groupBy on the 128-bit digest. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Per-document MinHash signature table: (doc_id, n_shingles, sig). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, k: Int = 32): DataFrame =
    df.select(col(idCol).as("doc_id"), expr(shingles(textCol, shingleN)).as("shingles"))
      .select(col("doc_id"), size(col("shingles")).as("n_shingles"),
        expr(minhashSignature("shingles", k)).as("sig"))

  /** LSH candidate pairs (doc_a < doc_b, n_bands = how many bands agree).
    * One shuffle on the band key; `maxBucket` caps degenerate buckets. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, k: Int = 32, bands: Int = 16,
                        maxBucket: Int = 50): DataFrame = {
    val rowsPerBand = k / bands
    val banded = minhashSignatures(df, idCol, textCol, shingleN, k)
      .select(col("doc_id"), explode(expr(bandKeys("sig", bands, rowsPerBand))).as("bkey"))
    val capped = banded
      .withColumn("bsize", count(lit(1)).over(Window.partitionBy("bkey")))
      .filter(col("bsize") <= maxBucket)
    val a = capped.select(col("doc_id").as("doc_a"), col("bkey"))
    val b = capped.select(col("doc_id").as("doc_b"), col("bkey"))
    a.join(b, "bkey").filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_bands"))
  }

  /** Near-duplicate pairs: LSH candidates verified by exact shingle-set
    * Jaccard >= `threshold`. Output: (doc_a, doc_b, jaccard rounded 1e-6). */
  def neardupPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, k: Int = 32, bands: Int = 16,
                   maxBucket: Int = 50, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("doc_id"), expr(shingles(textCol, shingleN)).as("shingles"))
    minhashCandidates(df, idCol, textCol, shingleN, k, bands, maxBucket)
      .join(sh.withColumnsRenamed(Map("doc_id" -> "doc_a", "shingles" -> "sh_a")), "doc_a")
      .join(sh.withColumnsRenamed(Map("doc_id" -> "doc_b", "shingles" -> "sh_b")), "doc_b")
      .withColumn("jaccard",
        expr("cast(size(array_intersect(sh_a, sh_b)) as double) / cast(size(array_union(sh_a, sh_b)) as double)"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Per-document SimHash fingerprints: (doc_id, sim). */
  def simhashFingerprints(df: DataFrame, idCol: String, textCol: String,
                          bits: Int = 16): DataFrame =
    df.select(col(idCol).as("doc_id"), expr(simhash(tokens(textCol), bits)).as("sim"))

  /** SimHash near-dup pairs with Hamming distance <= `maxHamming`, found by
    * banding the fingerprint into `bandsCount` equal bit-chunks and joining
    * on chunk equality (pigeonhole: distance <= bandsCount-1 guarantees at
    * least one identical chunk — full recall, no cross join). */
  def simhashNeardupPairs(df: DataFrame, idCol: String, textCol: String,
                          bits: Int = 16, bandsCount: Int = 4,
                          maxHamming: Int = 1): DataFrame = {
    require(maxHamming <= bandsCount - 1, "banding only guarantees recall up to bandsCount-1")
    val chunk = bits / bandsCount
    val mask = (1 << chunk) - 1
    val nibbled = simhashFingerprints(df, idCol, textCol, bits)
      .select(col("doc_id"), col("sim"),
        explode(expr(s"transform(sequence(0, ${bandsCount - 1}), " +
          s"j -> concat_ws(':', cast(j as string), cast((shiftright(sim, $chunk * j) & $mask) as string)))")).as("nkey"))
    val a = nibbled.select(col("doc_id").as("doc_a"), col("sim").as("sim_a"), col("nkey"))
    val b = nibbled.select(col("doc_id").as("doc_b"), col("sim").as("sim_b"), col("nkey"))
    a.join(b, "nkey").filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sim_a ^ sim_b)").cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding-cosine near-dup pairs of `probes` x `corpus` (exact, for a
    * small probe set — the full-corpus scale path is LSH bucketing, see
    * graft.ext.Similarity). Vectors are summed left-to-right in DOUBLE so
    * the result is deterministic and engine-portable. */
  def embeddingNeardupPairs(probes: DataFrame, corpus: DataFrame, idCol: String,
                            vecCol: String, threshold: Double): DataFrame = {
    def normed(d: DataFrame, prefix: String) = d
      .select(col(idCol).as(s"${prefix}_id"),
        expr(s"transform($vecCol, x -> cast(x as double))").as(s"${prefix}_v"))
      .withColumn(s"${prefix}_norm",
        expr(s"sqrt(aggregate(${prefix}_v, cast(0 as double), (acc, x) -> acc + x * x))"))
    val p = broadcast(normed(probes, "probe"))
    val q = normed(corpus, "vec")
    p.join(q, col("probe_id") =!= col("vec_id"))
      .withColumn("cosine",
        expr("aggregate(zip_with(probe_v, vec_v, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)" +
          " / (probe_norm * vec_norm)"))
      .filter(col("cosine") >= threshold)
      .select(col("probe_id"), col("vec_id"), round(col("cosine"), 4).as("cosine"))
  }
}
