package graft.ext

import org.apache.spark.sql.DataFrame
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
  *   - Signatures/fingerprints are computed in a single narrow pass per
  *     document: shingling is one compiled loop ([[shinglesUdf]]), hashing
  *     and the k permutation minima are codegen'd built-in expressions in
  *     one map-side-combined hash aggregate.
  *   - Candidate generation groups the exploded band table ONCE by band
  *     key; each bucket holds only colliding docs — never an all-pairs
  *     cross join.
  *   - Skew guard: bucket sizes are counted first and buckets larger than
  *     `maxBucket` anti-joined away BEFORE any bucket materializes (a
  *     bucket that large means a degenerate band — e.g. boilerplate —
  *     whose pairs would be quadratic; standard LSH practice).
  *   - Jaccard verification joins shingle sets only for surviving candidate
  *     pairs (tiny relative to the corpus).
  *   - Tables consumed twice within one call (banded signatures, shingle
  *     sets, SimHash bands) are persisted for the call and released once
  *     the small pair/result set is materialized.
  */
object Dedup {

  /** 60-bit engine-portable hash of `value` salted by `seed` (both SQL
    * expression strings): first 15 hex digits of md5, decoded to BIGINT. */
  def portableHash(value: String, seed: String): String =
    s"cast(conv(substr(md5(concat($seed, ':', $value)), 1, 15), 16, 10) as bigint)"

  /** Unsalted 31-bit base hash — computed ONCE per token/shingle; the k
    * MinHash permutations are derived from it by an affine universal-hash
    * family instead of k separate md5 calls (same standard construction,
    * ~k times less hashing on the hot path). 31-bit so a_i * h stays
    * below 2^62: every op is plain 64-bit integer arithmetic in any
    * engine — no 128-bit/decimal slow path. */
  def baseHash(value: String): String =
    s"(cast(conv(substr(md5($value), 1, 15), 16, 10) as bigint) % $MersennePrime31)"

  /** Mersenne prime 2^31 - 1: modulus of the affine rehash family. */
  val MersennePrime31: Long = 2147483647L

  private def md5Long(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Deterministic affine coefficients (a_i in [1, p-1], b_i in [0, p-1])
    * for the i-th MinHash permutation h_i(x) = (a_i * x + b_i) mod p. */
  def affineCoeffs(k: Int): (Seq[Long], Seq[Long]) = (
    (0 until k).map(i => md5Long(s"mh:a:$i") % (MersennePrime31 - 1) + 1),
    (0 until k).map(i => md5Long(s"mh:b:$i") % MersennePrime31))

  /** Whitespace tokens of a text column (SQL fragment). */
  def tokens(text: String): String = s"split($text, ' ')"

  /** Distinct word n-gram shingles of a text column, as a compiled UDF.
    * Short texts (< n tokens) yield their full token run as a single
    * shingle. Byte-for-byte the same set as the SQL formulation
    * `array_distinct(transform(sequence(1, greatest(size-n+1, 1)),
    * i -> concat_ws(' ', slice(tokens, i, n))))` — split keeps empty
    * tokens (Java regex split, limit -1), slices truncate at the end,
    * distinct keeps first occurrence — but runs as one JIT'd loop per doc
    * instead of an interpreted lambda per shingle. */
  def shinglesUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else {
        val t = text.split(" ", -1)
        val m = math.max(t.length - (n - 1), 1)
        val out = new scala.collection.mutable.LinkedHashSet[String]
        var i = 0
        while (i < m) {
          out += t.slice(i, math.min(i + n, t.length)).mkString(" ")
          i += 1
        }
        out.toSeq
      }
    }

  /** LSH band keys for a signature fragment: `bands` keys, each encoding
    * `rowsPerBand` consecutive signature entries. Two docs collide on a key
    * iff that whole band of their signatures matches. */
  def bandKeys(sigExpr: String, bands: Int, rowsPerBand: Int): String = {
    val parts = (1 to rowsPerBand)
      .map(r => s"cast(element_at($sigExpr, $rowsPerBand * b + $r) as string)")
      .mkString(", ")
    s"transform(sequence(0, ${bands - 1}), b -> concat_ws(':', cast(b as string), $parts))"
  }

  // ---- Dedup-first membership machinery ------------------------------------
  // Shared by every dedup-first pipeline (neardupPairs, simhashNeardupPairs,
  // Similarity.rpNeardupPairs, the d18 index): ONE place owns the subtle
  // semantics — group keying, null-payload behavior, rep selection — so a
  // fix lands everywhere at once.

  /** (digest, rep, doc_id) digest-group membership: rep = min id per
    * distinct digest — one window shuffle at any scale.
    *
    * Null-payload semantics are the subtle part and depend on what the
    * pipeline must equal:
    *   - `groupNulls = true` (dedup-first oracles, e.g. d04/d18, whose SQL
    *     window PARTITION BY groups nulls): all null digests share one
    *     sentinel group — also what makes null digests EQUAL across two
    *     tables in the incremental index join, where SQL null = null would
    *     not match.
    *   - `groupNulls = false` (raw-formulation oracles, e.g. d06/d08,
    *     where a null payload yields no fingerprint/band rows and can
    *     never pair): each null-payload row becomes its own singleton
    *     group keyed by a per-row sentinel, so expansion can never pair
    *     two null payloads. */
  private[graft] def digestMembership(df: DataFrame, idCol: String,
                                      digest: org.apache.spark.sql.Column,
                                      groupNulls: Boolean): DataFrame = {
    val keyed =
      if (groupNulls) coalesce(digest.cast("string"), lit("\u0000NULL"))
      else coalesce(digest.cast("string"),
        concat(lit("\u0000:"), col(idCol).cast("string")))
    df.select(col(idCol).as("doc_id"), keyed.as("digest"))
      .withColumn("rep", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("digest")))
      .select("digest", "rep", "doc_id")
  }

  /** Rows of `df` that are group representatives under `members`. */
  private[graft] def repRows(df: DataFrame, idCol: String, members: DataFrame): DataFrame =
    df.join(members.filter(col("rep") === col("doc_id"))
        .select(col("doc_id").as("__rep_id")),
      df(idCol) === col("__rep_id")).drop("__rep_id")

  /** Expand verified rep-level pairs through group membership: every
    * (member of A, member of B) inherits the rep pair's carried columns,
    * canonicalized back to (aCol < bCol). The two sides take separate
    * membership tables so restricted expansions (the incremental probe
    * expands one side through batch members only) share this one body. */
  private[graft] def expandCross(repPairs: DataFrame,
                                 aMembers: DataFrame, bMembers: DataFrame,
                                 aCol: String, bCol: String): DataFrame =
    repPairs
      .join(aMembers.select(col("rep").as(aCol), col("doc_id").as("__ia")), aCol)
      .join(bMembers.select(col("rep").as(bCol), col("doc_id").as("__ib")), bCol)
      .withColumn("__a", least(col("__ia"), col("__ib")))
      .withColumn("__b", greatest(col("__ia"), col("__ib")))
      .drop(aCol, bCol, "__ia", "__ib")
      .withColumnRenamed("__a", aCol)
      .withColumnRenamed("__b", bCol)

  /** [[expandCross]] with the same membership on both sides. */
  private[graft] def expandCross(repPairs: DataFrame, members: DataFrame,
                                 aCol: String, bCol: String): DataFrame =
    expandCross(repPairs, members, members, aCol, bCol)

  /** Same-group id pairs — exact copies — as (rep, aCol < bCol); callers
    * attach the pair value (jaccard 1.0, Hamming 0, or a computed
    * self-similarity looked up through `rep`). */
  private[graft] def withinGroupPairs(members: DataFrame,
                                      aCol: String, bCol: String): DataFrame =
    members.alias("x").join(members.alias("y"),
        col("x.rep") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.rep").as("rep"), col("x.doc_id").as(aCol), col("y.doc_id").as(bCol))

  /** Exact dedup: one row per distinct text digest with the smallest id as
    * canonical representative and the copy count. Scales as a plain
    * hash-shuffle groupBy on the 128-bit digest. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Per-document MinHash signature table: (doc_id, n_shingles, sig).
    * Base-hashes each shingle once, then derives all k permutations.
    *
    * Execution shape (the simhash template): explode shingles, hash each
    * once, then compute all k permutation minima as UNROLLED `min(...)`
    * aggregates in ONE codegen'd hash aggregate and regroup per doc. The
    * earlier `array_min(transform(...))` formulation ran k interpreted
    * lambda passes per document (non-codegen) and was ~10x slower; the
    * explode+partial-agg also combines map-side before the shuffle. */
  /** (doc_id, shingles) table — THE artifact every MinHash stage consumes.
    * Callers that run several stages (signatures + candidates + verify)
    * compute it once, persist it, and pass it down, instead of re-shingling
    * the corpus per stage. */
  def shingleTable(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3): DataFrame =
    df.select(col(idCol).as("doc_id"), shinglesUdf(shingleN)(col(textCol)).as("shingles"))

  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, k: Int = 32): DataFrame =
    minhashSignaturesFrom(shingleTable(df, idCol, textCol, shingleN), k)

  /** Signatures from a prebuilt (doc_id, shingles) table. */
  def minhashSignaturesFrom(sh: DataFrame, k: Int): DataFrame = {
    val (as, bs) = affineCoeffs(k)
    val hashed = sh
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .select(col("doc_id"), expr(baseHash("s")).as("h"))
    val mins = (0 until k).map(i =>
      min(expr(s"(${as(i)}L * h + ${bs(i)}L) % $MersennePrime31")).as(s"m$i"))
    hashed.groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_shingles"), mins: _*)
      .select(col("doc_id"), col("n_shingles"),
        array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH candidate pairs (doc_a < doc_b, n_bands = how many bands agree).
    *
    * Shape: (1) a map-side-combined `groupBy(bkey).count` finds degenerate
    * buckets (> `maxBucket` members — boilerplate bands whose pairs would
    * be quadratic; dropping them is standard LSH practice); (2) a
    * broadcast ANTI join removes those rows BEFORE any bucket is
    * materialized — a mega-bucket never reaches an executor's memory;
    * (3) surviving buckets (now provably <= maxBucket docs) are assembled
    * with `collect_list` and pairs emitted by a double explode. This
    * replaces an earlier window-based cap + self-join, which cost a full
    * sort pass plus two extra shuffles of the exploded band table.
    *
    * The size pre-pass and the bucket assembly both consume the banded
    * signature table, so it is persisted for the call (computed once) and
    * released after the candidate pairs — a small table, linear in the
    * true near-dup count — are materialized via localCheckpoint. At a real
    * 100 TB corpus the signature table is the artifact you'd persist/
    * bucket durably and reuse across every LSH run. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, k: Int = 32, bands: Int = 16,
                        maxBucket: Int = 50, materialize: Boolean = true): DataFrame =
    minhashCandidatesFrom(shingleTable(df, idCol, textCol, shingleN),
      k, bands, maxBucket, materialize)

  /** Candidates from a prebuilt (doc_id, shingles) table — see
    * [[minhashCandidates]] for the shape rationale.
    *
    * DELIBERATELY NOT SHARED with [[neardupPairs]]' raw-path band join,
    * though both band/cap/pair: the collect_list bucket assembly here is
    * safe only because the input is one row per DISTINCT text, so a
    * surviving bucket holds <= maxBucket ROWS. The raw path bands every
    * COPY — its buckets are bounded in distinct digests but unbounded in
    * rows — so it must generate pairs by equi-join, never by
    * materializing a bucket array. Two shapes, one semantics; DedupSpec's
    * both-paths identity test (incl. the capped-bucket stress) is the
    * seam guard if either side's cap/banding logic changes. */
  def minhashCandidatesFrom(sh: DataFrame, k: Int = 32, bands: Int = 16,
                            maxBucket: Int = 50, materialize: Boolean = true): DataFrame = {
    val rowsPerBand = k / bands
    val lazyBanded = minhashSignaturesFrom(sh, k)
      .select(col("doc_id"), explode(expr(bandKeys("sig", bands, rowsPerBand))).as("bkey"))
    // only the materialized path persists: the lazy path (shape assertions)
    // never runs the plan twice and must not leak storage blocks
    val banded =
      if (materialize) lazyBanded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else lazyBanded
    val oversized = banded.groupBy("bkey").agg(count(lit(1)).as("bsize"))
      .filter(col("bsize") > maxBucket).select("bkey")
    val buckets = banded.join(broadcast(oversized), Seq("bkey"), "left_anti")
      .groupBy("bkey").agg(collect_list(col("doc_id")).as("docs"))
      .filter(size(col("docs")) >= 2)
    val pairs = buckets
      .select(col("docs"), explode(col("docs")).as("doc_a"))
      .select(col("doc_a"), explode(col("docs")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_bands"))
    if (!materialize) pairs // lazy plan, for shape assertions (nothing cached)
    else {
      val out = pairs.localCheckpoint()
      banded.unpersist()
      out
    }
  }

  /** Near-duplicate pairs: exact-dedup FIRST, LSH + Jaccard verify on
    * DISTINCT texts only, then expand digest-group members back into id
    * pairs. Output: (doc_a < doc_b, jaccard rounded 1e-6).
    *
    * SEMANTICS: the `maxBucket` skew cap is counted over DISTINCT texts
    * (one representative per md5 digest), and within-digest pairs (exact
    * copies) are always emitted at jaccard 1.0. This is deliberately NOT
    * raw-corpus LSH when a bucket straddles the cap only because exact
    * copies inflate it — a bucket holding 6 distinct texts with 10 copies
    * each is 6 "real" members, not 60, and exact copies are duplicates by
    * definition, not candidates a skew heuristic may drop. (When no
    * bucket straddles the cap the two formulations coincide: exact copies
    * share all their representative's buckets and verify at 1.0.) The
    * DuckDB oracle (`queries.Dedup.neardupPairsCte`) mirrors these
    * dedup-first semantics exactly.
    *
    * The cost argument vs raw-corpus LSH on a dup-heavy
    * corpus: raw LSH puts every copy of a text in every one of its
    * buckets, so candidate pairs (and the shingle-array verify join) grow
    * QUADRATICALLY in group size, while here LSH and the verify run once
    * per distinct text and copies re-enter as two cheap equi-join
    * expansions. Measured on the 10x-tiled sf1 corpus: 102 s -> ~6 s for
    * d04. On a real 100 TB web crawl (30-50% exact duplication) this is
    * the only shape that survives. The output pair set is still what it
    * is (quadratic in group size — that's the true answer); only the
    * LSH/verify work is deduped. The within-group expansion is a
    * rep-keyed self-join, never a collect_list — a million-copy
    * boilerplate group must not materialize as one array.
    *
    * On a LOW-dup corpus the rep machinery (digest window + two expansion
    * joins) is pure overhead, so — the d06 gate promoted here — the path
    * is GATED on the same one-scan duplicate-rate probe, with the same
    * `knownDupRate` override for callers that must force a path (tests,
    * A/B benchmarks) or already know their corpus. The RAW path is
    * constructed to be EXACTLY pair-for-pair equivalent (DedupSpec pins
    * it), which takes three deliberate moves:
    *   - same-digest pairs are emitted from a digest self-join at 1.0,
    *     INDEPENDENT of the LSH machinery (the dedup-first `within` set
    *     exists even when every shared bucket is capped away, and for
    *     NULL texts, which alone are shingle-less and never band —
    *     [[shinglesUdf]] gives a shorter-than-n text its whole token run
    *     as a single shingle, so short texts DO band and their distinct-
    *     digest 1.0-pairs ride the banded join like any others);
    *   - the bucket cap counts DISTINCT DIGESTS, not rows (copies share
    *     their rep's every band, so a raw row count would cap buckets the
    *     rep formulation keeps — distinct digests per raw bucket equals
    *     reps per dedup-first bucket exactly);
    *   - the banded join drops same-digest collisions (already emitted by
    *     the self-join; their jaccard is 1.0 by identity).
    * Cross pairs then coincide: copies inherit their rep's bands, so (a,b)
    * shares a surviving bucket iff (rep_a, rep_b) does, and identical
    * shingle sets give identical jaccard. The probe counts ALL rows (null
    * texts share one digest group under d04's groupNulls semantics —
    * unlike d06, where nulls never pair and are excluded). */
  def neardupPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, k: Int = 32, bands: Int = 16,
                   maxBucket: Int = 50, threshold: Double = 0.5,
                   dedupFirstMinDupRate: Double = 0.05,
                   knownDupRate: Option[Double] = None): DataFrame = {
    // groupNulls: the d04-family oracle windows PARTITION BY md5(text),
    // which groups null texts into one (pair-at-1.0) group
    val keyedDigest = coalesce(md5(col(textCol)), lit("\u0000NULL"))
    val dupRate = knownDupRate.getOrElse {
      val stats = df.agg(count(lit(1)).as("n"),
        approx_count_distinct(keyedDigest).as("nd")).head()
      val n = stats.getLong(0)
      if (n == 0L) 0.0 else 1.0 - stats.getLong(1).toDouble / n
    }
    if (dupRate < dedupFirstMinDupRate) {
      // RAW path: shingle/band every row directly — rows ≈ distinct texts
      // here, so per-rep machinery buys nothing. See the scaladoc for the
      // three moves that keep this pair-for-pair identical to dedup-first.
      // Pair generation is an equi-join on the band key, NOT
      // minhashCandidatesFrom's collect_list buckets: raw buckets are
      // capped in distinct DIGESTS but unbounded in rows (copies), so a
      // bucket array could blow a reducer on a misrouted dup-heavy input
      // — the join shape degrades to wasted work instead (see
      // minhashCandidatesFrom's scaladoc; DedupSpec pins the seam).
      val rows = df.select(col(idCol).as("doc_id"), keyedDigest.as("digest"),
          shinglesUdf(shingleN)(col(textCol)).as("shingles"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val within = rows.select(col("doc_id").as("doc_a"), col("digest"))
        .join(rows.select(col("doc_id").as("doc_b"), col("digest")), "digest")
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), lit(1.0).as("jaccard"))
      val banded = minhashSignaturesFrom(rows, k)
        .join(rows.select(col("doc_id"), col("digest")), "doc_id")
        .select(col("doc_id"), col("digest"),
          explode(expr(bandKeys("sig", bands, k / bands))).as("bkey"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val oversized = banded.groupBy("bkey")
        .agg(countDistinct(col("digest")).as("bsize"))
        .filter(col("bsize") > maxBucket).select("bkey")
      val candidates = banded.join(broadcast(oversized), Seq("bkey"), "left_anti")
        .select(col("bkey"), col("doc_id").as("doc_a"), col("digest").as("dg_a"))
        .join(banded.select(col("bkey"), col("doc_id").as("doc_b"), col("digest").as("dg_b")), "bkey")
        .filter(col("doc_a") < col("doc_b") && col("dg_a") =!= col("dg_b"))
        .select("doc_a", "doc_b").distinct()
      val cross = candidates
        .join(rows.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
        .join(rows.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
        .withColumn("jaccard",
          expr("cast(size(array_intersect(sh_a, sh_b)) as double) / cast(size(array_union(sh_a, sh_b)) as double)"))
        .filter(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      val out = cross.union(within).localCheckpoint()
      banded.unpersist(); rows.unpersist()
      return out
    }
    val members = digestMembership(df, idCol, md5(col(textCol)), groupNulls = true)
      .select("rep", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the shingle table feeds candidate generation AND both sides of the
    // verification join — shingle once (per DISTINCT text), persist for
    // the call, release once the (small) verified rep-pair set is real
    val sh = shingleTable(repRows(df, idCol, members), idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val repPairs = minhashCandidatesFrom(sh, k, bands, maxBucket)
      .join(sh.withColumnsRenamed(Map("doc_id" -> "doc_a", "shingles" -> "sh_a")), "doc_a")
      .join(sh.withColumnsRenamed(Map("doc_id" -> "doc_b", "shingles" -> "sh_b")), "doc_b")
      .withColumn("jaccard",
        expr("cast(size(array_intersect(sh_a, sh_b)) as double) / cast(size(array_union(sh_a, sh_b)) as double)"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .localCheckpoint()
    sh.unpersist()
    // cross-group expansion inherits the rep pair's jaccard; within-group
    // pairs are exact copies, jaccard 1.0 by construction
    val cross = expandCross(repPairs, members, "doc_a", "doc_b")
      .select("doc_a", "doc_b", "jaccard")
    val within = withinGroupPairs(members, "doc_a", "doc_b")
      .select(col("doc_a"), col("doc_b"), lit(1.0).as("jaccard"))
    val out = cross.union(within).localCheckpoint()
    members.unpersist()
    out
  }

  /** Per-document SimHash fingerprints: (doc_id, sim). Computed
    * relationally — explode tokens, hash once each, then `bits` unrolled
    * conditional SUMs in one codegen'd hash aggregate (the nested-lambda
    * formulation in [[simhash]] is interpreted per element and ~10x
    * slower; at scale the explode+partial-agg also combines map-side). */
  def simhashFingerprints(df: DataFrame, idCol: String, textCol: String,
                          bits: Int = 32): DataFrame = {
    val th = df
      .select(col(idCol).as("doc_id"), explode(expr(tokens(textCol))).as("t"))
      .select(col("doc_id"), expr(portableHash("t", "'sim'")).as("h"))
    val sums = (0 until bits).map(j =>
      sum(expr(s"CASE WHEN (shiftright(h, $j) & 1) = 1 THEN 1 ELSE -1 END")).as(s"s$j"))
    val simExpr = (0 until bits)
      .map(j => s"(CASE WHEN s$j > 0 THEN shiftleft(cast(1 as bigint), $j) ELSE 0L END)")
      .mkString(" + ")
    th.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), expr(simExpr).as("sim"))
  }

  /** SimHash near-dup pairs with Hamming distance <= `maxHamming`, found by
    * banding the fingerprint into `bandsCount` equal bit-chunks and joining
    * on chunk equality (pigeonhole: distance <= bandsCount-1 guarantees at
    * least one identical chunk — full recall, no cross join).
    *
    * Dedup-first ([[neardupPairs]]' cost argument applied to SimHash):
    * fingerprints, band keys, and Hamming distances are pure functions of
    * the TEXT, so band collisions are decided once per DISTINCT text and
    * exact copies re-enter through two membership equi-joins (within-group
    * pairs at Hamming 0, cross-group pairs inheriting the rep distance).
    * On a dup-heavy corpus the raw banded self-join grows quadratically in
    * copy count — measured 22.6 s on the 10x-tiled sf1 corpus before this,
    * where per-rep work is linear in the true near-dup structure. Unlike
    * neardupPairs there is no bucket cap here, so the two formulations are
    * EXACTLY equivalent on any input (same band keys, same distances).
    *
    * On a LOW-dup corpus dedup-first is pure overhead: reps ≈ rows, so the
    * digest window plus the two expansion joins buy nothing (r10 verdict:
    * 4.7x slower at sf0.1 on the real corpus). Exact path equivalence
    * makes the choice a pure cost decision, so it is GATED on a one-scan
    * duplicate-rate probe — approx_count_distinct over the text digest —
    * and the raw banded self-join over all rows runs when the estimated
    * dup rate is below `dedupFirstMinDupRate`.
    *
    * The probe is an EAGER action at call time (one column-pruned scan of
    * the text column) — the one operator in the suite whose construction
    * is not fully lazy, which is the price of a data-dependent plan
    * choice. Callers that already know their corpus's duplicate rate (or
    * must force a path deterministically — tests, A/B benchmarks) pass
    * `knownDupRate = Some(r)` and no probe job runs. */
  def simhashNeardupPairs(df: DataFrame, idCol: String, textCol: String,
                          bits: Int = 32, bandsCount: Int = 4,
                          maxHamming: Int = 1,
                          dedupFirstMinDupRate: Double = 0.05,
                          knownDupRate: Option[Double] = None): DataFrame = {
    require(maxHamming <= bandsCount - 1, "banding only guarantees recall up to bandsCount-1")
    val chunk = bits / bandsCount
    val mask = (1 << chunk) - 1
    // banded self-join over a fingerprint table — shared by both paths.
    // The banded table feeds both sides, so persist for the call and
    // release once the (small) pair set is materialized.
    def bandedPairs(fps: DataFrame): DataFrame = {
      val nibbled = fps
        .select(col("doc_id"), col("sim"),
          explode(expr(s"transform(sequence(0, ${bandsCount - 1}), " +
            s"j -> concat_ws(':', cast(j as string), cast((shiftright(sim, $chunk * j) & $mask) as string)))")).as("nkey"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = nibbled.select(col("doc_id").as("doc_a"), col("sim").as("sim_a"), col("nkey"))
      val b = nibbled.select(col("doc_id").as("doc_b"), col("sim").as("sim_b"), col("nkey"))
      val pairs = a.join(b, "nkey").filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          expr("bit_count(sim_a ^ sim_b)").cast("int").as("hamming"))
        .filter(col("hamming") <= maxHamming)
        .distinct()
        .localCheckpoint()
      nibbled.unpersist()
      pairs
    }
    // Dup-rate probe deciding the path (scaladoc): ONE codegen'd scan,
    // map-side-combined HLL — no shuffle of rows, no window. Exact path
    // equivalence makes a misroute (HLL ~2% error near the threshold) a
    // time cost, never a correctness one. Both aggregates must ignore
    // NULL texts — count(textCol), not count(*) — or a null-heavy but
    // dup-free corpus reads as dup-heavy (nulls never group under the
    // raw-oracle semantics, so dedup-first would be pure overhead there).
    // HLL can also OVERestimate, making the raw rate slightly negative on
    // a dup-free corpus; callers forcing a path (tests, benchmarks) pass
    // `knownDupRate` instead of gaming the threshold.
    val dupRate = knownDupRate.getOrElse {
      val stats = df.agg(count(col(textCol)).as("n"),
        approx_count_distinct(md5(col(textCol))).as("nd")).head()
      val n = stats.getLong(0)
      if (n == 0L) 0.0 else 1.0 - stats.getLong(1).toDouble / n
    }
    if (dupRate < dedupFirstMinDupRate) {
      // low-dup corpus: fingerprint every row directly — the digest
      // window and expansion joins would buy nothing. A null text yields
      // no token rows, hence no fingerprint, and never pairs (the
      // raw-oracle semantics, same as groupNulls = false singletons).
      bandedPairs(simhashFingerprints(df, idCol, textCol, bits))
    } else {
      // dup-heavy corpus: decide band collisions once per DISTINCT text,
      // re-enter exact copies through membership equi-joins.
      // groupNulls = false: the d06 oracle is the RAW banded formulation,
      // where a null text yields no token/fingerprint rows and never pairs
      val members = digestMembership(df, idCol, md5(col(textCol)), groupNulls = false)
        .select("rep", "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val repPairs = bandedPairs(
        simhashFingerprints(repRows(df, idCol, members), idCol, textCol, bits))
      val cross = expandCross(repPairs, members, "doc_a", "doc_b")
        .select("doc_a", "doc_b", "hamming")
      val within = withinGroupPairs(members, "doc_a", "doc_b")
        .select(col("doc_a"), col("doc_b"), lit(0).cast("int").as("hamming"))
      val out = cross.union(within).localCheckpoint()
      members.unpersist()
      out
    }
  }

  /** Deletion-variant set of a string: the string itself plus every
    * single-character deletion, distinct (one JIT'd loop per row). If
    * ed(a, b) <= 1 then variants(a) and variants(b) intersect — equal
    * strings share themselves; a substitution at position i means deleting
    * position i from both yields the same string; an insertion means
    * deleting the inserted character recovers the other string — so the
    * variant equi-join has FULL recall for edit distance <= 1. */
  private val deletionVariantsUdf = udf { (s: String) =>
    if (s == null) Seq.empty[String]
    else {
      val out = new scala.collection.mutable.LinkedHashSet[String]
      out += s
      var i = 0
      while (i < s.length) {
        out += (s.substring(0, i) + s.substring(i + 1))
        i += 1
      }
      out.toSeq
    }
  }

  /** Fuzzy-match pairs within Levenshtein distance 1, by deletion-
    * neighborhood blocking: explode each string's |s|+1 deletion variants,
    * equi-join on the variant, verify candidates with an exact
    * `levenshtein` (candidates include some distance-2 pairs — delete in
    * one string, insert in the other — which the verify filters out).
    *
    * Scale shape (the PassJoin/SymDelete family): the variant table is
    * linear in total string length, candidate generation is an EQUI-join
    * on the variant key — never an all-pairs cross join — and the exact
    * Levenshtein runs only on candidate pairs, which are linear in the
    * true fuzzy-match count for id-like keys. The variant table feeds both
    * sides of the self-join, so it is persisted for the call and released
    * once the small verified pair set materializes (the LSH convention;
    * `materialize = false` keeps the plan lazy for shape assertions).
    * Output: (id_a < id_b, edit_dist). */
  def fuzzyPairsEd1(df: DataFrame, idCol: String, strCol: String,
                    materialize: Boolean = true): DataFrame =
    ed1VerifiedPairs(df, idCol, strCol, materialize)
      .select("id_a", "id_b", "edit_dist")

  /** Shared ed<=1 candidate chain behind [[fuzzyPairsEd1]] and
    * [[jaroWinklerBlocked]]: deletion-variant equi-join, pair-key dedup,
    * string re-attach, exact-Levenshtein verify. Returns verified pairs
    * (id_a < id_b) WITH both strings so scorers can run on top.
    *
    * The variant self-join and the candidate `.distinct()` carry ONLY
    * (id, variant) / (id_a, id_b) — never the strings (they'd ride the
    * dedup shuffle as dead weight in the key). Strings re-attach from the
    * base table via two equi-joins on id, which touch only the (small)
    * deduped candidate set — at 100 TB the wide payload moves once, for
    * candidates, not |s|+1 times per string through the variant shuffle. */
  private def ed1VerifiedPairs(df: DataFrame, idCol: String, strCol: String,
                               materialize: Boolean): DataFrame = {
    val base = df.select(col(idCol).as("fid"), col(strCol).as("fstr"))
    val lazyVariants = base
      .select(col("fid"), explode(deletionVariantsUdf(col("fstr"))).as("variant"))
    val v =
      if (materialize) lazyVariants.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else lazyVariants
    val keys = v.select(col("fid").as("id_a"), col("variant"))
      .join(v.select(col("fid").as("id_b"), col("variant")), "variant")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val pairs = keys
      .join(base.select(col("fid").as("id_a"), col("fstr").as("str_a")), "id_a")
      .join(base.select(col("fid").as("id_b"), col("fstr").as("str_b")), "id_b")
      .withColumn("edit_dist", levenshtein(col("str_a"), col("str_b")).cast("int"))
      .filter(col("edit_dist") <= 1)
    if (!materialize) pairs
    else {
      val out = pairs.localCheckpoint()
      v.unpersist()
      out
    }
  }

  /** Blocked Jaro-Winkler pair matching: the d09 deletion-neighborhood
    * bounds the candidate set (full recall for ed<=1), then the native
    * codegen [[graft.functions.JaroWinkler]] kernel scores ONLY the
    * verified candidates and keeps pairs at or above `threshold` — the
    * corpus-scale complement to [[jaroWinklerTopK]]'s probe-broadcast
    * scan. Candidate generation is an equi-join on the variant key (never
    * probe x corpus, never a nested loop); the scorer is a narrow pass
    * over the candidate pairs. Output: (id_a < id_b, jw rounded to 6). */
  def jaroWinklerBlocked(df: DataFrame, idCol: String, strCol: String,
                         threshold: Double, materialize: Boolean = true): DataFrame =
    ed1VerifiedPairs(df, idCol, strCol, materialize)
      .withColumn("jw_raw",
        graft.functions.StringFunctions.jaroWinkler(col("str_a"), col("str_b")))
      .filter(col("jw_raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jw_raw"), 6).as("jw"))

  /** Incremental dedup — the daily-ingestion shape: keep an `incoming`
    * row iff its content digest appears neither in the `existing` corpus
    * nor earlier (smaller id) within the batch itself. Two hash-shuffle
    * passes at any scale: a left ANTI join of incoming digests against
    * the (pre-computed, at production scale digest-bucketed) corpus
    * digest index, then the standard min-id window within the batch. The
    * corpus side projects ONLY its digest column — the 100 TB corpus
    * never rereads its payload to admit a new batch. */
  def incrementalDedup(existing: DataFrame, incoming: DataFrame,
                       idCol: String, textCol: String): DataFrame = {
    val seen = existing.select(md5(col(textCol)).as("digest")).distinct()
    val fresh = incoming
      .select(col(idCol).as("doc_id"), md5(col(textCol)).as("digest"))
      .join(seen, Seq("digest"), "left_anti")
    fresh
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("digest").orderBy("doc_id")))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("digest"))
  }

  /** Bloom-prefiltered incremental dedup — [[incrementalDedup]]'s exact
    * semantics with the standard 100 TB shuffle cut: a digest Bloom
    * filter over the corpus (`DataFrameStatFunctions.bloomFilter`, zero
    * false negatives by construction) broadcasts to the batch scan, and
    * only rows the filter SUSPECTS pay the exact anti-join against the
    * corpus digest set. On a typical crawl batch (a few % true dups +
    * fpp false positives) that shrinks the anti-join's probe side from
    * |batch| to ~(dupRate + fpp)·|batch| — the clean majority is admitted
    * scan-side with no shuffle at all, which is the point at 100 TB where
    * the batch itself is terabytes. False positives cost only a wasted
    * verify row (the anti-join gives the exact answer); false negatives
    * cannot occur, so the result is row-identical to [[incrementalDedup]]
    * (DedupSpec pins it, and d19's oracle is the same SQL as d10's).
    *
    * Null-text parity: the bloom probe returns false for null digests, so
    * nulls take the no-shuffle path — matching the exact formulation,
    * where a null digest never equi-matches the corpus and dedups only
    * within the batch window. Building the filter is one aggregation scan
    * of the corpus digest column (driver holds ~1.2 bytes/item at 1% fpp);
    * at production scale it is built ONCE alongside the standing digest
    * index and reused per batch — the per-call build here mirrors the
    * harness's self-contained query contract. The probe itself is a
    * broadcast bloom + one JIT'd `mightContainString` per row (same
    * justification as n09/deletionVariantsUdf: a compiled loop, and no
    * codegen'd built-in expresses an arbitrary-object bloom probe).
    *
    * `expectedItems <= 0` (the default) sizes the filter from a cheap
    * `approx_count_distinct` over the corpus digests — one extra
    * aggregation-only scan, paid once per build. A FIXED default would be
    * a silent perf trap: a corpus far above it saturates the filter (fpp
    * approaches 1) and the prefilter degrades to a no-op, so every batch
    * row pays the anti-join — correct (the exact verify still runs) but
    * the entire point of the bloom gate evaporates. Callers who already
    * know the corpus cardinality (the standing-index path, where the
    * build manifest records it) pass it explicitly and skip the scan;
    * the HLL estimate's ±2% error is absorbed by a 1.1x headroom factor. */
  def bloomIncrementalDedup(existing: DataFrame, incoming: DataFrame,
                            idCol: String, textCol: String,
                            expectedItems: Long = -1L,
                            fpp: Double = 0.01): DataFrame = {
    val spark = existing.sparkSession
    val corpusDigests = existing.select(md5(col(textCol)).as("digest"))
    val items =
      if (expectedItems > 0) expectedItems
      else math.max(1000L,
        (corpusDigests.agg(approx_count_distinct("digest")).head().getLong(0) * 1.1).toLong)
    val bf = corpusDigests.stat.bloomFilter(col("digest"), items, fpp)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf { (d: String) => d != null && bfB.value.mightContainString(d) }
    val batch = incoming.select(col(idCol).as("doc_id"), md5(col(textCol)).as("digest"))
    // no false negatives: a row the filter clears is provably corpus-new
    val cleanNew = batch.filter(!mightContain(col("digest")))
    val verifiedNew = batch.filter(mightContain(col("digest")))
      .join(corpusDigests.distinct(), Seq("digest"), "left_anti")
      .select("doc_id", "digest")
    cleanNew.select("doc_id", "digest").union(verifiedNew)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("digest").orderBy("doc_id")))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("digest"))
  }

  /** Write the standing NEAR-dup index of `corpus` under `path` — the
    * artifact [[incrementalNeardupPairs]] probes so a daily batch never
    * rereads (or re-shingles, or re-hashes) the 100 TB corpus. The index
    * is GENERATIONAL: each `gen=N/` directory is one complete, immutable
    * contribution — `gen=0` is this base build, every
    * [[ingestNeardupBatch]] adds a `gen=N+1`, and readers take the union
    * of all generations ([[indexTable]]'s glob). Inside a generation:
    *   - `members/`  (digest, rep, doc_id): digest-group membership,
    *     rep = min id per distinct text ([[neardupPairs]]' dedup-first rule);
    *   - `shingles/` (doc_id, shingles): shingle sets of the reps only —
    *     the Jaccard-verify side;
    *   - `bands/`    (doc_id, bkey): the exploded LSH band table of the
    *     rep MinHash signatures — the candidate-generation side;
    *   - `meta/`     one row, the generation's max doc id (readers take
    *     the max over generations for the id-monotonicity guard).
    * At production scale `bands/` is additionally bucketed BY bkey so the
    * probe's band equi-join co-locates without a corpus-side shuffle, and
    * [[compactNeardupIndex]] periodically folds the accumulated
    * generations back into one.
    *
    * The build is multi-process safe: all four tables are written into a
    * private temp sibling and installed at `path` with an atomic directory
    * rename ([[IndexStore.atomically]]), so a concurrent probe reads
    * either the previous complete index or the new one — never a torn
    * mid-overwrite state. */
  def writeNeardupIndex(corpus: DataFrame, idCol: String, textCol: String,
                        path: String, shingleN: Int = 3, k: Int = 32,
                        bands: Int = 16): Unit =
    IndexStore.atomically(corpus.sparkSession, path) { tmp =>
      val g0 = s"$tmp/gen=0"
      digestMembership(corpus, idCol, md5(col(textCol)), groupNulls = true)
        .write.mode("overwrite").parquet(s"$g0/members")
      // reps derive from the JUST-WRITTEN members table, not a recompute of
      // its lineage — the digest window over the corpus (its most expensive
      // scan + shuffle) runs exactly once per build
      val members = corpus.sparkSession.read.parquet(s"$g0/members")
      val sh = shingleTable(repRows(corpus, idCol, members), idCol, textCol, shingleN)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sh.write.mode("overwrite").parquet(s"$g0/shingles")
      minhashSignaturesFrom(sh, k)
        .select(col("doc_id"), explode(expr(bandKeys("sig", bands, k / bands))).as("bkey"))
        .write.mode("overwrite").parquet(s"$g0/bands")
      sh.unpersist()
      // One-row build manifest: the max corpus id, so probes can enforce the
      // ids-are-monotonic contract (see incrementalNeardupPairs) instead of
      // trusting a comment. Aggregated from the just-written members table —
      // no extra corpus scan. Cast pinned to BIGINT so every generation's
      // meta unions under one schema regardless of the id column's width.
      members.agg(max(col("doc_id")).cast("long").as("max_corpus_id"))
        .write.mode("overwrite").parquet(s"$g0/meta")
    }

  /** One index table as the union of all installed generations. The glob
    * skips [[IndexStore]]'s dot-prefixed in-flight/retired siblings by
    * construction. Indexes written by the pre-generational layout (tables
    * directly under the path, no `gen=N/` level) are still readable: when
    * no generation directory exists the read falls back to
    * `$indexPath/$table`, so a standing index from an older build degrades
    * gracefully instead of failing its first probe with path-not-found —
    * its first [[ingestNeardupBatch]] then adds `gen=1` alongside and the
    * union covers both layouts from that point on. */
  private def indexTable(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String, table: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = fs.globStatus(new org.apache.hadoop.fs.Path(root, "gen=*"))
    val legacy = fs.exists(new org.apache.hadoop.fs.Path(root, table))
    val paths =
      (if (gens != null && gens.nonEmpty) Seq(s"$indexPath/gen=*/$table") else Nil) ++
        (if (legacy) Seq(s"$indexPath/$table") else Nil)
    require(paths.nonEmpty,
      s"indexTable: no '$table' under $indexPath (neither gen=*/ nor legacy flat layout)")
    spark.read.parquet(paths: _*)
  }

  /** Max doc id across all generations (None for an empty-corpus index). */
  def indexMaxCorpusId(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String): Option[Long] = {
    val r = indexTable(spark, indexPath, "meta")
      .agg(max(col("max_corpus_id").cast("long"))).head()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  /** The batch's contributions relative to the STANDING index — the shared
    * derivation behind both the probe and the ingest:
    *   - `assigned`: every batch row with its digest, in-batch rep
    *     (`batch_rep`), standing-group rep if the digest is already
    *     indexed (`corpus_rep`), the effective `rep` (coalesce of the
    *     two — exactly the min-id rule given the id-monotonicity
    *     contract), and the raw text (`__text`);
    *   - `newSh`: shingle rows for NEW reps only (texts the index has
    *     never seen) — the only rows shingled/minhashed this run;
    *   - `newBands`: the exploded LSH band rows of those new reps.
    * `pin` is the caller's materialization policy (persist for real runs,
    * identity for lazy plan-shape assertions); newSh derives from the
    * pinned `assigned`, newBands from the pinned `newSh`. */
  private def batchContributions(spark: org.apache.spark.sql.SparkSession,
                                 indexPath: String, batch: DataFrame,
                                 idCol: String, textCol: String,
                                 shingleN: Int, k: Int, bands: Int,
                                 pin: DataFrame => DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val members = indexTable(spark, indexPath, "members")
    val batchDigests = digestMembership(batch, idCol, md5(col(textCol)), groupNulls = true)
      .withColumnRenamed("rep", "batch_rep")
    val assigned = pin(batchDigests
      .join(batch.select(col(idCol).as("doc_id"), col(textCol).as("__text")), "doc_id")
      .join(members.select(col("digest"), col("rep").as("corpus_rep")).distinct(),
        Seq("digest"), "left")
      .withColumn("rep", coalesce(col("corpus_rep"), col("batch_rep"))))
    val newSh = pin(assigned
      .filter(col("corpus_rep").isNull && col("doc_id") === col("batch_rep"))
      .select(col("doc_id"), shinglesUdf(shingleN)(col("__text")).as("shingles")))
    val newBands = pin(minhashSignaturesFrom(newSh, k)
      .select(col("doc_id"), explode(expr(bandKeys("sig", bands, k / bands))).as("bkey")))
    (assigned, newSh, newBands)
  }

  /** Enforce the ids-are-monotonic contract: every batch id must exceed
    * every indexed id (one 1-row action per side). */
  private def requireMonotonicIds(spark: org.apache.spark.sql.SparkSession,
                                  indexPath: String, batch: DataFrame,
                                  idCol: String, op: String): Unit =
    indexMaxCorpusId(spark, indexPath).foreach { maxCorpus =>
      val minRow = batch.agg(min(col(idCol))).head()
      if (!minRow.isNullAt(0)) {
        // getAs[Number]: id columns may surface as INT or BIGINT depending
        // on the writer — don't ClassCastException on a narrower type.
        val minBatch = minRow.getAs[Number](0).longValue()
        require(minBatch > maxCorpus,
          s"$op: batch ids must exceed all corpus ids " +
            s"(min batch id $minBatch <= max corpus id $maxCorpus); the min-id " +
            "rep rule would silently diverge from a full recompute")
      }
    }

  /** Absorb a probed batch INTO the standing index as a new generation —
    * the "then make today's batch part of tomorrow's corpus" step of the
    * daily pipeline. Work is batch-proportional (the same contributions
    * the probe computes: membership rows for every batch doc, shingles
    * and bands for NEW texts only); the corpus is never re-read. After
    * ingest, [[incrementalNeardupPairs]] against this index equals a
    * probe against a from-scratch [[writeNeardupIndex]] over
    * corpus ∪ batch (DedupSpec pins the equivalence).
    *
    * The generation directory installs atomically ([[IndexStore]]), so a
    * concurrent probe sees the batch's contribution whole or not at all —
    * never a members row whose bands are missing. Ingestion itself is
    * SINGLE-WRITER (the standard ingestion-pipeline contract): two
    * processes ingesting concurrently could pick the same generation
    * number, and last-installer-wins would drop one batch whole. */
  def ingestNeardupBatch(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String, batch: DataFrame,
                         idCol: String, textCol: String,
                         shingleN: Int = 3, k: Int = 32,
                         bands: Int = 16): Unit = {
    requireMonotonicIds(spark, indexPath, batch, idCol, "ingestNeardupBatch")
    def pin(df: DataFrame): DataFrame =
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (assigned, newSh, newBands) =
      batchContributions(spark, indexPath, batch, idCol, textCol, shingleN, k, bands, pin)
    // next generation = max existing + 1 (single-writer contract above)
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = fs.listStatus(new org.apache.hadoop.fs.Path(indexPath))
      .map(_.getPath.getName).filter(_.startsWith("gen="))
      .map(_.stripPrefix("gen=").toLong)
    val next = if (gens.isEmpty) 0L else gens.max + 1L
    IndexStore.atomically(spark, s"$indexPath/gen=$next") { tmp =>
      assigned.select("digest", "rep", "doc_id")
        .write.mode("overwrite").parquet(s"$tmp/members")
      newSh.write.mode("overwrite").parquet(s"$tmp/shingles")
      newBands.write.mode("overwrite").parquet(s"$tmp/bands")
      batch.agg(max(col(idCol)).cast("long").as("max_corpus_id"))
        .write.mode("overwrite").parquet(s"$tmp/meta")
    }
    newBands.unpersist(); newSh.unpersist(); assigned.unpersist()
  }

  /** Fold all accumulated generations back into one — the index's
    * table-maintenance pass (the [[Scale.compact]] discipline applied to
    * the standing index): every ingest adds a generation whose tables are
    * small batch-sized files, so after N batches a probe unions N+1
    * fragments and the band equi-join reads N+1 sets of footers; the
    * compaction rewrites each table ONCE, repartitioned on its join key
    * (members by digest, bands by bkey — the keys the probe joins on),
    * as a fresh single-generation index installed atomically over the old
    * one. Result-transparent by construction (the generations are
    * disjoint contributions whose union IS the index; DedupSpec pins
    * probe-identity before/after) and the superseded generations are
    * retired wholesale by the directory swap. */
  def compactNeardupIndex(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String, nFiles: Int = 0): Unit = {
    val n = if (nFiles > 0) nFiles else spark.sparkContext.defaultParallelism
    IndexStore.atomically(spark, indexPath) { tmp =>
      val g0 = s"$tmp/gen=0"
      indexTable(spark, indexPath, "members").repartition(n, col("digest"))
        .write.mode("overwrite").parquet(s"$g0/members")
      indexTable(spark, indexPath, "shingles").repartition(n, col("doc_id"))
        .write.mode("overwrite").parquet(s"$g0/shingles")
      indexTable(spark, indexPath, "bands").repartition(n, col("bkey"))
        .write.mode("overwrite").parquet(s"$g0/bands")
      indexTable(spark, indexPath, "meta")
        .agg(max(col("max_corpus_id").cast("long")).as("max_corpus_id"))
        .write.mode("overwrite").parquet(s"$g0/meta")
    }
  }

  /** Incremental NEAR-dup — the daily-crawl probe: all near-dup pairs
    * TOUCHING the batch, exactly as recomputing [[neardupPairs]] over
    * corpus+batch and keeping pairs with a batch member, but with work
    * proportional to the BATCH: signatures/shingles are computed for new
    * distinct batch texts only, candidates come from a band equi-join of
    * those against the stored index, and every corpus-side input (members,
    * bands, shingles) is read from the index — the corpus text is never
    * touched.
    *
    * Recompute-faithfulness is the subtle part, and drives the shape:
    *   - A batch doc whose digest exists in the corpus joins the standing
    *     group (its rep stays the corpus rep); one with a new digest reps
    *     at its batch-min id — so group membership equals the full
    *     recompute's.
    *   - The active reps re-scored are the NEW reps plus corpus reps whose
    *     group gained a batch copy: every recomputed pair touching the
    *     batch has an active endpoint (a batch member is in some group ⇒
    *     that group's rep is active), so probing only active reps loses
    *     nothing.
    *   - The `maxBucket` skew cap counts corpus + new reps per bucket
    *     (index bands ∪ new bands), because a new rep can push a standing
    *     bucket over the cap in the full recompute — counted on the union,
    *     the incremental candidates match it exactly.
    * Output: (doc_a < doc_b, jaccard) — within-digest pairs at 1.0,
    * cross-group pairs at their verified rep jaccard. */
  def incrementalNeardupPairs(spark: org.apache.spark.sql.SparkSession,
                              indexPath: String, batch: DataFrame,
                              idCol: String, textCol: String,
                              shingleN: Int = 3, k: Int = 32, bands: Int = 16,
                              maxBucket: Int = 50, threshold: Double = 0.5,
                              materialize: Boolean = true): DataFrame = {
    // only the materialized path persists/checkpoints: the lazy path
    // (plan-shape assertions) must not leak storage blocks
    def pin(df: DataFrame): DataFrame =
      if (materialize) df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df
    val members = indexTable(spark, indexPath, "members")
    // PRECONDITION (enforced on the materialized path): every batch id
    // must be strictly greater than every corpus id. The recompute-
    // equivalence argument below leans on it — coalesce(corpus_rep,
    // batch_rep) equals the min-id rep rule only when corpus ids sort
    // first. The materialize = false path skips the guard — that path
    // exists for plan-SHAPE assertions and must stay action-free, so the
    // contract is UNCHECKED there (documented trade, not an oversight).
    if (materialize)
      requireMonotonicIds(spark, indexPath, batch, idCol, "incrementalNeardupPairs")
    val idxBands = indexTable(spark, indexPath, "bands")
    val idxSh = indexTable(spark, indexPath, "shingles")
    // batch rep assignment: corpus rep when the digest is standing (ids in
    // the corpus are smaller by contract), else the batch-min id. The
    // digest goes through the SAME keying as the stored index (null texts
    // share the sentinel group across corpus and batch, like the oracle's
    // window partitioning over the union — raw SQL null = null would not
    // match in the join). Shared derivation with ingestNeardupBatch.
    val (assigned, newSh, newBands) =
      batchContributions(spark, indexPath, batch, idCol, textCol, shingleN, k, bands, pin)
    val batchMembers = assigned.select("digest", "rep", "doc_id")
    val allMembers = members.select("digest", "rep", "doc_id").union(batchMembers)
    // within-digest pairs touching the batch: exact copies, jaccard 1.0
    val exact = allMembers
      .join(batchMembers.select(col("digest"), col("doc_id").as("bid")), "digest")
      .filter(col("doc_id") =!= col("bid"))
      .select(least(col("doc_id"), col("bid")).as("doc_a"),
        greatest(col("doc_id"), col("bid")).as("doc_b"))
      .distinct()
      .withColumn("jaccard", lit(1.0))
    // active = new reps + corpus reps whose group gained a batch copy
    val affected = assigned.filter(col("corpus_rep").isNotNull)
      .select(col("corpus_rep").as("doc_id")).distinct()
    val activeBands = newBands.union(idxBands.join(affected, Seq("doc_id"), "left_semi"))
    val allBands = idxBands.union(newBands)
    // skew cap over COMBINED bucket sizes, anti-joined away before any
    // bucket pair materializes (same discipline as minhashCandidatesFrom)
    val oversized = allBands.groupBy("bkey").agg(count(lit(1)).as("bsize"))
      .filter(col("bsize") > maxBucket).select("bkey")
    val candPairs = activeBands.join(broadcast(oversized), Seq("bkey"), "left_anti")
      .select(col("doc_id").as("x"), col("bkey"))
      .join(allBands.join(broadcast(oversized), Seq("bkey"), "left_anti")
        .select(col("doc_id").as("y"), col("bkey")), "bkey")
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("rep_a"), greatest(col("x"), col("y")).as("rep_b"))
      .distinct()
    // Jaccard verify: corpus shingles come from the index, new from newSh
    val allSh = idxSh.union(newSh)
    val verified = candPairs
      .join(allSh.select(col("doc_id").as("rep_a"), col("shingles").as("sh_a")), "rep_a")
      .join(allSh.select(col("doc_id").as("rep_b"), col("shingles").as("sh_b")), "rep_b")
      .withColumn("jaccard",
        expr("cast(size(array_intersect(sh_a, sh_b)) as double) / cast(size(array_union(sh_a, sh_b)) as double)"))
      .filter(col("jaccard") >= threshold)
      .select(col("rep_a").as("doc_a"), col("rep_b").as("doc_b"),
        round(col("jaccard"), 6).as("jaccard"))
    // expansion restricted to batch-touching pairs: one side expands
    // through batch members, the other through all members (both ways,
    // through the shared expandCross body — batch x batch expansions
    // appear on both sides, hence the distinct)
    val bm = batchMembers.select(col("rep"), col("doc_id"))
    val am = allMembers.select(col("rep"), col("doc_id"))
    val cross = expandCross(verified, bm, am, "doc_a", "doc_b")
      .union(expandCross(verified, am, bm, "doc_a", "doc_b"))
      .select("doc_a", "doc_b", "jaccard")
      .distinct()
    val result = cross.union(exact)
    if (!materialize) result // lazy plan, for shape assertions (nothing cached)
    else {
      val out = result.localCheckpoint()
      newBands.unpersist(); newSh.unpersist(); assigned.unpersist()
      out
    }
  }

  /** Jaro-Winkler top-k name matching: each (broadcast) probe scores the
    * whole corpus with the native [[graft.functions.JaroWinkler]]
    * expression and keeps the k best matches — the scoring stage of
    * record linkage. The corpus is scanned ONCE with the probe side
    * broadcast (the s01 brute-force shape); the kernel call stays inside
    * whole-stage codegen, so at scale this is a single fused narrow pass
    * plus the per-probe top-k window. Blocking variants (d09's deletion
    * neighborhood, LSH) bound the candidate set when the corpus is too
    * big for even a fused scan per probe — [[jaroWinklerBlocked]] is the
    * built blocked variant. */
  def jaroWinklerTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
                      strCol: String, k: Int = 3): DataFrame = {
    val p = broadcast(probes.select(col(idCol).as("probe_id"), col(strCol).as("probe_str")))
    val q = corpus.select(col(idCol).as("cand_id"), col(strCol).as("cand_str"))
    p.join(q, col("probe_id") =!= col("cand_id"))
      .withColumn("s", graft.functions.StringFunctions.jaroWinkler(col("probe_str"), col("cand_str")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("probe_id").orderBy(col("s").desc, col("cand_id"))))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("cand_id"),
        round(col("s"), 6).as("jw"))
  }

  /** Embedding-cosine near-dup pairs of `probes` x `corpus` (exact, for a
    * small probe set — the full-corpus scale path is LSH bucketing, see
    * graft.ext.Similarity). Vectors are summed left-to-right in DOUBLE
    * (compiled kernels from [[Similarity]]) so the result is deterministic
    * and engine-portable. */
  def embeddingNeardupPairs(probes: DataFrame, corpus: DataFrame, idCol: String,
                            vecCol: String, threshold: Double): DataFrame = {
    def normed(d: DataFrame, prefix: String) = d
      .select(col(idCol).as(s"${prefix}_id"),
        col(vecCol).cast("array<double>").as(s"${prefix}_v"))
      .withColumn(s"${prefix}_norm", graft.functions.VectorFunctions.l2norm(col(s"${prefix}_v")))
    val p = broadcast(normed(probes, "probe"))
    val q = normed(corpus, "vec")
    p.join(q, col("probe_id") =!= col("vec_id"))
      .withColumn("cosine",
        graft.functions.VectorFunctions.dot(col("probe_v"), col("vec_v"))
          / (col("probe_norm") * col("vec_norm")))
      .filter(col("cosine") >= threshold)
      .select(col("probe_id"), col("vec_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** Every k-token window of a text, in position order (compiled UDF —
    * same rationale as [[shinglesUdf]]: one JIT'd loop per document
    * instead of an interpreted slice/concat lambda per window, measured
    * ~4x on the window table). Texts shorter than k yield no windows. */
  def windowsUdf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null) Array.empty[String]
      else {
        val t = text.split(" ", -1)
        val m = t.length - (k - 1)
        if (m <= 0) Array.empty[String]
        else Array.tabulate(m)(i => t.slice(i, i + k).mkString(" "))
      }
    }

  /** (doc_id, start, h) window-hash table: one 60-bit portable hash per
    * k-token window, `start` the 1-based token position. Linear in corpus
    * token count: the window strings come from one compiled loop per
    * document, the hash is a top-level codegen'd md5 per window;
    * documents shorter than k contribute no windows. */
  def windowHashes(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("doc_id"), windowsUdf(k)(col(textCol)).as("ws"))
      .select(col("doc_id"), posexplode(col("ws")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("start"),
        expr(portableHash("col", "'span'")).as("h"))

  /** Cross-document duplicated token spans — the hash-window approximation
    * of suffix-array substring dedup (the span-level complement to
    * document-level MinHash): a k-token window whose content occurs in at
    * least `minDocs` distinct documents is flagged, and flagged windows at
    * consecutive positions merge (gaps-and-islands) into maximal
    * duplicated spans. Returns (doc_id, span_start, span_end, n_windows),
    * token positions 1-based, span_end inclusive — the input to span
    * surgery ("excise every duplicated run >= k tokens") or to
    * [[spanCoverage]]'s per-document duplication fraction. Spans are
    * disjoint in window-START space; their token EXTENTS overlap when
    * two islands sit closer than k tokens (consumers that need a token
    * union — coverage, excision — merge or anti-join accordingly).
    *
    * Scale shape (the reason this beats a literal suffix array on a
    * cluster): the window table is LINEAR in corpus tokens; duplicated
    * hashes come from ONE map-side-combined hash aggregate on the 60-bit
    * hash; marking is an equi-join of windows against the (small —
    * duplicated content only) hash set; span assembly is a window
    * partitioned by doc_id, never a global sort. Nothing is quadratic: a
    * window shared by a million documents costs a million marked rows, not
    * a trillion pairs, so boilerplate needs no skew cap here. At 100 TB
    * the duplicated-hash set is the artifact to persist (hash-bucketed)
    * and anti-join incrementally, exactly like [[incrementalDedup]]'s
    * digest index. */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 8, minDocs: Int = 2,
                      materialize: Boolean = true): DataFrame = {
    // windows feed both the dup-hash aggregate and the mark join: persist
    // for the call so the corpus is tokenized once, release on materialize
    val win = windowHashes(df, idCol, textCol, k)
    val winP = if (materialize) win.persist() else win
    // minDocs == 2 (the standard setting) needs no distinct aggregate:
    // "appears in >= 2 distinct docs" is exactly min(doc_id) != max(doc_id),
    // one map-side-combined pass instead of countDistinct's two-phase
    // (h, doc_id) dedup shuffle
    val dup =
      if (minDocs == 2)
        winP.groupBy("h")
          .agg(min("doc_id").as("d0"), max("doc_id").as("d1"))
          .filter(col("d0") =!= col("d1"))
          .select("h")
      else
        winP.groupBy("h")
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= minDocs)
          .select("h")
    val spans = islandSpans(winP.join(dup, "h"), k)
    if (!materialize) spans
    else { val out = spans.localCheckpoint(); winP.unpersist(); out }
  }

  /** Gaps-and-islands over MARKED window starts (doc_id, start): maximal
    * runs of consecutive starts become (doc_id, span_start, span_end,
    * n_windows) with span_end = last start + k - 1. One window pass
    * partitioned per doc. */
  private def islandSpans(marked: DataFrame, k: Int): DataFrame =
    marked
      .withColumn("g", col("start") - row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("start")))
      .groupBy("doc_id", "g")
      .agg(min("start").as("span_start"),
        (max("start") + (k - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")

  /** Span surgery over [[duplicatedSpans]]: excise every duplicated span
    * and reassemble the residual text — (doc_id, clean_text, n_tokens,
    * kept_tokens). The symmetric policy (remove the span from EVERY
    * holder) is the standard conservative cut for cross-doc boilerplate;
    * keep-one-copy composes by exempting [[exactDedup]]/`p05` canonical
    * holders upstream. Shape: tokens posexplode once; covered positions
    * leave via a LEFT ANTI join against the per-doc span list (equi on
    * doc_id + BETWEEN on position — spans per doc are few, so the range
    * predicate rides the equi-join); reassembly is one sort_array over
    * (pos, token) structs per doc — grouped, never a global sort. Docs
    * with no surviving tokens keep an empty clean_text. */
  def spanExcise(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 8, minDocs: Int = 2): DataFrame =
    exciseWith(df, idCol, textCol,
      duplicatedSpans(df, idCol, textCol, k, minDocs))

  /** Span-level decontamination — the surgical form of [[TextAnalysis]]'
    * doc-level `decontaminate`: any k-token window of a `train` document
    * whose content appears ANYWHERE in the `benchmark` set is excised
    * (consecutive hits merge into spans first), and the residual text
    * reassembles. The [[duplicatedSpans]] machinery with an asymmetric
    * marking rule: the dup-hash set is the benchmark's distinct window
    * hashes instead of cross-corpus counts. Scale shape matches
    * [[incrementalDedup]]: the benchmark side reduces to a distinct
    * digest-like hash index (persist it once, reuse per training batch);
    * the train corpus streams through two narrow passes plus the
    * per-doc span window. */
  def spanDecontaminate(train: DataFrame, benchmark: DataFrame,
                        idCol: String, textCol: String, k: Int = 8): DataFrame = {
    // Dedup-first (marking depends only on CONTENT, so it is exact here
    // with no count subtlety): mark + excise once per distinct train
    // text, then every copy inherits its digest's cleaned result —
    // measured 17 s -> ~7 s on the 10x-tiled sf1 corpus.
    val t = train.select(col(idCol).as("doc_id"),
      md5(col(textCol)).as("digest"), col(textCol).as("txt"))
    val reps = t.groupBy("digest").agg(first(col("txt")).as("txt"))
    val benchH = windowHashes(benchmark, idCol, textCol, k).select("h").distinct()
    val marked = windowHashes(reps, "digest", "txt", k)
      .join(benchH, "h").select("doc_id", "start")
    val cleanedReps = exciseWith(reps, "digest", "txt", islandSpans(marked, k))
      .select(col("doc_id").as("digest"), col("clean_text"),
        col("n_tokens"), col("kept_tokens"))
    t.select("doc_id", "digest").join(cleanedReps, "digest")
      .select("doc_id", "clean_text", "n_tokens", "kept_tokens")
  }

  /** Excise `spans` (doc_id, span_start, span_end) from `df`'s token
    * runs and reassemble — shared tail of [[spanExcise]] /
    * [[spanDecontaminate]]. */
  private def exciseWith(df: DataFrame, idCol: String, textCol: String,
                         spansIn: DataFrame): DataFrame = {
    val spans = spansIn.select(col("doc_id"), col("span_start"), col("span_end"))
    val base = df.select(col(idCol).as("doc_id"), expr(tokens(textCol)).as("ts"))
    val toks = base
      .select(col("doc_id"), posexplode(col("ts")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"), col("col").as("t"))
    val kept = toks.join(spans,
        toks("doc_id") === spans("doc_id") &&
          col("p") >= col("span_start") && col("p") <= col("span_end"),
        "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("kept"),
        concat_ws(" ", expr("transform(array_sort(collect_list(struct(p, t))), s -> s.t)"))
          .as("clean"))
    // reattach: a fully-excised doc has NO surviving token rows but must
    // still appear, with an empty clean_text
    base.select(col("doc_id"), size(col("ts")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("clean"), lit("")).as("clean_text"),
        col("n_tokens"), coalesce(col("kept"), lit(0L)).as("kept_tokens"))
  }

  /** Containment (subset-duplication) pairs: C(A->B) = |A n B| / |A| >=
    * `t` over 3-gram shingle sets — the ASYMMETRIC near-dup case
    * (a document quoted or embedded inside a larger one) that symmetric
    * Jaccard misses: a short doc fully contained in a long one has low
    * Jaccard but containment 1.0.
    *
    * Blocking is the classic prefix filter with a pigeonhole recall
    * GUARANTEE: the verifier admits a pair iff |A∩B| >= ceil(|A|·t)
    * (`inter >= asize*t` on integers), i.e. |A \ B| <= |A| - ceil(|A|·t),
    * so among any |A| - ceil(|A|·t) + 1 shingles of A at least one lands
    * in B — joining that prefix of A against B's full posting list finds
    * every qualifying pair. The prefix length is derived from the SAME
    * integer product the verifier uses (not floor((1-t)|A|)+1, whose
    * floating-point (1-t) under-computes the bound exactly at integer
    * boundaries — e.g. t=0.8, |A|=5: 5*0.19999… floors to 0 → prefix 1,
    * but the verifier admits inter=4, i.e. |A\B|=1, requiring prefix 2). The prefix picks each doc's globally RAREST
    * shingles (df ascending, shingle tiebreak), the standard choice that
    * minimizes candidate fan-out; candidates then verify with the exact
    * intersection. Equi-joins only — prefix x posting, never all-pairs —
    * and the posting list of a boilerplate shingle fans out linearly,
    * never quadratically, because only PREFIX occurrences pair with it.
    * Returns (id_a, id_b, containment) with id_a the contained side. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       t: Double = 0.8, shingleN: Int = 3,
                       materialize: Boolean = true): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    // Exact-dedup-first (the d04 lesson, measured 7x at sf1): the prefix/
    // posting machinery runs once per DISTINCT text keyed by digest —
    // on a dup-heavy corpus n copies of a text would otherwise multiply
    // every candidate n x n — and exact copies re-enter afterwards
    // through digest equi-join expansions.
    val docs = df.select(col(idCol).as("doc_id"), md5(col(textCol)).as("digest"),
      col(textCol).as("txt"))
    val groups = docs.select("doc_id", "digest")
    val groupsP = if (materialize) groups.persist() else groups
    // all txt within a digest are identical, so first() is deterministic
    val reps = docs.groupBy("digest").agg(first(col("txt")).as("txt"))
    val sh = shingleTable(reps, "digest", "txt", shingleN)
      .withColumnRenamed("doc_id", "dig")
      .withColumn("asize", size(col("shingles")).cast("long"))
    val shP = if (materialize) sh.persist() else sh
    val posting = shP.select(col("dig"), col("asize"), explode(col("shingles")).as("s"))
    val dfreq = posting.groupBy("s").agg(count(lit(1)).as("sdf"))
    val prefix = posting.join(dfreq, "s")
      .withColumn("rn", row_number().over(
        w.partitionBy("dig").orderBy(col("sdf"), col("s"))))
      .filter(col("rn") <= col("asize") - ceil(col("asize") * t) + 1)
      .select(col("dig").as("dig_a"), col("s"))
    val cands = prefix
      .join(posting.select(col("dig").as("dig_b"), col("s")), "s")
      .filter(col("dig_a") =!= col("dig_b"))
      .select("dig_a", "dig_b").distinct()
    val repPairs = cands
      .join(shP.select(col("dig").as("dig_a"), col("shingles").as("sh_a"),
        col("asize")), "dig_a")
      .join(shP.select(col("dig").as("dig_b"), col("shingles").as("sh_b")), "dig_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .filter(col("inter") >= col("asize") * t)
      .select(col("dig_a"), col("dig_b"),
        round(col("inter").cast("double") / col("asize"), 6).as("containment"))
    // cross-digest expansion: every copy of A pairs with every copy of B
    val cross = repPairs
      .join(groupsP.select(col("digest").as("dig_a"), col("doc_id").as("id_a")), "dig_a")
      .join(groupsP.select(col("digest").as("dig_b"), col("doc_id").as("id_b")), "dig_b")
      .select(col("id_a"), col("id_b"), col("containment"))
    // within-digest pairs: identical texts contain each other exactly
    val within = groupsP.alias("x")
      .join(groupsP.alias("y"),
        col("x.digest") === col("y.digest") && col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        lit(1.0).as("containment"))
    val pairs = cross.union(within)
    if (!materialize) pairs
    else { val out = pairs.localCheckpoint(); shP.unpersist(); groupsP.unpersist(); out }
  }

  /** Per-document duplicated-token coverage over [[duplicatedSpans]]: how
    * many DISTINCT tokens sit inside at least one duplicated span and
    * what fraction of the document that is — the signal a curation
    * pipeline thresholds on ("drop documents more than X% duplicated").
    * Islands are disjoint in window-START space, but their token extents
    * overlap when two islands sit closer than k tokens (e.g. marked
    * starts {1,2,3} and {5} at k=4 cover [1,6] and [5,8]), so the spans
    * are interval-MERGED per document before summing — dup_tokens is the
    * true union length and dup_frac is guaranteed in [0,1], consistent
    * with [[spanExcise]]'s kept_tokens (n - dup = kept). Two windowed
    * passes over the tiny span table plus one corpus pass for token
    * counts; every document appears (zero coverage included). */
  def spanCoverage(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 8, minDocs: Int = 2): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("span_start")
    val merged = duplicatedSpans(df, idCol, textCol, k, minDocs)
      .withColumn("prev_e", max("span_end").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .withColumn("ng",
        when(col("span_start") > coalesce(col("prev_e"), lit(-1L)), 1L).otherwise(0L))
      .withColumn("grp", sum("ng").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "grp")
      .agg((max("span_end") - min("span_start") + 1).as("len"))
    val perDoc = merged.groupBy("doc_id").agg(sum(col("len")).as("dup"))
    df.select(col(idCol).as("doc_id"),
        size(expr(tokens(textCol))).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup"), lit(0L)).cast("double") / col("n_tokens"), 6)
          .as("dup_frac"))
  }
}
