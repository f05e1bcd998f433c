package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** (value, id) element carried by [[TopKByKey]] — `v` is the ranking
  * measure, `id` the payload and deterministic tiebreak. */
case class TopKElem(v: Long, id: Long)

/** Bounded per-key top-k Aggregator (reference mllib/rdd/
  * MLPairRDDFunctions.scala:41 topByKey = aggregateByKey over a
  * core/util/BoundedPriorityQueue.scala heap): every partial buffer holds
  * AT MOST k elements, so the map side combines locally and the shuffle
  * carries <= k rows per (key, map task) — the window-rank formulation by
  * contrast shuffles EVERY row and sorts whole key groups before
  * discarding all but k. Ordering matches the reference's implicit tuple
  * Ordering on (v, id): descending lexicographic, ties on v resolve to
  * the larger id — deterministic under any partitioning / merge order.
  * k is a tiny query constant, so the O(k log k) sort-trim per insert is
  * cheaper than heap bookkeeping at these sizes (same asymptotics as the
  * reference once k is fixed). */
class TopKByKey(k: Int) extends Aggregator[TopKElem, Seq[TopKElem], Seq[TopKElem]] {
  private def desc(a: TopKElem, b: TopKElem): Boolean =
    a.v > b.v || (a.v == b.v && a.id > b.id)
  private def trim(s: Seq[TopKElem]): Seq[TopKElem] =
    if (s.lengthCompare(k) <= 0) s else s.sortWith(desc).take(k)
  def zero: Seq[TopKElem] = Nil
  def reduce(b: Seq[TopKElem], a: TopKElem): Seq[TopKElem] = trim(b :+ a)
  def merge(x: Seq[TopKElem], y: Seq[TopKElem]): Seq[TopKElem] = trim(x ++ y)
  def finish(r: Seq[TopKElem]): Seq[TopKElem] = r.sortWith(desc)
  def bufferEncoder: Encoder[Seq[TopKElem]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[TopKElem]] = ExpressionEncoder()
}

/** Skew-handling utilities for 1000-executor scale. AQE's skew-join
  * splitting handles most cases at runtime; these are the explicit
  * patterns for when the skew is known up front (a hot grouping key, a
  * hot join key) and you want the plan shape guaranteed.
  */
object Scale {

  /** Minimum rows a task must amortize before a scan-spread repartition
    * pays for itself (below it, task-launch overhead eats the win). */
  val SpreadMinRowsPerSlot: Long = 4096L

  /** Spread a corpus frame across the session's parallelism BEFORE an
    * iterative chain persists it for repeated expression-heavy scans
    * (EM / gradient fits: 3-10 full passes against a broadcast 1-row
    * state). A small parquet table yields only a handful of input
    * splits, so every per-iteration scan would run on that many cores
    * no matter how wide the session is (s116 measured 2.3x on the
    * E-step scan alone at local[32]: 3 splits -> 32). Scale-adaptive,
    * not a local-mode constant (optimization guide s2.2/s2.5):
    *   - no-op when the source already has >= the session parallelism
    *     in partitions — the 100 TB case, where the input layout
    *     provides the splits and this must NOT add a corpus shuffle;
    *   - no-op when the frame is too small to amortize the extra tasks
    *     (rows-hint below [[SpreadMinRowsPerSlot]] per slot), so tiny
    *     1-partition feature frames keep their cheap single-task scans.
    * Row-count hint comes from the CALLER (these chains count() right
    * after persist anyway, or know the source cardinality); the
    * round-robin shuffle moves the narrow projected columns once.
    * Value-safe ONLY for partition-order-independent chains — exact
    * integer/DECIMAL sums, per-row projections — which is the house
    * quantization discipline for every EM/gradient operator. */
  def spreadForScans(df: DataFrame, rowsHint: Long): DataFrame = {
    val slots = df.sparkSession.sparkContext.defaultParallelism
    val parts = df.rdd.getNumPartitions
    if (parts >= slots || rowsHint < slots.toLong * SpreadMinRowsPerSlot) df
    else df.repartition(slots)
  }

  /** Per-key top-k through [[TopKByKey]]: group by `keyCol`, aggregate
    * (`vCol`, `idCol`) pairs into the k-bounded buffer, posexplode back
    * to one row per kept element with a 1-based `rk` in (v, id)
    * descending order. The aggregate is partial-merge distributed like a
    * built-in (ObjectHashAggregate partial -> final), so per-key state
    * never exceeds k anywhere in the plan. */
  def topKByKey(df: DataFrame, keyCol: String, vCol: String, idCol: String,
                k: Int): DataFrame = {
    val agg = udaf(new TopKByKey(k))
    df.groupBy(keyCol)
      .agg(agg(col(vCol).cast("long"), col(idCol).cast("long")).as("topk"))
      .select(col(keyCol), posexplode(col("topk")).as(Seq("pos", "e")))
      .selectExpr(keyCol, "CAST(pos + 1 AS BIGINT) AS rk",
        s"e.v AS $vCol", s"e.id AS $idCol")
  }

  /** Two-phase (salted) aggregation: spread each hot grouping key over
    * `saltBuckets` partial groups, aggregate, then merge. `partialAggs`
    * and `mergeAggs` must be an associative pair, e.g.
    * partial `count(*) as c` merged by `sum(c) as c`.
    *
    * Phase 1 shuffles on (key, salt) — hot keys fan out across
    * `saltBuckets` reducers instead of melting one; phase 2 shuffles the
    * tiny partial table on key alone. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                      partialAggs: Seq[Column], mergeAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keys.map(col): _*).agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Salted broadcast-replicated join for a skewed LEFT side against a
    * small right side: the right side is exploded `saltBuckets` times
    * (one copy per salt) so the left's hot keys spread over
    * `saltBuckets` reducers. Right side must be small enough to
    * replicate (it is, or you would broadcast it outright — this is the
    * pattern for when the join must shuffle, e.g. right side just over
    * the broadcast cap). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val replicatedRight = right
      .withColumn("__salt", explode(expr(s"sequence(0, ${saltBuckets - 1})")))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Co-located fact-fact join via bucketed storage: both sides are
    * written bucketed (and sorted) by their join key with the same bucket
    * count into the session catalog, so the sort-merge join reads
    * pre-partitioned, pre-sorted buckets with NO shuffle exchange on
    * either side (BucketingSpec pins the exchange-free plan). This is the
    * storage-level lever for the 100 TB fact-fact join: pay the shuffle
    * once at write time and every subsequent join over the stored tables
    * is exchange-free.
    *
    * `.hint("merge")` pins SMJ so the bucketed layout — not a broadcast —
    * carries the join: at real scale neither fact side fits a broadcast.
    * Size `buckets` so one bucket of the bigger side fits an executor
    * core (buckets ~ table_bytes / 128 MB at write time). */
  def bucketedJoin(spark: SparkSession,
                   left: DataFrame, leftKey: String, leftTable: String,
                   right: DataFrame, rightKey: String, rightTable: String,
                   buckets: Int): DataFrame = {
    dropManagedTable(spark, leftTable)
    dropManagedTable(spark, rightTable)
    left.write.bucketBy(buckets, leftKey).sortBy(leftKey)
      .mode("overwrite").saveAsTable(leftTable)
    right.write.bucketBy(buckets, rightKey).sortBy(rightKey)
      .mode("overwrite").saveAsTable(rightTable)
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
  }

  /** Global 1-based row index in `keyCol` order WITHOUT the single-
    * partition window a naive `row_number().over(orderBy(key))` collapses
    * to (Spark warns WindowExec "No Partition Defined" — one task sorts
    * the world). The scalable shape: range-repartition on the key (total
    * order across partitions, equal keys co-located), count rows per
    * partition (numPartitions longs collected to the driver — bounded by
    * construction), broadcast the cumulative offsets back as a map
    * literal, then number rows with a PER-partition window and add the
    * partition's offset. Every stage is parallel in numPartitions; this
    * is the DataFrame analog of RDD.zipWithIndex (reference:
    * core/src/main/scala/org/apache/spark/rdd/ZippedWithIndexRDD.scala:37,
    * same count-then-offset two-pass).
    *
    * The ranged table is persisted for the call: the count pass and the
    * numbering pass must see the SAME partitioning (range boundaries come
    * from a sample; recomputation could re-draw them).
    * `materialize = false` returns the lazy numbering plan for shape
    * assertions (the count pass still runs — it is what the offsets are). */
  def globalRowIndex(df: DataFrame, keyCol: String, numPartitions: Int = 32,
                     materialize: Boolean = true): DataFrame = {
    val ranged = df.repartitionByRange(numPartitions, col(keyCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withPid = ranged.withColumn("__pid", spark_partition_id())
    val counts = withPid.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = {
      var acc = 0L
      (0 until numPartitions).map { p =>
        val o = p -> acc; acc += counts.getOrElse(p, 0L); o
      }
    }
    val offCol = element_at(
      map(offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*), col("__pid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(col(keyCol))
    val numbered = withPid
      .withColumn("global_index", row_number().over(w).cast("bigint") + offCol)
      .drop("__pid")
    if (!materialize) {
      // lazy (shape-assertion) path: release the persist now — the plan
      // recomputes lazily (range boundaries re-sample deterministically
      // from the same input, but treat this path as shape-only; the
      // value-correct path is materialize = true)
      ranged.unpersist()
      numbered
    } else {
      val out = numbered.localCheckpoint()
      ranged.unpersist()
      out
    }
  }

  /** Token-budget packing — the sequence-packing step of a training-data
    * export: walk the corpus in `keyCol` order, keep a running total of
    * `weightCol` (token counts), and assign each row to pack
    * `floor(running_total_before_row / budget)` — a pack accepts rows
    * until its budget is crossed, and the straddling row stays in the
    * pack it started in. Emits the exclusive running total (`cum_before`)
    * alongside the pack id so the assignment is auditable.
    *
    * Scale shape: the weighted generalization of [[globalRowIndex]] — a
    * naive `sum().over(orderBy(key))` collapses to ONE task sorting the
    * world, so instead: range-repartition on the key (global order across
    * partitions), aggregate ONE weight sum per partition (numPartitions
    * longs to the driver — bounded by construction), broadcast the
    * cumulative offsets back, then a PER-partition exclusive prefix sum
    * plus the partition's offset. Every stage is parallel in
    * numPartitions; pack ids come from exact integer division, so results
    * are identical under any partition count. The ranged table is
    * persisted for the call: the sum pass and the numbering pass must see
    * the same sampled range boundaries. */
  def packByTokenBudget(df: DataFrame, keyCol: String, weightCol: String,
                        budget: Long, numPartitions: Int = 32,
                        materialize: Boolean = true): DataFrame = {
    require(budget > 0, s"packByTokenBudget: budget must be positive, got $budget")
    val ranged = df.repartitionByRange(numPartitions, col(keyCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withPid = ranged.withColumn("__pid", spark_partition_id())
    val sums = withPid.groupBy("__pid")
      .agg(sum(col(weightCol).cast("bigint")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = {
      var acc = 0L
      (0 until numPartitions).map { p =>
        val o = p -> acc; acc += sums.getOrElse(p, 0L); o
      }
    }
    val offCol = element_at(
      map(offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*), col("__pid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val packed = withPid
      .withColumn("cum_before",
        coalesce(sum(col(weightCol).cast("bigint")).over(w), lit(0L)) + offCol)
      .withColumn("pack_id", expr(s"cum_before div ${budget}L"))
      .drop("__pid")
    if (!materialize) {
      ranged.unpersist()
      packed
    } else {
      val out = packed.localCheckpoint()
      ranged.unpersist()
      out
    }
  }

  /** CDC merge (upsert/delete apply) — the nightly shape for a mutable
    * 100 TB table without a lakehouse format: `changes` carries one row
    * per key with `opCol` in {I, U, D}; the new snapshot keeps every
    * snapshot row whose key has no change (LEFT ANTI join — the only
    * shuffle touching the big side, and zero-shuffle when the snapshot
    * is stored bucketed by key, cf. [[bucketedJoin]]) plus the I/U
    * payloads. Changes are typically <<1% of the snapshot, so Catalyst
    * broadcasts them both times; the snapshot's payload is never
    * re-read for unchanged keys. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
                   keyCol: String, opCol: String): DataFrame = {
    val survivors = snapshot.join(changes.select(keyCol), Seq(keyCol), "left_anti")
    survivors.unionByName(
      changes.filter(col(opCol) =!= "D").drop(opCol))
  }

  /** Small-files compaction — the table-maintenance pass every long-lived
    * 100 TB dataset needs: streaming ingestion and per-partition writers
    * leave thousands of small files whose per-file open/footer cost comes
    * to dominate scans. Rewrite as `nFiles` range-partitioned files each
    * sorted by `keyCol`: file count drops to nFiles, files cover disjoint
    * key ranges (so min/max footer stats prune key lookups to ONE file),
    * and within-file ordering maximizes run-length/dictionary encoding.
    * Size nFiles ~ table_bytes / 128 MB. Result-transparent by
    * construction — compaction must never change the rows. */
  def compact(spark: SparkSession, src: DataFrame, keyCol: String,
              nFiles: Int, path: String): DataFrame = {
    src.repartitionByRange(nFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** Interleaved (Z-order) two-column layout — the multi-dimension
    * clustering pass [[compact]] cannot give: a single-column range sort
    * makes footer min/max stats prune lookups on THAT column to one file,
    * but every file then spans the other column's full range, so a filter
    * on the second dimension reads everything. Interleaving the two
    * columns' bits into one sort key (the space-filling-curve layout
    * Delta/Iceberg expose as ZORDER BY) keeps files locally clustered in
    * BOTH dimensions: each file's [min, max] on each column covers only a
    * fraction of that column's range, so selective predicates on EITHER
    * column eliminate most files from their footers alone.
    *
    * Mechanics: each column is quantized to 16 bits by exact integer
    * arithmetic over its (min, max) — one bounded aggregation action, four
    * longs to the driver — and the 32-bit Z-key is composed by a codegen'd
    * chain of shift/mask/or terms (builtin bitwise ops, no UDF). The write
    * is range-partitioned and sorted by the Z-key and installed atomically
    * via [[IndexStore]]; the key itself is dropped — it exists only to
    * order the rows, the pruning power lives in the per-file column stats.
    * Result-transparent by construction: same rows, different layout
    * (the x12 oracle is the plain-scan formulation). At 100 TB this is
    * the table-maintenance pass for the second-most-selective access
    * path; size nFiles ~ table_bytes / 128 MB, and re-run it on the cold
    * partitions streaming ingestion has fragmented. */
  def interleavedLayout(spark: SparkSession, src: DataFrame,
                        colA: String, colB: String,
                        nFiles: Int, path: String): DataFrame = {
    val mm = src.agg(min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    val zExpr =
      if (mm.isNullAt(0) || mm.isNullAt(2)) "0L" // empty/all-null input: layout is moot
      else {
        // Quantize by DIVISION into <= 65536 buckets, never by multiply-
        // then-divide: (c - lo) * 65535 overflows a bigint once the span
        // tops ~1.4e14 (epoch-nanos, snowflake ids). step is computed in
        // BigInt (hi - lo itself can wrap a Long) and capped back to a
        // Long; (c - lo) <= span always fits, so (c - lo) DIV step is
        // exact and bounded by 65535 with no overflow anywhere.
        def quant(c: String, lo: Long, hi: Long): String = {
          val span = BigInt(hi) - BigInt(lo)
          if (span <= Long.MaxValue) {
            val step = ((span / 65536) + 1).toLong // ceil-ish; quotient <= 65535
            s"((CAST($c AS BIGINT) - ${lo}L) DIV ${step}L)"
          } else {
            // span wider than a Long (lo << 0 < hi): even (c - lo) wraps.
            // Halve both sides first — the +-1 bucket-boundary slop only
            // perturbs the layout, never the rows.
            val step = (((span / 2) / 65536) + 1).toLong
            s"((CAST($c AS BIGINT) DIV 2L - ${lo / 2}L) DIV ${step}L)"
          }
        }
        val qa = quant(colA, mm.getLong(0), mm.getLong(1))
        val qb = quant(colB, mm.getLong(2), mm.getLong(3))
        (0 until 16).map(i =>
          s"(shiftleft(shiftright($qa, $i) & 1L, ${2 * i}) | " +
            s"shiftleft(shiftright($qb, $i) & 1L, ${2 * i + 1}))")
          .mkString(" | ")
      }
    IndexStore.atomically(spark, path) { tmp =>
      src.withColumn("__z", expr(zExpr))
        .repartitionByRange(nFiles, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite").parquet(tmp)
    }
    spark.read.parquet(path)
  }

  /** DROP TABLE IF EXISTS plus removal of any orphaned managed location:
    * the default in-memory catalog forgets tables across JVMs while their
    * warehouse directories survive on disk, and CTAS then refuses the
    * non-empty location (LOCATION_ALREADY_EXISTS). Every managed-table
    * writer in the query surface calls this first so re-runs in a fresh
    * session succeed. */
  def dropManagedTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val base = java.nio.file.Paths.get(
      if (wh.startsWith("file:")) new java.net.URI(wh).getPath else wh)
    val loc = base.resolve(table.toLowerCase)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** Deterministic md5-hash-order rank WITHIN each stratum, computed
    * PARTITION-parallel — the [[globalRowIndex]] partition-offset
    * machinery applied per (stratum × partition), replacing the per-
    * stratum rank window the r17 audit flagged: a
    * `Window.partitionBy(grp)` funnels each stratum's FULL row set
    * through one task, which is exactly wrong for the operator's common
    * use (a 100 TB corpus stratified by a handful of languages/domains).
    * The reference earns the same exactness partition-parallel
    * (core/.../util/random/StratifiedSamplingUtils.scala: per-partition
    * acceptance counts + a driver-merged bounded selection set).
    *
    * Mechanics: range-repartition on (grp, h, id) — global order across
    * partitions — sort within partitions, and take the partition-LOCAL
    * row number from `monotonically_increasing_id` (sequential per
    * partition, assigned above the sort; nondeterministic-flagged, so
    * Catalyst never reorders it past the sort). One tiny aggregate
    * collects (partition, stratum) → (first id, row count) — bounded by
    * numPartitions × strata, the same driver-side budget the reference's
    * selection sets use — and a broadcast literal map folds each cell's
    * cumulative stratum offset and local origin into ONE additive
    * constant. No WindowExec anywhere; every task ranks only its own
    * slice. The ranked frame stays persisted (mids must be read back,
    * not recomputed); callers filter, checkpoint their small result,
    * then `release()`. Ranks equal the old global window's by
    * construction: range partitioning makes (h, id) order within a
    * stratum consistent across partitions.
    *
    * NULL group keys are first-class: the offset-map key coalesces a
    * NULL grp to a sentinel string, so null-group rows rank as one
    * stratum exactly like the window regime's `partitionBy` treats
    * them (before this guard, the NULL map key made `element_at`
    * return NULL and the pick filter silently dropped the stratum).
    * The sentinel appears only in the internal map/totals keys, never
    * in the returned `grp` column.
    *
    * `numPartitions ≤ 0` (the default) auto-sizes the rank stage to
    * the INPUT's partition count, floored at 32 and capped at 4096:
    * a fixed 32 caps a 100 TB rank at 32 tasks (~3 TB/task), while
    * 4096 keeps the driver-side cells collect at `:390` bounded —
    * 4096 partitions × a few-thousand-strata contract is millions of
    * tiny rows at worst, and both public callers bound the strata
    * axis before ranking (groupSample ≤ maxOffsetStrata,
    * sampleByKeyExact semi-joins to the driver-held fracs keys).
    *
    * Returns (ranked frame with (grp, id, pick), per-stratum total rows
    * keyed by grp-as-string, release thunk). */
  private[graft] val NullStratum = " __graft_null_stratum__"

  private[graft] def stratumRank(base: DataFrame, salt: String,
                                 numPartitions: Int = 0)
      : (DataFrame, Map[String, Long], () => Unit) = {
    val parts =
      if (numPartitions > 0) numPartitions
      else math.min(4096, math.max(32, base.rdd.getNumPartitions))
    val ranged = base
      .withColumn("h", expr(Dedup.portableHash("cast(id as string)", salt)))
      .repartitionByRange(parts, col("grp"), col("h"), col("id"))
      .sortWithinPartitions("grp", "h", "id")
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gs = coalesce(col("grp").cast("string"), lit(NullStratum))
    val cells = ranged
      .groupBy(col("__pid"), gs.as("__gs"))
      .agg(min("__mid").as("lo"), count(lit(1)).as("c"))
      .collect() // bounded: parts × strata rows
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val adj = scala.collection.mutable.LinkedHashMap[String, Long]()
    val totals = scala.collection.mutable.LinkedHashMap[String, Long]()
    cells.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (gs, cs) =>
      var acc = 0L
      cs.sortBy(_._1).foreach { case (pid, _, lo, c) =>
        adj(s"$pid:$gs") = acc - lo + 1L // pick = __mid + adj
        acc += c
      }
      totals(gs) = acc
    }
    val adjCol =
      if (adj.isEmpty) lit(null).cast("bigint")
      else element_at(
        map(adj.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
        concat(col("__pid").cast("string"), lit(":"), gs))
    val ranked = ranged.withColumn("pick", col("__mid") + adjCol)
      .select(col("grp"), col("id"), col("pick"))
    (ranked, totals.toMap, () => { ranged.unpersist(); () })
  }

  /** Fixed-SIZE deterministic per-group sample: exactly min(m, |group|)
    * rows per group, picked by md5-hash order with an id tiebreak — the
    * eval-set construction primitive. Rate-based samplers (`sampleBy`,
    * the t14 mixture coin) give binomially-distributed group sizes;
    * benchmark/eval sets need EXACT counts, reproducible regardless of
    * ingestion order or partitioning — which is what hash order (a
    * deterministic shuffle of each group) provides.
    *
    * Two scale regimes, SAME result by construction (spec-pinned), the
    * skew axis picking the plan: few-strata corpora (≤
    * `maxOffsetStrata` groups — language/domain stratification, where a
    * single group can hold half the corpus) rank through
    * [[stratumRank]]'s partition-parallel offsets, no per-group window
    * anywhere; high-cardinality group keys (where the offsets path's
    * partitions × strata driver state would blow up, but no group is
    * corpus-sized) keep the per-group rank window, whose literal
    * `pick ≤ m` filter compiles to WindowGroupLimit — every partition
    * retains only m candidate rows per group ahead of the final
    * per-group top-m, so window state is m-bounded, never
    * group-sized. NULL group keys form one group in BOTH regimes
    * ([[stratumRank]]'s sentinel guard on the offsets side matches
    * `Window.partitionBy`'s null handling on the window side).
    *
    * `regime` pins the plan — "offsets" / "window" skip the
    * countDistinct probe entirely (callers who know their key
    * cardinality at 100 TB shouldn't pay a corpus scan to rediscover
    * it); "auto" keeps the probe. `numPartitions` forwards to
    * [[stratumRank]] (≤ 0 auto-sizes from the input). */
  def groupSample(df: DataFrame, groupCol: String, idCol: String,
                  m: Int, maxOffsetStrata: Int = 4096,
                  regime: String = "auto",
                  numPartitions: Int = 0): DataFrame = {
    val base = df.select(col(groupCol).as("grp"), col(idCol).as("id"))
    val useWindow = regime match {
      case "offsets" => false
      case "window"  => true
      case "auto" =>
        base.agg(countDistinct("grp")).head().getLong(0) > maxOffsetStrata
      case other => throw new IllegalArgumentException(
        s"groupSample: regime '$other' (expected auto | offsets | window)")
    }
    if (useWindow) {
      base
        .withColumn("h", expr(Dedup.portableHash("cast(id as string)", "'gs'")))
        .withColumn("pick", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("grp").orderBy(col("h"), col("id"))).cast("int"))
        .filter(col("pick") <= m)
        .select(col("grp"), col("id"), col("pick"))
    } else {
      val (ranked, _, release) = stratumRank(base, "'gs'", numPartitions)
      val out = ranked.filter(col("pick") <= m)
        .select(col("grp"), col("id"), col("pick").cast("int").as("pick"))
        .localCheckpoint() // eager, m-per-group bounded: safe to release
      release()
      out
    }
  }

  /** Exact per-stratum sampling (reference core/.../rdd/
    * PairRDDFunctions.scala:291 sampleByKeyExact — exactly
    * ceil(n_k · f_k) rows per key with probability 1, where plain
    * sampleByKey only hits the rate in expectation). The reference
    * earns exactness with acceptance sampling plus a per-stratum
    * selection threshold over random scores (StratifiedSamplingUtils'
    * two-pass design); here the [[stratumRank]] hash order is the
    * random score and the first quota_k ranks win — same contract,
    * same partition-parallel shape (per-partition stratum counts to
    * the driver, broadcast offsets back, partition-local rank; no
    * stratum ever sorts in one task). Fractions arrive as
    * parts-per-million BIGINTs so the quota is pure integer arithmetic
    * (ceil(a/b) = (a + b − 1) DIV b over nonnegative longs — identical
    * in Scala, Spark and the oracle); stratum totals fall out of the
    * rank pass, so no second count aggregate runs. Keys absent from
    * `fracsPpm` are excluded (the reference throws on them instead —
    * declared deviation). The exclusion happens BEFORE ranking (a
    * broadcast semi-join on the fracs keys), which also bounds the
    * offset machinery's driver state by |fracsPpm| × partitions — the
    * caller already holds the fracs Map driver-side, so the strata set
    * is driver-bounded by construction. Returns (grp, id, pick, n,
    * quota). Return-schema contract: `grp` is STRING regardless of the
    * input key type — the key is cast to string up front to match
    * `fracsPpm`'s string keys (and the quota/offset maps built from
    * them); callers needing the native key type re-join on `id`.
    * `numPartitions` forwards to [[stratumRank]] (≤ 0 auto-sizes). */
  def sampleByKeyExact(df: DataFrame, keyCol: String, idCol: String,
                       fracsPpm: Map[String, Long],
                       numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keys = fracsPpm.keys.toSeq.sorted.toDF("grp")
    val base = df.select(col(keyCol).cast("string").as("grp"), col(idCol).as("id"))
      .join(broadcast(keys), Seq("grp"), "left_semi")
    val (ranked, totals, release) = stratumRank(base, "'sbke'", numPartitions)
    val nq = totals.toSeq.sortBy(_._1).flatMap { case (gs, n) =>
      fracsPpm.get(gs).map(ppm => (gs, n, (n * ppm + 999999L) / 1000000L))
    }
    def lookup(vals: Seq[(String, Long)]): org.apache.spark.sql.Column =
      if (vals.isEmpty) lit(null).cast("bigint")
      else element_at(
        map(vals.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
        col("grp").cast("string"))
    val out = ranked
      .withColumn("n", lookup(nq.map(t => t._1 -> t._2)))
      .withColumn("quota", lookup(nq.map(t => t._1 -> t._3)))
      .filter(col("quota").isNotNull && col("pick") <= col("quota"))
      .select(col("grp"), col("id"), col("pick"), col("n"), col("quota"))
      .localCheckpoint() // eager, quota-bounded: safe to release
    release()
    out
  }

  /** Distributed sparse matrix multiply in block-coordinate form — the
    * reference's BlockMatrix.multiply (mllib/linalg/distributed/
    * BlockMatrix.scala:399), whose two-phase shape (:369
    * simulateMultiply routes each A-block to every k-matching B-block
    * destination, then partial products reduce by result block) is
    * exactly the two hash aggregations below.
    *
    * Inputs are coordinate entries a(i, k, va), b(k, j, vb); `blockSize`
    * assigns the grid (ib = i DIV blockSize etc. — ids must be
    * non-negative, the TPC-H key convention). Phase 1 joins on the
    * contraction key k and reduces WITHIN each (ib, kb, jb) block pair —
    * the per-block GEMM, map-side combinable; phase 2 reduces the
    * partials across kb into the result block (ib, jb) — simulateMultiply
    * 's cross-block shuffle. Values stay exact BIGINTs end to end, so the
    * product is partitioning-independent. At scale the k-join IS the
    * SUMMA data movement: both sides shuffle once on k, and the second
    * aggregate moves one row per (block-pair, cell), never per source
    * entry. Returns (ib, jb, i, j, v). */
  /** Block-matrix ADD (reference mllib/linalg/distributed/BlockMatrix
    * .scala:327 add — blocks cogroup on their (rowBlock, colBlock)
    * coordinate and sum element-wise, a block present on only one side
    * passing through, :337's branch). Coordinate form: ONE full-outer
    * equi-join on the element coordinate; block ids carried like
    * [[blockMultiply]]'s so the grid routing stays result-transparent.
    * Zero-valued sums are KEPT as entries — in the reference they live
    * as explicit zeros inside the dense block, and dropping them would
    * make add non-associative under later block cogroups. */
  def blockAdd(a: DataFrame, b: DataFrame, blockSize: Int): DataFrame =
    a.select(col("i"), col("j"), col("va"))
      .join(b.select(col("i"), col("j"), col("vb")), Seq("i", "j"), "full_outer")
      .selectExpr(s"CAST(i DIV $blockSize AS BIGINT) AS ib",
        s"CAST(j DIV $blockSize AS BIGINT) AS jb", "i", "j",
        "CAST(coalesce(va, 0) + coalesce(vb, 0) AS BIGINT) AS v")

  def blockMultiply(a: DataFrame, b: DataFrame, blockSize: Int): DataFrame = {
    val partials = a.select(col("i"), col("k"), col("va"))
      .join(b.select(col("k"), col("j"), col("vb")), "k")
      .groupBy(expr(s"CAST(i DIV $blockSize AS BIGINT)").as("ib"),
        expr(s"CAST(k DIV $blockSize AS BIGINT)").as("kb"),
        expr(s"CAST(j DIV $blockSize AS BIGINT)").as("jb"),
        col("i"), col("j"))
      .agg(sum(col("va") * col("vb")).as("pv"))
    partials.groupBy("ib", "jb", "i", "j")
      .agg(sum("pv").as("v"))
  }

  // ---- accumulator-audited pass (reference core/src/main/scala/org/
  // apache/spark/Accumulators.scala:258 Accumulator +
  // SparkContext.scala:1253/:1265 sc.accumulator — the driver-visible
  // side channel tasks add into; modern AccumulatorV2/longAccumulator) --

  /** Single-pass cleanse with accumulator-audited reject counts: ONE
    * action computes the clean aggregate while the map stage counts
    * every row and every suspect row into named accumulators — the
    * observability pattern that costs ZERO extra passes over 100 TB
    * (recomputing the counts relationally is a second full scan).
    *
    * The reference's documented caveat applies verbatim here and is the
    * reason the audit counts are gated against an exact recompute:
    * accumulator updates inside TRANSFORMATIONS are at-least-once under
    * task retries/speculation (only action-level updates are
    * exactly-once), so production treats these as diagnostics, and any
    * billing-grade count belongs in the aggregate itself. The oracle
    * equality proves the one-action, no-retry execution counted exactly.
    *
    * Returns one row (n_total, n_suspect, n_clean, clean_cents). */
  def auditedCleanse(values: org.apache.spark.sql.Dataset[Long],
                     suspectAbove: Long): DataFrame = {
    val s = values.sparkSession
    import s.implicits._
    val total = s.sparkContext.longAccumulator("audit_total")
    val suspect = s.sparkContext.longAccumulator("audit_suspect")
    val tagged = values.mapPartitions { it =>
      it.map { c =>
        total.add(1)
        if (c > suspectAbove) suspect.add(1)
        c
      }
    }
    // the SINGLE action: the clean aggregate (filter sits downstream of
    // the counting map, so the map sees every row exactly once)
    // coalesce: sum() is NULL over zero rows (all-suspect or empty
    // input) — the audit must report clean_cents = 0, not throw
    val row = tagged.filter(_ <= suspectAbove).toDF("c")
      .agg(count(lit(1)).as("n_clean"),
        coalesce(sum("c"), lit(0L)).as("clean_cents")).head()
    s.range(1).select(
      lit(total.value.toLong).as("n_total"),
      lit(suspect.value.toLong).as("n_suspect"),
      lit(row.getLong(0)).as("n_clean"),
      lit(row.getLong(1)).as("clean_cents"))
  }

  // ---- tree aggregation (reference core/src/main/scala/org/apache/
  // spark/rdd/RDD.scala:1091 treeAggregate and :1039 treeReduce — the
  // backbone of mllib's GradientDescent.scala:236 and RowMatrix's
  // Gramian: partial aggregates merge through intermediate levels of
  // bounded fan-in instead of one final task (or the driver) pulling
  // every partition's partial at once) ---------------------------------

  /** Multi-level (tree) aggregation to ONE row. `partials` aggregate the
    * raw rows once per leaf bucket; `merges` re-aggregate the partial
    * aliases and must be the associative merge of `partials` (the
    * treeAggregate seqOp/combOp contract). Each level keys its buckets
    * by `DIV fanout`, so every merge task fans in at most `fanout`
    * partials; levels run until one bucket remains.
    *
    * Why it matters at scale: with wide aggregation state (a gradient
    * vector, a d×d Gramian triangle) and 10^4 input partitions, the
    * classic partial+final plan funnels every partial into ONE final
    * reducer; the tree caps that fan-in at `fanout` per task, paying
    * log_fanout(leaves) tiny extra shuffles of `leaves` rows. The tree
    * is RESULT-INVISIBLE (associative exact-integer aggregates), which
    * is what the oracle gate proves.
    *
    * Leaf bucketing hashes `bucketExpr` into `leaves` buckets — the
    * deterministic relational analog of the RDD's partition index (a
    * partition-id key would make the intermediate tables depend on
    * physical layout; sums would still agree, but determinism of every
    * STAGE is the house standard). */
  def treeAggregate(df: DataFrame, bucketExpr: String, leaves: Int,
                    fanout: Int, partials: Seq[Column],
                    merges: Seq[Column]): DataFrame = {
    require(leaves > 0 && fanout > 1, "need leaves > 0, fanout > 1")
    var cur = df.withColumn("__b", pmod(expr(bucketExpr), lit(leaves)).cast("long"))
      .groupBy("__b").agg(partials.head, partials.tail: _*)
    var width = leaves
    while (width > 1) {
      width = (width + fanout - 1) / fanout
      cur =
        if (width > 1)
          cur.withColumn("__b", expr(s"__b DIV $fanout"))
            .groupBy("__b").agg(merges.head, merges.tail: _*)
        else cur.agg(merges.head, merges.tail: _*)
    }
    cur.drop("__b")
  }

  // ---- tall-skinny SVD via the Gramian (reference mllib/linalg/
  // distributed/RowMatrix.scala:113 computeGramianMatrix — one
  // treeAggregate of the d×d upper triangle, the "LocalARPACK"/
  // "LocalEigs" path of :210 computeSVD at small d: the Gramian's eigen
  // pair gives σ = sqrt(λ) and V, then U = A·V·Σ⁻¹ (:290). The reference
  // leaves singular-vector SIGNS to breeze's LAPACK call; the orientation
  // here is the DECLARED convention (b, λ−a)/‖·‖ per eigenvector —
  // deterministic, and a legal SVD sign choice. UNCENTERED by
  // definition, unlike the s21 PCA covariance path.) -------------------

  /** Closed-form 2×2 symmetric eigenvalues over exact Gramian sums
    * (g11, g12, g22) — formula strings shared verbatim with the oracle;
    * operands are one CAST-to-DOUBLE of exact integers, so every derived
    * double is engine-identical. */
  def svdLevel1: Seq[(String, String)] = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val (a, b, c) = (d("g11"), d("g12"), d("g22"))
    val mid = s"(($a + $c) / 2.0)"
    val rad = s"sqrt(((($a - $c) / 2.0) * (($a - $c) / 2.0)) + ($b * $b))"
    Seq("lam1" -> s"($mid + $rad)", "lam2" -> s"($mid - $rad)")
  }

  /** Singular values σ = sqrt(λ) and the two eigenvectors under the
    * declared (b, λ−a)/‖·‖ orientation (axis-aligned when b = 0); layer
    * 2 — references the g sums AND lam1/lam2. */
  def svdLevel2: Seq[(String, String)] = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val (a, b) = (d("g11"), d("g12"))
    val c = d("g22")
    def vec(lam: String, first: Boolean) = {
      val axis1 = if (first) "1.0" else "0.0"
      val axis2 = if (first) "0.0" else "1.0"
      val nrm = s"sqrt(($b * $b) + (($lam - $a) * ($lam - $a)))"
      Seq(
        s"v1${if (first) "1" else "2"}" ->
          s"(CASE WHEN $b = 0.0 THEN (CASE WHEN $a >= $c THEN $axis1 ELSE $axis2 END) ELSE $b / $nrm END)",
        s"v2${if (first) "1" else "2"}" ->
          s"(CASE WHEN $b = 0.0 THEN (CASE WHEN $a >= $c THEN $axis2 ELSE $axis1 END) ELSE ($lam - $a) / $nrm END)")
    }
    Seq("sv1" -> "sqrt(lam1)",
      "sv2" -> "sqrt(CASE WHEN lam2 < 0.0 THEN 0.0 ELSE lam2 END)") ++
      vec("lam1", first = true) ++ vec("lam2", first = false)
  }

  /** Per-row left-singular coordinates u_k = (x·v_k)/σ_k in micro-units
    * (RowMatrix.scala:290's U = A V Σ⁻¹ as a pure projection against the
    * broadcast 1-row factor frame). */
  def svd2RowExprs: Seq[(String, String)] = Seq(
    "u1_micro" -> ("CAST(round((((CAST(x1 AS DOUBLE) * v11) + (CAST(x2 AS DOUBLE) * v21)) / sv1) * 1000000.0) AS BIGINT)"),
    "u2_micro" -> ("CAST(round((((CAST(x1 AS DOUBLE) * v12) + (CAST(x2 AS DOUBLE) * v22)) / sv2) * 1000000.0) AS BIGINT)"))

  /** Tall-skinny SVD of the (idCol, x1, x2) matrix: ONE Gramian scan
    * (three exact integer sums — the treeAggregate), the closed-form
    * factor row, then U for the `cohort` keys as a broadcast projection.
    * Emits (id, u1_micro, u2_micro, sv1_micro, sv2_micro, v11_micro,
    * v21_micro, v12_micro, v22_micro) — factors constant on every row so
    * Σ and V are gated alongside U. */
  /** CoordinateMatrix -> transpose -> IndexedRowMatrix thin slice
    * (reference mllib/linalg/distributed/CoordinateMatrix.scala:74
    * transpose — swap (i, j) on every entry — and :80 toIndexedRowMatrix
    * — group entries by row index into a sparse row vector; :61
    * numRows/numCols are max index + 1; IndexedRowMatrix.scala:118
    * toCoordinateMatrix is the inverse; RowMatrix and BlockMatrix — the
    * other two distributed types — are covered by s42/x13). Duplicate
    * coordinates pre-merged by sum, declared: the reference's sparse
    * vector construction assumes unique indices per row. Each sparse row
    * emits FLATTENED per the comparator policy: (i, nnz, sum_v, row_md5
    * over the j-ordered "j:v" entry list, row_block = i div
    * rowsPerBlock — the toBlockMatrix(:119) block-coordinate
    * arithmetic), with the matrix dims as constant columns. Everything
    * is one groupBy over (i, j, v) triples — entries stay triples at any
    * scale, nothing densifies. */
  def coordinateTransposeRows(entries: DataFrame, rowsPerBlock: Int): DataFrame = {
    val t = entries.select(col("j").as("i"), col("i").as("j"), col("v"))
    val rows = t.groupBy("i").agg(
      count(lit(1)).as("nnz"), sum("v").as("sum_v"),
      expr("md5(array_join(transform(sort_array(collect_list(struct(j, v))), " +
        "e -> concat(CAST(e.j AS STRING), ':', CAST(e.v AS STRING))), ',')) ").as("row_md5"))
    val dims = t.agg((max("i") + 1).as("n_rows"), (max("j") + 1).as("n_cols"))
    rows.crossJoin(broadcast(dims))
      .selectExpr("i", "nnz", "CAST(sum_v AS BIGINT) AS sum_v", "row_md5",
        s"CAST(i DIV $rowsPerBlock AS BIGINT) AS row_block",
        "CAST(n_rows AS BIGINT) AS n_rows", "CAST(n_cols AS BIGINT) AS n_cols")
  }

  // ---- secondary sort (reference core rdd/OrderedRDDFunctions.scala:74
  // repartitionAndSortWithinPartitions — "more efficient than calling
  // repartition and then sorting within each partition because it can
  // push the sorting down into the shuffle machinery"; the classic
  // per-key ordered-processing primitive). ------------------------------

  /** Secondary sort: shuffle ONCE on `keyCol` and sort each partition
    * by (key, orderCols...) — never a global sort. A downstream window
    * PARTITION BY key ORDER BY orderCols consumes the layout without
    * adding an Exchange or Sort of its own (Catalyst sees its required
    * distribution and child ordering already satisfied — ScaleSpec pins
    * exactly one Exchange and one Sort in the windowed plan). At 100 TB
    * this is the shape for per-entity ordered passes (sessionization,
    * history assembly, ordered log replay): one key-proportional
    * shuffle, in-partition sorts bounded by partition volume, no stage
    * that funnels the corpus into one task. */
  def secondarySorted(df: DataFrame, keyCol: String,
                      orderCols: Seq[String]): DataFrame =
    df.repartition(col(keyCol))
      .sortWithinPartitions((keyCol +: orderCols).map(col): _*)

  // ---- tall-skinny QR (reference mllib/linalg/distributed/RowMatrix
  // .scala:526 tallSkinnyQR — per-partition local breeze QRs whose R
  // factors treeReduce by stack-and-requalify, then Q = A·R⁻¹ when
  // computeQ (:545 inv(combinedR), this.multiply). Re-expressed through
  // the Gramian: R is the upper-triangular CHOLESKY factor of AᵀA —
  // for full-rank A the unique upper-triangular factor with positive
  // diagonal, which is the reference's Householder-chain R up to that
  // sign convention (DECLARED; breeze may emit negative-diagonal rows).
  // The distributed work is therefore the identical ONE Gramian scan as
  // s42's SVD — d(d+1)/2 exact integer sums, nothing else shuffles —
  // and Q = A·R⁻¹ is a broadcast projection against the 1-row factor
  // frame, never a materialized inverse join. ---------------------------

  /** Closed-form 2-column Cholesky of the exact Gramian sums, layer 1:
    * r11 = sqrt(g11). Formula strings shared verbatim with the oracle —
    * operands are one CAST-to-DOUBLE of exact integers. */
  def qrLevel1: Seq[(String, String)] =
    Seq("r11" -> "sqrt(CAST(g11 AS DOUBLE))")

  /** Layer 2 — r12 = g12/r11 and r22 = sqrt(g22 − r12²) (r12 re-derived
    * inline so the layer only references r11; the string is the shared
    * currency, so the IEEE op order is engine-identical). */
  def qrLevel2: Seq[(String, String)] = Seq(
    "r12" -> "(CAST(g12 AS DOUBLE) / r11)",
    "r22" -> ("sqrt(CAST(g22 AS DOUBLE) - ((CAST(g12 AS DOUBLE) / r11)" +
      " * (CAST(g12 AS DOUBLE) / r11)))"))

  /** Per-row Q = A·R⁻¹ coordinates in micro-units: q1 = x1/r11,
    * q2 = (x2 − x1·r12/r11)/r22 — the back-substitution of the
    * upper-triangular solve, one shared string each. */
  def qr2RowExprs: Seq[(String, String)] = Seq(
    "q1_micro" -> "CAST(round((CAST(x1 AS DOUBLE) / r11) * 1000000.0) AS BIGINT)",
    "q2_micro" -> ("CAST(round(((CAST(x2 AS DOUBLE) - ((CAST(x1 AS DOUBLE) * r12) / r11))" +
      " / r22) * 1000000.0) AS BIGINT)"))

  /** Tall-skinny QR of the (idCol, x1, x2) matrix: ONE Gramian scan
    * (the same three exact integer sums as [[tallSkinnySvd]]), the
    * closed-form Cholesky R, then Q rows for the `cohort` keys as a
    * broadcast projection. Emits (id, q1_micro, q2_micro, r11_micro,
    * r12_micro, r22_micro) — R constant on every row so the factor is
    * gated alongside Q. Rank-deficient input (g11 = 0 or r22 = 0)
    * divides by zero and yields null/NaN Q columns — the analog of the
    * reference's :545 MatrixSingularException → null-Q branch; callers
    * wanting a hard failure should assert r22_micro > 0. */
  def tallSkinnyQr(feats: DataFrame, idCol: String, cohort: Long): DataFrame = {
    val gcols = Seq("g11", "g12", "g22")
    val factors = feats
      .agg(sum(expr("x1 * x1")).as("g11"), sum(expr("x1 * x2")).as("g12"),
        sum(expr("x2 * x2")).as("g22"))
      .selectExpr(gcols ++ qrLevel1.map { case (n, e) => s"$e AS $n" }: _*)
      .selectExpr(gcols ++ qrLevel1.map(_._1) ++
        qrLevel2.map { case (n, e) => s"$e AS $n" }: _*)
    feats.filter(col(idCol) <= cohort)
      .crossJoin(broadcast(factors))
      .selectExpr(Seq(s"$idCol AS id") ++
        qr2RowExprs.map { case (n, e) => s"$e AS $n" } ++
        Seq("r11", "r12", "r22").map(c =>
          s"CAST(round($c * 1000000.0) AS BIGINT) AS ${c}_micro"): _*)
      .orderBy("id")
  }

  def tallSkinnySvd(feats: DataFrame, idCol: String, cohort: Long): DataFrame = {
    val gcols = Seq("g11", "g12", "g22")
    val factors = feats
      .agg(sum(expr("x1 * x1")).as("g11"), sum(expr("x1 * x2")).as("g12"),
        sum(expr("x2 * x2")).as("g22"))
      .selectExpr(gcols ++ svdLevel1.map { case (n, e) => s"$e AS $n" }: _*)
      .selectExpr(gcols ++ svdLevel1.map(_._1) ++
        svdLevel2.map { case (n, e) => s"$e AS $n" }: _*)
    feats.filter(col(idCol) <= cohort)
      .crossJoin(broadcast(factors))
      .selectExpr(Seq(s"$idCol AS id") ++
        svd2RowExprs.map { case (n, e) => s"$e AS $n" } ++
        Seq("sv1", "sv2", "v11", "v21", "v12", "v22").map(c =>
          s"CAST(round($c * 1000000.0) AS BIGINT) AS ${c}_micro"): _*)
      .orderBy("id")
  }
}
