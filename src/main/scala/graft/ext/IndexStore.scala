package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Atomic install for standing on-disk indexes (the d18 near-dup index,
  * x04's cluster-partitioned IVF store, fitted pipeline models, the
  * exactly-once streaming sink's batch directories) — the committer
  * discipline Spark's own output committers use (task attempt dir +
  * rename on commit): a build NEVER writes into the live path. It writes
  * a complete index into a same-filesystem temp sibling, then installs it
  * with directory renames, so a concurrent reader observes either the
  * previous complete index or the new complete index — never a
  * half-written one.
  *
  * The temp and retired siblings are DOT-PREFIXED (`.name.__build_x`,
  * `.name.__old_x`): Spark's file listing ignores dot/underscore-prefixed
  * paths, so when the destination is itself a partition directory inside
  * a discovered table root (the exactly-once sink's `batch_id=N` dirs),
  * in-flight builds and retired copies are INVISIBLE to partition
  * discovery — a reader of the parent can never double-count a batch or
  * infer a bogus partition value from a temp name.
  *
  * This is what makes index builds multi-PROCESS safe, not just
  * multi-thread safe: the per-JVM build-once memo (queries/Dedup.scala)
  * remains the fast path that skips redundant builds inside one process,
  * but when two independent JVMs race on the same path, each installs a
  * complete index and the loser's work is discarded whole — the old
  * failure mode (JVM B's mode("overwrite") deleting files under JVM A's
  * running probe) cannot occur because overwrite now only ever targets a
  * private temp dir.
  *
  * Failure semantics, stated honestly:
  *   - A build that throws deletes its temp dir and leaves dest exactly
  *     as it was.
  *   - A failed retire (rename of the old index out of the way) aborts
  *     BEFORE touching dest and throws — stale data is never silently
  *     served as success.
  *   - A failed install rolls the retired index BACK to dest and throws,
  *     unless another process won the race and dest holds its (complete)
  *     index — then this build's work is discarded whole, which is the
  *     documented last-installer-wins contract.
  *   - The previous index is deleted only AFTER dest exists again; no
  *     path through this code deletes the only surviving copy.
  *   - Between retiring the old index and renaming the new one in, the
  *     live path is briefly ABSENT. A reader listing at that instant
  *     fails fast with path-not-found (and retries/rebuilds) — it cannot
  *     read torn data. HDFS has no rename-over-non-empty-dir, so this gap
  *     is the standard committer trade. A hard crash inside the gap
  *     leaves the old index as a dot-prefixed `.name.__old_x` sibling:
  *     invisible to readers, reclaimed by the next successful install's
  *     cleanup of its own nonce (stale nonces need a manual sweep — the
  *     same caveat as Spark's own `_temporary` dirs after a driver kill).
  *   - Hadoop `rename` is atomic per directory on HDFS and local fs
  *     alike; object stores without atomic rename (raw S3) need their
  *     committer's equivalent — same caveat as every rename-based Spark
  *     committer. */
object IndexStore {

  /** Run `build` against a private temp path, then atomically install the
    * result at `dest`. On any failure `dest` is left with a complete
    * index (the previous one) or with the concurrent winner's; the temp
    * dir never survives. Concurrent callers each install a complete
    * index; last installer wins. */
  def atomically(spark: SparkSession, dest: String)(build: String => Unit): Unit = {
    val destPath = new Path(dest)
    val fs = destPath.getFileSystem(spark.sessionState.newHadoopConf())
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val parent = destPath.getParent
    val tmp = new Path(parent, s".${destPath.getName}.__build_$nonce")
    val retired = new Path(parent, s".${destPath.getName}.__old_$nonce")
    try {
      build(tmp.toString)
      fs.mkdirs(parent)
      // Retire any previous index out of the way, then install. A failed
      // retire aborts before dest is touched; a failed install restores
      // the retired copy unless a concurrent installer's complete index
      // already took dest (last-installer-wins).
      if (fs.exists(destPath) && !fs.rename(destPath, retired))
        throw new java.io.IOException(
          s"IndexStore: could not retire existing index at $dest — aborting install, dest untouched")
      if (fs.rename(tmp, destPath)) {
        // Hadoop rename(src, dst) where dst is an existing DIRECTORY moves
        // src INTO dst as a child and still returns true (HDFS and local fs
        // alike) — so when a concurrent installer re-created dest between
        // our retire and this rename, our build did not replace the index:
        // it landed nested inside the winner's as a dot-prefixed child
        // (invisible to readers, but an orphan that would leak until a
        // manual sweep, and 'last-installer-wins' silently became
        // first-wins). Detect that outcome and discard our nested build —
        // the winner's index is complete, which the contract permits.
        val nested = new Path(destPath, tmp.getName)
        if (fs.exists(nested)) fs.delete(nested, true)
      } else {
        if (fs.exists(destPath)) fs.delete(tmp, true) // lost the race; winner's index is complete
        else {
          val restored = fs.exists(retired) && fs.rename(retired, destPath)
          throw new java.io.IOException(
            s"IndexStore: install rename into $dest failed" +
              (if (restored) " — previous index restored" else " — NO previous index to restore"))
        }
      }
    } finally {
      if (fs.exists(tmp)) fs.delete(tmp, true)
      // never delete the retired copy unless dest holds a complete index
      if (fs.exists(retired) && fs.exists(destPath)) fs.delete(retired, true)
    }
  }
}
