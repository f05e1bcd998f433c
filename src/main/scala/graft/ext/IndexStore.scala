package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Atomic install for standing on-disk indexes (the d18 near-dup index,
  * x04's cluster-partitioned IVF store) — the committer discipline Spark's
  * own output committers use (task attempt dir + rename on commit): a
  * build NEVER writes into the live path. It writes a complete index into
  * a same-filesystem temp sibling, then installs it with directory
  * renames, so a concurrent reader observes either the previous complete
  * index or the new complete index — never a half-written one.
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
  * Windows and their consequences, stated honestly:
  *   - Between retiring the old index and renaming the new one in, the
  *     live path is briefly ABSENT. A reader listing at that instant fails
  *     fast with path-not-found (and retries/rebuilds) — it cannot read
  *     torn data. HDFS has no rename-over-non-empty-dir, so this gap is
  *     the standard committer trade; the alternative (versioned dirs + a
  *     pointer file) costs a read indirection every probe.
  *   - Hadoop `rename` is atomic per directory on HDFS and local fs alike;
  *     object stores without atomic rename (raw S3) need their committer's
  *     equivalent — same caveat as every rename-based Spark committer. */
object IndexStore {

  /** Run `build` against a private temp path, then atomically install the
    * result at `dest`. On build failure the temp dir is deleted and `dest`
    * is left exactly as it was. Concurrent callers each install a complete
    * index; last installer wins. */
  def atomically(spark: SparkSession, dest: String)(build: String => Unit): Unit = {
    val destPath = new Path(dest)
    val fs = destPath.getFileSystem(spark.sessionState.newHadoopConf())
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(s"$dest.__build_$nonce")
    val retired = new Path(s"$dest.__old_$nonce")
    try {
      build(tmp.toString)
      fs.mkdirs(destPath.getParent)
      // Retire any previous index out of the way, then install. If another
      // process swapped in between our two renames, our rename fails
      // (dest exists again) — its index is complete too, so just discard.
      if (fs.exists(destPath)) fs.rename(destPath, retired)
      if (!fs.rename(tmp, destPath)) fs.delete(tmp, true)
    } finally {
      // a throwing build must not leave temp garbage or touch dest
      if (fs.exists(tmp)) fs.delete(tmp, true)
      if (fs.exists(retired)) fs.delete(retired, true)
    }
  }
}
