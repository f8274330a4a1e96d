package graft.scale

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe rewrite primitives for on-disk parquet stores.
  *
  * The compact/upsert/delete paths rewrite a store FROM its own current
  * contents. Pinning the read with `localCheckpoint` before an in-place
  * `mode("overwrite")` is NOT fault-tolerant: localCheckpoint blocks
  * live in executor memory/disk with the lineage truncated, so an
  * executor loss mid-write leaves the result unrecomputable while the
  * target files are already deleted — unrecoverable loss of exactly the
  * store these layers exist to persist. The safe shape (the one
  * [[Layout.compactPartitions]] always used) is: write the full result
  * to a TEMP SIBLING directory (the source files are still intact and
  * re-readable on any task retry or executor loss), then swap via
  * renames. A crash before the swap leaves the store untouched plus a
  * stale temp dir that the next run clears; a crash between the two
  * renames leaves the `.old_` copy recoverable by hand — at no point do
  * the only bytes live in volatile executor state.
  */
object Stores {

  /** Hadoop `FileSystem.rename` reports failure by RETURNING FALSE (and
    * on several implementations renames INTO a still-existing target
    * directory as a child) — ignoring it would let a failed swap report
    * success while the store is untouched or, worse, nested. Throw
    * instead: the temp/old siblings are left for inspection and the
    * next run's stale-cleanup. */
  private def renameOrThrow(fs: FileSystem, src: Path, dst: Path,
                            recovery: String): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(
        s"store swap: rename $src -> $dst failed; $recovery")

  /** Replace the store at `dir` with `result` (whose plan may read
    * `dir` itself): write to a temp sibling, swap atomically, clear
    * leftovers — never an in-place overwrite of files the plan reads. */
  def rewriteAtomically(spark: SparkSession, dir: String,
                        result: DataFrame): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(root.getParent, s".rewrite_${root.getName}")
    fs.delete(tmp, true) // stale leftover from a crashed prior run
    result.write.mode("overwrite").parquet(tmp.toString)
    val old = new Path(root.getParent, s".old_${root.getName}")
    fs.delete(old, true)
    renameOrThrow(fs, root, old,
      s"store left untouched at $root; rewritten copy preserved at $tmp")
    renameOrThrow(fs, tmp, root,
      s"store contents now live ONLY under $old — rename it back to " +
        s"$root (or $tmp in) to recover")
    fs.delete(old, true)
  }

  /** Swap one `day=<d>` partition of a date-partitioned store: rename
    * the freshly-written `tmpPart` in over `storePart` (renaming the
    * current files away first, then clearing them). Each partition swap
    * is atomic on its own; a crash between partitions leaves every
    * partition either fully old or fully new, all readable. */
  def swapPartition(fs: FileSystem, storePart: Path, tmpPart: Path): Unit = {
    val old = new Path(storePart.getParent, s".old_${storePart.getName}")
    fs.delete(old, true)
    if (fs.exists(storePart)) renameOrThrow(fs, storePart, old,
      s"partition left untouched at $storePart; new copy preserved at $tmpPart")
    renameOrThrow(fs, tmpPart, storePart,
      s"partition contents now live ONLY under $old — rename it back to " +
        s"$storePart (or $tmpPart in) to recover")
    fs.delete(old, true)
  }
}
