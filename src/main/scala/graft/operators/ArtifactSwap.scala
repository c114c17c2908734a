package graft.operators

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Write-then-swap for compacted artifacts, and its self-healing.
  *
  * A compaction builds the replacement in a stamped sibling tmp dir and
  * swaps it in via two renames (`X → .X_compact_old_<stamp>`,
  * `.X_compact_tmp_<stamp> → X`). A crash between the renames strands
  * the complete pre-compaction artifact in the hidden `old` dir — and a
  * later writer that doesn't notice would recreate `X` fresh, silently
  * orphaning all history. Every artifact entry point (ingest, query,
  * compaction) calls [[recover]] first: if the root is missing but a
  * compaction-old dir exists, the newest one (NUMERIC stamp order — the
  * stamps are nanoTime decimals of varying digit count, so a
  * lexicographic sort could resurrect an older artifact) is renamed
  * back; stale tmp/old/marker leftovers are swept once the root exists.
  * Work can be stranded by a crash, never lost or doubled.
  *
  * Live-swap vs crashed-swap: the rename window is also what a
  * CONCURRENT READER observes while a live compaction swaps — and a
  * reader that renamed the old dir back mid-swap would race the
  * writer's `rename(tmp, root)` (failing one side, or on
  * rename-into-existing-dir stores nesting one dir inside the other
  * where no recovery glob ever looks). So [[swap]] writes a
  * swap-in-progress MARKER before the first rename and removes it after
  * the second: a reader that sees root missing WITH a marker backs off
  * and polls for the swap to complete instead of renaming; only when
  * the marker outlives [[LiveSwapTimeoutMs]] (writer crashed mid-swap —
  * the window itself is two metadata ops) does the reader perform the
  * rename-back, JVM-serialized and re-checked so concurrent readers
  * don't race each other. Root missing with NO marker can only be a
  * pre-marker-era strand — renamed back immediately, as before.
  *
  * Single-writer contract (one stream / one maintenance job per
  * artifact): writer entry points call [[recover]] with `sweep = true`
  * — by contract no OTHER writer's swap can be live, so a marker seen
  * by a writer is always a crash leftover (no wait), and stale
  * tmp/old/marker dirs are deleted once the root exists. READERS must
  * use `sweep = false`: a reader's sweep would delete a LIVE
  * compaction's in-flight tmp out from under the writer.
  */
private[graft] object ArtifactSwap {

  /** How long a read-side [[recover]] waits for a marked live swap to
    * complete before declaring the writer dead. The marker window is
    * two FileSystem renames; seconds of margin is orders beyond it.
    */
  private val LiveSwapTimeoutMs = 30000L

  /** JVM-wide serialization of crashed-swap recovery renames, so
    * concurrent readers in one driver never race each other's
    * rename-back (cross-JVM readers remain subject to the store's
    * rename atomicity — the post-rename existence re-check below keeps
    * the loser harmless on stores where the rename just fails).
    */
  private val recoveryLock = new Object

  /** Fixed-width (zero-padded) nanoTime stamp: lexicographic order on
    * names equals numeric order on stamps, for tools that only see
    * names; [[recover]] still parses numerically and so also orders
    * legacy unpadded stamps correctly.
    */
  def newStamp(): String = f"${System.nanoTime()}%019d"

  def tmpPath(root: Path, stamp: String): Path =
    new Path(root.getParent, s".${root.getName}_compact_tmp_$stamp")

  private def oldPath(root: Path, stamp: String): Path =
    new Path(root.getParent, s".${root.getName}_compact_old_$stamp")

  private def markerPath(root: Path, stamp: String): Path =
    new Path(root.getParent, s".${root.getName}_swap_inprogress_$stamp")

  private def numericStamp(s: FileStatus): Long = {
    val name = s.getPath.getName
    val suffix = name.substring(name.lastIndexOf('_') + 1)
    try suffix.toLong catch { case _: NumberFormatException => -1L }
  }

  private def stamped(fs: FileSystem, root: Path, kind: String): Seq[FileStatus] = {
    val parent = root.getParent
    if (parent == null || !fs.exists(parent)) Seq.empty
    else fs.globStatus(new Path(parent, s".${root.getName}_${kind}_*")).toSeq
  }

  /** The writer-side swap: publish the fully-written `tmpPath(root,
    * stamp)` as `root`. Marker before the first rename, removed after
    * the second; the old artifact is only deleted once the new root is
    * in place, so a crash at ANY point strands a complete artifact for
    * [[recover]], never loses one. The pre-swap-in existence check
    * narrows (cannot fully close — documented residual) the
    * rename-into-existing-dir hazard against a reader whose crash
    * timeout misfired on a stalled-but-alive writer.
    */
  def swap(fs: FileSystem, root: Path, stamp: String, label: String): Unit = {
    val marker = markerPath(root, stamp)
    val out = fs.create(marker, true)
    out.close()
    val old = oldPath(root, stamp)
    require(fs.rename(root, old), s"$label: swap-out of $root failed")
    require(!fs.exists(root),
      s"$label: $root reappeared mid-swap (concurrent writer or misfired reader recovery)")
    require(fs.rename(tmpPath(root, stamp), root), s"$label: swap-in to $root failed")
    fs.delete(old, true)
    fs.delete(marker, false)
  }

  def recover(
      fs: FileSystem,
      root: Path,
      label: String,
      sweep: Boolean,
      liveSwapTimeoutMs: Long = LiveSwapTimeoutMs): Unit = {
    if (!fs.exists(root)) {
      // a marker means the root-missing window may be a LIVE swap
      // (readers only — a writer entry point holds the single-writer
      // lease, so any marker it sees is a crash leftover): poll for
      // the writer's second rename instead of racing it
      if (!sweep && stamped(fs, root, "swap_inprogress").nonEmpty) {
        val deadline = System.currentTimeMillis() + liveSwapTimeoutMs
        while (!fs.exists(root) && System.currentTimeMillis() < deadline)
          Thread.sleep(50L)
      }
      if (!fs.exists(root)) recoveryLock.synchronized {
        if (!fs.exists(root)) {
          val olds = stamped(fs, root, "compact_old").sortBy(numericStamp)
          olds.lastOption.foreach { o =>
            if (!fs.rename(o.getPath, root)) {
              // cross-JVM race: the JVM-wide lock only serializes
              // recoverers in THIS driver, so another process (a
              // concurrent recoverer, or the live writer's swap-in)
              // can win between our exists-check and the rename — on
              // stores where the loser's rename just fails, the loser
              // is harmless iff the root is now in place
              require(fs.exists(root),
                s"$label: recovery rename of ${o.getPath} failed and $root is still missing")
            }
          }
          // the swap this marker guarded is adjudicated dead (timeout
          // above, or writer-side entry): clear it so later reads
          // don't re-wait the full timeout on a tombstone
          stamped(fs, root, "swap_inprogress")
            .foreach(m => fs.delete(m.getPath, false))
        }
      }
    }
    if (sweep && fs.exists(root))
      (stamped(fs, root, "compact_old") ++ stamped(fs, root, "compact_tmp") ++
        stamped(fs, root, "swap_inprogress"))
        .foreach(s => fs.delete(s.getPath, true))
  }
}
