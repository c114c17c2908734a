package graft.operators

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Self-healing for write-then-swap compactions (`X → .X_compact_old_*`,
  * `.X_compact_tmp_* → X`): a crash between the two renames strands the
  * complete pre-compaction artifact in the hidden `old` dir — and a
  * later writer that doesn't notice would recreate `X` fresh, silently
  * orphaning all history. Every artifact entry point (ingest, query,
  * compaction) calls [[recover]] first: if the root is missing but a
  * compaction-old dir exists, the newest one is renamed back; stale
  * tmp/old leftovers are swept once the root exists. Work can be
  * stranded by a crash, never lost or doubled.
  *
  * Single-writer contract (one stream / one maintenance job per
  * artifact); CONCURRENT READERS are allowed and must call the
  * read-side form — [[recover]] with `sweep = false` — which only
  * performs the root-missing rename-back and never deletes sibling
  * dirs: a reader that swept would delete a LIVE compaction's
  * in-flight tmp out from under the writer (turning every reader into
  * a writer and failing the swap). Only writer entry points (ingest
  * bodies, the compactions themselves) sweep stale leftovers.
  */
private[graft] object ArtifactSwap {

  def recover(fs: FileSystem, root: Path, label: String, sweep: Boolean): Unit = {
    val parent = root.getParent
    def stamped(kind: String): Seq[FileStatus] =
      if (parent == null || !fs.exists(parent)) Seq.empty
      else fs.globStatus(new Path(parent, s".${root.getName}_${kind}_*")).toSeq
    if (!fs.exists(root)) {
      val olds = stamped("compact_old").sortBy(_.getPath.getName)
      olds.lastOption.foreach { o =>
        require(fs.rename(o.getPath, root),
          s"$label: recovery rename of ${o.getPath} failed")
      }
    }
    if (sweep && fs.exists(root))
      (stamped("compact_old") ++ stamped("compact_tmp"))
        .foreach(s => fs.delete(s.getPath, true))
  }
}
