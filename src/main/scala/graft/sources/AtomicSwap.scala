package graft.sources

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Crash-atomic directory replacement for bucket-grained index rewrites
  * (the NeighborGraph/compaction "rewrite only touched buckets" shape).
  *
  * The naive swap — write new content to a sibling, `move(dir, old)`,
  * `move(tmp, dir)` — has a window between the two moves where a crash
  * leaves the bucket MISSING: the next reader silently serves a smaller
  * index, and the stale `.old`/`.tmp` siblings make the next rewrite's
  * own moves throw. This object closes both holes with a commit marker
  * (the [[graft.Stage]] `_STAGED` discipline at bucket grain):
  *
  *  1. `write(tmp)` — new content lands in a scratch sibling; a crash
  *     here leaves the target untouched (tmp is garbage, collected on
  *     the next [[recover]]).
  *  2. marker created — THE commit point. The marker is a zero-byte
  *     file whose single atomic creation flips the protocol from
  *     "roll back" to "roll forward": before it, recovery discards tmp;
  *     after it, recovery completes the swap from whatever state the
  *     crash left.
  *  3. `move(target, old)`; 4. `move(tmp, target)`; 5. delete old;
  *  6. delete marker.
  *
  * Every intermediate state is re-entrant: [[recover]] scans the
  * scratch dir for leftover markers/siblings and rolls each tag forward
  * (marker present) or back (marker absent) — callers invoke it once at
  * entry, so an interrupted rewrite is healed by the NEXT maintenance
  * call on the same index, with no separate repair tool. Scratch
  * siblings are dot-prefixed so directory-level parquet readers of the
  * live layout never see in-flight content.
  *
  * Guarantee scope: PROCESS-crash atomicity (kill -9 at any step, what
  * AtomicSwapSpec simulates). The marker is created without fsyncing
  * tmp's files or the parent directory, so under power loss / OS crash
  * the marker could become durable before tmp's data and recovery would
  * roll forward onto incomplete content — callers needing power-loss
  * safety must fsync tmp's tree (and the scratch directory) before the
  * write callback returns, or rebuild the bucket from source on media-
  * level doubt. The staged layouts this protocol serves are DERIVED
  * artifacts (rebuildable from the corpus), which is why the cheaper
  * guarantee is the designed trade.
  */
object AtomicSwap {
  private val NEW = ".swapnew_"
  private val OLD = ".swapold_"
  private val COMMIT = ".swapcommit_"

  private def rmTree(p: Path): Unit =
    if (Files.exists(p)) {
      val w = Files.walk(p)
      try w.sorted(Comparator.reverseOrder[Path]())
        .forEach(q => { Files.deleteIfExists(q); () })
      finally w.close()
    }

  /** Replace `target` with the directory `write` produces, surviving a
    * crash at any point. `tag` names the swap's scratch siblings under
    * `scratch` (one in-flight swap per tag; bucket rewrites use the
    * bucket id). `write` receives the tmp path and must leave a complete
    * directory there (e.g. a Spark `mode("overwrite").parquet` write). */
  def swap(scratch: Path, tag: String, target: Path)(write: Path => Unit): Unit = {
    recoverTag(scratch, tag, target) // heal any prior interrupted swap first
    val tmp = scratch.resolve(NEW + tag)
    val old = scratch.resolve(OLD + tag)
    val mark = scratch.resolve(COMMIT + tag)
    write(tmp)
    Files.createFile(mark) // commit point
    if (Files.exists(target)) Files.move(target, old)
    Files.move(tmp, target)
    rmTree(old)
    Files.deleteIfExists(mark)
    ()
  }

  /** Heal every interrupted swap whose scratch siblings live under
    * `scratch`; `targetOf` maps a tag back to its live directory. */
  def recover(scratch: Path, targetOf: String => Path): Unit = {
    if (!Files.isDirectory(scratch)) return
    val s = Files.list(scratch)
    val tags = try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString).collect {
        case n if n.startsWith(NEW) => n.stripPrefix(NEW)
        case n if n.startsWith(OLD) => n.stripPrefix(OLD)
        case n if n.startsWith(COMMIT) => n.stripPrefix(COMMIT)
      }.toSet
    } finally s.close()
    tags.foreach(t => recoverTag(scratch, t, targetOf(t)))
  }

  /** The state machine: marker present ⇒ tmp is complete, roll FORWARD
    * (finish the moves, drop old); marker absent ⇒ the write never
    * committed, roll BACK (drop tmp, restore old if the target is
    * somehow gone — defensively; the protocol never leaves that state). */
  private def recoverTag(scratch: Path, tag: String, target: Path): Unit = {
    val tmp = scratch.resolve(NEW + tag)
    val old = scratch.resolve(OLD + tag)
    val mark = scratch.resolve(COMMIT + tag)
    if (Files.exists(mark)) {
      if (Files.exists(tmp)) {
        // crash before/inside the moves: re-run them idempotently
        if (Files.exists(target) && !Files.exists(old)) Files.move(target, old)
        if (Files.exists(target)) rmTree(target) // old already saved: target is stale tmp? never — defensive
        Files.move(tmp, target)
      } else if (!Files.exists(target) && Files.exists(old)) {
        // tmp already promoted then lost? impossible forward; restore old
        Files.move(old, target)
      }
      rmTree(old)
      Files.deleteIfExists(mark)
    } else {
      // uncommitted: discard the incomplete write; restore old defensively
      rmTree(tmp)
      if (!Files.exists(target) && Files.exists(old)) Files.move(old, target)
      else rmTree(old)
    }
    ()
  }
}
