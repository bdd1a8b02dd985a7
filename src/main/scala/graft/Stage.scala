package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Persistent, staleness-aware staging for DERIVED artifacts — the
  * production home of what [[TempDirs.scoped]] only session-memoizes.
  *
  * The engine materializes several pay-once layouts from a dataset dir
  * (the co-purchase graph, the positional inverted index, the IVF-PQ
  * vector index). Before this object they lived in throwaway temp dirs
  * keyed on the dataset PATH alone: every new JVM re-paid every build,
  * and an in-session mutation of the source dir would silently serve a
  * stale artifact. Both halves are fixed here:
  *
  *  - '''Persistence''': artifacts live under a stable root
  *    (`GRAFT_STAGE_DIR`, defaulting to `java.io.tmpdir/graft_stage`) —
  *    a fresh session finds the committed artifact and skips the build.
  *    At cluster scale the root is a lakehouse path; the layout
  *    (`<root>/<name>/<fingerprint>/`) is exactly a derived table
  *    refreshed with its fact table.
  *  - '''Staleness''': the artifact directory is keyed on a CONTENT
  *    fingerprint of the source listing (relative path + size + mtime of
  *    every file — a FileSystem listing, no data read, O(files)). A
  *    mutated source dir fingerprints differently, so consumers rebuild
  *    instead of reading stale data; the fingerprint is re-computed on
  *    EVERY lookup, so even in-session mutation is caught.
  *  - '''Atomic commit''' (the Rollup.mergeInto versioned-commit
  *    discipline, directory-grained): builders write into a private
  *    `.tmp_*` sibling, stamp a `_STAGED` marker, and atomically rename
  *    onto the fingerprint dir. Concurrent builders race benignly — the
  *    rename loser discards its tmp and reads the winner's commit.
  *    Superseded fingerprints are pruned after commit (old versions of a
  *    refreshed derived table do not accrue).
  *
  * Unlike [[TempDirs]], nothing here registers for exit-time deletion —
  * outliving the JVM is the point.
  */
object Stage {

  /** Build invocations actually run in this JVM — spec observability. */
  val buildsRun = new AtomicLong(0)

  private val memo = new ConcurrentHashMap[String, Path]()
  private val locks = new ConcurrentHashMap[String, Object]()
  private val tmpSeq = new AtomicLong(0)

  def root: Path = Paths.get(sys.env.getOrElse("GRAFT_STAGE_DIR",
    s"${System.getProperty("java.io.tmpdir")}/graft_stage"))

  /** Drop the in-memory memo — simulates a fresh JVM against the same
    * on-disk stage root (spec hook; harmless otherwise). */
  private[graft] def clearMemo(): Unit = memo.clear()

  /** Content fingerprint of a source directory: md5 over the source's
    * absolute path plus the sorted (relative path, size, mtime-ms)
    * listing. Nothing is read but metadata, so this is cheap even for
    * huge sources; any file added, removed, resized, or rewritten
    * (mtime) changes the fingerprint. The source PATH is part of the
    * key: two different sources whose listings happen to coincide
    * (same file names/sizes written in the same mtime millisecond —
    * observed live in specs) must not alias one artifact, because the
    * listing never reads content and cannot prove the bytes match. */
  def fingerprint(sourceDir: String): String = {
    val base = Paths.get(sourceDir).toAbsolutePath.normalize
    require(Files.isDirectory(base), s"not a directory: $sourceDir")
    val walk = Files.walk(base)
    val lines = try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.filter(Files.isRegularFile(_)).map { f =>
        s"${base.relativize(f)}|${Files.size(f)}|${Files.getLastModifiedTime(f).toMillis}"
      }.toVector.sorted
    } finally walk.close()
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((base.toString +: lines).mkString("\n").getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  /** The staged dir for `name` derived from `sourceDir`, building it if
    * this source content has never been staged. `name` must identify the
    * artifact AND its build parameters (e.g. "invidx_b64") — two
    * parameterizations are two names. `build` receives an empty private
    * dir and must write the complete artifact into it; on return the dir
    * is committed atomically under the source fingerprint. */
  def derived(name: String, sourceDir: String)(build: Path => Unit): Path = {
    require(!name.contains('/') && !name.startsWith("."),
      s"artifact name must be a plain dir name: $name")
    val fp = fingerprint(sourceDir)
    val target = root.resolve(name).resolve(fp)
    val memoKey = s"$name|$fp"
    val got = memo.get(memoKey)
    if (got != null) return got
    val lock = locks.computeIfAbsent(memoKey, _ => new Object)
    lock.synchronized {
      if (!Files.exists(target.resolve("_STAGED"))) {
        val parent = Files.createDirectories(root.resolve(name))
        val tmp = parent.resolve(
          s".tmp_${fp}_${ProcessHandle.current.pid}_${tmpSeq.incrementAndGet}")
        Files.createDirectories(tmp)
        try {
          build(tmp)
          buildsRun.incrementAndGet()
          // _SOURCE records which dataset this artifact derives from, so
          // pruning can tell "superseded version of MY source" from "live
          // artifact of a DIFFERENT source sharing the artifact name"
          Files.writeString(tmp.resolve("_SOURCE"),
            Paths.get(sourceDir).toAbsolutePath.normalize.toString)
          Files.createFile(tmp.resolve("_STAGED"))
          try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
          catch {
            // Another session committed first — use theirs. The JDK maps
            // the losing rename() inconsistently by platform: EEXIST/
            // ENOTEMPTY surface as FileAlreadyExistsException OR
            // DirectoryNotEmptyException OR (Linux, observed live in the
            // StageSpec race test) a PLAIN FileSystemException reading
            // "Directory not empty". Matching exception classes is
            // therefore the wrong discriminator — the ground truth is
            // whether a committed artifact now occupies the target: if
            // yes the loss is benign, otherwise the failure is real.
            case e: java.io.IOException =>
              deleteTree(tmp)
              if (!Files.exists(target.resolve("_STAGED"))) throw e
          }
        } catch { case e: Throwable => deleteTree(tmp); throw e }
        prune(parent, keep = fp, source = sourceDir)
      }
      memo.put(memoKey, target)
      target
    }
  }

  /** Retention horizon for GARBAGE (not superseded versions): artifacts
    * whose source dataset no longer exists on disk, and marker-less dirs
    * of unknown provenance (pre-`_SOURCE` builds). Superseded same-source
    * versions are pruned immediately regardless; this horizon only
    * bounds how long unreachable artifacts may linger. Long by design —
    * a reader that fingerprinted before its source was deleted has this
    * many hours to finish. Override via GRAFT_STAGE_RETENTION_HOURS. */
  private def retentionMs: Long =
    sys.env.get("GRAFT_STAGE_RETENTION_HOURS").flatMap(_.toLongOption)
      .getOrElse(168L) * 3600 * 1000

  /** Remove superseded fingerprint dirs, crashed builders' tmp dirs older
    * than six hours, and (past [[retentionMs]]) orphaned garbage.
    * "Superseded" is judged per SOURCE: a dir is pruned immediately only
    * when its `_SOURCE` marker names the SAME dataset this build derives
    * from (its content was refreshed, the old fingerprint is a dead
    * version). A different fingerprint from a DIFFERENT source is a LIVE
    * sibling — several datasets legitimately share one artifact name
    * (the three test scale factors here; per-tenant sources at cluster
    * scale), and round 11 observed the unqualified prune deleting a
    * sibling's committed artifact out from under a concurrently-running
    * session (PATH_NOT_FOUND mid-read).
    *
    * The retention sweep closes the lifecycle the source-scoped rule
    * left open: without it, artifacts of DELETED or renamed sources are
    * never reclaimed (nothing fingerprints them again), and marker-less
    * pre-`_SOURCE` dirs accrue forever — at a lakehouse root that is an
    * unbounded leak. A committed dir is garbage when either its
    * `_SOURCE` names a path that no longer exists, or it has no
    * `_SOURCE` at all (unknown provenance — never guessed stale, only
    * aged out); both are reclaimed only once older than the horizon,
    * so a concurrent reader mid-artifact is never undercut.
    *
    * Every per-entry check tolerates the entry vanishing mid-scan
    * (NoSuchFileException and kin → skip): concurrent sessions prune the
    * same parent, and a TOCTOU between exists() and readString() must
    * not fail a build whose own commit already succeeded. */
  private def prune(parent: Path, keep: String, source: String): Unit = {
    val src = Paths.get(source).toAbsolutePath.normalize.toString
    val ds = Files.newDirectoryStream(parent)
    try {
      import scala.jdk.CollectionConverters._
      val now = System.currentTimeMillis()
      val staleMs = now - 6L * 3600 * 1000
      val garbageMs = now - retentionMs
      ds.iterator().asScala.foreach { p =>
        try {
          val n = p.getFileName.toString
          val marker = p.resolve("_SOURCE")
          val markedSrc =
            if (Files.exists(marker)) Some(Files.readString(marker)) else None
          val committed = n != keep && !n.startsWith(".tmp_") &&
            Files.exists(p.resolve("_STAGED"))
          val superseded = committed && markedSrc.contains(src)
          val aged = Files.getLastModifiedTime(p).toMillis < garbageMs
          val orphaned = committed && aged && (markedSrc match {
            case Some(m) => !Files.isDirectory(Paths.get(m)) // source deleted
            case None    => true // pre-_SOURCE build, unknown provenance
          })
          val crashed = n.startsWith(".tmp_") &&
            Files.getLastModifiedTime(p).toMillis < staleMs
          if (superseded || orphaned || crashed) deleteTree(p)
        } catch { // entry vanished mid-scan (concurrent prune) — skip it
          case _: java.io.IOException | _: java.io.UncheckedIOException => ()
        }
      }
    } finally ds.close()
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(q => { Files.deleteIfExists(q); () })
}
