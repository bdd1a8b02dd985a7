package graft

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}
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
          catch { // another session committed first — use theirs
            case _: FileAlreadyExistsException
                 | _: java.nio.file.DirectoryNotEmptyException =>
              deleteTree(tmp)
          }
        } catch { case e: Throwable => deleteTree(tmp); throw e }
        prune(parent, keep = fp, source = sourceDir)
      }
      memo.put(memoKey, target)
      target
    }
  }

  /** Remove superseded fingerprint dirs and crashed builders' tmp dirs
    * older than six hours. "Superseded" is judged per SOURCE: a dir is
    * pruned only when its `_SOURCE` marker names the SAME dataset this
    * build derives from (its content was refreshed, the old fingerprint
    * is a dead version). A different fingerprint from a DIFFERENT source
    * is a LIVE sibling — several datasets legitimately share one
    * artifact name (the three test scale factors here; per-tenant
    * sources at cluster scale), and round 11 observed the unqualified
    * prune deleting a sibling's committed artifact out from under a
    * concurrently-running session (PATH_NOT_FOUND mid-read). Dirs
    * without a `_SOURCE` marker (pre-round-11 builds) are left alone —
    * unknown provenance must not be guessed stale. */
  private def prune(parent: Path, keep: String, source: String): Unit = {
    val src = Paths.get(source).toAbsolutePath.normalize.toString
    val ds = Files.newDirectoryStream(parent)
    try {
      import scala.jdk.CollectionConverters._
      val staleMs = System.currentTimeMillis() - 6L * 3600 * 1000
      ds.iterator().asScala.foreach { p =>
        val n = p.getFileName.toString
        val sameSource = Files.exists(p.resolve("_SOURCE")) &&
          Files.readString(p.resolve("_SOURCE")) == src
        val superseded = n != keep && !n.startsWith(".tmp_") &&
          Files.exists(p.resolve("_STAGED")) && sameSource
        val crashed = n.startsWith(".tmp_") &&
          Files.getLastModifiedTime(p).toMillis < staleMs
        if (superseded || crashed) deleteTree(p)
      }
    } finally ds.close()
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(q => { Files.deleteIfExists(q); () })
}
