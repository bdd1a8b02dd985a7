package graft

import java.nio.file.{Files, Path}
import java.util.Comparator
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import java.util.concurrent.atomic.AtomicBoolean

/** Session-lifetime temp-dir registry with ONE JVM shutdown hook.
  *
  * Several queries stage data on local disk (q129's rollup table, q164's
  * doubled backlog, q161's inverted index, the shared co-purchase graph).
  * Each used to create its own temp dir AND register its own shutdown
  * hook per invocation — a bench sweep invokes every query 2–4×, so hooks
  * (each pinning a thread and a path) accrued for the JVM lifetime and
  * disk usage grew unboundedly within a session.
  *
  * This registry fixes both accruals:
  *  - exactly one shutdown hook, installed lazily on first use, draining
  *    a shared cleanup list ([[hookCount]] stays 1 forever — spec'd);
  *  - [[scoped]] memoizes a dir per cache key, so deterministic staged
  *    artifacts (an index built from a dataset dir, a materialized derived
  *    table) are built ONCE per key and reused by every later invocation
  *    instead of re-staged per call. The first caller runs the build
  *    inside `computeIfAbsent`, so concurrent callers of the same key
  *    block until the artifact is complete — no torn reads.
  *
  * Cleanup stays at-JVM-exit (not eager) because returned DataFrames read
  * the staged files lazily — deleting a previous invocation's dir could
  * pull the rug out from under a caller still holding its result.
  */
object TempDirs {
  private val registered = new ConcurrentLinkedQueue[Path]()
  private val hookInstalled = new AtomicBoolean(false)
  private val scopedDirs = new ConcurrentHashMap[String, Path]()
  private val scopedLocks = new ConcurrentHashMap[String, Object]()

  /** 0 before first use, 1 forever after — never one per invocation. */
  def hookCount: Int = if (hookInstalled.get) 1 else 0

  /** Dirs currently awaiting exit-time cleanup. */
  def registeredCount: Int = registered.size()

  /** Fresh temp dir, deleted recursively at JVM exit. */
  def fresh(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    if (hookInstalled.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        registered.forEach { base =>
          if (Files.exists(base))
            Files.walk(base).sorted(Comparator.reverseOrder[Path]())
              .forEach(q => { Files.deleteIfExists(q); () })
        }
      }))
    p
  }

  /** Memoized temp dir per key: the first caller creates the dir and runs
    * `build` against it; later callers get the finished dir instantly.
    *
    * Contract (SESSION-scoped staging — for artifacts that must persist
    * across JVMs and invalidate on source change, use [[Stage.derived]]):
    *  - the key must fully determine the artifact for the JVM lifetime —
    *    a key derived from a dataset path assumes that dataset dir is
    *    immutable within the session (content staleness is Stage's job);
    *  - `build` runs OUTSIDE the memo map (a per-key monitor serializes
    *    duplicate builders), so a build may itself call `scoped` for a
    *    different key without deadlocking; re-entering the SAME key from
    *    inside its own build would self-deadlock on the monitor — don't.
    */
  def scoped(key: String, prefix: String)(build: Path => Unit): Path = {
    val got = scopedDirs.get(key)
    if (got != null) return got
    val lock = scopedLocks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      val again = scopedDirs.get(key)
      if (again != null) again
      else { val p = fresh(prefix); build(p); scopedDirs.put(key, p); p }
    }
  }
}
