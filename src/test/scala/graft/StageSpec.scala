package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Contract of [[Stage]] — the persistent, staleness-aware staging layer:
  * build once, serve every later session from disk, rebuild (never serve
  * stale) when the source content changes, prune superseded versions. */
class StageSpec extends AnyFunSuite {

  private def freshSource(): Path = {
    val src = TempDirs.fresh("stage_src")
    Files.write(src.resolve("a.txt"), "one".getBytes("UTF-8"))
    Files.write(src.resolve("b.txt"), "two".getBytes("UTF-8"))
    src
  }

  test("derived builds once and reuses within the session") {
    val src = freshSource()
    val name = s"spec_${java.util.UUID.randomUUID}"
    var built = 0
    def build(p: Path): Unit = {
      built += 1
      Files.write(p.resolve("artifact.txt"), s"v$built".getBytes("UTF-8"))
    }
    val d1 = Stage.derived(name, src.toString)(build)
    val d2 = Stage.derived(name, src.toString)(build)
    assert(built == 1)
    assert(d1 == d2)
    assert(Files.exists(d1.resolve("_STAGED")))
  }

  test("a fresh session is served by the persisted artifact, no rebuild") {
    val src = freshSource()
    val name = s"spec_${java.util.UUID.randomUUID}"
    var built = 0
    def build(p: Path): Unit = {
      built += 1
      Files.write(p.resolve("artifact.txt"), "payload".getBytes("UTF-8"))
    }
    Stage.derived(name, src.toString)(build)
    assert(built == 1)
    Stage.clearMemo() // simulate a new JVM against the same stage root
    val again = Stage.derived(name, src.toString)(build)
    assert(built == 1, "second session must reuse the committed artifact")
    assert(new String(Files.readAllBytes(again.resolve("artifact.txt")),
      "UTF-8") == "payload")
  }

  test("mutated source content forces a rebuild and prunes the stale dir") {
    val src = freshSource()
    val name = s"spec_${java.util.UUID.randomUUID}"
    var built = 0
    def build(p: Path): Unit = {
      built += 1
      Files.write(p.resolve("artifact.txt"), s"v$built".getBytes("UTF-8"))
    }
    val v1 = Stage.derived(name, src.toString)(build)
    // size change ⇒ fingerprint change even within mtime resolution —
    // note NO clearMemo: in-session mutation must be caught too, the
    // fingerprint is recomputed on every lookup
    Files.write(src.resolve("a.txt"), "one-more-bytes".getBytes("UTF-8"))
    val v2 = Stage.derived(name, src.toString)(build)
    assert(built == 2, "mutated source must rebuild, not serve stale data")
    assert(v1 != v2)
    assert(new String(Files.readAllBytes(v2.resolve("artifact.txt")),
      "UTF-8") == "v2")
    assert(!Files.exists(v1), "superseded fingerprint dir must be pruned")
  }

  test("sibling sources share an artifact name without pruning each other") {
    // Round-11 regression: the three scale factors (or per-tenant sources
    // at cluster scale) all stage under one artifact name. Building for
    // source B must NOT delete source A's live artifact (the unqualified
    // prune did — PATH_NOT_FOUND in a concurrent session mid-read);
    // refreshing A must still prune only A's old fingerprint.
    val srcA = freshSource()
    val srcB = freshSource()
    val name = s"spec_${java.util.UUID.randomUUID}"
    def build(tag: String)(p: Path): Unit =
      Files.write(p.resolve("artifact.txt"), tag.getBytes("UTF-8"))
    val a1 = Stage.derived(name, srcA.toString)(build("a1"))
    val b1 = Stage.derived(name, srcB.toString)(build("b1"))
    assert(Files.exists(a1.resolve("_STAGED")),
      "building for a sibling source must not prune another source's artifact")
    assert(Files.exists(b1.resolve("_STAGED")))
    // refresh A: its own old fingerprint prunes, B's stays
    Files.write(srcA.resolve("a.txt"), "mutated-bytes".getBytes("UTF-8"))
    val a2 = Stage.derived(name, srcA.toString)(build("a2"))
    assert(a2 != a1 && !Files.exists(a1), "A's superseded dir must prune")
    assert(Files.exists(b1.resolve("_STAGED")), "B must survive A's refresh")
  }

  test("adding or removing a source file changes the fingerprint") {
    val src = freshSource()
    val f0 = Stage.fingerprint(src.toString)
    Files.write(src.resolve("c.txt"), "three".getBytes("UTF-8"))
    val f1 = Stage.fingerprint(src.toString)
    assert(f0 != f1)
    Files.delete(src.resolve("c.txt"))
    assert(Stage.fingerprint(src.toString) == f0)
  }

  private def ageDir(p: Path, hours: Long): Unit =
    Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - hours * 3600 * 1000))

  test("retention sweep reclaims aged artifacts of deleted sources only") {
    // The lifecycle gap the source-scoped prune left open: a source that
    // is deleted (or renamed) never fingerprints again, so its artifacts
    // would accrue forever. The sweep reclaims them once aged past the
    // retention horizon — and must not touch live siblings or
    // not-yet-aged orphans (a concurrent reader may still be mid-read).
    val srcA = freshSource()
    val srcB = freshSource()
    val srcC = freshSource()
    val name = s"spec_${java.util.UUID.randomUUID}"
    def build(tag: String)(p: Path): Unit =
      Files.write(p.resolve("artifact.txt"), tag.getBytes("UTF-8"))
    val a1 = Stage.derived(name, srcA.toString)(build("a1"))
    val b1 = Stage.derived(name, srcB.toString)(build("b1"))
    val c1 = Stage.derived(name, srcC.toString)(build("c1"))
    // delete B's and C's source datasets; only B's artifact is aged out
    def rmTree(p: Path): Unit =
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(q => { Files.deleteIfExists(q); () })
    rmTree(srcB); rmTree(srcC)
    ageDir(b1, hours = 200) // past the 168h default horizon
    // any build under the name triggers the sweep
    Files.write(srcA.resolve("a.txt"), "refreshed".getBytes("UTF-8"))
    val a2 = Stage.derived(name, srcA.toString)(build("a2"))
    assert(Files.exists(a2.resolve("_STAGED")))
    assert(!Files.exists(b1), "aged orphan (deleted source) must be reclaimed")
    assert(Files.exists(c1.resolve("_STAGED")),
      "an orphan inside the retention horizon must survive the sweep")
  }

  test("retention sweep ages out marker-less dirs, keeps recent ones") {
    // Pre-round-11 artifacts carry no _SOURCE marker: provenance unknown,
    // never guessed stale — but they must not leak forever either. The
    // sweep reclaims them only past the retention horizon.
    val src = freshSource()
    val name = s"spec_${java.util.UUID.randomUUID}"
    val parent = Files.createDirectories(Stage.root.resolve(name))
    def legacy(fp: String): Path = {
      val d = Files.createDirectories(parent.resolve(fp))
      Files.write(d.resolve("artifact.txt"), "legacy".getBytes("UTF-8"))
      Files.createFile(d.resolve("_STAGED")) // committed, but no _SOURCE
      d
    }
    val old = legacy("feedfacefeedfacefeedfacefeedface")
    val recent = legacy("deadbeefdeadbeefdeadbeefdeadbeef")
    ageDir(old, hours = 200)
    Stage.derived(name, src.toString) { p =>
      Files.write(p.resolve("artifact.txt"), "live".getBytes("UTF-8"))
    }
    assert(!Files.exists(old), "aged marker-less dir must be reclaimed")
    assert(Files.exists(recent.resolve("_STAGED")),
      "recent marker-less dir must survive (unknown provenance, not aged)")
  }

  test("a failed build leaves no committed artifact and can be retried") {
    val src = freshSource()
    val name = s"spec_${java.util.UUID.randomUUID}"
    intercept[RuntimeException] {
      Stage.derived(name, src.toString)(_ => sys.error("boom"))
    }
    assert(!Files.exists(Stage.root.resolve(name)
      .resolve(Stage.fingerprint(src.toString)).resolve("_STAGED")))
    var built = 0
    Stage.derived(name, src.toString) { p =>
      built += 1
      Files.write(p.resolve("ok.txt"), "ok".getBytes("UTF-8"))
    }
    assert(built == 1)
  }

  test("concurrent derived on one name+source: one build, one commit, all served") {
    val src = freshSource()
    val name = s"spec_${java.util.UUID.randomUUID}"
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val futures = (1 to 8).map(_ => Future {
        Stage.derived(name, src.toString) { p =>
          built.incrementAndGet()
          Thread.sleep(50) // widen the race window
          Files.write(p.resolve("artifact.txt"), "x".getBytes("UTF-8"))
        }
      })
      val paths = Await.result(Future.sequence(futures), 60.seconds)
      assert(built.get == 1, s"expected one build, ran ${built.get}")
      assert(paths.toSet.size == 1)
      assert(Files.exists(paths.head.resolve("_STAGED")))
    } finally pool.shutdown()
  }

  test("rename-race loser discards its tmp and serves the winner's commit") {
    val src = freshSource()
    val name = s"spec_${java.util.UUID.randomUUID}"
    val fp = Stage.fingerprint(src.toString)
    val target = Stage.root.resolve(name).resolve(fp)
    // the build closure plays the OTHER session: it commits the target
    // while this session's build is still writing its tmp — this
    // session's atomic move must lose benignly and serve the winner
    val d = Stage.derived(name, src.toString) { tmp =>
      Files.createDirectories(target)
      Files.writeString(target.resolve("artifact.txt"), "winner")
      Files.writeString(target.resolve("_SOURCE"),
        src.toAbsolutePath.normalize.toString)
      Files.createFile(target.resolve("_STAGED"))
      Files.writeString(tmp.resolve("artifact.txt"), "loser")
    }
    assert(Files.readString(d.resolve("artifact.txt")) == "winner")
    val leftoverTmps = {
      val s = Files.list(Stage.root.resolve(name))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(_.getFileName.toString.startsWith(".tmp_"))
      } finally s.close()
    }
    assert(leftoverTmps == 0, s"$leftoverTmps loser tmp dirs left behind")
  }

  test("prune under churn never undercuts a live sibling's artifact") {
    val name = s"spec_${java.util.UUID.randomUUID}"
    val src1 = freshSource()
    val src2 = freshSource()
    Stage.derived(name, src2.toString) { p =>
      Files.writeString(p.resolve("art"), "s2")
    }
    val churnFailed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val churn = new Thread(() => {
      try (0 until 10).foreach { i =>
        // mutate src1's content (size changes → new fingerprint) so every
        // derived() commits a new version and prunes the superseded one
        Files.write(src1.resolve("a.txt"), ("v" * (i + 1)).getBytes("UTF-8"))
        Stage.derived(name, src1.toString) { p =>
          Files.writeString(p.resolve("art"), s"v$i")
        }
      } catch { case _: Throwable => churnFailed.set(true) }
    })
    churn.start()
    // concurrently, fresh "sessions" keep resolving src2's artifact while
    // src1's churn prunes the shared parent dir
    var rebuilt = false
    val ok = (1 to 20).forall { _ =>
      Stage.clearMemo()
      val d = Stage.derived(name, src2.toString) { p =>
        rebuilt = true // would mean the sibling's commit was pruned
        Files.writeString(p.resolve("art"), "s2")
      }
      Files.exists(d.resolve("art")) && Files.readString(d.resolve("art")) == "s2"
    }
    churn.join(60000)
    assert(!churnFailed.get, "churn thread threw")
    assert(!rebuilt, "sibling artifact was pruned out from under a live source")
    assert(ok, "sibling artifact unreadable during concurrent prune")
  }
}
