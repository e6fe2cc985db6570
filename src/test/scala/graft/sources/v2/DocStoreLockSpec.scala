package graft.sources.v2

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Lock-protocol edge cases that the filesystem-level
  * DocStoreCompactSpec can't reach deterministically: the
  * breaker-vs-fresh-acquirer displacement (a slow breaker must NOT
  * move aside a lock that was already broken and re-acquired by a
  * faster process) and heartbeat loss (a holder whose lock is broken
  * out from under it must abort loudly, not keep mutating unlocked).
  * Lives in package graft.sources.v2 for `private[v2]` access. */
class DocStoreLockSpec extends AnyFunSuite {

  private def tmpDir(): String =
    Files.createTempDirectory("docstore-lock").toString

  test("breakStale breaks a lock whose mtime matches the observation") {
    val dir = tmpDir()
    val lock = new File(dir, "_compact.lock")
    Files.createFile(lock.toPath)
    val stale = System.currentTimeMillis() - DocStoreCompact.LockStaleMs - 5000
    assert(lock.setLastModified(stale))
    val observed = lock.lastModified()
    assert(DocStoreCompact.breakStale(dir, lock, observed))
    assert(!lock.exists(), "broken lock should be gone")
    assert(new File(dir).listFiles().forall(!_.getName.contains("broken")),
      "debris should be cleaned up")
  }

  test("breakStale puts back a FRESH lock it displaced (the slow-breaker race)") {
    val dir = tmpDir()
    val lock = new File(dir, "_compact.lock")
    // the slow breaker observed the OLD stale mtime...
    val observedStale =
      System.currentTimeMillis() - DocStoreCompact.LockStaleMs - 5000
    // ...but by the time it moves, a faster breaker has already broken
    // that lock and created a fresh one (simulated: the on-disk file
    // carries a current mtime, not the observed one)
    Files.createFile(lock.toPath)
    val freshMtime = lock.lastModified()
    assert(freshMtime != observedStale)
    assert(!DocStoreCompact.breakStale(dir, lock, observedStale),
      "displacing a fresh lock must report failure")
    assert(lock.exists(), "the fresh lock must be put back")
    assert(lock.lastModified() === freshMtime,
      "the restored lock must be the displaced one, not a new file")
  }

  test("heartbeat loss aborts the mutation instead of running unlocked") {
    val dir = tmpDir()
    val lock = new File(dir, "_compact.lock")
    val ex = intercept[DocStoreCompact.ConcurrentCompactionException] {
      DocStoreCompact.withLock(dir, heartbeatMs = 50L) {
        // someone breaks our lock mid-mutation (manual delete / clock
        // skew / the displaced-lock path); the beat must notice and
        // interrupt this body
        assert(lock.delete())
        Thread.sleep(10000)
        fail("body kept running unlocked after the lock was broken")
      }
    }
    assert(ex.getMessage.contains("lost"), ex.getMessage)
    assert(!Thread.currentThread().isInterrupted,
      "interrupt flag must be cleared on exit")
  }

  test("heartbeat loss does not delete a successor's lock on exit") {
    val dir = tmpDir()
    val lock = new File(dir, "_compact.lock")
    intercept[DocStoreCompact.ConcurrentCompactionException] {
      DocStoreCompact.withLock(dir, heartbeatMs = 50L) {
        assert(lock.delete())
        // a successor acquires in the window before our beat fires
        Files.createFile(lock.toPath)
        Thread.sleep(10000)
      }
    }
    assert(lock.exists(),
      "the successor's lock must survive our abort path")
  }

  test("normal path still acquires, beats, and releases") {
    val dir = tmpDir()
    val lock = new File(dir, "_compact.lock")
    val out = DocStoreCompact.withLock(dir, heartbeatMs = 20L) {
      assert(lock.exists())
      Thread.sleep(120) // let several beats land
      42
    }
    assert(out === 42)
    assert(!lock.exists(), "lock must be released")
    assert(!Thread.currentThread().isInterrupted)
  }
}
