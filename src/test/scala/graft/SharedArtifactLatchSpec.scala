package graft

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Pins the per-path once-latch semantics of
  * [[queries.LlmOps.buildSharedOnce]] (r12). The r11 shape held one
  * global monitor through any build, so concurrent constructors of
  * DIFFERENT shared artifacts (e01's exact top-k vs e16's exact MMR,
  * under parallel spec suites) serialized behind whichever build ran
  * first. These tests drive the latch with plain thunks — no Spark. Paths
  * are unique per test so runs never collide with each other or with the
  * real scratch artifacts built elsewhere in the suite. */
class SharedArtifactLatchSpec extends AnyFunSuite {
  private def uniq(tag: String) = s"/latch-spec/$tag-${java.util.UUID.randomUUID()}"

  test("builders of DIFFERENT paths do not serialize behind each other") {
    val aEntered  = new CountDownLatch(1)
    val aRelease  = new CountDownLatch(1)
    val bFinished = new CountDownLatch(1)
    val pathA = uniq("a")
    val pathB = uniq("b")
    val ta = new Thread(() =>
      queries.LlmOps.buildSharedOnce(pathA) { aEntered.countDown(); aRelease.await() })
    ta.start()
    assert(aEntered.await(10, TimeUnit.SECONDS), "builder A never entered its build")
    // with A still INSIDE its build, a builder of an unrelated path must
    // complete — under the r11 global monitor this deadlocked until A
    // released (here: timed out)
    val tb = new Thread(() =>
      queries.LlmOps.buildSharedOnce(pathB) { bFinished.countDown() })
    tb.start()
    assert(bFinished.await(10, TimeUnit.SECONDS),
      "builder B (different path) blocked behind A's in-flight build")
    aRelease.countDown()
    ta.join(10000); tb.join(10000)
  }

  test("concurrent builders of the SAME path build once; latecomer sees the finished build") {
    val builds = new AtomicInteger(0)
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val path = uniq("same")
    val t1 = new Thread(() =>
      queries.LlmOps.buildSharedOnce(path) {
        builds.incrementAndGet(); entered.countDown(); release.await()
      })
    t1.start()
    assert(entered.await(10, TimeUnit.SECONDS))
    // the latecomer must WAIT for the in-flight build (never observe a
    // half-written artifact), then return without building again
    val t2 = new Thread(() => queries.LlmOps.buildSharedOnce(path) { builds.incrementAndGet() })
    t2.start()
    t2.join(500)
    assert(t2.isAlive, "latecomer returned while the same-path build was still in flight")
    release.countDown()
    t1.join(10000); t2.join(10000)
    assert(!t1.isAlive && !t2.isAlive)
    assert(builds.get() == 1, s"same path built ${builds.get()} times")
    // and a later sequential call is a no-op read of the latch
    queries.LlmOps.buildSharedOnce(path) { builds.incrementAndGet() }
    assert(builds.get() == 1)
  }

  test("a failed build propagates its cause and the next call retries") {
    val path = uniq("fail")
    val boom = intercept[IllegalStateException] {
      queries.LlmOps.buildSharedOnce(path) { throw new IllegalStateException("boom") }
    }
    assert(boom.getMessage == "boom")
    var built = false
    queries.LlmOps.buildSharedOnce(path) { built = true }
    assert(built, "failed build did not release the latch for a retry")
  }

  test("a concurrent waiter on a failing build sees the failure or performs the retry itself") {
    val path = uniq("fail2")
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    @volatile var waiterError: Throwable = null
    @volatile var waiterBuilt = false
    val t1 = new Thread(() =>
      try queries.LlmOps.buildSharedOnce(path) {
        entered.countDown(); release.await(); throw new IllegalStateException("boom2")
      } catch { case _: Throwable => () })
    t1.start()
    assert(entered.await(10, TimeUnit.SECONDS))
    // the waiter either joins the in-flight failing build (and must see
    // its failure, never a silent success over a missing artifact) or —
    // if the failure wins the race and releases the latch first — it IS
    // the retry and must build successfully. Both are correct; what is
    // forbidden is returning success without anyone having built.
    val t2 = new Thread(() =>
      try queries.LlmOps.buildSharedOnce(path) { waiterBuilt = true }
      catch { case e: Throwable => waiterError = e })
    t2.start()
    release.countDown()
    t1.join(10000); t2.join(10000)
    assert(waiterBuilt || waiterError != null,
      "waiter returned success though nothing was ever built")
    if (waiterError != null) assert(waiterError.getMessage == "boom2")
    // after the dust settles a build must be (or become) available
    var built = false
    queries.LlmOps.buildSharedOnce(path) { built = true }
    assert(built || waiterBuilt)
  }

  test("an interrupted WAITER does not evict the in-flight latch (no double build)") {
    val path = uniq("interrupt")
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val builds = new AtomicInteger(0)
    @volatile var waiterInterrupted = false
    val installer = new Thread(() =>
      queries.LlmOps.buildSharedOnce(path) {
        builds.incrementAndGet(); entered.countDown(); release.await()
      })
    installer.start()
    assert(entered.await(10, TimeUnit.SECONDS))
    val waiter = new Thread(() =>
      try queries.LlmOps.buildSharedOnce(path) { builds.incrementAndGet() }
      catch { case _: InterruptedException => waiterInterrupted = true })
    waiter.start()
    Thread.sleep(100) // let the waiter block on the latch
    waiter.interrupt()
    waiter.join(10000)
    assert(waiterInterrupted, "waiter did not surface its interruption")
    // the installer's build is STILL the one latch: finishing it must
    // satisfy every later caller without a second build — under the old
    // catch-all the interrupted waiter evicted the latch and the next
    // caller re-ran the build over a possibly-published artifact
    release.countDown()
    installer.join(10000)
    queries.LlmOps.buildSharedOnce(path) { builds.incrementAndGet() }
    assert(builds.get() == 1, s"build ran ${builds.get()} times; the latch was evicted")
  }

  test("same-thread reentry for the same path fails fast instead of deadlocking (r13)") {
    // pre-r12 the reentrant monitor made this a silent no-op; the r12
    // FutureTask latch turned it into a DEADLOCK (the build waits on its
    // own still-running task). The r13 contract: fail fast, naming the
    // path — a reentrant caller must not read a half-written artifact.
    val path = uniq("reenter")
    val builds = new AtomicInteger(0)
    val caught = intercept[IllegalStateException] {
      queries.LlmOps.buildSharedOnce(path) {
        builds.incrementAndGet()
        queries.LlmOps.buildSharedOnce(path) { builds.incrementAndGet() }
      }
    }
    assert(caught.getMessage.contains(path))
    assert(builds.get() == 1, "the inner call must not re-run the build")
    // the failed OUTER build removed its latch: the path stays retryable
    queries.LlmOps.buildSharedOnce(path) { builds.incrementAndGet() }
    assert(builds.get() == 2, "path not retryable after the reentrant failure")
  }

  test("a DIFFERENT thread's build may itself build another path (no cross-path reentry trip)") {
    // the reentry guard keys on (installer thread, path): a build that
    // builds a DIFFERENT path nests fine
    val outer = uniq("outer")
    val inner = uniq("inner")
    val builds = new AtomicInteger(0)
    queries.LlmOps.buildSharedOnce(outer) {
      builds.incrementAndGet()
      queries.LlmOps.buildSharedOnce(inner) { builds.incrementAndGet() }
    }
    assert(builds.get() == 2)
  }
}
