package graft.io

import java.util.concurrent.atomic.AtomicBoolean

import org.scalatest.funsuite.AnyFunSuite

class ConcurrentSpec extends AnyFunSuite {

  test("runAll runs every task and propagates the original failure") {
    val ran = new AtomicBoolean(false)
    val boom = intercept[RuntimeException] {
      Concurrent.runAll(Seq(
        () => ran.set(true),
        () => throw new RuntimeException("task failed"),
      ))
    }
    assert(boom.getMessage == "task failed")
    assert(ran.get())
  }

  test("on failure, a still-running sibling is interrupted before the rethrow") {
    val interrupted = new AtomicBoolean(false)
    val finishedNormally = new AtomicBoolean(false)
    intercept[RuntimeException] {
      Concurrent.runAll(Seq(
        () => { Thread.sleep(50); throw new RuntimeException("fail fast") },
        () =>
          try { Thread.sleep(60000); finishedNormally.set(true) }
          catch { case _: InterruptedException => interrupted.set(true) },
      ))
    }
    assert(interrupted.get(), "sibling task was not interrupted")
    assert(!finishedNormally.get())
  }

  test("a fast failure is observed even when a slow task was submitted first") {
    val interrupted = new AtomicBoolean(false)
    val t0 = System.nanoTime()
    intercept[RuntimeException] {
      Concurrent.runAll(Seq(
        () =>
          try Thread.sleep(60000)
          catch { case _: InterruptedException => interrupted.set(true) },
        () => { Thread.sleep(50); throw new RuntimeException("fail fast") },
      ))
    }
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(elapsedMs < 10000, s"failure sat behind the slow sibling for ${elapsedMs}ms")
    assert(interrupted.get())
  }

  test("single task runs inline") {
    var n = 0
    Concurrent.runAll(Seq(() => n += 1))
    assert(n == 1)
  }
}
