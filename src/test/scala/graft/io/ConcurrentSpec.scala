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

  test("single task runs inline") {
    var n = 0
    Concurrent.runAll(Seq(() => n += 1))
    assert(n == 1)
  }
}
