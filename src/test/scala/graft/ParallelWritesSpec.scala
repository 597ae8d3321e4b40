package graft

import graft.util.ParallelWrites
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.atomic.AtomicInteger

class ParallelWritesSpec extends AnyFunSuite {

  test("results keep submission order") {
    val out = ParallelWrites.run((1 to 16).toList, 4)(_ * 2)
    assert(out == (1 to 16).map(_ * 2))
  }

  test("tasks actually overlap at parallelism > 1") {
    val peak = new AtomicInteger
    val active = new AtomicInteger
    ParallelWrites.run((1 to 8).toList, 4) { _ =>
      val now = active.incrementAndGet()
      peak.updateAndGet(p => math.max(p, now))
      Thread.sleep(50)
      active.decrementAndGet()
    }
    assert(peak.get() > 1, s"peak concurrency ${peak.get()} — tasks ran serially")
  }

  test("every task completes before the first failure is rethrown") {
    val completed = new AtomicInteger
    val e = intercept[RuntimeException] {
      ParallelWrites.run((1 to 6).toList, 3) { i =>
        if (i == 2) throw new RuntimeException("boom")
        Thread.sleep(20)
        completed.incrementAndGet()
      }
    }
    assert(e.getMessage == "boom")
    // the barrier contract: no unsupervised task left running on abort
    assert(completed.get() == 5)
  }

  test("parallelism 1 degenerates to the sequential loop") {
    val order = collection.mutable.Buffer[Int]()
    ParallelWrites.run((1 to 5).toList, 1) { i => order += i }
    assert(order.toList == (1 to 5).toList)
  }
}
