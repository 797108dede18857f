package graft

import org.scalatest.funsuite.AnyFunSuite

/** The build-exactly-once memo cell (round 18): TrieMap.getOrElseUpdate
  * can evaluate its by-name default twice under a race — for memo
  * values that pin checkpoint blocks or write shared paths, the losing
  * build is a silent leak. Once.memo must build exactly once under
  * heavy contention and never build on peek.
  */
class OnceSpec extends AnyFunSuite {

  test("memo builds exactly once under 32-thread contention") {
    val m = scala.collection.concurrent.TrieMap.empty[String, graft.util.Once[Int]]
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val barrier = new java.util.concurrent.CyclicBarrier(32)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val threads = (0 until 32).map { _ =>
      new Thread(() => {
        barrier.await()
        results.add(graft.util.Once.memo(m, "k") {
          Thread.sleep(5) // widen the race window
          builds.incrementAndGet()
        }): Unit
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(builds.get() == 1, "the build must run exactly once")
    assert(results.size == 32 && results.toArray.forall(_ == 1),
      "every caller must observe the single built value")
  }

  test("peek never triggers a build") {
    val cell = new graft.util.Once[Int](() => sys.error("peek must not build"))
    assert(cell.peek.isEmpty)
    val built = new graft.util.Once[Int](() => 7)
    assert(built.value == 7)
    assert(built.peek.contains(7))
  }
}
