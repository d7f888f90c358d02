package graft

import graft.catalog.SideFileCache
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Unit pins for the shared metadata side-file cache behind
  * [[graft.catalog.ChunkCache]] and [[graft.catalog.ManifestListCache]]:
  * single-flight loads, LRU eviction by accounted size, and the
  * invalidate/replace bookkeeping (a leak there silently shrinks the
  * effective capacity for the rest of the process).
  */
class SideFileCacheSpec extends AnyFunSuite {

  test("concurrent gets of one key load once and share the instance") {
    val cache = new SideFileCache[java.util.List[String]](100L, _.size)
    val loads = new AtomicInteger(0)
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(8)
    try {
      val futs = (0 until 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[java.util.List[String]] {
          def call(): java.util.List[String] = cache.get("k") {
            gate.await(5, TimeUnit.SECONDS)
            loads.incrementAndGet()
            java.util.Arrays.asList("a", "b")
          }
        })
      }
      // let every thread reach the miss path before the load finishes
      Thread.sleep(100)
      gate.countDown()
      val results = futs.map(_.get(10, TimeUnit.SECONDS))
      assert(loads.get() == 1, s"load ran ${loads.get()} times")
      assert(results.forall(_ eq results.head), "all callers must share one instance")
      assert(cache.cachedCount == 1)
    } finally pool.shutdownNow()
  }

  test("eviction is by accounted size, oldest first, never the entry just loaded") {
    val cache = new SideFileCache[java.util.List[Integer]](30L, _.size)
    def entry(n: Int) = {
      val l = new java.util.ArrayList[Integer](); (0 until n).foreach(l.add(_)); l
    }
    cache.get("a")(entry(10)); cache.get("b")(entry(10)); cache.get("c")(entry(10))
    assert(cache.cachedCount == 3)
    cache.get("d")(entry(10)) // 40 > 30: evict the LRU entry (a)
    assert(cache.cachedCount == 3)
    assert(cache.peek("a") == null && cache.peek("d") != null)
    // an entry bigger than the whole capacity still caches itself
    // (everything else goes, the requested key survives)
    cache.get("huge")(entry(100))
    assert(cache.peek("huge") != null && cache.cachedCount == 1)
  }

  test("invalidate frees accounted capacity; peek never loads") {
    val cache = new SideFileCache[java.util.List[Integer]](20L, _.size)
    def entry(n: Int) = {
      val l = new java.util.ArrayList[Integer](); (0 until n).foreach(l.add(_)); l
    }
    assert(cache.peek("a") == null)
    cache.get("a")(entry(10)); cache.get("b")(entry(10))
    cache.invalidate("a")
    assert(cache.peek("a") == null && cache.peek("b") != null)
    // if invalidate leaked its accounting, this third insert would
    // push "total" past capacity and evict b; correct bookkeeping
    // keeps both (10 + 10 <= 20)
    cache.get("c")(entry(10))
    assert(cache.peek("b") != null && cache.peek("c") != null)
    cache.invalidateAll()
    assert(cache.cachedCount == 0)
  }

  test("a failed load propagates to every waiter and clears the in-flight slot") {
    val cache = new SideFileCache[java.util.List[String]](100L, _.size)
    intercept[RuntimeException] { cache.get("k")(throw new RuntimeException("io")) }
    // the failure must not wedge the key: a retry loads cleanly
    val v = cache.get("k")(java.util.Arrays.asList("ok"))
    assert(v.get(0) == "ok" && cache.cachedCount == 1)
  }
}
