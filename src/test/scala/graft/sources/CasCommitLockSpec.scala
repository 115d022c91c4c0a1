package graft.sources

import java.nio.file.Files

import graft.SparkSuite

/** The object-store-shaped CommitLock: a CAS lease over a key-value store
  * serializes racing commits, a crashed holder's lease self-heals by
  * expiry, and a mid-commit takeover surfaces loudly. */
class CasCommitLockSpec extends SparkSuite {
  import spark.implicits._

  test("racing appends through the CAS lease all land, strictly serialized") {
    val root = Files.createTempDirectory("graft_cas_").toString
    spark.conf.set("spark.sql.catalog.graftcas", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcas.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcas.q")
    spark.sql("CREATE TABLE graftcas.q.t (id BIGINT)")
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val overlapped = new java.util.concurrent.atomic.AtomicBoolean(false)
    val store = new InMemoryCasStore
    val observing = new CommitLock {
      private val cas = new CasCommitLock(store, leaseMs = 60000L)
      def withLock[T](dir: java.nio.file.Path)(body: => T): T =
        cas.withLock(dir) {
          if (inside.incrementAndGet() != 1) overlapped.set(true)
          try body finally inside.decrementAndGet()
        }
    }
    val prev = ManifestLock.install(observing)
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext = ExecutionContext.global
      val futs = (0 until 8).map { t =>
        Future {
          spark.range(t * 100L, t * 100L + 10).toDF("id")
            .coalesce(1).writeTo("graftcas.q.t").append()
        }
      }
      Await.result(Future.sequence(futs), 180.seconds)
    } finally ManifestLock.install(prev)
    assert(spark.table("graftcas.q.t").count() == 80L,
      "every racing append must publish through the CAS lease")
    assert(!overlapped.get(), "no two commits may hold the lease at once")
  }

  test("an expired lease (crashed holder) is taken over; a live one blocks") {
    val store = new InMemoryCasStore
    val lock = new CasCommitLock(store, leaseMs = 200L, retryMs = 2L)
    val dir = Files.createTempDirectory("graft_cas2_")
    val key = s"graft-lock:${dir.toAbsolutePath}"
    // simulate a holder that died mid-commit: a lease with a near deadline
    store.putIfMatch(key, None, s"dead-writer@${System.currentTimeMillis() + 100}")
    val t0 = System.currentTimeMillis()
    var ran = false
    lock.withLock(dir) { ran = true } // must wait out the lease, then take it
    assert(ran)
    assert(System.currentTimeMillis() - t0 >= 90,
      "a live lease must block the taker until expiry")
    assert(store.get(key).contains(""), "release must return the key to free")
  }

  test("a mid-commit takeover surfaces instead of silently unlocking") {
    val store = new InMemoryCasStore
    val lock = new CasCommitLock(store, leaseMs = 50L, retryMs = 2L)
    val dir = Files.createTempDirectory("graft_cas3_")
    val key = s"graft-lock:${dir.toAbsolutePath}"
    val e = intercept[IllegalStateException] {
      lock.withLock(dir) {
        // the commit outlives its lease and ANOTHER writer takes over
        Thread.sleep(80)
        assert(store.putIfMatch(key, store.get(key),
          s"usurper@${System.currentTimeMillis() + 60000}"))
      }
    }
    assert(e.getMessage.contains("expired mid-commit"))
  }
}
