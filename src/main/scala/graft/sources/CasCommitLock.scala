package graft.sources

import java.nio.file.Path

/** The ATOMIC PRIMITIVE object stores actually offer — conditional put /
  * compare-and-swap on one key's value (S3 `If-Match`/`If-None-Match`, GCS
  * generation preconditions, DynamoDB conditional writes, etcd txn).
  * Everything a multi-driver commit coordinator needs reduces to this one
  * operation; a deployment binds it to its store's API. */
private[graft] trait CasStore {
  def get(key: String): Option[String]

  /** Atomically set `key` to `next` iff its current value is `expected`
    * (None = key absent). Returns false — changing NOTHING — otherwise. */
  def putIfMatch(key: String, expected: Option[String], next: String): Boolean
}

/** In-JVM [[CasStore]] — the test double, and the reference semantics any
  * real binding must honor (linearizable single-key CAS). */
private[graft] final class InMemoryCasStore extends CasStore {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def get(key: String): Option[String] = Option(m.get(key))
  def putIfMatch(key: String, expected: Option[String], next: String): Boolean =
    expected match {
      case None => m.putIfAbsent(key, next) == null
      case Some(e) => m.replace(key, e, next)
    }
}

/** Production-shaped [[CommitLock]] over a [[CasStore]]: a LEASE per table
  * directory, acquired by CAS and stamped with an expiry — the
  * DynamoDB-lease / S3-conditional-put design Delta documents for
  * multi-cluster writers, with the store call reduced to the one primitive
  * every object store offers.
  *
  *  - acquire: CAS the dir's key from its current state (absent, a
  *    released token, or an EXPIRED lease another writer abandoned by
  *    crashing) to a fresh `token@deadline`; losers retry with jittered
  *    backoff — they block, never silently proceed (the CommitLock
  *    contract).
  *  - release: CAS the key from our own token to released. A release that
  *    fails (our lease expired mid-commit and someone took over) is
  *    surfaced loudly — the commit may have raced, and silence here is
  *    exactly the lost-update the lock exists to prevent.
  *  - expiry makes a crashed holder's lease self-healing at the cost of a
  *    liveness assumption: `leaseMs` must exceed the longest
  *    read-stage-swap a commit performs. The default is generous for
  *    metadata swaps (the data writes happen OUTSIDE the lock).
  *
  * Clock caveat, stated plainly: expiry compares the TAKER's clock against
  * the HOLDER's deadline stamp — the standard lease trade-off; bound clock
  * skew well under `leaseMs`. */
private[graft] final class CasCommitLock(store: CasStore,
    leaseMs: Long = 60000L, retryMs: Long = 5L) extends CommitLock {

  private def now(): Long = System.currentTimeMillis()

  def withLock[T](dir: Path)(body: => T): T = {
    val key = s"graft-lock:${dir.toAbsolutePath}"
    val token = s"${java.util.UUID.randomUUID()}"
    var mine: String = null
    var spins = 0
    while (mine == null) {
      val cur = store.get(key)
      val free = cur match {
        case None => true
        case Some("") => true
        case Some(v) => v.split("@") match {
          case Array(_, deadline) => deadline.toLong < now() // expired lease
          case _ => false
        }
      }
      if (free) {
        val next = s"$token@${now() + leaseMs}"
        if (store.putIfMatch(key, cur, next)) mine = next
      }
      if (mine == null) {
        spins += 1
        // jittered linear backoff; the token seeds the jitter so two
        // losers do not stampede in lockstep
        Thread.sleep(retryMs + math.abs(token.hashCode) % (retryMs * spins + 1))
      }
    }
    try body
    finally {
      if (!store.putIfMatch(key, Some(mine), ""))
        throw new IllegalStateException(
          s"CasCommitLock: lease for $dir expired mid-commit and was taken " +
            "over — the commit may have raced a concurrent writer; raise " +
            s"leaseMs (${leaseMs}ms) above the slowest commit's duration")
    }
  }
}
