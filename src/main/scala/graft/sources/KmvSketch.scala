package graft.sources

/** KMV (k-minimum-values) DISTINCT-COUNT sketch for the manifest's
  * column statistics — the NDV input Catalyst's CBO needs for join-order
  * and broadcast decisions that min/max zone maps cannot provide.
  *
  * Writers keep the K smallest DISTINCT 64-bit hashes of each configured
  * column's non-null cells, gathered in the same pass that writes the
  * rows (zero extra scans, O(K) memory per column). The retained hash
  * set serializes into the manifest's stats line (~2 KB base64 at
  * K=256), and planning merges per-file sketches by hash-set union —
  * KMV's closure property: the union's K smallest hashes are exactly the
  * sketch of the files' union, so overlapping files never double-count.
  *
  * Estimator: with fewer than K retained hashes the sketch IS the
  * complete distinct-hash set (exact up to 64-bit collisions); otherwise
  * the classic order-statistics estimate `(K−1) / u_K` where `u_K` is
  * the K-th smallest hash mapped onto the unit interval. Standard error
  * ≈ 1/√(K−2) ≈ 6% at K=256.
  *
  * Hashing mirrors [[FileBloom]]'s per-type canonicalization (splitmix64
  * over the internal long encoding, FNV-1a over UTF-8 bytes) so the
  * writer and any future reader-side consumer agree forever; doubles
  * ride their IEEE-754 bit pattern.
  */
private[sources] object KmvSketch {
  val K = 256

  /** Ascending UNSIGNED sort: flipping the sign bit maps unsigned order
    * onto signed order, so the JDK's primitive sort applies. */
  private def unsignedSorted(a: Array[Long]): Array[Long] = {
    val flipped = a.map(_ ^ Long.MinValue)
    java.util.Arrays.sort(flipped)
    flipped.map(_ ^ Long.MinValue)
  }

  /** Task-side collector: K smallest distinct hashes in unsigned order.
    * A max-heap (unsigned) holds the current survivors; the mirror set
    * makes distinctness O(1). Both are bounded at K entries. */
  final class Builder {
    private val heap = new java.util.PriorityQueue[java.lang.Long](
      K, (a: java.lang.Long, b: java.lang.Long) =>
        java.lang.Long.compareUnsigned(b, a))
    private val seen = new java.util.HashSet[java.lang.Long]()
    def add(h: Long): Unit = {
      val boxed = java.lang.Long.valueOf(h)
      if (seen.contains(boxed)) return
      if (heap.size < K) { heap.add(boxed); seen.add(boxed) }
      else if (java.lang.Long.compareUnsigned(h, heap.peek()) < 0) {
        seen.remove(heap.poll()); heap.add(boxed); seen.add(boxed)
      }
    }
    /** Retained hashes, ascending unsigned — the serialized form. */
    def result(): Array[Long] = {
      val a = new Array[Long](heap.size)
      val it = heap.iterator()
      var i = 0
      while (it.hasNext) { a(i) = it.next(); i += 1 }
      unsignedSorted(a)
    }
  }

  /** NDV estimate from per-file sketches: union the retained hashes,
    * take the K smallest, estimate from the K-th order statistic. */
  def estimate(sketches: Seq[Array[Long]]): Long = {
    val merged = sketches.flatten.distinct.toArray
    if (merged.length < K) merged.length.toLong
    else {
      val kth = unsignedSorted(merged)(K - 1)
      // u ∈ (0, 1]: the K-th hash as a fraction of the unsigned 64-bit
      // space (top 53 bits keep double precision exact)
      val u = ((kth >>> 11).toDouble + 1.0) / (1L << 53).toDouble
      math.max(K.toLong, math.round((K - 1).toDouble / u))
    }
  }
}
