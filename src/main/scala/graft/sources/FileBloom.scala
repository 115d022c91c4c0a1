package graft.sources

/** Per-file BLOOM FILTERS for point-lookup file skipping — the pruning the
  * min/max zone maps cannot do: an equality probe on a high-cardinality
  * UNCLUSTERED key (`doc_id = X` over an append-ordered corpus) overlaps
  * every file's [min, max], yet each file holds only a tiny key subset.
  * The same trade as Delta's bloom index and parquet's bloom pages, kept
  * manifest-resident so planning stays metadata-only.
  *
  * Configuration: table property `bloom.columns` (comma-separated column
  * names — set at CREATE or via ALTER TABLE SET TBLPROPERTIES). Writers
  * build one bloom per configured long/int/date/timestamp/string column
  * per file in the same pass that writes the rows; readers consult them
  * for pushed `EqualTo`/`In` filters only (a bloom can PRUNE a file —
  * "definitely absent" — but never PROVE a match, so it never feeds the
  * metadata-DELETE prover).
  *
  * Sizing: [[BitsPerKey]] bits per inserted value, rounded up to a power
  * of two in [[MinBits]]..[[MaxBits]] (16 KB = ~22 KB base64 in the
  * manifest line). A file with more distinct values than the cap can serve
  * at that budget DROPS its bloom rather than shipping a saturated one —
  * absent stats never prune, so the drop is sound and honest at 100 TB
  * file sizes (the Delta `maxExpectedFpp` rule). Collection memory is
  * bounded by the same cap (~16 B per value until the drop triggers).
  *
  * Hashing: two independent 64-bit hashes per value — splitmix64 finalizer
  * over the internal long encoding (epoch days / micros ride their int/long
  * forms) for integral types, FNV-1a over UTF-8 bytes for strings — then
  * K probe positions by double hashing `h1 + i·h2` (h2 forced odd; the
  * standard Kirsch-Mitzenmacher construction). The reader canonicalizes
  * pushed filter values to the SAME encoding, both java.sql and java.time
  * flavors.
  */
private[sources] object FileBloom {
  val K = 7
  val BitsPerKey = 10
  val MinBits: Int = 1 << 10
  val MaxBits: Int = 1 << 17
  /** Values beyond this count cannot be served at BitsPerKey within
    * MaxBits — the builder drops the bloom. */
  val MaxEntries: Int = MaxBits / BitsPerKey

  // splitmix64 finalizer (public-domain constants) with two fixed stream
  // seeds — the writer and reader must mix identically forever
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def hashLong(v: Long): (Long, Long) =
    (mix(v ^ 0x6a09e667f3bcc908L), mix(v ^ 0xbb67ae8584caa73bL))

  private def fnv(b: Array[Byte], basis: Long): Long = {
    var h = basis
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }
  def hashBytes(b: Array[Byte]): (Long, Long) =
    (mix(fnv(b, 0xcbf29ce484222325L)), mix(fnv(b, 0x84222325cbf29ce4L)))

  /** Streaming builder: collects hash pairs until [[MaxEntries]], then
    * marks itself dropped (bounded memory, no saturated blooms). */
  final class Builder {
    private val h1s = Array.newBuilder[Long]
    private val h2s = Array.newBuilder[Long]
    private var n = 0
    private var dropped = false
    def add(h: (Long, Long)): Unit =
      if (!dropped) {
        if (n >= MaxEntries) { dropped = true; h1s.clear(); h2s.clear() }
        else { h1s += h._1; h2s += h._2; n += 1 }
      }
    /** The serialized bloom, or None when dropped or empty-by-drop. An
      * EMPTY bloom (zero values inserted) is still emitted: all-zero bits
      * prune every equality probe, which is sound — a column that is all
      * NULL in this file matches no equality predicate. */
    def result(): Option[String] =
      if (dropped) None
      else {
        val a1 = h1s.result(); val a2 = h2s.result()
        val bits = math.max(MinBits,
          Integer.highestOneBit(math.max(1, n * BitsPerKey - 1)) * 2)
        val words = new Array[Long](bits / 64)
        var i = 0
        while (i < a1.length) {
          setBits(words, a1(i), a2(i)); i += 1
        }
        Some(ser(words))
      }
  }

  private def setBits(words: Array[Long], h1: Long, h2: Long): Unit = {
    val mask = words.length * 64 - 1
    val step = h2 | 1L
    var i = 0
    while (i < K) {
      val bit = ((h1 + i * step) & Long.MaxValue).toInt & mask
      words(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** True iff the value MAY be present (all K bits set). */
  def maybe(words: Array[Long], h: (Long, Long)): Boolean = {
    val mask = words.length * 64 - 1
    val step = h._2 | 1L
    var i = 0
    while (i < K) {
      val bit = ((h._1 + i * step) & Long.MaxValue).toInt & mask
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def ser(words: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    words.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }
  /** Bloom deserializations since JVM start — the laziness contract's
    * test hook (plans that probe no bloom'd column must not move it). */
  private[graft] val deserCount = new java.util.concurrent.atomic.AtomicLong

  def deser(s: String): Array[Long] = {
    deserCount.incrementAndGet()
    val bytes = java.util.Base64.getDecoder.decode(s)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  /** A pushed filter value canonicalized to the writer's hash encoding, or
    * None for types blooms do not serve (doubles, booleans). Must mirror
    * [[ManifestDataWriter]]'s per-type hashing exactly. */
  def hashValue(v: Any): Option[(Long, Long)] = v match {
    case n: Long => Some(hashLong(n))
    case n: Int => Some(hashLong(n.toLong))
    case n: Short => Some(hashLong(n.toLong))
    case n: Byte => Some(hashLong(n.toLong))
    case s: String =>
      Some(hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    case d: java.sql.Date => Some(hashLong(d.toLocalDate.toEpochDay))
    case d: java.time.LocalDate => Some(hashLong(d.toEpochDay))
    case t: java.sql.Timestamp =>
      Some(hashLong(t.getTime * 1000L + (t.getNanos / 1000L) % 1000L))
    case t: java.time.Instant =>
      Some(hashLong(t.getEpochSecond * 1000000L + t.getNano / 1000L))
    case _ => None
  }
}
