package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Soundness of the per-file bloom filters: NO FALSE NEGATIVES ever (a
  * false negative silently drops matching rows from a scan), a sane
  * false-positive rate at the designed bits-per-key, the saturation drop,
  * and stats-line serialization round-trips including legacy lines. */
class FileBloomSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("no false negatives over random longs, and FPR stays near design") {
    val r = rng(42)
    val present = Seq.fill(2000)(r.nextLong()).distinct
    val b = new FileBloom.Builder
    present.foreach(v => b.add(FileBloom.hashLong(v)))
    val words = FileBloom.deser(b.result().get)
    assert(present.forall(v => FileBloom.maybe(words, FileBloom.hashLong(v))),
      "a present value must always report maybe")
    val presentSet = present.toSet
    val absent = Iterator.continually(r.nextLong())
      .filterNot(presentSet).take(20000).toSeq
    val fp = absent.count(v => FileBloom.maybe(words, FileBloom.hashLong(v)))
    // 10 bits/key + 7 hashes designs for <1% FPR; allow generous slack
    assert(fp.toDouble / absent.size < 0.05, s"FPR too high: $fp/20000")
  }

  test("no false negatives over strings") {
    val r = rng(7)
    val present = Seq.fill(1000)(r.alphanumeric.take(1 + r.nextInt(20)).mkString).distinct
    val b = new FileBloom.Builder
    def h(s: String) = FileBloom.hashBytes(s.getBytes("UTF-8"))
    present.foreach(v => b.add(h(v)))
    val words = FileBloom.deser(b.result().get)
    assert(present.forall(v => FileBloom.maybe(words, h(v))))
    val presentSet = present.toSet
    val absent = Seq.fill(5000)(r.alphanumeric.take(25).mkString)
      .filterNot(presentSet)
    val fp = absent.count(v => FileBloom.maybe(words, h(v)))
    assert(fp.toDouble / absent.size < 0.05, s"string FPR too high: $fp")
  }

  test("saturation drops the bloom instead of shipping a useless one") {
    val b = new FileBloom.Builder
    (0L to FileBloom.MaxEntries.toLong).foreach(v => b.add(FileBloom.hashLong(v)))
    assert(b.result().isEmpty, "over-cap builder must drop, not saturate")
  }

  test("an empty bloom prunes every probe (all-NULL column is sound)") {
    val words = FileBloom.deser((new FileBloom.Builder).result().get)
    assert(!FileBloom.maybe(words, FileBloom.hashLong(123L)))
  }

  test("reader-side value canonicalization matches the writer encoding") {
    // date: writer hashes the internal epoch-day int widened to long
    val day = java.time.LocalDate.of(2026, 3, 14)
    assert(FileBloom.hashValue(day).contains(FileBloom.hashLong(day.toEpochDay)))
    assert(FileBloom.hashValue(java.sql.Date.valueOf(day))
      .contains(FileBloom.hashLong(day.toEpochDay)))
    // timestamp: epoch micros, both java.time and java.sql flavors
    val inst = java.time.Instant.parse("2026-03-14T01:59:26.535897Z")
    val micros = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
    assert(FileBloom.hashValue(inst).contains(FileBloom.hashLong(micros)))
    assert(FileBloom.hashValue(java.sql.Timestamp.from(inst))
      .contains(FileBloom.hashLong(micros)))
    // ints widen to the long encoding
    assert(FileBloom.hashValue(41).contains(FileBloom.hashLong(41L)))
    // doubles are not bloom-served
    assert(FileBloom.hashValue(1.5d).isEmpty)
  }

  test("ColumnStats round-trips blooms and still parses legacy lines") {
    val b = new FileBloom.Builder
    b.add(FileBloom.hashLong(99L))
    val bloom = b.result().get
    val st = ColumnStats(
      Map("id" -> ((BigDecimal(0), BigDecimal(10)))),
      Set("id"),
      Map("s" -> (("QQ==", "Wg=="))))
      .withBlooms(Map("id" -> bloom))
    val back = ColumnStats.parse(st.render)
    assert(back == st)
    assert(back.blooms == Map("id" -> bloom))
    // pre-bloom stats lines (no '%' section) parse to empty blooms
    val legacy = ColumnStats.parse("id=0,10#id$s=QQ==,Wg==")
    assert(legacy.blooms.isEmpty && legacy.ranges.contains("id"))
  }
}
