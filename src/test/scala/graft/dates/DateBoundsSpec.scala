package graft.dates

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's date-utility unit tests
  * (/root/reference/pasta1_etl/tests/test_utils.py:108-127: next-month incl.
  * December rollover, tolerance subtraction) plus property-style coverage
  * the reference lacked (README.md:54-56 admits thin tests). Properties use
  * a fixed-seed generator (the scalatest↔scalacheck bridge artifact isn't in
  * the offline cache). */
class DateBoundsSpec extends AnyFunSuite {

  test("first day of next month — mid-year (test_utils.py:108-113)") {
    assert(DateBounds.firstDayOfNextMonth("2023-03") ===
      LocalDateTime.parse("2023-04-01T00:00:00"))
  }

  test("first day of next month — December year rollover (test_utils.py:114-118, utils.py:100)") {
    assert(DateBounds.firstDayOfNextMonth("2023-12") ===
      LocalDateTime.parse("2024-01-01T00:00:00"))
  }

  test("date minus tolerance — hours cross the month boundary (test_utils.py:120-127)") {
    assert(DateBounds.dateMinusTolerance("2023-03", 72) ===
      LocalDateTime.parse("2023-02-26T00:00:00"))
    // January — tolerance crosses the year boundary
    assert(DateBounds.dateMinusTolerance("2023-01", 24) ===
      LocalDateTime.parse("2022-12-31T00:00:00"))
  }

  test("zero tolerance is the month start itself") {
    assert(DateBounds.dateMinusTolerance("2023-07", 0) ===
      LocalDateTime.parse("2023-07-01T00:00:00"))
  }

  test("filename year-month parsing (main.py:156 convention)") {
    assert(DateBounds.yearMonthOfFile("yellow_tripdata_2023-05.parquet") === Some("2023-05"))
    assert(DateBounds.yearMonthOfFile("orders_1996-01.parquet") === Some("1996-01"))
    assert(DateBounds.yearMonthOfFile("readme.txt") === None)
    assert(DateBounds.yearMonthOfFile("orders_19960.parquet") === None)
  }

  test("file range pruning is inclusive on both ends (main.py:158-163)") {
    assert(DateBounds.inRange("2023-01", "2023-01", "2023-03"))
    assert(DateBounds.inRange("2023-03", "2023-01", "2023-03"))
    assert(!DateBounds.inRange("2022-12", "2023-01", "2023-03"))
    assert(!DateBounds.inRange("2023-04", "2023-01", "2023-03"))
  }

  private def randomYms(n: Int): Seq[(String, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(n) {
      val ym = f"${1990 + rnd.nextInt(110)}%04d-${1 + rnd.nextInt(12)}%02d"
      (ym, rnd.nextLong(27L * 24 * 3600))
    }
  }

  test("property: every timestamp inside a month falls in exactly one zero-tolerance interval") {
    for ((ym, offsetSec) <- randomYms(500)) {
      val start = DateBounds.dateMinusTolerance(ym, 0)
      val end = DateBounds.firstDayOfNextMonth(ym)
      val ts = start.plusSeconds(offsetSec)
      // inside its own month interval…
      assert(!ts.isBefore(start) && ts.isBefore(end), s"$ym +${offsetSec}s")
      // …and in no other month's interval
      val otherYm = if (ym.endsWith("-01")) ym.take(5) + "02" else ym.take(5) + "01"
      val oStart = DateBounds.dateMinusTolerance(otherYm, 0)
      val oEnd = DateBounds.firstDayOfNextMonth(otherYm)
      assert(ts.isBefore(oStart) || !ts.isBefore(oEnd), s"$ym vs $otherYm")
    }
  }

  test("property: next-month is strictly after month start and at a month boundary") {
    for ((ym, _) <- randomYms(500)) {
      val start = DateBounds.dateMinusTolerance(ym, 0)
      val next = DateBounds.firstDayOfNextMonth(ym)
      assert(next.isAfter(start))
      assert(next.getDayOfMonth === 1 && next.getHour === 0 && next.getMinute === 0)
      assert(java.time.temporal.ChronoUnit.MONTHS.between(start, next) === 1)
    }
  }
}
