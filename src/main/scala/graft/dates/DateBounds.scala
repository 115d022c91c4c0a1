package graft.dates

import java.time.{LocalDate, LocalDateTime}
import java.time.format.DateTimeFormatter

/** Month-interval boundary math, reproducing the reference's driver-side date
  * logic (`/root/reference/pasta1_etl/src/utils.py:87-116`): monthly input
  * files are filtered to the half-open interval
  * `[month_start - tolerance_hours, first_day_of_next_month)` — lower bound
  * inclusive (`main.py:182`), upper exclusive (`main.py:186`).
  *
  * Pure functions over java.time — property-testable, no Spark dependency.
  */
object DateBounds {
  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** First day of the month after "YYYY-MM", incl. the December→January
    * year rollover (`utils.py:100`). */
  def firstDayOfNextMonth(yearMonth: String): LocalDateTime =
    LocalDate.parse(s"$yearMonth-01").plusMonths(1).atStartOfDay

  /** Month start minus a tolerance in hours (`utils.py:103-116`) — admits
    * trips whose pickup leaked into the tail of the previous month. */
  def dateMinusTolerance(yearMonth: String, toleranceHours: Int): LocalDateTime =
    LocalDate.parse(s"$yearMonth-01").atStartOfDay.minusHours(toleranceHours.toLong)

  /** `yyyy-MM-dd HH:mm:ss` literal for embedding in SQL / Spark `lit`s. */
  def sqlLiteral(dt: LocalDateTime): String = dt.format(fmt)

  /** Parse the `YYYY-MM` suffix of a `<prefix>_YYYY-MM.parquet` file name
    * (`main.py:156`); None if the name doesn't follow the convention. */
  def yearMonthOfFile(fileName: String): Option[String] = {
    val re = raw".*_(\d{4}-\d{2})\.parquet$$".r
    fileName match { case re(ym) => Some(ym); case _ => None }
  }

  /** Reference's file-level pruning (`main.py:158-163`): keep files whose
    * YYYY-MM falls within [startYm, endYm] by plain string comparison. */
  def inRange(ym: String, startYm: String, endYm: String): Boolean =
    ym >= startYm && ym <= endYm
}
